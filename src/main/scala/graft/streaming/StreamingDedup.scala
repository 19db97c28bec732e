package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exact dedup: first-seen-wins over a document stream, keyed
  * by content fingerprint, with cross-batch state and an event-time TTL —
  * the streaming complement of q90's batch incremental dedup (there the
  * corpus is static and the batch is new; here the "corpus" is the
  * stream's own history).
  *
  * `dropDuplicatesWithinWatermark` already covers notification replays
  * (T7/T8); this operator exists for the CONTENT-dedup semantics a
  * training-data ingest needs: the survivor is the earliest (event_ts,
  * doc_id) arrival, later copies increment a per-fingerprint duplicate
  * counter rather than silently vanishing, and the emitted survivor row
  * carries its fingerprint so a downstream sink can build the canonical
  * table incrementally.
  *
  * Scale: state is one small fixed-size entry per DISTINCT fingerprint
  * inside the TTL horizon, sharded by the fingerprint key across
  * executors (RocksDB state store in production). The TTL is the honest
  * boundedness contract: a duplicate arriving more than `ttl` after the
  * watermark passes its original is re-admitted — the same horizon
  * tradeoff the watermark itself imposes on late data. Duplicates within
  * one batch resolve deterministically (min event_ts, then min doc_id)
  * regardless of partition order.
  */
object StreamingDedup {

  final case class DocEvent(doc_id: Long, fp: String, event_ts: Timestamp)
  final case class SurvivorEvent(doc_id: Long, fp: String, event_ts: Timestamp,
                                 dups_at_emit: Long)
  final case class SeenState(firstDocId: Long, firstMicros: Long, dups: Long)

  private[streaming] def update(ttlMillis: Long)(
      fp: String,
      events: Iterator[DocEvent],
      state: GroupState[SeenState]): Iterator[SurvivorEvent] = {
    if (state.hasTimedOut) {
      // horizon passed: forget the fingerprint (bounded state); a
      // duplicate arriving after this re-admits — the TTL contract
      state.remove()
      Iterator.empty
    } else {
      val evs = events.toArray
      // deterministic within-batch order: the iterator's order is
      // partition-arrival order, which is not stable across runs
      val sorted = evs.sortBy(e => (e.event_ts.getTime, e.doc_id))
      val prev = state.getOption
      val (out, next) = prev match {
        case Some(seen) =>
          (None, seen.copy(dups = seen.dups + evs.length))
        case None =>
          val first = sorted.head
          (Some(SurvivorEvent(first.doc_id, fp, first.event_ts, evs.length - 1L)),
            SeenState(first.doc_id, first.event_ts.getTime * 1000L, evs.length - 1L))
      }
      state.update(next)
      val baseMs = math.max(
        sorted.last.event_ts.getTime,
        prev.map(_.firstMicros / 1000L).getOrElse(0L))
      state.setTimeoutTimestamp(baseMs + ttlMillis)
      out.iterator
    }
  }

  /** First-seen survivors of a fingerprinted document stream. The input
    * must carry `doc_id`, `fp`, `event_ts` columns; `delay` bounds late
    * data (watermark) and `ttlMillis` bounds the seen-state horizon.
    */
  def firstSeen(docs: DataFrame, delay: String = "60 seconds",
                ttlMillis: Long = 600000L): Dataset[SurvivorEvent] = {
    import docs.sparkSession.implicits._
    docs
      .select(col("doc_id").cast("long"), col("fp").cast("string"),
        col("event_ts").cast("timestamp"))
      .withWatermark("event_ts", delay)
      .as[DocEvent]
      .groupByKey(_.fp)
      .flatMapGroupsWithState[SeenState, SurvivorEvent](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update(ttlMillis))
  }
}
