package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** T2 — the device-liveness state machine (reference
  * `Services/OpcSubscribeService.cs:45-58,578-585,809-847`):
  *
  *   - good value        → myPV_online := 1
  *   - bad status        → myPV_online := 0            (`:585`)
  *   - 60 s silence      → myPV_online := 0            (heartbeat window)
  *   - 3 min server hush → every device offline        (watchdog, `:980-997`)
  *
  * Implemented as `flatMapGroupsWithState` keyed by device with an
  * EVENT-time timeout. The reference times out on wall clock; because its
  * staleness gate (F2) already forces |ingest − source| ≤ 60 s, event time
  * tracks the wall clock within the accepted envelope, and event-time
  * timeouts make the operator deterministic and replayable — the right
  * trade at scale (reprocessing a day of history must not mark everything
  * offline).
  *
  * State per device is one (lastGoodMicros, online) pair — O(#devices)
  * total, evicted by timeout; partitioned by device hash so 1000 executors
  * share the key space with no hot spot.
  */
object Liveness {

  val DeviceTimeout: String = "60 seconds"   // Services/OpcSubscribeService.cs:45-58
  val DeviceTimeoutMicros: Long = 60L * 1000 * 1000

  /** Emitted on every transition AND every refresh: the streaming analogue
    * of the reference's myPV_online row upsert.
    */
  final case class OnlineEvent(device: String, online: Double, event_ts: Timestamp)

  final case class DeviceState(lastGoodMicros: Long, online: Boolean)

  def update(
      device: String,
      events: Iterator[MeasureEvent],
      state: GroupState[DeviceState]): Iterator[OnlineEvent] = {
    if (state.hasTimedOut) {
      // 60 s with no good value → offline (reference heartbeat sweep)
      val last = state.get
      state.update(DeviceState(last.lastGoodMicros, online = false))
      // Keep the key one more window so repeated sweeps stay cheap; the
      // state is tiny and a returning device flips it back to online.
      state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 60000L)
      Iterator.single(OnlineEvent(device, 0.0, new Timestamp(state.getCurrentWatermarkMs())))
    } else {
      val evs = events.toSeq
      val good = evs.filter(_.status_ok)
      val prev = state.getOption
      val out = if (good.nonEmpty) {
        // any good value within the batch → online (reference `:580`)
        val lastGoodTs = good.map(_.source_ts).maxBy(_.getTime)
        state.update(DeviceState(lastGoodTs.getTime * 1000L, online = true))
        Some(OnlineEvent(device, 1.0, lastGoodTs))
      } else if (evs.nonEmpty) {
        // only bad-status values → offline immediately (reference `:585`)
        state.update(DeviceState(prev.map(_.lastGoodMicros).getOrElse(0L), online = false))
        Some(OnlineEvent(device, 0.0, evs.map(_.source_ts).maxBy(_.getTime)))
      } else None
      // re-arm: offline 60 s after the newest event for this device
      val baseMs = evs.map(_.source_ts.getTime).maxOption
        .getOrElse(state.getCurrentWatermarkMs())
      state.setTimeoutTimestamp(baseMs + 60000L)
      out.iterator
    }
  }

  /** Wire the state machine onto a gated measure stream. Callers attach
    * their own sink (`foreachBatch` MERGE in production, memory sink in
    * tests). Watermark bounds both dedup state and the timeout clock; pass
    * `watermarked = true` when the input already carries one (redefining a
    * watermark downstream is disallowed).
    */
  def onlineEvents(measures: Dataset[MeasureEvent],
                   watermarked: Boolean = false): Dataset[OnlineEvent] = {
    import measures.sparkSession.implicits._
    val wm = if (watermarked) measures
             else measures.withWatermark("source_ts", DeviceTimeout)
    wm.groupByKey(_.device)
      .flatMapGroupsWithState[DeviceState, OnlineEvent](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }
}
