package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.Sampling.reservoirK]]: the
  * exactly-k per-group draw maintained incrementally. Because the batch
  * draw ranks by (md5-hash, key) — a pure function of the keys — the
  * streaming form just keeps the k smallest (hash, key) pairs seen so
  * far per group: REPLACEMENT IS DETERMINISTIC, so after replaying any
  * prefix of the log (in any batch partitioning, any order) the held
  * reservoir equals the batch operator run over the same rows — exact
  * parity, something a classic randomized reservoir cannot offer.
  *
  * State per group: ≤ k (hash, key) pairs — bounded by construction.
  * Emits the full current reservoir (k rows, rn = draw order) plus the
  * running `n_seen` count after every batch (Update mode); the snapshot
  * with the group's max n_seen is the current draw. Keys are assumed
  * row-unique per group (the doc-id contract of the batch operator).
  */
object StreamingReservoir {

  final case class Obs(g: String, key: Long)
  final case class ResState(members: Vector[(Long, Long)], nSeen: Long)
  final case class ResRow(g: String, key: Long, rn: Int, n_seen: Long)

  /** First 8 hex chars of md5(key.toString), read as an integer — the
    * exact [[graft.functions.ScalarOps.md5Hash32]] contract, computed
    * JVM-side so the streaming state ranks identically to the batch
    * column expression.
    */
  private[streaming] def hash32(key: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(key.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) | ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
  }

  private[streaming] def update(k: Int)(
      group: String,
      events: Iterator[Obs],
      state: GroupState[ResState]): Iterator[ResRow] = {
    var st = state.getOption.getOrElse(ResState(Vector.empty, 0L))
    val incoming = events.map(e => (hash32(e.key), e.key)).toVector
    // distinct: a replayed key must not occupy two reservoir slots
    val merged = (st.members ++ incoming).distinct.sorted.take(k)
    st = ResState(merged, st.nSeen + incoming.size)
    state.update(st)
    st.members.iterator.zipWithIndex.map { case ((_, key), i) =>
      ResRow(group, key, i + 1, st.nSeen)
    }
  }

  /** Running exactly-k reservoir per group over a stream carrying `g`
    * (group) and `key` columns.
    */
  def reservoir(obs: DataFrame, k: Int): Dataset[ResRow] = {
    require(k >= 1, s"reservoir size must be >= 1, got $k")
    import obs.sparkSession.implicits._
    obs
      .select(col("g").cast("string"), col("key").cast("long"))
      .as[Obs]
      .groupByKey(_.g)
      .flatMapGroupsWithState[ResState, ResRow](
        OutputMode.Update(), GroupStateTimeout.NoTimeout())(update(k))
  }
}
