package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.Funnel
import graft.streaming.StreamingFunnel

object StreamingFunnelSpec {
  final case class Ev(u: Long, ts: Timestamp, t: String, tie: Long)
}

/** Batch/stream parity for the funnel state machine: on an event-ordered
  * replay the greedy first-qualifying advance equals the batch
  * earliest-min binding, bounded and unbounded.
  */
class StreamingFunnelSpec extends SparkSpec {
  import spark.implicits._
  import StreamingFunnelSpec.Ev

  private def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)
  private val stages = Seq("view", "click", "purchase")

  /** A deterministic log exercising out-of-order stages, repeats, equal
    * timestamps, and gap-straddling conversions.
    */
  private def mkLog: Seq[Ev] = {
    val types = Array("view", "click", "purchase", "other")
    (1 to 400).map { i =>
      Ev((i % 25).toLong, ts(i * 7 % 360), types(i * 13 % 4), i.toLong)
    }
  }

  private def batchCounts(gap: Option[Long]): Map[Int, Long] =
    Funnel.ordered(mkLog.toDF("user_id", "ts", "event_type", "tie"),
      stages, maxGapMinutes = gap)
      .select("stage", "n_users").as[(Int, Long)].collect().toMap

  private def streamCounts(gap: Option[Long], batches: Int): Map[Int, Long] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val name = s"sfunnel_${gap.getOrElse(0L)}_$batches"
    val query = StreamingFunnel.funnel(
      input.toDS().toDF("u", "ts", "t", "tie"), stages, maxGapMinutes = gap)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      // event-ordered replay (the parity contract)
      val ordered = mkLog.sortBy(e => (e.ts.getTime, e.tie))
      ordered.grouped(math.max(1, ordered.size / batches))
        .foreach { g => input.addData(g: _*); query.processAllAvailable() }
      spark.table(name).groupBy("stage")
        .agg(countDistinct("u").as("n")).as[(Int, Long)].collect().toMap
    } finally query.stop()
  }

  /** The stream emits no row for a never-reached stage; batch reports
    * n_users = 0 — zero-fill before comparing.
    */
  private def filled(m: Map[Int, Long]): Map[Int, Long] =
    (1 to stages.length).map(i => i -> m.getOrElse(i, 0L)).toMap

  test("unbounded funnel: replayed stream matches batch stage counts") {
    val batch = batchCounts(None)
    assert(batch(1) > batch(3), "fixture funnel must actually narrow")
    assert(filled(streamCounts(None, 5)) == filled(batch))
  }

  test("bounded funnel (max gap): replayed stream matches batch") {
    for (gap <- Seq(30L, 120L)) {
      val batch = batchCounts(Some(gap))
      val un = batchCounts(None)
      assert(batch(3) < un(3), s"gap $gap must actually drop conversions")
      assert(filled(streamCounts(Some(gap), 3)) == filled(batch), s"gap $gap")
    }
  }

  test("batch-boundary invariance: 1 batch == many batches") {
    assert(filled(streamCounts(None, 1)) == filled(streamCounts(None, 8)))
  }
}
