package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.Historian
import graft.streaming.StreamingAnomaly

object StreamingAnomalySpec {
  // top-level: Spark cannot encode inner classes of a test suite
  final case class Row4(k: Long, ts: Timestamp, value: Double, tie: Long)
}

/** Streaming anomaly detection: batch/stream parity on a replayed log,
  * incremental cross-batch state, and the bounded-ring contract.
  */
class StreamingAnomalySpec extends SparkSpec {
  import spark.implicits._
  import StreamingAnomalySpec.Row4

  private def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)

  private def mkObs(n: Int): Seq[Row4] =
    (1 to n).map { i =>
      // two devices; device 1 gets spikes at i = 40 and 77
      val base = if (i % 2 == 0) 10.0 + (i % 5) else 20.0 + (i % 3)
      val v = if ((i == 40 || i == 77) && i % 2 == 0) 500.0 else base
      Row4((i % 2).toLong, ts(i), v, i.toLong)
    }

  test("stream replay matches the batch operator row for row") {
    implicit val sqlCtx = spark.sqlContext
    val obs = mkObs(100)
    val batch = Historian.rollingAnomalies(
      obs.toDF("k", "t", "v", "id"), col("k"), col("t"), col("v"), col("id"))
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet

    val input = MemoryStream[Row4]
    val out = StreamingAnomaly.anomalies(
      input.toDS().toDF("k", "ts", "value", "tie"))
    val query = out.writeStream.format("memory").queryName("sanom_parity")
      .outputMode("append").start()
    try {
      // replay in three event-ordered batches (the parity contract)
      obs.grouped(40).foreach { g => input.addData(g: _*); query.processAllAvailable() }
      val streamed = spark.table("sanom_parity")
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
      assert(streamed == batch, s"stream $streamed vs batch $batch")
      assert(batch.nonEmpty, "fixture produced no anomalies — test is vacuous")
    } finally query.stop()
  }

  test("sub-ms events: stream orders by µs like the batch operator") {
    implicit val sqlCtx = spark.sqlContext
    // 10 warmup events at distinct ms, then 5 events inside ONE
    // millisecond whose tie order is the REVERSE of their µs order — an
    // ms-truncated sort would process them by tie and diverge from the
    // batch operator's unix_micros ordering (different n/ring at the
    // spike → different flagged row)
    def us(micro: Int, tie: Long, v: Double): Row4 = {
      val t = ts(11) // all in the same millisecond
      t.setNanos(micro * 1000)
      Row4(1L, t, v, tie)
    }
    val obs = (1 to 10).map(i => Row4(1L, ts(i), 10.0 + (i % 3), i.toLong)) ++
      Seq(us(100, 20L, 500.0), us(200, 19L, 10.0),
        us(300, 18L, 11.0), us(400, 17L, 12.0), us(500, 16L, 10.0))
    val batch = Historian.rollingAnomalies(
      obs.toDF("k", "t", "v", "id"), col("k"), col("t"), col("v"), col("id"))
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(batch.nonEmpty, "sub-ms fixture produced no anomalies — vacuous")

    val input = MemoryStream[Row4]
    val out = StreamingAnomaly.anomalies(
      input.toDS().toDF("k", "ts", "value", "tie"))
    val query = out.writeStream.format("memory").queryName("sanom_subms")
      .outputMode("append").start()
    try {
      input.addData(obs: _*)
      query.processAllAvailable()
      val streamed = spark.table("sanom_subms")
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
      assert(streamed == batch, s"sub-ms parity: stream $streamed vs batch $batch")
    } finally query.stop()
  }

  test("state ring stays bounded: early history beyond lookback is forgotten") {
    implicit val sqlCtx = spark.sqlContext
    // device with a level shift: old level leaves the 5-obs ring, so a
    // return to the OLD level flags as anomalous against the new baseline
    val rows = ((1 to 10).map(i => Row4(1L, ts(i), 100.0, i.toLong)) ++
      (11 to 30).map(i => Row4(1L, ts(i), 10.0 + (i % 3), i.toLong)) :+
      Row4(1L, ts(31), 100.0, 31L))
    val input = MemoryStream[Row4]
    val out = StreamingAnomaly.anomalies(
      input.toDS().toDF("k", "ts", "value", "tie"), lookback = 5, minN = 3)
    val query = out.writeStream.format("memory").queryName("sanom_ring")
      .outputMode("append").start()
    try {
      input.addData(rows: _*)
      query.processAllAvailable()
      val flagged = spark.table("sanom_ring").select("tie").as[Long].collect().toSet
      assert(flagged.contains(31L),
        s"return to forgotten level must flag against the new baseline: $flagged")
      assert(!flagged.contains(5L), "stable early history must not flag")
    } finally query.stop()
  }
}
