package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.SkewTools
import graft.streaming.{MeasureEvent, Rollups}

class RollupsSkewSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("tumbling rollup emits a finalized window once the watermark passes it") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[MeasureEvent]
    val q = Rollups.tumbling(input.toDF(), windowLength = "1 minute")
      .writeStream.format("memory").queryName("rollup_t")
      .outputMode("append").start()
    try {
      input.addData(
        MeasureEvent("d1", "temp", 1.0, ts("2024-01-01 00:00:10"), status_ok = true),
        MeasureEvent("d1", "temp", 3.0, ts("2024-01-01 00:00:50"), status_ok = true))
      q.processAllAvailable()
      // advance the watermark well past the first window's end + delay
      input.addData(MeasureEvent("d1", "temp", 9.0, ts("2024-01-01 00:10:00"), status_ok = true))
      q.processAllAvailable()
      val rows = spark.table("rollup_t")
        .select("device", "n", "min_value", "max_value", "avg_value")
        .as[(String, Long, Double, Double, Double)].collect()
      assert(rows.contains(("d1", 2L, 1.0, 3.0, 2.0)))
    } finally q.stop()
  }

  test("session windows close after the gap and count their events") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[MeasureEvent]
    val q = Rollups.sessions(input.toDF(), gap = "5 minutes", delay = "0 seconds")
      .writeStream.format("memory").queryName("sessions_t")
      .outputMode("append").start()
    try {
      input.addData(
        MeasureEvent("d1", "temp", 1.0, ts("2024-01-01 00:00:00"), status_ok = true),
        MeasureEvent("d1", "temp", 2.0, ts("2024-01-01 00:03:00"), status_ok = true), // same session
        MeasureEvent("d1", "temp", 3.0, ts("2024-01-01 00:20:00"), status_ok = true)) // new session
      q.processAllAvailable()
      input.addData(MeasureEvent("d2", "temp", 0.0, ts("2024-01-01 01:00:00"), status_ok = true))
      q.processAllAvailable()
      val sessions = spark.table("sessions_t")
        .filter(col("device") === "d1")
        .select("n_events").as[Long].collect().sorted.toSeq
      assert(sessions == Seq(1L, 2L))
    } finally q.stop()
  }

  test("salted aggregation equals direct aggregation on skewed data") {
    // one hot key with 10k rows, many cold keys
    val df = ((1 to 10000).map(i => ("hot", i.toLong, i.toDouble)) ++
      (1 to 500).map(i => (s"cold-${i % 50}", i.toLong, i.toDouble)))
      .toDF("k", "id", "v")
    val direct = df.groupBy("k").agg(sum("v").as("sum_v"), count(lit(1)).as("n"))
      .as[(String, Double, Long)].collect()
      .map { case (k, s, n) => k -> (s, n) }.toMap
    val sums = SkewTools.saltedSum(df, Seq("k"), "v", col("id"), buckets = 8)
      .as[(String, Double)].collect().toMap
    val counts = SkewTools.saltedCount(df, Seq("k"), col("id"), buckets = 8)
      .as[(String, Long)].collect().toMap
    assert(sums.keySet == direct.keySet)
    sums.foreach { case (k, s) => assert(math.abs(s - direct(k)._1) < 1e-6) }
    counts.foreach { case (k, n) => assert(n == direct(k)._2) }
  }
}
