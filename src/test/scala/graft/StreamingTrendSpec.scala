package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.{Historian, Sampling}
import graft.streaming.{StreamingReservoir, StreamingTrend}

object StreamingTrendSpec {
  final case class Row3(k: Long, ts: Timestamp, value: Double)
  final case class RowG(g: String, key: Long)
}

/** Batch/stream parity for the round-7 incremental twins: OLS trend
  * sufficient statistics and the deterministic exactly-k reservoir.
  */
class StreamingTrendSpec extends SparkSpec {
  import spark.implicits._
  import StreamingTrendSpec._

  private def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)

  test("trend: replayed log matches the batch operator's exact rationals") {
    implicit val sqlCtx = spark.sqlContext
    val obs = (1 to 90).map { i =>
      Row3((i % 3).toLong, ts(i), 2.5 * i + (i % 7) - 3.0)
    }
    val batch = Historian.trendSlope(obs.toDF("k", "t", "v"),
      col("k"), col("t"), col("v"))
      .select("k", "n", "num", "den").as[(Long, Long, Long, Long)]
      .collect().toSet

    val input = MemoryStream[Row3]
    val out = StreamingTrend.trend(input.toDS().toDF("k", "ts", "value"))
    val query = out.writeStream.format("memory").queryName("strend_parity")
      .outputMode("update").start()
    try {
      obs.grouped(35).foreach { g => input.addData(g: _*); query.processAllAvailable() }
      // the row with each key's max n is the final state
      val streamed = spark.table("strend_parity")
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("k")
            .orderBy(col("n").desc)))
        .filter(col("rk") === 1)
        .select("k", "n", "num", "den").as[(Long, Long, Long, Long)]
        .collect().toSet
      assert(streamed == batch, s"stream $streamed vs batch $batch")
      assert(batch.exists(_._4 > 0), "fixture has no nonzero denominator — vacuous")
    } finally query.stop()
  }

  test("reservoir: replayed log holds exactly the batch draw after every prefix") {
    implicit val sqlCtx = spark.sqlContext
    val rows = (1L to 300L).map(i => RowG(if (i % 2 == 0) "en" else "de", i))
    val input = MemoryStream[RowG]
    val out = StreamingReservoir.reservoir(input.toDS().toDF("g", "key"), k = 10)
    val query = out.writeStream.format("memory").queryName("sres_parity")
      .outputMode("update").start()
    try {
      var seen = Vector.empty[RowG]
      rows.grouped(100).foreach { g =>
        seen ++= g
        input.addData(g: _*); query.processAllAvailable()
        // stream's current reservoir (max n_seen per group) must equal
        // the batch operator over exactly the rows seen so far — the
        // deterministic-replacement contract, checked at EVERY prefix
        val streamed = spark.table("sres_parity")
          .withColumn("mx", max(col("n_seen")).over(
            org.apache.spark.sql.expressions.Window.partitionBy("g")))
          .filter(col("n_seen") === col("mx"))
          .select("g", "key", "rn").as[(String, Long, Int)].collect().toSet
        val batch = Sampling.reservoirK(
          seen.toDF("g", "key"), col("key"), col("g"), 10)
          .select("g", "key", "rn").as[(String, Long, Int)].collect().toSet
        assert(streamed == batch,
          s"prefix ${seen.size}: stream $streamed vs batch $batch")
      }
    } finally query.stop()
  }

  test("reservoir: state stays bounded at k and replayed keys don't double-fill") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[RowG]
    val out = StreamingReservoir.reservoir(input.toDS().toDF("g", "key"), k = 5)
    val query = out.writeStream.format("memory").queryName("sres_bounded")
      .outputMode("update").start()
    try {
      input.addData((1L to 50L).map(RowG("x", _)): _*)
      query.processAllAvailable()
      input.addData((1L to 50L).map(RowG("x", _)): _*) // full replay
      query.processAllAvailable()
      val last = spark.table("sres_bounded")
        .withColumn("mx", max(col("n_seen")).over(
          org.apache.spark.sql.expressions.Window.partitionBy("g")))
        .filter(col("n_seen") === col("mx"))
        .select("key").as[Long].collect().toSet
      assert(last.size == 5, s"reservoir must hold exactly k keys: $last")
      val batch = Sampling.reservoirK(
        (1L to 50L).map(RowG("x", _)).toDF("g", "key"), col("key"), col("g"), 5)
        .select("key").as[Long].collect().toSet
      assert(last == batch, "replayed keys changed the draw")
    } finally query.stop()
  }
}
