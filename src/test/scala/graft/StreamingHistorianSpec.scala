package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.Historian
import graft.streaming.StreamingHistorian

object StreamingHistorianSpec {
  final case class Row4(k: Long, ts: Timestamp, value: Double, tie: Long)
}

/** Streaming TWA: exact parity with the batch operator after a replayed
  * multi-batch log, including the last-sample-weighs-zero contract.
  */
class StreamingHistorianSpec extends SparkSpec {
  import spark.implicits._
  import StreamingHistorianSpec.Row4

  private def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)

  test("replayed stream TWA equals batch TWA bit for bit") {
    implicit val sqlCtx = spark.sqlContext
    val obs = (1 to 90).map(i =>
      Row4((i % 3).toLong, ts(i), 5.0 + (i % 11) * 1.25, i.toLong))
    val batch = Historian.twa(obs.toDF("k", "t", "v", "id"),
      col("k"), col("t"), col("v"), col("id"))
      .as[(Long, Double)].collect().toMap

    val input = MemoryStream[Row4]
    val out = StreamingHistorian.twa(input.toDS().toDF("k", "ts", "value", "tie"))
    val query = out.writeStream.format("memory").queryName("stwa")
      .outputMode("update").start()
    try {
      obs.grouped(30).foreach { g => input.addData(g: _*); query.processAllAvailable() }
      // Update mode: the LAST emitted row per key is the running figure
      val streamed = spark.table("stwa").groupBy("k")
        .agg(last(col("twa")).as("twa"), max(col("n_obs")).as("n"))
        .as[(Long, Double, Long)].collect()
      assert(streamed.length == 3)
      streamed.foreach { case (k, twa, n) =>
        assert(n == 30, s"device $k saw $n observations")
        assert(twa == batch(k), s"device $k: stream $twa != batch ${batch(k)}")
      }
    } finally query.stop()
  }

  test("single observation: falls back to the value itself (den = 0)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Row4]
    val out = StreamingHistorian.twa(input.toDS().toDF("k", "ts", "value", "tie"))
    val query = out.writeStream.format("memory").queryName("stwa1")
      .outputMode("update").start()
    try {
      input.addData(Row4(9L, ts(0), 42.5, 1L))
      query.processAllAvailable()
      val got = spark.table("stwa1").as[(Long, Double, Long)].collect().toList
      assert(got.size == 1 && math.abs(got.head._2 - 42.5) < 1e-6)
    } finally query.stop()
  }
}
