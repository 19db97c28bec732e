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

  test("streaming OHLC bars equal batch bars once the watermark closes them") {
    implicit val sqlCtx = spark.sqlContext
    // 2 keys, 3+ hour buckets, same-ts tie at the open of one bucket
    val obs = (1 to 200).map(i =>
      Row4((i % 2).toLong, ts(i), 50.0 + (i * 13 % 29) - 14, i.toLong)) ++ Seq(
      Row4(1L, ts(1), 99.0, 1000L)) // same key+ts as tie=1: higher tie is NOT the open
    val batch = Historian.ohlc(obs.toDF("k", "t", "v", "id"),
      col("k"), col("t"), col("v"), col("id"))
      .as[(Long, Timestamp, Double, Double, Double, Double, Long)]
      .collect().toSet

    val input = MemoryStream[Row4]
    val bars = StreamingHistorian.ohlcBars(input.toDS().toDF("k", "ts", "value", "tie"))
    val query = bars.writeStream.format("memory").queryName("sohlc")
      .outputMode("append").start()
    try {
      val ordered = obs.sortBy(e => (e.ts.getTime, e.tie))
      // sentinel far beyond the last bucket closes every real window
      val full = ordered :+ Row4(0L, ts(100000), 1.0, 9999L)
      full.grouped(60).foreach { g => input.addData(g: _*); query.processAllAvailable() }
      val streamed = spark.table("sohlc")
        .as[(Long, Timestamp, Double, Double, Double, Double, Long)]
        .collect().toSet
      // the sentinel closes every real bar and its own stays open, so
      // the emitted set IS the batch set (batch ran without the sentinel)
      assert(batch.size >= 6, s"fixture must span bars: ${batch.size}")
      assert(streamed == batch)
      // the tie fixture bound: the 99.0 spike is the HIGH of its bar,
      // never the open (tie 1000 loses the same-instant race to tie 1)
      val spiky = batch.find(b => b._1 == 1L && b._4 == 99.0).get
      assert(spiky._3 != 99.0, s"open must not be the higher-tie value: $spiky")
    } finally query.stop()
  }
}
