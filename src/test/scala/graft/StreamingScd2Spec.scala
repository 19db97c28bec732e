package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.Scd2
import graft.streaming.StreamingScd2

object StreamingScd2Spec {
  final case class Ev(k: Long, ts: Timestamp, state: String, tie: Long)
}

/** Batch/stream parity for the SCD-2 interval build: replayed closed
  * intervals equal the batch non-null-valid_to rows; the open state per
  * key is the batch null row (pinned by closing every key with a
  * sentinel state change).
  */
class StreamingScd2Spec extends SparkSpec {
  import spark.implicits._
  import StreamingScd2Spec.Ev

  private def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)

  /** 12 keys, state flips with repeated runs and same-ts ties. */
  private def mkLog: Seq[Ev] = {
    val states = Array("ok", "warn", "down")
    (1 to 400).map { i =>
      Ev((i % 12).toLong, ts(i * 3 % 300), states(i * 7 % 17 % 3), i.toLong)
    }
  }

  private val sentinelTs = ts(10000)

  /** The log plus one sentinel observation per key: a state no real row
    * uses, so every open interval closes at the sentinel's arrival.
    */
  private def withSentinels(log: Seq[Ev]): Seq[Ev] =
    log ++ log.map(_.k).distinct.sorted.zipWithIndex.map { case (k, i) =>
      Ev(k, sentinelTs, "__close__", 1000000L + i)
    }

  private def batchClosed: Set[(Long, String, Long, Long, Long)] =
    Scd2.intervals(withSentinels(mkLog).toDF("key", "t", "st", "tie"),
      col("key"), col("st"), col("t"), col("tie"))
      .filter(col("valid_to").isNotNull && col("state") =!= "__close__")
      .select(col("k"), col("state"), unix_micros(col("valid_from")),
        unix_micros(col("valid_to")), col("n_obs"))
      .as[(Long, String, Long, Long, Long)].collect().toSet

  private def streamClosed(batches: Int): Set[(Long, String, Long, Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val name = s"sscd2_$batches"
    val query = StreamingScd2.intervals(
      input.toDS().toDF("k", "ts", "state", "tie"))
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      val ordered = withSentinels(mkLog).sortBy(e => (e.ts.getTime, e.tie))
      ordered.grouped(math.max(1, ordered.size / batches))
        .foreach { g => input.addData(g: _*); query.processAllAvailable() }
      spark.table(name)
        .as[(Long, String, Long, Long, Long)].collect().toSet
    } finally query.stop()
  }

  test("scd2: replayed stream equals batch closed intervals exactly") {
    val batch = batchClosed
    assert(batch.size > 50, "fixture must flip state a lot")
    assert(batch.exists(_._5 > 1), "must have multi-observation runs")
    assert(streamClosed(5) == batch)
  }

  test("scd2: batch-boundary invariance") {
    assert(streamClosed(1) == streamClosed(9))
  }

  test("scd2: same-ts observations collapse by tie order in both forms") {
    // two same-ts observations with different states: the higher tie wins
    // the instant, the lower closes with valid_to = that same instant
    val log = Seq(Ev(7L, ts(1), "a", 1L), Ev(7L, ts(2), "b", 2L),
      Ev(7L, ts(2), "c", 3L), Ev(7L, ts(9999), "__close__", 4L))
    val batch = Scd2.intervals(log.toDF("key", "t", "st", "tie"),
      col("key"), col("st"), col("t"), col("tie"))
      .filter(col("valid_to").isNotNull)
      .select(col("state"), col("n_obs")).as[(String, Long)].collect().toSet
    assert(batch == Set(("a", 1L), ("b", 1L), ("c", 1L)))
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val query = StreamingScd2.intervals(input.toDS().toDF("k", "ts", "state", "tie"))
      .writeStream.format("memory").queryName("sscd2_tie")
      .outputMode("append").start()
    try {
      input.addData(log: _*); query.processAllAvailable()
      val got = spark.table("sscd2_tie").select(col("state"), col("n_obs"))
        .as[(String, Long)].collect().toSet
      assert(got == batch)
    } finally query.stop()
  }
}
