package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.Historian
import graft.streaming.StreamingEwma

object StreamingEwmaSpec {
  final case class Ev(k: String, ts: Timestamp, value: Double, tie: Long)
}

/** Batch/stream parity for the dyadic EWMA forecast: a replayed log
  * reproduces the batch window's numerators, forecasts, and residuals
  * bit for bit, warm-up included.
  */
class StreamingEwmaSpec extends SparkSpec {
  import spark.implicits._
  import StreamingEwmaSpec.Ev

  private def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)

  private def mkLog: Seq[Ev] =
    (1 to 120).map { i =>
      Ev(s"t${i % 3}", ts(i), 10.0 + (i * 37 % 23) * 0.5, i.toLong)
    }

  private def batchRows: Set[(String, Long, Long, Long, Double, Long)] =
    Historian.ewmaForecast(mkLog.toDF("k", "t", "v", "id"),
      col("k"), col("t"), col("v"), col("id"))
      .as[(String, Long, Long, Long, Double, Long)].collect().toSet

  private def streamRows(batches: Int): Set[(String, Long, Long, Long, Double, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val name = s"sewma_$batches"
    val query = StreamingEwma.forecasts(input.toDS().toDF("k", "ts", "value", "tie"))
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      mkLog.sortBy(e => (e.ts.getTime, e.tie))
        .grouped(math.max(1, mkLog.size / batches))
        .foreach { g => input.addData(g: _*); query.processAllAvailable() }
      spark.table(name)
        .as[(String, Long, Long, Long, Double, Long)].collect().toSet
    } finally query.stop()
  }

  test("replayed stream equals batch forecasts bit for bit") {
    val batch = batchRows
    assert(batch.size == 120 - 3 * 16, "each key drops 16 warm-up rows")
    assert(batch.exists(_._6 != 0L), "fixture must have nonzero residuals")
    assert(streamRows(5) == batch)
  }

  test("batch-boundary invariance") {
    assert(streamRows(1) == streamRows(8))
  }
}
