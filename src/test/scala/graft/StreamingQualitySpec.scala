package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingQuality

object StreamingQualitySpec {
  final case class Ev(ts: Timestamp, value: Double, cat: String)
}

/** Stream ≡ batch for the windowed quality monitor: the same monitor()
  * call over a replayed stream emits exactly the batch windows.
  */
class StreamingQualitySpec extends SparkSpec {
  import spark.implicits._
  import StreamingQualitySpec.Ev

  private def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)

  private val rules = Seq(
    "out_of_range" -> (col("value") < 0.0 || col("value") > 100.0),
    "bad_cat" -> !col("cat").isin("a", "b"))

  private def mkLog: Seq[Ev] =
    (1 to 300).map { i =>
      Ev(ts(i), (i * 37 % 140) - 20.0, Seq("a", "b", "zz")(i * 7 % 3))
    }

  private def batchWindows(log: Seq[Ev]): Set[(Timestamp, Long, Long, Long)] =
    StreamingQuality.monitor(log.toDF("ts", "value", "cat"),
      "ts", "1 hour", "30 seconds", rules)
      .as[(Timestamp, Long, Long, Long)].collect().toSet

  test("stream emits exactly the batch windows once the watermark closes them") {
    implicit val sqlCtx = spark.sqlContext
    val log = mkLog
    // a far-future sentinel drives the watermark past every real window
    val full = log :+ Ev(ts(100000), 1.0, "a")
    val input = MemoryStream[Ev]
    val query = StreamingQuality.monitor(
      input.toDS().toDF("ts", "value", "cat"), "ts", "1 hour", "30 seconds", rules)
      .writeStream.format("memory").queryName("squality")
      .outputMode("append").start()
    try {
      full.sortBy(_.ts.getTime).grouped(60)
        .foreach { g => input.addData(g: _*); query.processAllAvailable() }
      val got = spark.table("squality")
        .as[(Timestamp, Long, Long, Long)].collect().toSet
      val want = batchWindows(log) // sentinel window still open -> excluded
      assert(want.size >= 5, "fixture must span several windows")
      assert(want.exists(_._3 > 0) && want.exists(_._4 > 0),
        "fixture must violate both rules somewhere")
      assert(got == want)
    } finally query.stop()
  }

  test("batch monitor counts are exact on a hand fixture") {
    val log = Seq(
      Ev(ts(1), 50.0, "a"), Ev(ts(2), -1.0, "a"),   // one range violation
      Ev(ts(3), 200.0, "zz"),                        // violates both
      Ev(ts(70), 5.0, "b"))                          // second window, clean
    val got = batchWindows(log)
    assert(got.map(w => (w._2, w._3, w._4)) == Set((3L, 2L, 1L), (1L, 0L, 0L)))
  }
}
