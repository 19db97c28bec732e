package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.{Funnel, Sessionize}
import graft.streaming.{StreamingLastTouch, StreamingSessionize}

object StreamingSessionizeSpec {
  final case class Ev(u: Long, ts: Timestamp, tie: Long)
  final case class TEv(u: Long, ts: Timestamp, t: String, tie: Long)
}

/** Batch/stream parity for sessionization and last-touch attribution:
  * on an event-ordered replay the incremental folds equal the batch
  * window formulations row for row.
  */
class StreamingSessionizeSpec extends SparkSpec {
  import spark.implicits._
  import StreamingSessionizeSpec.{Ev, TEv}

  private def ts(s: Long) = new Timestamp(1700000000000L + s * 1000L)

  /** Deterministic log: 20 users, bursts separated by > gap idle spans,
    * equal-timestamp pairs to exercise the tie order.
    */
  private def mkLog: Seq[Ev] =
    (1 to 600).map { i =>
      val u = (i % 20).toLong
      // bursts: events cluster mod 7, with occasional long jumps
      val t = (i / 20) * 400L + (i * 31 % 7) * 30L + (if (i % 13 == 0) 5000L else 0L)
      Ev(u, ts(t), i.toLong)
    }

  private def batchSessions(gap: Long): Set[(Long, Long, Long, Long, Long)] =
    Sessionize.sessions(mkLog.toDF("user_id", "ts", "event_id"),
      col("user_id"), col("ts"), col("event_id"), gap)
      .as[(Long, Long, Long, Long, Long)].collect().toSet

  private def streamSessions(gap: Long, batches: Int): Set[(Long, Long, Long, Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val name = s"ssess_${gap}_$batches"
    val query = StreamingSessionize.sessions(
      input.toDS().toDF("u", "ts", "tie"), gapSeconds = gap)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      val ordered = mkLog.sortBy(e => (e.ts.getTime, e.tie))
      // sentinel far past every session + gap: closes each user's open
      // session so the emitted set covers ALL batch sessions; the
      // sentinel itself stays open and is excluded below
      val maxT = ordered.last.ts.getTime
      val flush = (0L until 20L).map(u =>
        Ev(u, new Timestamp(maxT + gap * 3000L), 100000L + u))
      (ordered.grouped(math.max(1, ordered.size / batches)).toSeq :+ flush)
        .foreach { g => input.addData(g: _*); query.processAllAvailable() }
      spark.table(name)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
        .filterNot(_._5 == 0L) // defensive: no zero-count sessions exist
    } finally query.stop()
  }

  test("sessionize: replayed stream equals batch sessions exactly") {
    val batch = batchSessions(600L)
    assert(batch.size > 40, "fixture must produce real session structure")
    assert(batch.exists(_._5 > 1), "must have multi-event sessions")
    assert(streamSessions(600L, 6) == batch)
  }

  test("sessionize: batch-boundary invariance") {
    assert(streamSessions(600L, 1) == streamSessions(600L, 9))
  }

  test("sessionize: tighter gap yields strictly more sessions, still parity") {
    val loose = batchSessions(600L)
    val tight = batchSessions(60L)
    assert(tight.size > loose.size)
    assert(streamSessions(60L, 4) == tight)
  }

  // ---- last-touch attribution parity ----

  private def mkTouchLog: Seq[TEv] = {
    val types = Array("ad", "visit", "buy", "other")
    (1 to 500).map { i =>
      val u = (i % 15).toLong
      val t = (i * 37L % 4000L)
      TEv(u, ts(t), types(i * 11 % 4), i.toLong)
    } ++ Seq( // same-instant tie: touch id 1001 before conv id 1002
      TEv(99L, ts(10L), "ad", 1001L), TEv(99L, ts(10L), "buy", 1002L),
      // conv before any touch at the same instant: higher tie -> null
      TEv(98L, ts(10L), "buy", 2001L), TEv(98L, ts(10L), "ad", 2002L))
  }

  private def batchAttr(gapMin: Long): Set[(Long, Long, Option[Long], Option[Long])] =
    Funnel.lastTouch(mkTouchLog.toDF("user_id", "ts", "event_type", "tie"),
      col("user_id"), col("ts"), col("event_type"), col("tie"),
      touchType = "ad", convType = "buy", maxGapMinutes = gapMin)
      .as[(Long, Long, Option[Long], Option[Long])].collect().toSet

  private def streamAttr(gapMin: Long, batches: Int): Set[(Long, Long, Option[Long], Option[Long])] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[TEv]
    val name = s"sltouch_${gapMin}_$batches"
    val query = StreamingLastTouch.attribute(
      input.toDS().toDF("u", "ts", "t", "tie"),
      touchType = "ad", convType = "buy", maxGapMinutes = gapMin)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      val ordered = mkTouchLog.sortBy(e => (e.ts.getTime, e.tie))
      ordered.grouped(math.max(1, ordered.size / batches))
        .foreach { g => input.addData(g: _*); query.processAllAvailable() }
      spark.table(name)
        .as[(Long, Long, Option[Long], Option[Long])].collect().toSet
    } finally query.stop()
  }

  test("last-touch: replayed stream equals batch attribution, nulls included") {
    val batch = batchAttr(30L)
    assert(batch.exists(_._3.isEmpty), "must have unattributed conversions")
    assert(batch.exists(_._3.nonEmpty), "must have attributed conversions")
    // the same-instant contract rows
    assert(batch.contains((99L, 1002L, Some(1001L), Some(0L))))
    assert(batch.exists(r => r._1 == 98L && r._2 == 2001L && r._3.isEmpty))
    assert(streamAttr(30L, 5) == batch)
  }

  test("last-touch: bound drops stale touches in both forms") {
    val tight = batchAttr(1L)
    val loose = batchAttr(30L)
    assert(tight.count(_._3.nonEmpty) < loose.count(_._3.nonEmpty))
    assert(streamAttr(1L, 3) == tight)
  }
}
