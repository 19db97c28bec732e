package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingDedup
import graft.streaming.StreamingDedup.DocEvent

/** Streaming first-seen dedup: within-batch determinism, cross-batch
  * suppression, and TTL re-admission — the seen-state horizon contract.
  */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("first-seen survives; within-batch dups resolve to (min ts, min id); cross-batch dups suppressed") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[DocEvent]
    val out = StreamingDedup.firstSeen(input.toDS().toDF())
    val query = out.writeStream.format("memory").queryName("sdedup_t")
      .outputMode("append").start()
    try {
      // batch 1: fpA twice (later id has EARLIER ts and must win), fpB once
      input.addData(
        DocEvent(11L, "fpA", ts("2024-01-01 00:00:05")),
        DocEvent(7L, "fpA", ts("2024-01-01 00:00:02")),
        DocEvent(20L, "fpB", ts("2024-01-01 00:00:03")))
      query.processAllAvailable()
      // batch 2: fpA again (suppressed), fpC new
      input.addData(
        DocEvent(30L, "fpA", ts("2024-01-01 00:00:30")),
        DocEvent(40L, "fpC", ts("2024-01-01 00:00:31")))
      query.processAllAvailable()

      val rows = spark.table("sdedup_t")
        .select("doc_id", "fp", "dups_at_emit").as[(Long, String, Long)].collect().toSet
      assert(rows == Set((7L, "fpA", 1L), (20L, "fpB", 0L), (40L, "fpC", 0L)))
    } finally query.stop()
  }

  test("TTL horizon: a duplicate beyond the seen-state TTL re-admits (bounded state contract)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[DocEvent]
    // tiny TTL (10 s) so the horizon passes inside the test
    val out = StreamingDedup.firstSeen(input.toDS().toDF(), delay = "0 seconds", ttlMillis = 10000L)
    val query = out.writeStream.format("memory").queryName("sdedup_ttl_t")
      .outputMode("append").start()
    try {
      input.addData(DocEvent(1L, "fpX", ts("2024-01-01 00:00:01")))
      query.processAllAvailable()
      // advance the watermark far past fpX's TTL, then replay the content
      input.addData(DocEvent(2L, "other", ts("2024-01-01 00:05:00")))
      query.processAllAvailable()
      input.addData(DocEvent(3L, "fpX", ts("2024-01-01 00:06:00")))
      query.processAllAvailable()

      val fpx = spark.table("sdedup_ttl_t").where("fp = 'fpX'")
        .select("doc_id").as[Long].collect().toSet
      // both the original and the post-horizon replay were emitted
      assert(fpx == Set(1L, 3L))
    } finally query.stop()
  }
}
