package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.functions.CountMinSketch
import graft.streaming.StreamingSketch

/** Streaming sketch maintenance: stream-built cell table ≡ one batch
  * sketch over the same rows, and batch replay is idempotent.
  */
class StreamingSketchSpec extends SparkSpec {
  import spark.implicits._

  private def rows(n: Int): Seq[(String, Long)] =
    (1 to n).map(i => (if (i % 2 == 0) "a" else "b", (i % 17).toLong))

  test("stream-built sketch equals the direct batch sketch (linearity across batches)") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-scms").toFile.getAbsolutePath
    val input = MemoryStream[(String, Long)]
    val query = StreamingSketch.maintainCms(
      input.toDS().toDF("g", "item"), Seq("g"), dir, width = 64)
    try {
      rows(300).grouped(100).foreach { g => input.addData(g: _*); query.processAllAvailable() }
    } finally query.stop()

    val streamed = StreamingSketch.readRolledUp(spark, dir, Seq("g"))
      .orderBy("g", "j", "bucket").as[(String, Int, Long, Long)].collect().toList
    val direct = CountMinSketch.rollup(
      CountMinSketch.sketchCells(rows(300).toDF("g", "item"), Seq("g"),
        lit(0).as("cell"), col("item"), width = 64), Seq("g"))
      .orderBy("g", "j", "bucket").as[(String, Int, Long, Long)].collect().toList
    assert(streamed == direct)
  }

  test("bloom twin: stream-built filter equals the direct batch build") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-sbloom").toFile.getAbsolutePath
    val input = MemoryStream[(String, Long)]
    val query = StreamingSketch.maintainBloom(
      input.toDS().toDF("g", "item"), Seq("g"), dir)
    try {
      rows(200).grouped(80).foreach { g => input.addData(g: _*); query.processAllAvailable() }
    } finally query.stop()
    val streamed = StreamingSketch.readBloom(spark, dir, Seq("g"))
      .orderBy("g", "word").as[(String, Long, Long)].collect().toList
    val direct = graft.functions.BloomTable.build(rows(200).toDF("g", "item"),
      Seq("g"), col("item"))
      .orderBy("g", "word").as[(String, Long, Long)].collect().toList
    assert(streamed == direct)
  }

  test("replaying a batch overwrites its partition — counters never double") {
    val dir = java.nio.file.Files.createTempDirectory("graft-scms2").toFile.getAbsolutePath
    val batch = rows(100).toDF("g", "item")
    StreamingSketch.writeBatch(batch, Seq("g"), dir, batchId = 7L, width = 64)
    val once = StreamingSketch.readRolledUp(spark, dir, Seq("g"))
      .agg(sum("cnt")).head().getLong(0)
    // epoch replay: the same batch id lands again (failure between write
    // and offset commit)
    StreamingSketch.writeBatch(batch, Seq("g"), dir, batchId = 7L, width = 64)
    val twice = StreamingSketch.readRolledUp(spark, dir, Seq("g"))
      .agg(sum("cnt")).head().getLong(0)
    assert(once == twice, s"replay doubled the counters: $once -> $twice")
  }

  test("streaming inverted index: stream-built probe equals direct BM25 exactly") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-sidx").toFile.getAbsolutePath
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    val input = MemoryStream[(Long, String)]
    val query = graft.streaming.StreamingIndex.maintainPostings(
      input.toDS().toDF("doc_id", "text"), dir)
    try {
      val rows = docs.as[(Long, String)].collect().toSeq
      rows.grouped(180).foreach { g => input.addData(g: _*); query.processAllAvailable() }
    } finally query.stop()
    val qTerms = docs.filter(col("doc_id") < 5)
      .select(col("doc_id").as("q_id"),
        explode(graft.functions.TextOps.words(col("text"))).as("term"))
      .distinct()
    val streamed = graft.operators.Retrieval.bm25TopKFromIndex(
      graft.streaming.StreamingIndex.readPostings(spark, dir),
      graft.streaming.StreamingIndex.readStats(spark, dir), qTerms, k = 10)
      .orderBy("q_id", "rk").collect().map(_.toSeq).toSeq
    val direct = graft.operators.Retrieval.bm25TopK(docs, 5L, 10)
      .orderBy("q_id", "rk").collect().map(_.toSeq).toSeq
    assert(streamed == direct, "stream-built index probe diverged from direct BM25")
  }

  test("streaming inverted index: replaying a batch overwrites, tf never doubles") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sidx2").toFile.getAbsolutePath
    val batch = Seq((1L, "alpha beta alpha"), (2L, "beta gamma")).toDF("doc_id", "text")
    graft.streaming.StreamingIndex.writeBatch(batch, dir, batchId = 3L)
    graft.streaming.StreamingIndex.writeBatch(batch, dir, batchId = 3L) // epoch replay
    val p = graft.streaming.StreamingIndex.readPostings(spark, dir)
      .select("doc_id", "term", "tf", "dl", "df")
      .as[(Long, String, Long, Long, Long)].collect().toSet
    assert(p === Set((1L, "alpha", 2L, 3L, 1L), (1L, "beta", 1L, 3L, 2L),
      (2L, "beta", 1L, 2L, 2L), (2L, "gamma", 1L, 2L, 1L)))
    val st = graft.streaming.StreamingIndex.readStats(spark, dir)
      .as[(Long, Long)].collect().head
    assert(st === ((2L, 5L)))
  }

  test("HLL twin: stream-built estimates equal the direct batch sketch") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-shll").toFile.getAbsolutePath
    val input = MemoryStream[(String, Long)]
    val query = StreamingSketch.maintainHll(
      input.toDS().toDF("g", "item"), Seq("g"), dir)
    try {
      rows(300).grouped(100).foreach { g => input.addData(g: _*); query.processAllAvailable() }
    } finally query.stop()
    val streamed = StreamingSketch.readHllRolledUp(spark, dir, Seq("g"))
      .orderBy("g").as[(String, Long)].collect().toList
    val direct = graft.functions.SketchRollup.rollup(
      graft.functions.SketchRollup.sketchCells(
        rows(300).toDF("g", "item"), Seq("g"), lit(0), col("item")), Seq("g"))
      .orderBy("g").as[(String, Long)].collect().toList
    assert(streamed == direct)
    // sanity: the estimate is near-exact at this cardinality (17 items)
    assert(streamed.map(_._2).forall(e => e >= 15 && e <= 19), streamed.toString)
  }
}
