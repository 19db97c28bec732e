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
