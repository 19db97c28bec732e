package graft

import org.apache.spark.sql.functions._
import graft.functions.SketchRollup

/** The stored-sketch-table contract: unioning per-cell sketches must
  * answer exactly what one direct sketch over all rows would — that
  * equivalence is what lets a pipeline persist cell sketches once and
  * roll up any slice without rescanning (the 100 TB pattern q132
  * exercises end-to-end).
  */
class SketchRollupSpec extends SparkSpec {
  import spark.implicits._

  private val rows = (0 until 5000).map { i =>
    (s"type${i % 3}", i % 40, s"user${i % 1200}")
  }.toDF("k", "day", "u")

  test("union of cell sketches == one direct sketch (estimate-exact mergeability)") {
    val cells = SketchRollup.sketchCells(rows, Seq("k"), col("day"), col("u"))
    assert(cells.count() == 3 * 40) // one sketch per (k, day)
    val viaUnion = SketchRollup.rollup(cells, Seq("k"))
      .as[(String, Long)].collect().toMap
    val direct = rows.groupBy("k")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("u"), lit(SketchRollup.LgK)))
        .as("e"))
      .as[(String, Long)].collect().toMap
    // HLL_4 register merge is lossless: the union of the 40 cell
    // sketches carries the identical register state as one pass
    assert(viaUnion == direct, s"union $viaUnion != direct $direct")
  }

  test("rollup estimate is within the lgK=14 error bound of exact") {
    val cells = SketchRollup.sketchCells(rows, Seq("k"), col("day"), col("u"))
    val approx = SketchRollup.rollup(cells, Seq("k")).as[(String, Long)].collect().toMap
    val exact = rows.groupBy("k").agg(countDistinct(col("u")).cast("long").as("c"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a - e).toDouble / e <= 0.05, s"$k: approx $a vs exact $e")
    }
  }

  test("sketches survive a parquet round-trip (the stored-table pattern)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sketch").toString
    val cells = SketchRollup.sketchCells(rows, Seq("k"), col("day"), col("u"))
    cells.write.mode("overwrite").parquet(s"$dir/cells")
    val reloaded = spark.read.parquet(s"$dir/cells")
    val a = SketchRollup.rollup(cells, Seq("k")).as[(String, Long)].collect().toMap
    val b = SketchRollup.rollup(reloaded, Seq("k")).as[(String, Long)].collect().toMap
    assert(a == b, "reloaded sketch table rolls up differently")
  }

  test("partition-count invariance of the whole build+rollup") {
    val a = SketchRollup.rollup(
      SketchRollup.sketchCells(rows.repartition(1), Seq("k"), col("day"), col("u")),
      Seq("k")).as[(String, Long)].collect().sortBy(_._1).toSeq
    val b = SketchRollup.rollup(
      SketchRollup.sketchCells(rows.repartition(32), Seq("k"), col("day"), col("u")),
      Seq("k")).as[(String, Long)].collect().sortBy(_._1).toSeq
    assert(a == b)
  }

  test("sliding window merge == direct sketch over exactly the window's rows") {
    val dated = rows.withColumn("d",
      date_add(lit("2024-01-01").cast("date"), col("day")))
    val cells = SketchRollup.sketchCells(dated, Seq("k"), col("d"), col("u"))
    val slid = SketchRollup.slidingDistinct(cells, Seq("k"), windowDays = 7)
      .select(col("k"), datediff(col("cell"), lit("2024-01-01")).as("day"),
        col("approx_distinct"))
      .as[(String, Int, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // register-lossless merge: the windowed estimate equals a direct
    // sketch built over precisely the trailing-7-day rows
    for ((k, day) <- Seq(("type0", 10), ("type1", 0), ("type2", 39), ("type1", 6))) {
      val direct = rows
        .filter(col("k") === k && col("day").between(day - 6, day))
        .agg(hll_sketch_estimate(
          hll_sketch_agg(col("u"), lit(SketchRollup.LgK))).as("e"))
        .as[Long].head()
      assert(slid((k, day)) == direct,
        s"($k, day $day): windowed ${slid((k, day))} != direct $direct")
    }
    // a partial leading window (day < 6) covers only the existing days
    assert(slid.contains(("type0", 0)))
  }
}
