package graft

import org.apache.spark.sql.functions._
import graft.functions.HistSketch

/** Contract of the mergeable quantile-sketch table (q133):
  *  - bin mapping is monotone and its lower bound is within 2^-SubBits
  *    below the value (the one-sided ≤6.25% accuracy claim);
  *  - merging per-cell histograms is EXACT (sum of counts), so rollup
  *    over cells equals a single-cell build over all rows bit-for-bit;
  *  - quantile estimates bracket the true order statistic from below
  *    within one bin width.
  */
class HistSketchSpec extends SparkSpec {
  import spark.implicits._

  private def binIdx(v: Long): Long = {
    val e = 63 - java.lang.Long.numberOfLeadingZeros(v)
    if (e <= HistSketch.SubBits) v
    else (e - HistSketch.SubBits).toLong * (1L << HistSketch.SubBits) +
      (v >> (e - HistSketch.SubBits))
  }
  private def binLb(b: Long): Long =
    if (b < (2L << HistSketch.SubBits)) b
    else ((b & ((1L << HistSketch.SubBits) - 1)) + (1L << HistSketch.SubBits)) <<
      ((b >> HistSketch.SubBits) - 1)

  test("bin mapping: monotone, invertible lower bound, ≤2^-SubBits relative error") {
    val rng = new scala.util.Random(7)
    val vals = (Seq(1L, 2L, 15L, 16L, 31L, 32L, 33L, Long.MaxValue) ++
      Seq.fill(5000)(math.abs(rng.nextLong()) max 1L)).distinct.sorted
    // model agrees with the Column implementation
    val df = vals.toDF("v").repartition(2)
      .select(col("v"), HistSketch.binIndex(col("v")).as("b"))
      .select(col("v"), col("b"), HistSketch.binLower(col("b")).as("lb"))
      .as[(Long, Long, Long)].collect()
    df.foreach { case (v, b, lb) =>
      assert(b == binIdx(v), s"column binIndex($v)=$b model=${binIdx(v)}")
      assert(lb == binLb(b), s"column binLower($b)=$lb model=${binLb(b)}")
      assert(lb <= v, s"lb $lb > v $v")
      // one-sided error: v < lb * (1 + 2^-SubBits) once past the linear region
      assert(v - lb <= math.max(1L, lb >> HistSketch.SubBits),
        s"v=$v lb=$lb gap exceeds one bin width")
    }
    // monotone over the sorted values (repartition scrambles collect order)
    val bs = df.sortBy(_._1).map(_._2)
    assert(bs.zip(bs.tail).forall { case (a, b2) => a <= b2 }, "bin index not monotone")
  }

  private val rows = (0 until 6000).map { i =>
    ("t" + i % 3, i % 20, 0.01 + (i * 37 % 1000) / 7.0)
  }.toDF("k", "day", "value")

  test("rollup over cells == single-cell build over all rows (exact mergeability)") {
    val micros = HistSketch.toMicros(col("value"))
    val cells = HistSketch.sketchCells(rows, Seq("k"), col("day"), micros)
    assert(cells.count() == 3 * 20)
    val qs = Seq("p50" -> 50, "p90" -> 90, "p99" -> 99)
    val viaCells = HistSketch.rollupQuantiles(cells, Seq("k"), qs)
      .orderBy("k").collect().toSeq
    val oneCell = HistSketch.rollupQuantiles(
      HistSketch.sketchCells(rows, Seq("k"), lit(0), micros), Seq("k"), qs)
      .orderBy("k").collect().toSeq
    assert(viaCells == oneCell, s"$viaCells != $oneCell")
  }

  test("estimates bracket the exact quantile from below within one bin") {
    val micros = HistSketch.toMicros(col("value"))
    val cells = HistSketch.sketchCells(rows, Seq("k"), col("day"), micros)
    val est = HistSketch.rollupQuantiles(cells, Seq("k"), Seq("p90" -> 90))
      .select("k", "p90").as[(String, Double)].collect().toMap
    val exact = rows.select(col("k"), micros.as("v")).as[(String, Long)]
      .collect().groupBy(_._1).map { case (k, vs) =>
        val sorted = vs.map(_._2).sorted
        // ceil(0.9 n) rank, 1-based — same rank rule the sketch uses
        k -> sorted(((9L * sorted.length + 9) / 10 - 1).toInt)
      }
    exact.foreach { case (k, ex) =>
      val e = (est(k) * HistSketch.Scale).toLong
      assert(e <= ex, s"$k: estimate $e above exact $ex")
      assert(ex - e <= math.max(1L, e >> HistSketch.SubBits),
        s"$k: exact $ex exceeds estimate $e by more than one bin")
    }
  }

  test("partition-count invariance of build+rollup") {
    val qs = Seq("p50" -> 50, "p99" -> 99)
    def run(parts: Int) = HistSketch.rollupQuantiles(
      HistSketch.sketchCells(rows.repartition(parts), Seq("k"), col("day"),
        HistSketch.toMicros(col("value"))), Seq("k"), qs)
      .orderBy("k").collect().toSeq
    assert(run(1) == run(32))
  }

  test("sliding window == rollup over exactly the window's cells") {
    val dated = rows.withColumn("d",
      date_add(lit("2024-01-01").cast("date"), col("day")))
    val cells = HistSketch.sketchCells(dated, Seq("k"), col("d"),
      HistSketch.toMicros(col("value")))
    val qs = Seq("p50" -> 50, "p90" -> 90)
    val slid = HistSketch.slidingQuantiles(cells, Seq("k"), 7, qs)
      .select(col("k"), datediff(col("day"), lit("2024-01-01")).as("day"),
        col("n"), col("p50"), col("p90"))
      .as[(String, Int, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    for ((k, day) <- Seq(("t0", 10), ("t1", 0), ("t2", 19), ("t1", 6))) {
      val direct = HistSketch.rollupQuantiles(
        HistSketch.sketchCells(
          rows.filter(col("k") === k && col("day").between(day - 6, day)),
          Seq("k"), col("day"), HistSketch.toMicros(col("value"))),
        Seq("k"), qs)
        .select(col("n"), col("p50"), col("p90"))
        .as[(Long, Double, Double)].collect().head
      assert(slid((k, day)) == direct,
        s"($k, day $day): windowed ${slid((k, day))} != direct $direct")
    }
  }
}
