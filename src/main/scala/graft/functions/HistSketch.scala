package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Mergeable QUANTILE sketch table — the quantile analogue of
  * [[SketchRollup]]'s HLL pattern: build one fixed-shape integer
  * histogram per fine-grained cell ONCE at ingest, store the tiny
  * sketch table, and answer any coarser quantile rollup by summing
  * histograms — the raw table is scanned exactly once, ever.
  *
  * Unlike HLL (whose binary internals are engine-specific, so q132 can
  * only oracle its ERROR), this sketch is engine-EXACT end to end: bins
  * are HdrHistogram-style base-2 log buckets with [[SubBits]] sub-bucket
  * bits, computed with integer-only arithmetic (`length(bin(v))`, shifts,
  * masks) that DuckDB reproduces bit-for-bit — build, merge, and the
  * final quantile estimates all hash-match a SQL oracle.
  *
  * Accuracy contract: ranks are EXACT (bins hold exact counts); the
  * reported value is the bin lower bound, so for any quantile q,
  * `lb ≤ true_q < lb·(1 + 2^-SubBits)` once values exceed `2^SubBits`
  * — a ≤6.25% one-sided value error at 4 sub-bucket bits, pinned by
  * HistSketchSpec. Doubles enter integer domain via a power-of-two
  * scale (`floor(v · 2^20)`), which is exact in IEEE arithmetic.
  */
object HistSketch {

  /** Sub-bucket bits: 2^SubBits linear sub-buckets per octave. */
  val SubBits = 4

  /** Power-of-two scale taking a positive double into micro-ish integer
    * units exactly (mantissa untouched — only the exponent moves).
    */
  val ScaleBits = 20
  val Scale: Long = 1L << ScaleBits

  /** Integer-exact positive-long domain for a double value column. */
  def toMicros(v: Column): Column =
    greatest(floor(v * lit(Scale.toDouble)).cast(LongType), lit(1L))

  /** Histogram bin index of a positive long: identity below 2^SubBits·2,
    * then `(e-SubBits)·2^SubBits + (v >> (e-SubBits))` where
    * `e = floor(log2 v)` — monotone, invertible to a lower bound, and
    * expressible in both engines with string-free integer ops.
    */
  def binIndex(v: Column): Column = {
    val e = length(bin(v)) - lit(1)
    when(e <= lit(SubBits), v)
      .otherwise((e - lit(SubBits)).cast(LongType) * lit(1L << SubBits) +
        call_function("shiftright", v, e - lit(SubBits)))
  }

  /** Lower bound of bin `b` — the reported (conservative) estimate. */
  def binLower(b: Column): Column =
    when(b < lit(2L << SubBits), b)
      .otherwise(call_function("shiftleft",
        b.bitwiseAND(lit((1L << SubBits) - 1)) + lit(1L << SubBits),
        call_function("shiftright", b, lit(SubBits)) - lit(1)))

  /** One histogram per (keys..., cell): `hist` is a sorted array of
    * (bin, cnt) structs — the sketch blob a pipeline persists via
    * `Storage` at ingest. Two keyed aggregations, both map-side
    * combinable; the second one's input is already sketch-sized.
    */
  def sketchCells(df: DataFrame, keys: Seq[String], cell: Column,
      valueMicros: Column): DataFrame = {
    val kc = keys.map(col) :+ cell.as("cell")
    df.groupBy((kc :+ binIndex(valueMicros).as("bin")): _*)
      .agg(count(lit(1)).as("cnt"))
      .groupBy(keys.map(col) :+ col("cell"): _*)
      .agg(sort_array(collect_list(struct(col("bin"), col("cnt")))).as("hist"))
  }

  /** Merge cell histograms up to the key grain and extract quantiles.
    * Touches ONLY the sketch table: explode (bounded ≈ 10³ bins/cell),
    * sum per (keys, bin), one keys-partitioned cumulative window — no
    * global sort, nothing raw-scale crosses an exchange. `qs` are
    * (name, percent) pairs; ranks use `cum·100 ≥ n·pct`, i.e. the exact
    * ceil(n·q) rank with no float in sight.
    */
  def rollupQuantiles(cells: DataFrame, keys: Seq[String],
      qs: Seq[(String, Int)]): DataFrame = {
    val k = keys.map(col)
    val merged = cells
      .select(k :+ expr("inline(hist)"): _*)
      .groupBy(k :+ col("bin"): _*)
      .agg(sum("cnt").as("cnt"))
    val cum = merged
      .withColumn("cum", sum("cnt").over(
        Window.partitionBy(keys.map(col): _*).orderBy("bin")))
      .withColumn("n", sum("cnt").over(Window.partitionBy(keys.map(col): _*)))
    val qCols = qs.map { case (name, pct) =>
      (binLower(min(when(col("cum") * lit(100) >= col("n") * lit(pct),
        col("bin")))).cast(DoubleType) / lit(Scale.toDouble)).as(name)
    }
    cum.groupBy(k: _*)
      .agg(max("n").cast(LongType).as("n"), qCols: _*)
  }

  /** SLIDING-window quantiles from the stored cell table: for every
    * (keys, day) cell, quantiles over the trailing `windowDays` days by
    * summing the window's histograms — the quantile counterpart of
    * [[SketchRollup.slidingDistinct]], and like everything HistSketch
    * the ESTIMATES themselves are integer-derived and hash-exact. The
    * join fans each cell out ≤ `windowDays` times — sketch-table-sized,
    * never raw-scale. `cell` must be a date.
    */
  def slidingQuantiles(cells: DataFrame, keys: Seq[String], windowDays: Int,
      qs: Seq[(String, Int)]): DataFrame = {
    require(windowDays >= 1, s"window must be >= 1 day, got $windowDays")
    val k = keys.map(col)
    val days = cells.select(k :+ col("cell").as("day"): _*).distinct()
    val renamed = keys.foldLeft(cells.withColumnRenamed("cell", "__c_cell")) {
      (d, kn) => d.withColumnRenamed(kn, s"__c_$kn")
    }
    val joinCond = (keys.map(kn => col(kn) === col(s"__c_$kn")) :+
      col("__c_cell").between(date_sub(col("day"), windowDays - 1), col("day")))
      .reduce(_ && _)
    val merged = days.join(renamed, joinCond)
      .select(k :+ col("day") :+ expr("inline(hist)"): _*)
      .groupBy(k :+ col("day") :+ col("bin"): _*)
      .agg(sum("cnt").as("cnt"))
    val grp = keys.map(col) :+ col("day")
    val cum = merged
      .withColumn("cum", sum("cnt").over(
        Window.partitionBy(grp: _*).orderBy("bin")))
      .withColumn("n", sum("cnt").over(Window.partitionBy(grp: _*)))
    val qCols = qs.map { case (name, pct) =>
      (binLower(min(when(col("cum") * lit(100) >= col("n") * lit(pct),
        col("bin")))).cast(DoubleType) / lit(Scale.toDouble)).as(name)
    }
    cum.groupBy(grp: _*)
      .agg(max("n").cast(LongType).as("n"), qCols: _*)
  }
}
