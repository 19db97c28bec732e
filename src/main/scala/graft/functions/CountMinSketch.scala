package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Count-min sketch as a mergeable TABLE (Cormode & Muthukrishnan 2005) —
  * the frequency counterpart of the q132 HLL rollup and q133 histogram
  * table: one (j, bucket) → count grid per fine-grained cell, built in a
  * single pass over the raw events and stored tiny (depth × width longs
  * per cell); any coarser rollup SUMS grids (counters are linear), and a
  * point-frequency estimate is `min_j cnt[j][h_j(x)]` — never ≤ the true
  * count, overshooting only by collision mass ≈ N/width per row, with the
  * min over `depth` independent rows driving the overshoot probability
  * down exponentially.
  *
  * Where [[HeavyHitters]] (Misra-Gries, q105) answers "which items are
  * frequent" with a bounded in-flight summary, the CM table answers "how
  * frequent is THIS item" for any later probe without rescanning — the
  * stored-sketch-table pattern at 100 TB: raw scan once at ingest, every
  * subsequent probe touches depth × width counters per cell.
  *
  * Hashing is the minhash universal family over M = 2³¹−1
  * ([[Dedup.permA]]/[[Dedup.permB]], exported literals) on NON-NEGATIVE
  * integer items: ((x mod M)·a_j + b_j) mod M mod width. All intermediates
  * stay < 2⁶², so Long arithmetic is exact and the oracle reproduces every
  * counter AND every estimate bit-for-bit — the estimates themselves
  * hash-match cross-engine (stronger than q81's error-verdict pattern).
  */
object CountMinSketch {

  val Mod: Long = Dedup.MinhashMod // 2^31 − 1

  /** Default grid: 4 rows × 256 buckets = 1024 longs per cell. */
  val Depth = 4
  val Width = 256

  private def jCol(depth: Int): Column =
    explode(array((0 until depth).map(lit): _*)).as("j")

  /** h_j(item) for the row index in column "j" (1-based element_at). */
  private def bucketCol(item: Column, depth: Int, width: Int): Column = {
    val as = array((0 until depth).map(j => lit(Dedup.permA(j))): _*)
    val bs = array((0 until depth).map(j => lit(Dedup.permB(j))): _*)
    ((item % Mod) * element_at(as, col("j") + 1) + element_at(bs, col("j") + 1)) % Mod % width
  }

  /** One CM grid per (keys..., cell): rows (keys, cell, j, bucket, cnt).
    * Zero-count buckets are absent (sparse form); [[estimate]] coalesces.
    * The explode multiplies pre-aggregation rows ×depth, but the partial
    * aggregate collapses map-side, so the shuffle carries at most
    * cells × depth × width counter rows.
    */
  def sketchCells(df: DataFrame, keys: Seq[String], cell: Column, item: Column,
                  depth: Int = Depth, width: Int = Width): DataFrame =
    df.select((keys.map(col) :+ cell.as("cell") :+ item.as("item")): _*)
      .withColumn("j", jCol(depth))
      .withColumn("bucket", bucketCol(col("item"), depth, width))
      .groupBy((keys.map(col) ++ Seq(col("cell"), col("j"), col("bucket"))): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Merge cell grids up to the key grain — counters sum (linearity). */
  def rollup(cells: DataFrame, keys: Seq[String]): DataFrame =
    cells.groupBy((keys.map(col) ++ Seq(col("j"), col("bucket"))): _*)
      .agg(sum(col("cnt")).as("cnt"))

  /** Point-frequency estimates for `probes` (must carry `keys` and an
    * `item` column) against a rolled-up sketch: min over j of the probed
    * counter, 0-coalesced for never-seen buckets. One broadcast-sized
    * join per probe row × depth — the sketch is the small side by
    * construction.
    */
  def estimate(sketch: DataFrame, keys: Seq[String], probes: DataFrame,
               depth: Int = Depth, width: Int = Width): DataFrame = {
    val probeCols = probes.columns.map(col).toSeq
    probes
      .withColumn("j", jCol(depth))
      .withColumn("bucket", bucketCol(col("item"), depth, width))
      .join(sketch, keys ++ Seq("j", "bucket"), "left")
      .groupBy(probeCols: _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_cnt"))
  }

  /** The DuckDB-side hash-row dimension (j, a, b) as a VALUES CTE — the
    * oracle embeds the SAME coefficients so both engines compute
    * identical buckets and identical estimates.
    */
  def oracleJs(depth: Int = Depth): String =
    (0 until depth)
      .map(j => s"(${j}, ${Dedup.permA(j)}, ${Dedup.permB(j)})")
      .mkString("js(j, a, b) AS (VALUES ", ", ", ")")
}
