package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable-sketch rollups — the pre-aggregation pattern that makes
  * distinct counting work at 100 TB: build one DataSketches HLL sketch
  * per fine-grained cell ONCE (e.g. per (event_type, day) at ingest),
  * store the binary sketches as a tiny table, and answer any coarser
  * distinct-count rollup by UNIONING sketches — never rescanning the
  * raw events. `approx_count_distinct` (q29/q81) answers one query per
  * scan; a sketch table answers every slice after one scan.
  *
  * Uses Spark's built-in DataSketches expressions (`hll_sketch_agg` /
  * `hll_union_agg` / `hll_sketch_estimate`), so sketches are the
  * STANDARD Apache DataSketches HLL_4 binary format — readable by any
  * DataSketches binding, which is what makes the stored-table pattern
  * portable. Sketch internals are engine-specific, so correctness is
  * pinned the q81 way: the rollup's relative error vs the exact count
  * is the oracle-checked verdict, and mergeability (union of cell
  * sketches ≡ one direct sketch over the union of rows) is spec-pinned
  * exactly.
  */
object SketchRollup {

  /** log2 of the HLL register count: 2^14 registers ≈ 0.8% standard
    * error — comfortably inside q81's 5% verdict at any fixture size.
    */
  val LgK = 14

  /** One sketch per (keys..., cell) — the table a pipeline would persist
    * via `Storage` at ingest time. `cells` is the fine grain (day,
    * source shard, …); output carries one binary sketch per cell.
    */
  def sketchCells(df: DataFrame, keys: Seq[String], cell: Column,
      item: Column): DataFrame =
    df.groupBy((keys.map(col) :+ cell.as("cell")): _*)
      .agg(hll_sketch_agg(item, lit(LgK)).as("sketch"))

  /** Roll the cell sketches up to the key grain: union, then estimate.
    * The raw table is never touched — this is the query a dashboard
    * runs against the stored sketch table.
    */
  def rollup(cells: DataFrame, keys: Seq[String]): DataFrame =
    cells.groupBy(keys.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"), lit(false)))
        .as("approx_distinct"))

  /** SLIDING-window distinct estimates from the stored cell table: for
    * every (keys, day) cell, the estimate over the trailing `windowDays`
    * days — a windowed `hll_union_agg` over the day-sized sketch table,
    * so "7-day uniques per type per day" costs one pass over the tiny
    * sketch table instead of `windowDays` rescans of the raw events
    * (the rolling-dashboard query at 100 TB). `cell` must be a date.
    */
  def slidingDistinct(cells: DataFrame, keys: Seq[String],
                      windowDays: Int): DataFrame = {
    require(windowDays >= 1, s"window must be >= 1 day, got $windowDays")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(datediff(col("cell"), lit("1970-01-01")))
      .rangeBetween(-(windowDays - 1).toLong, 0L)
    cells.withColumn("approx_distinct",
      hll_sketch_estimate(hll_union_agg(col("sketch"), lit(false)).over(w)))
      .drop("sketch")
  }
}
