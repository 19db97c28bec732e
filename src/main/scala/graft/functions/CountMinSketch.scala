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

  /** SLIDING-window top-k from stored daily state — the top-k member of
    * the sliding dashboard trio (q162 distinct, q163 quantiles): per
    * (keys, day), rank the trailing `windowDays` days' heavy items by
    * their window frequency, where
    *   - CANDIDATES are the union of each window day's exact top-`dailyTopM`
    *     (the per-day lists a pipeline stores alongside the CM cells;
    *     a heuristic superset, standard practice with m ≫ k — an item
    *     spread too thinly to make any day's top-m is not a window heavy
    *     hitter at m ≫ k), and
    *   - FREQUENCIES are CM estimates from the window-SUMMED counter
    *     grids (linearity), never a raw rescan.
    * Output carries the exact window count per candidate too, so the CM
    * one-sided guarantee (`est ≥ exact`) is part of the verdict. Both
    * scans of `df` are ingest-time state builds (daily counts + CM
    * cells — one multi-aggregate pass in a real pipeline); everything
    * after runs on day-dim-sized frames. All arithmetic integer →
    * estimates and ranks hash-exact cross-engine.
    */
  def slidingHeavyHitters(df: DataFrame, keys: Seq[String], cell: Column,
      item: Column, windowDays: Int, dailyTopM: Int, topK: Int,
      depth: Int = Depth, width: Int = Width): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(windowDays >= 1 && dailyTopM >= topK,
      "need windowDays >= 1 and dailyTopM >= topK")
    val k = keys.map(col)
    def windowed(prefix: String, extra: Column*): Column = {
      val conds = keys.map(kn => col(kn) === col(s"$prefix$kn")) ++
        Seq(col(s"${prefix}cell")
          .between(date_sub(col("day"), windowDays - 1), col("day"))) ++
        extra.toSeq
      conds.reduce(_ && _)
    }
    def renamed(dfr: DataFrame, prefix: String): DataFrame =
      keys.foldLeft(dfr.withColumnRenamed("cell", s"${prefix}cell")) {
        (d, kn) => d.withColumnRenamed(kn, s"$prefix$kn")
      }
    // ingest-time state 1: exact daily per-item counts
    val daily = df.select((k :+ cell.as("cell") :+ item.as("item")): _*)
      .groupBy(k :+ col("cell") :+ col("item"): _*)
      .agg(count(lit(1)).as("cnt"))
      .persist()
    val wTop = Window.partitionBy(k :+ col("cell"): _*)
      .orderBy(col("cnt").desc, col("item"))
    val topm = daily.withColumn("rn", row_number().over(wTop))
      .filter(col("rn") <= dailyTopM)
      .select(k :+ col("cell") :+ col("item"): _*)
    val days = daily.select(k :+ col("cell").as("day"): _*).distinct()
    val cands = days.join(renamed(topm, "__t_"), windowed("__t_"))
      .select(k :+ col("day") :+ col("item"): _*)
      .distinct()
    val exact = cands.join(
        renamed(daily, "__d_").withColumnRenamed("item", "__d_item"),
        windowed("__d_", col("__d_item") === col("item")))
      .groupBy(k :+ col("day") :+ col("item"): _*)
      .agg(sum("cnt").as("exact_cnt"))
    // ingest-time state 2: CM cells; window-summed grids by linearity
    val cells = sketchCells(df, keys, cell, item, depth, width)
    val winGrid = days.join(renamed(cells, "__s_"), windowed("__s_"))
      .groupBy(k ++ Seq(col("day"), col("j"), col("bucket")): _*)
      .agg(sum("cnt").as("cnt"))
    estimate(winGrid, keys :+ "day", exact, depth, width)
      .withColumn("lower_ok", col("est_cnt") >= col("exact_cnt"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(k :+ col("day"): _*)
          .orderBy(col("est_cnt").desc, col("item")))
        .cast(org.apache.spark.sql.types.IntegerType))
      .filter(col("rk") <= topK)
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
