package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, IntegerType, LongType}

import graft.functions.HistSketch

/** ML feature-engineering primitives for training-data preparation —
  * the tabular-feature counterpart of the text-curation family
  * (reference scope: the ingestion engine ends at typed current-value
  * tables, `Services/OpcSubscribeService.cs:522-598`; turning those
  * tables into model features is the downstream step a training
  * pipeline owns).
  *
  * Every operator follows the board's exactness conventions: integer
  * sufficient statistics end-to-end, with at most one trailing IEEE
  * division/sqrt on exact BIGINTs (the q158 rational-slope convention),
  * so results hash-match a DuckDB oracle bit-for-bit.
  *
  * Scale posture, per operator:
  *  - [[quantileBins]]: one map-side-combinable histogram agg (output is
  *    sketch-sized, ≤ ~10³ log-bins regardless of row count), a bounded
  *    driver collect of nBins-1 boundaries, then a PURE MAP assignment —
  *    the raw table is scanned once and never shuffled at row grain.
  *  - [[targetEncode]]: one category-keyed agg (map-side combinable) +
  *    a 2-long bounded driver scalar for the global prior — no joins,
  *    no second scan.
  *  - [[corrPairs]]: ONE keyed agg computes every pairwise sufficient
  *    statistic in a single pass; the pair explosion happens on the
  *    group-sized frame.
  */
object FeatureEng {

  /** Equi-depth quantile binning (QuantileDiscretizer analogue) with a
    * deterministic, engine-exact contract: cut points are [[HistSketch]]
    * log-bin boundaries at the exact ceil(n·k/nBins) ranks, and
    * `bin_id = #{k : binIndex(v) ≥ boundary_k}` — duplicate boundaries
    * on skewed data collapse bins rather than splitting ties arbitrarily.
    *
    * `valueCol` must be a positive integer-domain column (take doubles
    * through [[HistSketch.toMicros]] first). Returns `df` plus `bin_id`.
    *
    * The collect is the bounded-dim driver-scalar convention (q149):
    * nBins-1 longs, never row-scale.
    */
  def quantileBins(df: DataFrame, valueCol: Column, nBins: Int): DataFrame = {
    require(nBins >= 2, s"need >= 2 bins, got $nBins")
    val binned = df.withColumn("__bin", HistSketch.binIndex(greatest(valueCol, lit(1L))))
    val hist = binned.groupBy(col("__bin")).agg(count(lit(1)).as("cnt"))
      .orderBy("__bin")
      .collect() // sketch-sized: one row per occupied log-bin (≤ ~10³)
    if (hist.isEmpty) // empty input: nothing to bin, keep the schema
      return binned.withColumn("bin_id", lit(0).cast(IntegerType)).drop("__bin")
    val n = hist.map(_.getLong(1)).sum
    val cum = hist.map(_.getLong(1)).scanLeft(0L)(_ + _).tail
    val boundaries = (1 until nBins).map { k =>
      val i = cum.indexWhere(c => c * nBins >= n * k)
      hist(i).getLong(0)
    }
    val binId = boundaries
      .map(b => when(col("__bin") >= lit(b), 1).otherwise(0))
      .reduce(_ + _)
    binned.withColumn("bin_id", binId.cast(IntegerType)).drop("__bin")
  }

  /** Smoothed target (mean) encoding of a categorical column: the
    * per-category label mean shrunk toward the global prior with
    * pseudo-count `m` — `enc = (pos + m·prior) / (cnt + m)`, emitted as
    * the exact rational `(pos·gcnt + m·gpos) / ((cnt + m)·gcnt)` with
    * one IEEE division, so two engines agree bit-for-bit.
    *
    * `labelCol` must be 0/1 integer. Returns the encoder dimension
    * (category, cnt, pos, enc) — the artifact a pipeline broadcasts
    * back onto the fact table. The global prior is a 2-long bounded
    * driver scalar (q149 convention; a 1-row crossJoin would plan as
    * the BroadcastNestedLoopJoin PlanGuard bans).
    */
  def targetEncode(df: DataFrame, catCol: Column, labelCol: Column,
      m: Long): DataFrame = {
    val base = df.select(catCol.as("category"), labelCol.cast(LongType).as("y"))
    val g = base.agg(sum(col("y")).as("gpos"), count(lit(1)).as("gcnt")).head()
    val (gpos, gcnt) = (g.getLong(0), g.getLong(1))
    base.groupBy("category")
      .agg(count(lit(1)).as("cnt"), sum(col("y")).as("pos"))
      .select(col("category"), col("cnt"), col("pos"),
        ((col("pos") * lit(gcnt) + lit(m * gpos)).cast(DoubleType) /
          ((col("cnt") + lit(m)) * lit(gcnt)).cast(DoubleType)).as("enc"))
  }

  /** Pearson correlation for every requested metric pair, per group, in
    * ONE scan: the agg computes n, Σx, Σx² and Σxy for all pairs as
    * exact BIGINTs, then each pair row carries the exact rational
    * `num = n·Σxy − Σx·Σy`, `den_x = n·Σx² − (Σx)²` (likewise den_y)
    * and `corr = num / sqrt(den_x · den_y)` — the sqrt/product in
    * double domain, one multiply, one sqrt, one divide, identical op
    * order both engines (past ~2^53 the doubles are the ROUNDED images
    * of the exact integers — identical rounding in both engines, see
    * the round-10 bounds below).
    *
    * Inputs must be pre-quantized integer columns. Exactness bounds
    * (round 10 — the old all-Long form capped n·V at 3·10⁹ and the 100×
    * audit corpus blew past it into an ANSI overflow): per-ROW products
    * x·y stay Long, so Σx² needs n·V² ≤ ~4·10¹⁸; the GROUP-level
    * products n·Σxy and Σx·Σy are computed in Decimal(38,0) — exact
    * through 10³⁸, i.e. n·V ≤ 10¹⁹, unbounded for any practical corpus.
    * num/den surface as DOUBLE: each is ONE exact integer rounded once
    * to IEEE (both engines round the same integer to the same double),
    * so the output is engine-exact at any scale while corr keeps its
    * one-multiply/one-sqrt/one-divide contract.
    */
  def corrPairs(df: DataFrame, groupCols: Seq[String],
      metrics: Seq[(String, Column)], maxAbs: Long,
      expectedMaxRows: Long): DataFrame = {
    require(metrics.size >= 2, "corrPairs needs at least two metrics")
    require(BigInt(expectedMaxRows) * maxAbs * maxAbs <= BigInt("4000000000000000000"),
      s"n·V² = ${BigInt(expectedMaxRows) * maxAbs * maxAbs} exceeds the per-row " +
        "Long-exactness bound 4e18 — re-quantize")
    val named = metrics.map { case (nm, c) => nm -> c.cast(LongType) }
    val base = df.select(groupCols.map(col) ++
      named.map { case (nm, c) => c.as(nm) }: _*)
    val aggs =
      named.map { case (nm, _) => sum(col(nm)).as(s"s_$nm") } ++
      named.map { case (nm, _) => sum(col(nm) * col(nm)).as(s"ss_$nm") } ++
      (for (i <- named.indices; j <- named.indices if i < j) yield {
        val (a, b) = (named(i)._1, named(j)._1)
        sum(col(a) * col(b)).as(s"sp_${a}_$b")
      })
    val stats = base.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"), aggs: _*)
    val dec = DecimalType(38, 0)
    def d(c: Column): Column = c.cast(dec)
    val pairRows = for (i <- named.indices; j <- named.indices if i < j) yield {
      val (a, b) = (named(i)._1, named(j)._1)
      struct(lit(s"${a}_$b").as("pair"),
        (d(col("n")) * d(col(s"sp_${a}_$b")) - d(col(s"s_$a")) * d(col(s"s_$b"))).as("num"),
        (d(col("n")) * d(col(s"ss_$a")) - d(col(s"s_$a")) * d(col(s"s_$a"))).as("den_x"),
        (d(col("n")) * d(col(s"ss_$b")) - d(col(s"s_$b")) * d(col(s"s_$b"))).as("den_y"))
    }
    stats
      .select(groupCols.map(col) :+ col("n") :+
        explode(array(pairRows: _*)).as("p"): _*)
      .select(groupCols.map(col) ++ Seq(col("p.pair").as("pair"), col("n"),
        col("p.num").cast(DoubleType).as("num"),
        col("p.den_x").cast(DoubleType).as("den_x"),
        col("p.den_y").cast(DoubleType).as("den_y"),
        when(col("p.den_x") > 0 && col("p.den_y") > 0,
          col("p.num").cast(DoubleType) /
            sqrt(col("p.den_x").cast(DoubleType) * col("p.den_y").cast(DoubleType)))
          .as("corr")): _*)
  }

  /** Per-group feature scaling — the two classic normalizers from ONE
    * keyed window pass: percentile rank `(rank − 1)/(cnt − 1)` (RANK
    * semantics, so equal values share a rank and no tiebreak is needed
    * — the normalization stays a pure function of the value) and
    * min-max `(v − min)/(max − min)`. Both are exact-integer rationals
    * with one IEEE division each (null on degenerate groups: a single
    * row, a constant group). `valueCol` must be integer-domain.
    */
  def scaleFeatures(df: DataFrame, groupCols: Seq[String],
      valueCol: Column): DataFrame = {
    val g = groupCols.map(col)
    val wOrd = Window.partitionBy(g: _*).orderBy(col("v"))
    val wAll = Window.partitionBy(g: _*)
    df.select(df.columns.map(col) :+ valueCol.cast(LongType).as("v"): _*)
      .withColumn("rnk", rank().over(wOrd))
      .withColumn("cnt", count(lit(1)).over(wAll))
      .withColumn("vmin", min(col("v")).over(wAll))
      .withColumn("vmax", max(col("v")).over(wAll))
      .withColumn("pct_rank",
        when(col("cnt") > 1, (col("rnk") - 1).cast(DoubleType) /
          (col("cnt") - 1).cast(DoubleType)))
      .withColumn("minmax",
        when(col("vmax") > col("vmin"), (col("v") - col("vmin")).cast(DoubleType) /
          (col("vmax") - col("vmin")).cast(DoubleType)))
      .drop("cnt", "vmin", "vmax")
  }

  /** Winsorized clipping — the robust-preprocessing step between
    * [[scaleFeatures]] (no outlier handling) and dropping rows
    * outright: per group, values clamp to the exact [pLo, pHi]
    * percentile band, where percentile ranks are `ceil(n·p/100)` over
    * the quantized integers (the quantileBins exact-rank convention —
    * no interpolation, no floats, engine-invariant). The standard
    * treatment for heavy-tailed features (latencies, token counts)
    * where a handful of extremes would otherwise own the scale.
    *
    * ONE exchange on the group key; the rank pass and both boundary
    * broadcasts are window stages over the same partitioning
    * (madOutliers' shape). Output keeps every input row with
    * (lo, hi, clipped) attached.
    */
  def winsorize(df: DataFrame, groupCols: Seq[String], valueCol: Column,
                tieCol: Column, pLo: Int = 10, pHi: Int = 90): DataFrame = {
    require(1 <= pLo && pLo < pHi && pHi <= 100, s"bad band [$pLo, $pHi]")
    val g = groupCols.map(col)
    val wAll = Window.partitionBy(g: _*)
    val wOrd = wAll.orderBy(col("v"), col("__wz_tie"))
    df.select(df.columns.map(col) :+ valueCol.cast(LongType).as("v")
        :+ tieCol.as("__wz_tie"): _*)
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("rn", row_number().over(wOrd).cast(LongType))
      .withColumn("lo",
        max(when(col("rn") === expr(s"(n * $pLo + 99) div 100"), col("v")))
          .over(wAll))
      .withColumn("hi",
        max(when(col("rn") === expr(s"(n * $pHi + 99) div 100"), col("v")))
          .over(wAll))
      .withColumn("clipped", least(greatest(col("v"), col("lo")), col("hi")))
      .drop("n", "rn", "__wz_tie")
  }

  /** Snapshot reconciliation WITHOUT a join: for two (possibly
    * overlapping) time windows over an event log, diff the
    * last-value-per-key states — `added` (key live only in the new
    * window), `removed` (only in the old), `changed` / `unchanged` by
    * value compare. One groupBy computes BOTH snapshots via conditional
    * `max(struct(ts, tie, value))` argmax — a single key-grain shuffle
    * where the naive formulation runs two scans plus a full outer join.
    * Ties beyond (ts) are impossible: `tieCol` must be unique per row.
    */
  def snapshotDiff(events: DataFrame, keyCols: Seq[String], tsCol: Column,
      tieCol: Column, valueCol: Column,
      oldWindow: Column, newWindow: Column): DataFrame = {
    val k = keyCols.map(col)
    events
      .filter(oldWindow || newWindow)
      .groupBy(k: _*)
      .agg(
        max(when(oldWindow, struct(tsCol.as("ts"), tieCol.as("tie"),
          valueCol.as("v")))).as("a"),
        max(when(newWindow, struct(tsCol.as("ts"), tieCol.as("tie"),
          valueCol.as("v")))).as("b"))
      .select(k ++ Seq(
        col("a.v").as("old_value"), col("b.v").as("new_value"),
        when(col("a").isNull, "added")
          .when(col("b").isNull, "removed")
          .when(col("a.v") =!= col("b.v"), "changed")
          .otherwise("unchanged").as("status")): _*)
  }
}
