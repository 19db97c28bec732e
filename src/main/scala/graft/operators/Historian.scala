package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Process-historian resampling over the measure stream — the analytics
  * a deployment runs ON the data this engine ingests (the reference
  * stores current values only; any historian bolted onto its modvalues
  * table needs exactly these): step-interpolated time-weighted averages,
  * OHLC bars, and carried-forward gap fill.
  *
  * Determinism: TWA works in integer µs durations × integer-quantized
  * values (round_even(v·2²⁰)) summed exactly, with ONE double division
  * at the end — the bigramLikelihood convention, hash-exact
  * cross-engine. OHLC picks rows (no arithmetic) with (ts, tiebreak)
  * ordering, so ties resolve identically everywhere.
  *
  * Scale shape: everything is keyed by the entity — one corpus shuffle
  * each; the gap-fill grid explodes hour sequences per entity (grid-
  * sized, not event-sized) and the carry-forward window rides the same
  * entity partition.
  */
object Historian {

  val QScale: Long = 1L << 20

  /** Step-interpolated time-weighted average per key: each observation
    * holds until the next one; the last holds until the key's max ts
    * (weight 0 when it is the only sample point — degenerate keys fall
    * back to the plain mean of quantized values to stay total).
    * Output: (k, twa) with twa = Σ q_i·Δms_i / (2²⁰·Σ Δms_i).
    */
  def twa(df: DataFrame, key: Column, ts: Column, value: Column,
          tiebreak: Column): DataFrame = {
    val w = Window.partitionBy("k").orderBy("tus", "tie")
    val stepped = df
      .select(key.as("k"), unix_micros(ts).as("tus"),
        bround(value * QScale, 0).cast(LongType).as("q"), tiebreak.as("tie"))
      .withColumn("next_tus", lead(col("tus"), 1).over(w))
      // `div` (integral) — a double quotient cast to long can round up
      // across the integer boundary before truncation
      .withColumn("dms",
        when(col("next_tus").isNotNull, expr("(next_tus - tus) div 1000"))
          .otherwise(lit(0L)))
    stepped.groupBy("k")
      .agg(sum(col("q") * col("dms")).as("num"), sum(col("dms")).as("den"),
        sum(col("q")).as("qsum"), count(lit(1)).as("n"))
      .select(col("k"),
        when(col("den") > 0,
          col("num").cast(DoubleType) / (col("den") * QScale).cast(DoubleType))
          .otherwise(col("qsum").cast(DoubleType) / (col("n") * QScale).cast(DoubleType))
          .as("twa"))
  }

  /** OHLC bars per (key, hour bucket): open/close by (ts, tiebreak)
    * order, high/low plain extremes. Pure row selection — hash-exact.
    */
  def ohlc(df: DataFrame, key: Column, ts: Column, value: Column,
           tiebreak: Column): DataFrame = {
    val base = df.select(key.as("k"), date_trunc("hour", ts).as("bucket"),
      unix_micros(ts).as("tus"), value.as("v"), tiebreak.as("tie"))
    val w = Window.partitionBy("k", "bucket").orderBy("tus", "tie")
    val wDesc = Window.partitionBy("k", "bucket").orderBy(col("tus").desc, col("tie").desc)
    base
      .withColumn("rn_open", row_number().over(w))
      .withColumn("rn_close", row_number().over(wDesc))
      .groupBy("k", "bucket")
      .agg(
        max(when(col("rn_open") === 1, col("v"))).as("open"),
        max(col("v")).as("high"),
        min(col("v")).as("low"),
        max(when(col("rn_close") === 1, col("v"))).as("close"),
        count(lit(1)).as("n_obs"))
  }

  /** Hourly carry-forward gap fill per key: one row per hour from the
    * key's first to last observed hour; hours with no observation carry
    * the latest prior hour's closing value and are flagged `filled`.
    * The hour grid explodes per key (grid-sized); the carry-forward is
    * a running last-non-null over the same key partition.
    */
  def gapFillHourly(df: DataFrame, key: Column, ts: Column, value: Column,
                    tiebreak: Column): DataFrame = {
    val closes = ohlc(df, key, ts, value, tiebreak)
      .select(col("k"), col("bucket"), col("close"))
    val grid = closes.groupBy("k")
      .agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
      .select(col("k"),
        explode(sequence(col("lo"), col("hi"), expr("INTERVAL 1 HOUR"))).as("bucket"))
    val w = Window.partitionBy("k").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(closes, Seq("k", "bucket"), "left")
      .withColumn("value", last(col("close"), ignoreNulls = true).over(w))
      .withColumn("filled", col("close").isNull)
      .select(col("k"), col("bucket"), col("value"), col("filled"))
  }

  /** Rolling z-score anomalies with INTEGER-ONLY arithmetic: flag an
    * observation whose squared deviation from its trailing-window mean
    * exceeds k²·variance — the z² ≥ k² test cleared of divisions by
    * multiplying through by n²:  (n·q − S)² > k²·(n·S2 − S²)  over
    * quantized q = round_even(v·2¹⁰), trailing sums S = Σq, S2 = Σq².
    * No float mean, no sqrt, no division — the flag is bit-identical
    * across engines and partitionings (the q138 integer-exactness
    * argument applied to streaming-style anomaly detection).
    *
    * Window: the `lookback` rows BEFORE the current one (the observation
    * never baselines itself), requiring ≥ `minN` history. One keyed
    * shuffle (the entity partition); everything else is the running sums.
    * Output: flagged rows only — (k, tie, q, n, dev2, bound).
    */
  /** Per-key OLS trend slope with EXACT integer sufficient statistics:
    * x = whole seconds since the key's first observation, y = the
    * q148-style quantization round_even(value·2¹⁰). Emits the exact
    * numerator n·Σxy − Σx·Σy and denominator n·Σx² − (Σx)² as BIGINTs
    * (cross-engine hash-exact — comparing two slopes compares two exact
    * rationals) plus the one IEEE division for human consumption.
    *
    * Overflow budget: x ≤ time-range seconds (~3·10⁶ for a month),
    * |q| ≤ |value|·2¹⁰; with per-key n ≤ 10⁴ the worst product
    * n·Σx² ≈ 10⁴·10⁴·(3·10⁶)² ≈ 2⁶⁰ stays in Long. Scale shape: one
    * keyed window (the min-ts baseline) + one keyed aggregation.
    */
  def trendSlope(df: DataFrame, key: Column, ts: Column, value: Column): DataFrame = {
    val w = Window.partitionBy("k")
    val b = df
      .select(key.as("k"), unix_micros(ts).as("tus"),
        bround(value * 1024, 0).cast(LongType).as("q"))
      .withColumn("mintus", min(col("tus")).over(w))
      .withColumn("x", expr("(tus - mintus) div 1000000"))
    b.groupBy("k")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("q")).as("sy"),
        sum(col("x") * col("q")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .select(col("k"), col("n"),
        (col("n") * col("sxy") - col("sx") * col("sy")).as("num"),
        (col("n") * col("sxx") - col("sx") * col("sx")).as("den"))
      .withColumn("slope",
        when(col("den") > 0,
          col("num").cast(DoubleType) / col("den").cast(DoubleType)))
  }

  /** CUSUM change-point per key: the observation index maximizing the
    * n-scaled cumulative deviation |n·S_i − i·S_n| (S = prefix sum of
    * quantized values in (ts, tiebreak) order) — the classic "where did
    * the level shift" statistic with the division by n multiplied out,
    * so the argmax is over exact integers and ties resolve to the
    * EARLIEST index identically in every engine. Output: (k, n, cut_i,
    * cut_tie, dev).
    *
    * Scale shape: one keyed window (prefix sum) + one keyed total + one
    * keyed argmax — all on the same key partitioning, and the argmax is
    * a max(struct) aggregation, not a sort.
    */
  def cusumChangepoint(df: DataFrame, key: Column, ts: Column, value: Column,
                       tiebreak: Column): DataFrame = {
    val w = Window.partitionBy("k").orderBy("tus", "tie")
    val p = df
      .select(key.as("k"), unix_micros(ts).as("tus"),
        bround(value * 1024, 0).cast(LongType).as("q"), tiebreak.as("tie"))
      .withColumn("i", row_number().over(w).cast(LongType))
      .withColumn("s", sum(col("q")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = p.groupBy(col("k").as("tk"))
      .agg(count(lit(1)).as("n"), sum(col("q")).as("tot"))
    p.join(tot, col("k") === col("tk"))
      .select(col("k"), col("n"), col("i"), col("tie"),
        abs(col("n") * col("s") - col("i") * col("tot")).as("dev"))
      .groupBy("k")
      .agg(first(col("n")).as("n"),
        max(struct(col("dev"), (-col("i")).as("ni"), col("tie").as("t"))).as("m"))
      .select(col("k"), col("n"), (-col("m.ni")).as("cut_i"),
        col("m.t").as("cut_tie"), col("m.dev").as("dev"))
  }

  def rollingAnomalies(df: DataFrame, key: Column, ts: Column, value: Column,
                       tiebreak: Column, lookback: Int = 20, minN: Int = 8,
                       kSigma: Int = 3): DataFrame = {
    val w = Window.partitionBy("k").orderBy("tus", "tie")
      .rowsBetween(-lookback, -1)
    df.select(key.as("k"), unix_micros(ts).as("tus"),
        bround(value * lit(1024), 0).cast(LongType).as("q"), tiebreak.as("tie"))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("s", sum(col("q")).over(w))
      .withColumn("s2", sum(col("q") * col("q")).over(w))
      .filter(col("n") >= minN)
      .withColumn("dev2",
        (col("n") * col("q") - col("s")) * (col("n") * col("q") - col("s")))
      .withColumn("bound",
        lit(kSigma.toLong * kSigma) * (col("n") * col("s2") - col("s") * col("s")))
      .filter(col("dev2") > col("bound"))
      .select(col("k"), col("tie"), col("q"), col("n"), col("dev2"), col("bound"))
  }

  /** Truncated-EWMA one-step forecast with a DYADIC decay (α = 1/2,
    * window 16): each observation's forecast is the weighted sum of its
    * 16 predecessors, weights 2^15…2^0 over lags 1…16, denominator
    * 2^16−1 = 65535. The dyadic α makes every weight a power of two, so
    * the numerator is an exact BIGINT both engines reproduce; the
    * forecast itself is ONE IEEE division by the constant 65535·1024
    * (folding the q-scale back out), and `resid_scaled = q·65535 − num`
    * stays integer — the q158 exact-rational convention applied to
    * forecasting. Rows with fewer than 16 predecessors are warm-up and
    * dropped. One keyed window (the lags and the row_number share its
    * sort); nothing rescans.
    */
  def ewmaForecast(df: DataFrame, key: Column, ts: Column, value: Column,
      tiebreak: Column): DataFrame = {
    val w = Window.partitionBy("k").orderBy("tus", "tie")
    val base = df.select(key.as("k"), unix_micros(ts).as("tus"),
      tiebreak.as("tie"), bround(value * 1024, 0).cast(LongType).as("q"))
    val fnum = (1 to 16)
      .map(j => lag(col("q"), j).over(w) * lit(1L << (16 - j)))
      .reduce(_ + _)
    base
      .withColumn("rn", row_number().over(w))
      .withColumn("fnum", fnum)
      .filter(col("rn") > 16)
      .select(col("k"), col("tie"), col("q"), col("fnum"),
        (col("fnum").cast(DoubleType) / lit(67107840.0)).as("forecast"),
        (col("q") * lit(65535L) - col("fnum")).as("resid_scaled"))
  }

  /** Hour-of-day seasonal baseline + residual ranking: the baseline for
    * each (key, hour-of-day) cell is the exact rational mean (sum, cnt)
    * of that cell's quantized observations; each observation's deviation
    * from its cell mean is ranked as `(q·cnt − sum)/cnt` — exact integer
    * numerator, one division so deviations are comparable across cells
    * of different sizes. Emits the top `topN` |deviation| observations
    * (ties by tiebreak). One cell-keyed window carries sum/cnt to every
    * row without a second scan; the global top-N is a distributed
    * TakeOrdered (orderBy + limit), with ranks assigned on the bounded
    * result.
    */
  def seasonalResiduals(df: DataFrame, key: Column, ts: Column, value: Column,
      tiebreak: Column, topN: Int): DataFrame = {
    val w = Window.partitionBy("k", "hr")
    val scored = df
      .select(key.as("k"), hour(ts).as("hr"),
        bround(value * 1024, 0).cast(LongType).as("q"), tiebreak.as("tie"))
      .withColumn("cnt", count(lit(1)).over(w))
      .withColumn("s", sum(col("q")).over(w))
      .withColumn("resid",
        (col("q") * col("cnt") - col("s")).cast(DoubleType) /
          col("cnt").cast(DoubleType))
      // global top-N as a distributed TakeOrdered — never a
      // single-partition row_number over the event-scale frame
      .orderBy(abs(col("resid")).desc, col("tie"))
      .limit(topN)
    scored
      .withColumn("rk", row_number().over( // bounded: ≤ topN rows by now
        Window.orderBy(abs(col("resid")).desc, col("tie"))).cast(IntegerType))
      .select(col("rk"), col("k"), col("hr"), col("q"), col("cnt"),
        col("resid"))
  }

  /** Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013) —
    * the standard historian/dashboard downsampler: keep first and last
    * observations, split the interior into `buckets` equal ranges, and
    * from each range keep the point forming the LARGEST triangle with
    * the previously-kept point and the NEXT range's centroid — the
    * selection that preserves visual extremes where plain striding
    * flattens them.
    *
    * Engine-exact arithmetic: x quantizes to whole seconds from the
    * key's first observation, y to the q148 value·1024 integers, and
    * the triangle comparison multiplies the centroid out —
    * `|(cn·xP−Sx)(cn·yC−Sy) − (cn·xC−Sx)(cn·yP−Sy)|` — so every area
    * is an exact BIGINT both engines reproduce (Long-exact while
    * `bucket_n² · x_span · y_span < 2^63`; rescale x for
    * multi-year-span series). Ties break to the earliest (ts, tie)
    * candidate.
    *
    * The selection chain is sequential in the bucket index but LOCAL
    * to one key's series, so it runs inside one mapGroups pass (the
    * MMR lesson: job orchestration is the wrong tool for per-group
    * loops) — one exchange on the key, O(n) work per series. Keys with
    * fewer than `buckets`+2 observations are left out (nothing to
    * downsample; every bucket must be non-empty for the chain).
    *
    * Output: (k, sel_idx 0..buckets+1, tie, x_s, q).
    */
  def lttb(df: DataFrame, key: Column, ts: Column, value: Column,
           tiebreak: Column, buckets: Int = 10): DataFrame = {
    require(buckets >= 1, "lttb needs at least one interior bucket")
    val spark = df.sparkSession
    import spark.implicits._
    val b = buckets
    df.select(key.cast("long").as("k"), unix_micros(ts).as("tus"),
        bround(value * lit(1024), 0).cast(LongType).as("q"),
        tiebreak.cast("long").as("tie"))
      .as[(Long, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (k, it) =>
        val pts = it.map { case (_, tus, q, tie) => (tus, tie, q) }
          .toArray.sortBy(p => (p._1, p._2))
        val n = pts.length
        if (n < b + 2) Iterator.empty
        else {
          val x0 = pts.head._1
          def xs(i: Int): Long = (pts(i)._1 - x0) / 1000000L
          val nInt = n - 2
          def bucketOf(i: Int): Int = (((i - 1).toLong * b) / nInt).toInt
          val builders = Array.fill(b)(Vector.newBuilder[Int])
          var i = 1
          while (i < n - 1) { builders(bucketOf(i)) += i; i += 1 }
          val bucketIdx = builders.map(_.result())
          val out = Vector.newBuilder[(Long, Int, Long, Long, Long)]
          out += ((k, 0, pts(0)._2, xs(0), pts(0)._3))
          var prev = 0
          var bi = 0
          while (bi < b) {
            val (cn, sx, sy) =
              if (bi == b - 1) (1L, xs(n - 1), pts(n - 1)._3)
              else {
                val ids = bucketIdx(bi + 1)
                (ids.size.toLong, ids.map(xs).sum, ids.map(pts(_)._3).sum)
              }
            val px = xs(prev); val py = pts(prev)._3
            var best = -1
            var bestA = -1L
            bucketIdx(bi).foreach { c =>
              val a = math.abs((cn * px - sx) * (cn * pts(c)._3 - sy)
                - (cn * xs(c) - sx) * (cn * py - sy))
              if (a > bestA) { best = c; bestA = a } // first-wins = (ts, tie) tie-break
            }
            out += ((k, bi + 1, pts(best)._2, xs(best), pts(best)._3))
            prev = best
            bi += 1
          }
          out += ((k, b + 1, pts(n - 1)._2, xs(n - 1), pts(n - 1)._3))
          out.result().iterator
        }
      }
      .toDF("k", "sel_idx", "tie", "x_s", "q")
  }

  /** Median/MAD robust outliers — [[rollingAnomalies]]' robust twin:
    * flag observations with `|q − median| > 3·1.4826·MAD`, the
    * estimator an actual outlier CANNOT drag (a 3σ spike inflates the
    * mean/σ baseline that is supposed to catch it — the classic
    * masking failure; medians don't move). Both medians are EXACT
    * lower-median ranks over quantized integers and the 3·1.4826
    * consistency constant is premultiplied to the integer 44478/10⁴,
    * so the verdict is `dev·10⁴ > 44478·mad` — integer-only, engine-
    * and partition-invariant, no float σ anywhere.
    *
    * A constant key (MAD = 0) flags every deviating row — the standard
    * MAD caveat, here the RIGHT behavior for sensor data: any change
    * on a flatlined channel is signal.
    *
    * ONE exchange on the key; the two rank passes and both median
    * broadcasts are window stages over the same partitioning.
    */
  def madOutliers(df: DataFrame, key: Column, value: Column,
                  tiebreak: Column): DataFrame = {
    val wk = Window.partitionBy("k")
    val wq = wk.orderBy("q", "tie")
    val lowerMed = expr("(n + 1) div 2")
    val withMed = df
      .select(key.as("k"), bround(value * lit(1024), 0).cast(LongType).as("q"),
        tiebreak.as("tie"))
      .withColumn("n", count(lit(1)).over(wk))
      .withColumn("rn", row_number().over(wq).cast(LongType))
      .withColumn("med",
        max(when(col("rn") === lowerMed, col("q"))).over(wk))
      .withColumn("dev", abs(col("q") - col("med")))
    val wd = wk.orderBy("dev", "tie")
    withMed
      .withColumn("rn2", row_number().over(wd).cast(LongType))
      .withColumn("mad",
        max(when(col("rn2") === lowerMed, col("dev"))).over(wk))
      .filter(col("dev") * 10000L > lit(44478L) * col("mad"))
      .select(col("k"), col("tie"), col("q"), col("med"), col("dev"), col("mad"))
  }
}
