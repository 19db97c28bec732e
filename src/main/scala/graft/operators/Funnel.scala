package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Event-funnel and cohort-retention analytics over an event log.
  *
  * Both are the batch analogues of product-analytics queries the
  * reference's current-values pipeline feeds downstream (the reference
  * itself stops at the values table; these are the standard consumers).
  */
object Funnel {

  /** U-shaped (position-based) multi-touch attribution — the
    * multi-touch companion of `lastTouch`: every touch inside the
    * lookback window shares the conversion's credit, 40 % to the first
    * touch, 40 % to the last, 20 % split across the middles. Credit is
    * EXACT INTEGER BASIS POINTS: middles get `2000 div (n−2)` each and
    * the division remainder rides on the FIRST touch (a float split
    * would neither sum to exactly 10000 nor hash-match); n = 1 takes
    * all 10000, n = 2 splits 5000/5000. Per conversion, credits sum to
    * exactly 10000 — spec-pinned.
    *
    * Shapes: the touch↔conversion pairing is the bucketed
    * [[RangeJoin.within]] equi-join (never a theta join), the position
    * window is keyed per conversion — bounded by touches-per-window,
    * not corpus size.
    *
    * Output: (conv_id, touch_id, rn, n_t, bp).
    */
  def positionAttribution(events: DataFrame, userCol: Column, tsCol: Column,
                          typeCol: Column, idCol: Column,
                          touchType: String, convType: String,
                          windowMinutes: Long): DataFrame = {
    val base = events.select(userCol.as("u"), tsCol.as("ts"),
      typeCol.as("t"), idCol.as("id"))
    val convs = base.filter(col("t") === convType)
      .select(col("u"), col("ts"), col("id").as("conv_id"))
    val touches = base.filter(col("t") === touchType)
      .select(col("u"), col("ts"), col("id"))
    val tolUs = windowMinutes * 60L * 1000000L
    val paired = RangeJoin.within(convs, touches, "u", "ts", "ts", tolUs)
      .filter(unix_micros(col("r_ts")) <= unix_micros(col("ts")))
      .select(col("conv_id"), col("r_id").as("touch_id"),
        col("r_ts").as("touch_ts"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("conv_id")
    val wOrd = w.orderBy(col("touch_ts"), col("touch_id"))
    paired
      .withColumn("rn", row_number().over(wOrd).cast("long"))
      .withColumn("n_t", count(lit(1)).over(w))
      .withColumn("bp",
        when(col("n_t") === 1, lit(10000L))
          .when(col("n_t") === 2, lit(5000L))
          .when(col("rn") === 1,
            lit(4000L) + expr("2000 % (n_t - 2)"))
          .when(col("rn") === col("n_t"), lit(4000L))
          .otherwise(expr("2000 div (n_t - 2)")))
      .select("conv_id", "touch_id", "rn", "n_t", "bp")
  }

  /** Strictly-ordered conversion funnel: a user reaches stage k iff they
    * emitted `stages(k)` at a timestamp strictly after their stage-(k-1)
    * completion time (earliest-completion semantics: each stage binds to
    * the MINIMUM qualifying timestamp, which maximizes downstream
    * conversions and is the standard product-analytics definition).
    *
    * Returns one row per stage: (stage, stage_name, n_users).
    *
    * Scale shape: the event log is filtered to funnel event types and
    * hash-partitioned by user_id ONCE (persisted); every per-stage
    * aggregation and join is then keyed on user_id against that single
    * co-partitioned cache, so the loop adds no corpus-wide re-shuffles.
    * Per-stage frontiers are user-cardinality-sized (one row per
    * surviving user), persisted because stage k feeds both stage k+1 and
    * its own count row.
    */
  def ordered(events: DataFrame, stages: Seq[String],
              userCol: String = "user_id", typeCol: String = "event_type",
              tsCol: String = "ts",
              maxGapMinutes: Option[Long] = None): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(maxGapMinutes.forall(_ > 0), "maxGapMinutes must be positive")
    val spark = events.sparkSession
    val relevant = events
      .filter(col(typeCol).isin(stages: _*))
      .select(col(userCol).as("__u"), col(typeCol).as("__t"), col(tsCol).as("__ts"))
      .repartition(col("__u"))
      .persist()

    // frontier(k): one row per user who reached stage k, with the earliest
    // completion timestamp of stage k.
    val frontiers = stages.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, (stage, _)) =>
        val hits = relevant.filter(col("__t") === stage)
        val reached = prev match {
          case None => hits.groupBy("__u").agg(min(col("__ts")).as("__reached"))
          case Some(p) =>
            val joined = hits.join(p.withColumnRenamed("__reached", "__prev"), "__u")
              .filter(col("__ts") > col("__prev"))
            // time-bounded binding (q154): the stage must complete within
            // maxGap of the PREVIOUS stage's bind time — the session-style
            // funnel knob; unbounded (q135) when None
            val bounded = maxGapMinutes match {
              case Some(m) =>
                joined.filter(col("__ts") <= col("__prev") + expr(s"INTERVAL $m MINUTES"))
              case None => joined
            }
            bounded.groupBy("__u").agg(min(col("__ts")).as("__reached"))
        }
        Some(reached.persist())
    }.flatten

    val rows = frontiers.zip(stages.zipWithIndex).map { case (f, (name, i)) =>
      f.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).cast(IntegerType).as("stage"),
          lit(name).as("stage_name"), col("n_users"))
    }
    val out = rows.reduce(_ unionByName _).orderBy("stage")
    // materialization frees the caches afterwards is the caller's concern;
    // frontiers stay session-cached like SequencePack's prefix tables.
    out
  }

  /** Classic cohort-retention matrix over an order/activity log:
    * cohort = calendar month of a key's FIRST activity; a cohort member
    * counts as retained at offset m if it was active in cohort_month + m.
    *
    * Returns (cohort_month 'yyyy-MM', offset_m, n_active), offset 0 being
    * the cohort size by construction.
    *
    * Scale shape: first-activity is a keyed aggregation on the entity key;
    * the activity log joins that frontier on the SAME key (exchange
    * reuse, no broadcast assumption — cohort dim is entity-sized), and the
    * (cohort, offset) rollup is sketch-sized. Month arithmetic is integer
    * (year*12+month), immune to timezone/DST drift.
    */
  def cohortRetention(activity: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val monthNum = (c: org.apache.spark.sql.Column) =>
      year(c) * lit(12) + month(c)
    val first = activity.groupBy(col(keyCol))
      .agg(min(col(tsCol)).as("__first"))
      .select(col(keyCol), date_format(col("__first"), "yyyy-MM").as("cohort_month"),
        monthNum(col("__first")).as("__m0"))
    activity.select(col(keyCol), col(tsCol))
      .join(first, keyCol)
      .select(col("cohort_month"),
        (monthNum(col(tsCol)) - col("__m0")).cast(IntegerType).as("offset_m"),
        col(keyCol))
      .groupBy("cohort_month", "offset_m")
      .agg(countDistinct(col(keyCol)).as("n_active"))
      .orderBy("cohort_month", "offset_m")
  }

  /** LAST-TOUCH attribution: for every conversion event, the most recent
    * preceding touch event by the same user within `maxGapMinutes` —
    * the marketing-attribution primitive (q28's as-of join answers
    * "latest reference row"; attribution additionally needs the
    * lookback BOUND and the touch/conversion event split). Single-pass
    * shape: ONE shuffle on the user key, a carry-forward
    * `last(..., ignoreNulls)` over the (event-µs, tie)-ordered stream
    * in a deterministic ROWS frame, then the conversion filter — no
    * join at all, so the plan is one exchange + one window regardless
    * of how many touches precede each conversion.
    *
    * A touch at the SAME µs attributes only when its tiebreak orders
    * before the conversion (the row frame is deterministic, never
    * RANGE's all-peers). Output per conversion: (u, conv_id, touch_id,
    * gap_s) with touch_id/gap_s null when no touch is inside the
    * window.
    */
  def lastTouch(events: DataFrame, user: Column, ts: Column, etype: Column,
                tiebreak: Column, touchType: String, convType: String,
                maxGapMinutes: Long): DataFrame = {
    require(maxGapMinutes > 0, "maxGapMinutes must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("u").orderBy("tus", "tie")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val gapUs = maxGapMinutes * 60000000L
    events
      .select(user.as("u"), unix_micros(ts).as("tus"), etype.as("t"),
        tiebreak.as("tie"))
      .withColumn("touch_tus",
        last(when(col("t") === touchType, col("tus")), ignoreNulls = true).over(w))
      .withColumn("touch_tie",
        last(when(col("t") === touchType, col("tie")), ignoreNulls = true).over(w))
      .filter(col("t") === convType)
      .withColumn("ok",
        col("touch_tus").isNotNull && col("tus") - col("touch_tus") <= gapUs)
      .select(col("u"), col("tie").as("conv_id"),
        when(col("ok"), col("touch_tie")).as("touch_id"),
        when(col("ok"), expr("(tus - touch_tus) div 1000000")).as("gap_s"))
  }
}
