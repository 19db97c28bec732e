package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.ScalarOps

/** The reference's core semantics (SURVEY.md §1.3): a current-value table
  * keyed (device, measure_name) with last-writer-wins updates, a derived
  * per-device liveness flag, seeding, heartbeat and offline-reset — all as
  * deterministic batch DataFrame ops. The streaming formulation (same
  * semantics, `flatMapGroupsWithState`) lives in graft.streaming.
  *
  * Scale notes: every op here shuffles at most once, on the natural key
  * (device, measure_name) or (device). At 100 TB the input would be
  * date-partitioned; the window/argmax runs after partial aggregation and
  * AQE sizes the shuffle. Nothing collects to the driver.
  */
object CurrentValues {

  val OnlineMeasure = "myPV_online" // Services/OpcSubscribeService.cs:45-58

  /** A3 — last-value-per-key: one row per (device, measure_name), the
    * latest by (source_ts, event_id). This is the batch formulation of the
    * reference's per-notification UPDATE (`Services/OpcSubscribeService.cs:624-641`).
    * row_number (not max+join) — single shuffle, no second pass.
    */
  def lastValuePerKey(measures: DataFrame): DataFrame = {
    val w = Window.partitionBy("device", "measure_name")
      .orderBy(col("source_ts").desc, col("event_id").desc)
    measures.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }

  /** Point-in-time reconstruction of the current-values table — "what
    * did modvalues say N hours ago": [[lastValuePerKey]] over only the
    * observations at or before the cutoff (data-max "now" minus
    * `lookbackMicros`, the q02 batch-pure now convention). The
    * incident-review/backfill-audit query a current-values store alone
    * cannot answer — this is why the history is day-partitioned
    * ([[graft.sources.Storage.writeMeasureHistory]]): at 100 TB the
    * cutoff prunes entire day partitions before the scan.
    */
  def asOfSnapshot(measures: DataFrame, lookbackMicros: Long): DataFrame = {
    val now = measures.agg(max(unix_micros(col("source_ts"))).as("__now_us"))
    lastValuePerKey(
      measures.crossJoin(broadcast(now))
        .filter(unix_micros(col("source_ts")) <= col("__now_us") - lookbackMicros)
        .drop("__now_us"))
  }

  /** T2 (batch) — device liveness: online=1 iff the device produced a
    * good-status value within `windowMicros` of the global max timestamp
    * (the batch-pure analogue of "updated in the last 60 s",
    * `Services/OpcSubscribeService.cs:45-58,578-585`).
    * Returns (device, online, last_good_ts?).
    */
  def liveness(measures: DataFrame, windowMicros: Long): DataFrame = {
    val now = measures.agg(max(col("source_ts")).as("now_ts"))
    val lastGood = measures.filter(col("status_ok"))
      .groupBy("device").agg(max(col("source_ts")).as("last_good_ts"))
    measures.select("device").distinct()
      .join(lastGood, Seq("device"), "left_outer")
      .crossJoin(broadcast(now))
      .withColumn("online",
        when(col("last_good_ts").isNotNull &&
          ScalarOps.absDeltaMicros(col("now_ts"), col("last_good_ts")) <= lit(windowMicros), 1.0)
          .otherwise(0.0))
  }

  /** K1 — seed-if-missing (`Services/OpcSubscribeService.cs:656-713`):
    * one zero row per (device, measure) plus one myPV_online row per
    * device, `logging='instant'`. Idempotent by construction (distinct);
    * against an existing sink this becomes a left-anti join + append.
    */
  def seedRows(measures: DataFrame): DataFrame = {
    val points = measures.select("device", "measure_name").distinct()
    val online = measures.select("device").distinct()
      .withColumn("measure_name", lit(OnlineMeasure))
    points.unionByName(online)
      .withColumn("tag_value", lit(0.0))
      .withColumn("measure_value", lit(0.0))
      .withColumn("logging", lit("instant"))
  }

  /** K1 against an existing sink: only the missing keys (left-anti). */
  def seedMissing(measures: DataFrame, existing: DataFrame): DataFrame =
    seedRows(measures).join(existing.select("device", "measure_name"),
      Seq("device", "measure_name"), "left_anti")

  /** The flagship assembly (SURVEY.md §7.3): gates → scaling → last-value
    * → liveness, shaped like the reference's `modvalues` table
    * (DDL `Services/OpcSubscribeService.cs:140-152`). Deterministic: "now"
    * is derived from the data, timestamps rendered as C4 strings.
    */
  def currentValues(measures: DataFrame, slope: Double, offset: Double,
                    livenessWindowMicros: Long): DataFrame = {
    val gated = Gates.qualityGate(Gates.excludeOnlineMeasure(measures))
    val latest = lastValuePerKey(gated)
      .withColumn("tag_value", bround(col("raw_value"), 3))
      .withColumn("measure_value", ScalarOps.scaleSlopeIntercept(col("raw_value"), slope, offset))
      .withColumn("last_updated", ScalarOps.lastUpdatedString(col("source_ts")))
      .select(col("device"), col("measure_name"), col("tag_value"),
        col("measure_value"), col("last_updated"))

    val now = measures.agg(max(col("source_ts")).as("now_ts"))
    val online = liveness(measures, livenessWindowMicros)
      .crossJoin(broadcast(now.select(ScalarOps.lastUpdatedString(col("now_ts")).as("last_updated"))))
      .select(col("device"), lit(OnlineMeasure).as("measure_name"),
        col("online").as("tag_value"), col("online").as("measure_value"),
        col("last_updated"))

    latest.unionByName(online)
      .withColumn("device_type", lit("sensor"))
      .withColumn("tag_name", col("measure_name"))
      .withColumn("source_unit", lit("raw"))
      .withColumn("destination_unit", lit("scaled"))
      .withColumn("logging", lit("instant"))
      .select("device", "device_type", "tag_name", "tag_value", "measure_name",
        "measure_value", "source_unit", "destination_unit", "last_updated", "logging")
  }

  /** K4 — heartbeat (`Services/OpcSubscribeService.cs:332-378`): bump
    * `last_updated` to now for every row of every online device. The
    * online set is small → broadcast join, no full shuffle; `now` arrives
    * as a 1-row broadcast DataFrame with column `now_s` (derived from data
    * in batch, from the trigger clock in streaming) — never collected.
    */
  def heartbeat(current: DataFrame, onlineDevices: DataFrame, now: DataFrame): DataFrame = {
    current
      .join(broadcast(onlineDevices.select(col("device"), lit(true).as("is_online"))),
        Seq("device"), "left_outer")
      .crossJoin(broadcast(now))
      .withColumn("last_updated",
        when(col("is_online"), col("now_s")).otherwise(col("last_updated")))
      .drop("is_online", "now_s")
  }

  /** K3 — startup offline reset (`Services/OpcSubscribeService.cs:717-739`):
    * zero every myPV_online row, stamp now (1-row broadcast, col `now_s`).
    */
  def offlineReset(current: DataFrame, now: DataFrame): DataFrame = {
    val isOnline = col("measure_name") === OnlineMeasure
    current.crossJoin(broadcast(now))
      .withColumn("tag_value", when(isOnline, 0.0).otherwise(col("tag_value")))
      .withColumn("measure_value", when(isOnline, 0.0).otherwise(col("measure_value")))
      .withColumn("last_updated", when(isOnline, col("now_s")).otherwise(col("last_updated")))
      .drop("now_s")
  }
}
