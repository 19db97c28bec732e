package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.ScalarOps

/** Row-level gates (SURVEY.md §2.3). Each is a plain `filter`, so Catalyst
  * pushes it into the parquet scan (visible as PushedFilters) — at 100 TB
  * these run inside the vectorized reader, not as a separate stage.
  */
object Gates {

  /** F1 — quality gate: keep only good-status values
    * (`Services/OpcSubscribeService.cs:563`). The bad-status branch becomes
    * the offline event stream (see CurrentValues.liveness).
    */
  def qualityGate(df: DataFrame): DataFrame = df.filter(col("status_ok"))

  /** F3 — the liveness pseudo-measure is never subscribable
    * (`Services/OpcSubscribeService.cs:216,558`).
    */
  def excludeOnlineMeasure(df: DataFrame): DataFrame =
    df.filter(col("measure_name") =!= CurrentValues.OnlineMeasure)

  /** F2 — staleness gate: |now − source_ts| ≤ timeout
    * (`Services/OpcSubscribeService.cs:558-559`; `<=` is inclusive).
    * Batch-pure form: "now" is the max source_ts in the data, joined in as
    * a 1-row broadcast (no driver collect, no full shuffle).
    */
  def stalenessGate(df: DataFrame, timeoutMicros: Long): DataFrame = {
    val now = df.agg(max(col("source_ts")).as("now_ts"))
    df.crossJoin(broadcast(now))
      .filter(ScalarOps.absDeltaMicros(col("now_ts"), col("source_ts")) <= lit(timeoutMicros))
      .drop("now_ts")
  }

  /** F5 — conjunctive equality + IN-list predicate shape
    * (`Services/OpcSubscribeService.cs:308-313`).
    */
  def onlineDevicePredicate(measure: Column, value: Column, devices: Seq[String]): Column = {
    val base = measure === CurrentValues.OnlineMeasure && value === 1.0
    if (devices.isEmpty) base else base && col("device").isin(devices: _*)
  }
}
