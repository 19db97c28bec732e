package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities for hot keys (SURVEY.md §7.1 "salting for
  * skew"). AQE's skew-join splitting handles JOIN skew at runtime; a
  * skewed AGGREGATION on a hot key still funnels that key's every row
  * into one reduce task. Salting splits each key into `buckets`
  * sub-keys for a partial aggregate, then combines — two small shuffles
  * instead of one unbounded task.
  *
  * Only algebraic aggregates decompose this way (sum/count/min/max and
  * anything built from them, e.g. avg = sum/count). Spark's partial
  * aggregation already does map-side combine per PARTITION; salting
  * additionally bounds the per-task REDUCE volume when one key dominates
  * many partitions' output.
  */
object SkewTools {

  /** Deterministic salt in [0, buckets) — hash of the whole row's key
    * columns plus a spread column (e.g. a timestamp or id) so one hot key
    * spreads evenly.
    */
  def salt(spread: Column, buckets: Int): Column =
    pmod(hash(spread), lit(buckets))

  /** groupBy(keys).agg(sum(value)) with two-phase salting; identical
    * result to the direct aggregation for any `buckets`.
    */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
                spread: Column, buckets: Int = 16): DataFrame = {
    val keyCols = keys.map(col)
    df.withColumn("__salt", salt(spread, buckets))
      .groupBy(keyCols :+ col("__salt"): _*)
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(keyCols: _*)
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))
  }

  /** Same shape for counts. */
  def saltedCount(df: DataFrame, keys: Seq[String], spread: Column,
                  buckets: Int = 16): DataFrame = {
    val keyCols = keys.map(col)
    df.withColumn("__salt", salt(spread, buckets))
      .groupBy(keyCols :+ col("__salt"): _*)
      .agg(count(lit(1)).as("__partial"))
      .groupBy(keyCols: _*)
      .agg(sum(col("__partial")).as("n"))
  }
}
