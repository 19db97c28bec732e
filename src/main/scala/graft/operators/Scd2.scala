package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD-2 style state-interval compaction (gaps-and-islands): collapse a
  * keyed observation log into validity intervals — one row per maximal
  * run of consecutive equal states, with `valid_from`/`valid_to` and the
  * open (current) interval carrying a NULL `valid_to`. The warehouse
  * "slowly changing dimension type 2" build step, applied to the event
  * log the way a training-data pipeline snapshots entity state over time.
  *
  * Deterministic by construction: observations order by (ts, tiebreak)
  * where the caller supplies a UNIQUE tiebreak (event_id), so same-ts
  * observations collapse identically in any engine — the whole output is
  * hash-exact cross-engine.
  *
  * Scale shape: every window is keyed by the entity — two analytic
  * passes over one (key)-partitioned sort (change flags + running island
  * id), one keyed aggregate, one interval-dim window for `valid_to`.
  * ONE corpus shuffle total (the repartition by key); the interval dim
  * the second window runs on is change-point-sized, not event-sized.
  */
object Scd2 {

  /** @param df       observation log
    * @param key      entity column (partition key)
    * @param state    observed state column
    * @param ts       observation time column
    * @param tiebreak unique per-row column ordering same-ts observations
    */
  def intervals(df: DataFrame, key: Column, state: Column, ts: Column,
                tiebreak: Column): DataFrame = {
    val obs = df.select(key.as("k"), state.as("state"), ts.as("ts"),
      tiebreak.as("tie"))
    val wObs = Window.partitionBy("k").orderBy("ts", "tie")
    val flagged = obs
      .withColumn("chg",
        when(lag(col("state"), 1).over(wObs).isNull
          || lag(col("state"), 1).over(wObs) =!= col("state"), 1L)
          .otherwise(0L))
      .withColumn("island", sum(col("chg")).over(wObs))
    val runs = flagged.groupBy("k", "island", "state")
      .agg(min(col("ts")).as("valid_from"), count(lit(1)).as("n_obs"))
    val wRun = Window.partitionBy("k").orderBy("island")
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wRun))
      .select(col("k"), col("state"), col("valid_from"), col("valid_to"),
        col("n_obs"))
  }
}
