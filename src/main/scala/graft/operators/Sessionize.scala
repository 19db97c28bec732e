package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Inactivity-gap sessionization (the q25 semantics, factored so the
  * streaming twin has a batch parity target): split each user's (ts,
  * tie)-ordered event sequence wherever the gap to the previous event
  * exceeds the threshold; `session_id` is 1-based per user.
  *
  * One user-keyed shuffle shared by the lag window, the cumulative-sum
  * window, and the session aggregation — Catalyst reuses the partitioning
  * across all three, so the row-grain frame crosses exactly one exchange.
  */
object Sessionize {

  /** (u, session_id, start_tus, end_tus, n_events) per session. */
  def sessions(df: DataFrame, user: Column, ts: Column, tiebreak: Column,
               gapSeconds: Long): DataFrame = {
    require(gapSeconds > 0, "gap must be positive")
    val gapUs = gapSeconds * 1000000L
    val w = Window.partitionBy("u").orderBy("tus", "tie")
    df.select(user.as("u"), unix_micros(ts).as("tus"), tiebreak.as("tie"))
      .withColumn("prev", lag(col("tus"), 1).over(w))
      .withColumn("is_new",
        when(col("prev").isNull || col("tus") - col("prev") > gapUs, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("is_new")).over(w))
      .groupBy("u", "session_id")
      .agg(min(col("tus")).as("start_tus"), max(col("tus")).as("end_tus"),
        count(lit(1)).as("n_events"))
  }
}
