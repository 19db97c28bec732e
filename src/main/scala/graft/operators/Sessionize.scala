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

  /** Top session paths: the most frequent 3-step event-type sequences
    * WITHIN a session (same gap rule as [[sessions]]) — the product-
    * analytics "what do users actually do" query. A trigram never
    * crosses a session boundary (the two leads are scoped to the
    * (user, session) window), so a returning user's new visit starts
    * fresh paths. One user-keyed window pass + one path aggregation +
    * a TakeOrdered top-k — no corpus-wide sort.
    *
    * Output: (path, n, rk ≤ topK), ties (n desc, path).
    */
  def pathTrigrams(df: DataFrame, user: Column, ts: Column, tiebreak: Column,
                   typeCol: Column, gapSeconds: Long, topK: Int): DataFrame = {
    require(gapSeconds > 0 && topK >= 1, "need positive gap and topK")
    val gapUs = gapSeconds * 1000000L
    val w = Window.partitionBy("u").orderBy("tus", "tie")
    val rows = df.select(user.as("u"), unix_micros(ts).as("tus"),
        tiebreak.as("tie"), typeCol.as("t"))
      .withColumn("prev", lag(col("tus"), 1).over(w))
      .withColumn("is_new",
        when(col("prev").isNull || col("tus") - col("prev") > gapUs, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("is_new")).over(w))
    val ws = Window.partitionBy("u", "session_id").orderBy("tus", "tie")
    val paths = rows
      .withColumn("t2", lead(col("t"), 1).over(ws))
      .withColumn("t3", lead(col("t"), 2).over(ws))
      .filter(col("t3").isNotNull)
      .select(concat_ws(">", col("t"), col("t2"), col("t3")).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
    val top = paths.orderBy(col("n").desc, col("path")).limit(topK)
    top.withColumn("rk", row_number().over( // bounded: ≤ topK rows by now
        Window.orderBy(col("n").desc, col("path")))
      .cast(org.apache.spark.sql.types.IntegerType))
  }
}
