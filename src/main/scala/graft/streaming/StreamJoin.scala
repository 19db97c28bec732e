package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked STREAM–STREAM interval join — the one stateful join shape
  * the rest of the streaming surface doesn't exercise (everything else
  * is stream-static or keyed-state): purchases pair with same-user views
  * within ±tolerance, both sides watermarked so Spark can expire join
  * state instead of buffering each stream forever. The batch twin is
  * [[graft.operators.RangeJoin.within]] (q56); the parity spec pins that
  * a replayed log produces exactly the batch pair set.
  *
  * Scale notes: state is bounded by (watermark + tolerance) per side —
  * the knob a 100 TB ingest tunes against its lateness SLA; the join
  * itself is user-keyed, so it shards like any keyed state. Append mode
  * (inner join) emits pairs as soon as both sides are present; the
  * count-per-purchase aggregation belongs downstream (its own watermark
  * chain), exactly like the batch q56 aggregates after `within`.
  */
object StreamJoin {

  /** Pairs of (purchase event_id, view ts) within ±`toleranceSec` for
    * the same user. Both inputs need (user_id, ts); purchases also
    * carry event_id. `delay` is the watermark lateness bound.
    */
  def purchasesWithViews(purchases: DataFrame, views: DataFrame,
                         toleranceSec: Long,
                         delay: String = "1 hour"): DataFrame = {
    val p = purchases
      .select(col("event_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", delay)
    val v = views
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
      .withWatermark("v_ts", delay)
    p.join(v,
      col("p_user") === col("v_user") &&
        col("v_ts") >= col("p_ts") - expr(s"INTERVAL $toleranceSec SECONDS") &&
        col("v_ts") <= col("p_ts") + expr(s"INTERVAL $toleranceSec SECONDS"))
      .select(col("event_id"), col("p_user").as("user_id"),
        col("p_ts"), col("v_ts"))
  }
}
