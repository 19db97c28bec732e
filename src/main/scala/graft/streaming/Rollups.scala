package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming windowed rollups (SURVEY.md §2.8 notes the reference has no
  * window aggregates — liveness is a processing-time timeout — so these
  * are extension operators; their batch twins are q25/q26).
  *
  * Both are watermarked, so state is evicted once the window closes +
  * delay passes: the state footprint is O(open windows × keys), not
  * O(history) — the property that lets them run forever at 100 TB/day.
  */
object Rollups {

  /** Tumbling per-(device, measure) aggregate in append mode: a window row
    * emits exactly once, when the watermark passes its end.
    */
  def tumbling(df: DataFrame, windowLength: String = "1 minute",
               delay: String = "60 seconds"): DataFrame =
    df.withWatermark("source_ts", delay)
      .groupBy(window(col("source_ts"), windowLength),
        col("device"), col("measure_name"))
      .agg(count(lit(1)).as("n"),
        min(col("raw_value")).as("min_value"),
        max(col("raw_value")).as("max_value"),
        avg(col("raw_value")).as("avg_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("device"), col("measure_name"),
        col("n"), col("min_value"), col("max_value"), col("avg_value"))

  /** Session windows per device: a session closes after `gap` of
    * event-time silence (streaming-native twin of the batch
    * gaps-and-islands q25).
    */
  def sessions(df: DataFrame, gap: String = "30 minutes",
               delay: String = "60 seconds"): DataFrame =
    df.withWatermark("source_ts", delay)
      .groupBy(session_window(col("source_ts"), gap), col("device"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("device"), col("n_events"))
}
