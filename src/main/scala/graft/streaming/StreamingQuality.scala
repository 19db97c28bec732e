package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Continuous data-quality monitoring — [[graft.operators.DataQuality]]'s
  * row-level rules evaluated per event-time window over the ingest
  * stream: each tumbling window emits total rows plus one violation
  * count per rule (range breaches, nulls, unaccepted values — any
  * row-local predicate).
  *
  * ONE definition serves both engines-of-record: applied to a streaming
  * frame it is a watermarked windowed aggregation (Append emits each
  * window once its close passes the watermark); applied to a batch
  * frame the same code is a plain windowed groupBy — so batch backfill
  * and ingest-time monitoring CANNOT drift, the parity-by-construction
  * contract the twins verify by spec elsewhere
  * (StreamingQualitySpec pins stream ≡ batch row-for-row anyway, since
  * "same code" still leaves watermark/trigger semantics to get wrong).
  *
  * Row-local predicates only: referential/uniqueness checks need
  * cross-row state and stay batch-side (DataQuality.report) by design —
  * a streaming FK probe would be a stream-stream join with unbounded
  * state.
  */
object StreamingQuality {

  def monitor(df: DataFrame, tsCol: String, windowLength: String,
      delay: String, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    val aggs = count(lit(1)).as("n") +:
      rules.map { case (nm, p) => sum(when(p, 1L).otherwise(0L)).as(nm) }
    df.withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), windowLength))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("window.start").as("w_start") +: col("n") +:
        rules.map { case (nm, _) => col(nm) }: _*)
  }
}
