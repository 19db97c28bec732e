package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.functions.CountMinSketch

/** Streaming maintenance of the stored-sketch tables — the ingest-time
  * half of the 100 TB pattern the batch queries (q132 HLL, q133
  * histogram, q139 count-min, q146 bloom) only demonstrate read-side:
  * the raw stream is sketched ONCE as it arrives, micro-batch by
  * micro-batch, and every later probe touches only the tiny cell table.
  *
  * Exactly-once without a transactional sink: each micro-batch's cell
  * grid lands in its own `batch=<id>` partition via SaveMode.Overwrite —
  * epoch REPLAY after failure rewrites the same partition instead of
  * appending a duplicate (counter grids are linear, so a doubled
  * partition would silently double every estimate; idempotence is load-
  * bearing, not cosmetic, and the spec replays a batch to pin it).
  * Readers roll up across batch partitions exactly like rolling up
  * across days — the same [[CountMinSketch.rollup]] by linearity.
  */
object StreamingSketch {

  /** Maintain a count-min cell table at `path` from a streaming frame.
    * `df` must carry `keys` and an `item` column; cells are per
    * (keys, micro-batch). Returns the running query.
    */
  def maintainCms(df: DataFrame, keys: Seq[String], path: String,
                  width: Int = CountMinSketch.Width,
                  trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    df.writeStream
      .trigger(trigger)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeBatch(batch, keys, path, batchId, width)
      }
      .start()

  /** One micro-batch → one overwritten partition (exposed for specs and
    * for replay-repair jobs that re-sketch a batch from the source log).
    */
  def writeBatch(batch: DataFrame, keys: Seq[String], path: String,
                 batchId: Long, width: Int = CountMinSketch.Width): Unit =
    CountMinSketch
      .sketchCells(batch, keys, lit(batchId).as("cell"), col("item"), width = width)
      .write.mode(SaveMode.Overwrite)
      .parquet(s"$path/batch=$batchId")

  /** Read the maintained table rolled up to the key grain. */
  def readRolledUp(spark: org.apache.spark.sql.SparkSession, path: String,
                   keys: Seq[String]): DataFrame =
    CountMinSketch.rollup(spark.read.parquet(s"$path/batch=*"), keys)

  /** Bloom twin: membership words instead of counters. Same partition-
    * overwrite idempotence story — bloom words are even forgiving of a
    * duplicated batch (OR is idempotent), but the discipline stays
    * uniform so a future counter-valued sketch can't inherit an unsafe
    * append by example.
    */
  def maintainBloom(df: DataFrame, keys: Seq[String], path: String,
                    words: Int = graft.functions.BloomTable.Words,
                    trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    df.writeStream
      .trigger(trigger)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.functions.BloomTable.build(batch, keys, col("item"), words = words)
          .write.mode(SaveMode.Overwrite)
          .parquet(s"$path/batch=$batchId")
      }
      .start()

  def readBloom(spark: org.apache.spark.sql.SparkSession, path: String,
                keys: Seq[String]): DataFrame =
    graft.functions.BloomTable.merge(spark.read.parquet(s"$path/batch=*"), keys)

  /** HLL twin — completes the ingest-time triple (frequencies: CMS,
    * membership: Bloom, distinct counts: HLL). One DataSketches HLL
    * sketch per (keys, micro-batch) partition; readers union across
    * batch partitions exactly like q132's day rollup. Same
    * partition-overwrite idempotence story: HLL union is idempotent
    * for REPEATED ITEMS but a replayed epoch appended as a NEW
    * partition would still be wrong for any downstream that counts
    * cells — the overwrite discipline stays uniform across all three.
    */
  def maintainHll(df: DataFrame, keys: Seq[String], path: String,
                  trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    df.writeStream
      .trigger(trigger)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.functions.SketchRollup
          .sketchCells(batch, keys, lit(batchId), col("item"))
          .write.mode(SaveMode.Overwrite)
          .parquet(s"$path/batch=$batchId")
      }
      .start()

  /** Distinct-count estimates at the key grain from the maintained
    * table — one sketch union, never a raw-stream rescan.
    */
  def readHllRolledUp(spark: org.apache.spark.sql.SparkSession, path: String,
                      keys: Seq[String]): DataFrame =
    graft.functions.SketchRollup.rollup(spark.read.parquet(s"$path/batch=*"), keys)
}
