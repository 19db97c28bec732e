package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Write-side layout for the 100 TB posture (SURVEY.md §4, §7.1):
  *
  *  - Measure HISTORY is append-only and time-range queried → parquet
  *    date-partitioned on `day = date(source_ts)`. Catalyst partition
  *    pruning turns "last hour over 100 TB" into a scan of one directory.
  *  - The CURRENT-VALUE table (modvalues) is key-accessed and MERGE-heavy
  *    → bucketed by `device` so the MERGE/join shuffle disappears: both
  *    sides are pre-partitioned by the same hash, and a join between two
  *    tables bucketed the same way plans with NO Exchange.
  *
  * Bucket/partition counts are per-deployment: bucket count ≈ cluster
  * cores × small factor; partition granularity day (hour at extreme
  * rates). These helpers encode the layout; counts are parameters.
  */
object Storage {

  /** Append measure events date-partitioned. Files within a partition are
    * sized by Spark's normal write path; at scale pair with
    * maxRecordsPerFile / AQE coalesce to avoid small files.
    */
  def writeMeasureHistory(events: DataFrame, path: String,
                          mode: SaveMode = SaveMode.Append): Unit =
    events.withColumn("day", to_date(col("source_ts")))
      .write.mode(mode)
      .partitionBy("day")
      .parquet(path)

  /** Read back with pruning-friendly schema (`day` is a partition column —
    * filters on it never touch non-matching directories).
    */
  def readMeasureHistory(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Compact ONE day partition of the history: rewrite it as
    * `targetFiles` files, rows sorted by (device, source_ts) within each
    * file. Streaming appends leave a long tail of small files (one per
    * micro-batch × partition) that dominates scan open-cost at 100 TB;
    * compaction merges them and the device sort makes the parquet
    * row-group min/max stats selective for per-device reads. The rewrite
    * goes to a sibling temp dir first and swaps in via rename, so a
    * failure mid-compact never corrupts the live partition.
    */
  def compactDay(spark: SparkSession, path: String, day: String,
                 targetFiles: Int = 1): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val dayDir = s"$path/day=$day"
    val tmpDir = s"$path/.day=$day.compacting"
    spark.read.parquet(dayDir)
      .repartition(targetFiles)
      .sortWithinPartitions("device", "source_ts")
      .write.mode(SaveMode.Overwrite).parquet(tmpDir)
    val live = Paths.get(dayDir)
    val stale = Paths.get(s"$path/.day=$day.old")
    Files.move(live, stale, StandardCopyOption.ATOMIC_MOVE)
    Files.move(Paths.get(tmpDir), live, StandardCopyOption.ATOMIC_MOVE)
    // best-effort cleanup of the replaced files
    Files.walk(stale).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.deleteIfExists(p))
  }

  /** Save a device-keyed table bucketed by device: co-located with every
    * other table written through this helper with the same bucket count,
    * so device-keyed joins/MERGEs between them are exchange-free.
    */
  def writeDeviceBucketed(df: DataFrame, tableName: String, path: String,
                          buckets: Int = 32): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(buckets, "device")
      .sortBy("device")
      .saveAsTable(tableName)
}
