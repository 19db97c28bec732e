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
    * row-group min/max stats selective for per-device reads.
    *
    * The rewrite lands in a sibling temp dir, then swaps in with two
    * renames through the Hadoop FileSystem API (works on local, HDFS and
    * object stores alike — never java.nio, which only exists on the
    * driver's local disk). The swap itself is two renames, not one atomic
    * operation: a crash between them leaves the partition moved aside,
    * which the NEXT compactDay call detects and restores before doing
    * anything else — so a crashed compaction is self-healing, but readers
    * racing the swap can observe a brief empty window. Run compaction in
    * a maintenance window, or use a table format (Delta/Iceberg) where
    * the swap is a metadata commit, when readers can't be paused.
    */
  def compactDay(spark: SparkSession, path: String, day: String,
                 targetFiles: Int = 1): Unit = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(path).getFileSystem(spark.sessionState.newHadoopConf())
    val live = new Path(s"$path/day=$day")
    val tmp = new Path(s"$path/.day=$day.compacting")
    val old = new Path(s"$path/.day=$day.old")
    // recover from a previous crash: live moved aside, replacement never
    // landed → put the original back; a leftover .old beside a live dir
    // is a completed swap whose cleanup failed → just remove it
    if (!fs.exists(live) && fs.exists(old)) fs.rename(old, live)
    else if (fs.exists(old)) fs.delete(old, true)
    if (fs.exists(tmp)) fs.delete(tmp, true)

    spark.read.parquet(live.toString)
      .repartition(targetFiles)
      .sortWithinPartitions("device", "source_ts")
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    if (!fs.rename(live, old))
      throw new java.io.IOException(s"compactDay: cannot move $live aside")
    if (!fs.rename(tmp, live)) {
      fs.rename(old, live) // restore before failing
      throw new java.io.IOException(s"compactDay: cannot land $tmp")
    }
    fs.delete(old, true) // best-effort; next call cleans a leftover
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

  /** Training-data shard export — the pipeline's last mile: the curated
    * corpus lands as `nShards` deterministic shards (shard =
    * md5-hash(doc_id) mod n, the q53 idiom — never random(), so a re-run
    * reproduces byte-identical shards and a resumed export can skip
    * completed ones), each shard's rows in a reproducible (hash, doc_id)
    * order so downstream training reads a stable sequence without a
    * global sort — ordering is within-shard only, the corpus never
    * serializes through one task.
    *
    * Layout: parquet `partitionBy(shard)`; one write task per shard
    * (repartition on the shard value), so each shard directory is one
    * file unless the shard itself outgrows the writer's
    * maxRecordsPerFile. Readers address shards by directory
    * (`shard=K/`), the layout elastic trainers expect.
    */
  def exportTrainingShards(docs: DataFrame, path: String, nShards: Int): Unit = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    docs
      .withColumn("shard_hash",
        graft.functions.ScalarOps.md5Hash32(col("doc_id").cast("string")))
      .withColumn("shard", pmod(col("shard_hash"), lit(nShards.toLong)))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions("shard", "shard_hash", "doc_id")
      .write.mode(SaveMode.Overwrite)
      .partitionBy("shard")
      .parquet(path)
  }

  /** The IVF index as a TABLE: embeddings joined with their cell
    * assignment ([[graft.operators.Similarity.ivfCells]]), bucketed by
    * cell — the documented 100 TB layout where the per-query probe
    * (`cand JOIN corpus ON cell`) reads only the probed cells' buckets
    * and, between tables written with the same bucket count, joins with
    * no exchange on the corpus side. Build once at ingest; every ANN
    * probe amortizes it.
    */
  def writeIvfBucketed(embeddings: DataFrame, cells: DataFrame,
                       tableName: String, path: String,
                       buckets: Int = 32): Unit = {
    val joined = embeddings.join(cells, Seq("vec_id"))
    // an index build that silently DROPS vectors (assignment missing for
    // some ids — e.g. a degenerate centroid pick) would make every later
    // probe quietly return partial results; fail the build loudly instead
    val (nIn, nOut) = (embeddings.count(), joined.count())
    require(nOut == nIn,
      s"IVF index build lost ${nIn - nOut} of $nIn vectors (cell assignment incomplete)")
    joined.write.mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(buckets, "cell")
      .sortBy("cell")
      .saveAsTable(tableName)
  }

  /** Rendezvous (highest-random-weight) shard assignment — the
    * MINIMAL-MOVEMENT sharding scheme: each key goes to the shard whose
    * keyed hash scores highest, so growing n → n+1 moves ONLY the keys
    * the new shard wins (≈ 1/(n+1) of them) while `hash mod n` moves
    * nearly everything — the difference between a cheap corpus
    * rebalance and rewriting 100 TB. Pure per-row scalar (n md5 scores,
    * one GREATEST, shard recovered from the low bits — the same
    * expression any engine evaluates identically); no state, no
    * coordination.
    */
  def rendezvousShard(key: org.apache.spark.sql.Column, nShards: Int)
      : org.apache.spark.sql.Column = {
    require(nShards >= 1 && nShards <= 16, "rendezvousShard supports 1..16 shards")
    import org.apache.spark.sql.functions.{concat, greatest, lit}
    val scores = (0 until nShards).map(s =>
      graft.functions.ScalarOps.md5Hash32(
        concat(key.cast("string"), lit(s":$s"))) * 16 + s)
    (if (scores.size == 1) scores.head else greatest(scores: _*)) % 16
  }

  /** DuckDB twin of [[rendezvousShard]] (same scores, same GREATEST,
    * same low-bit decode).
    */
  def rendezvousShardSql(keyExpr: String, nShards: Int): String = {
    require(nShards >= 1 && nShards <= 16)
    val scores = (0 until nShards).map(s =>
      s"(${graft.functions.TextOps.hash32Sql(s"$keyExpr || ':$s'")} * 16 + $s)")
    if (scores.size == 1) s"${scores.head} % 16"
    else scores.mkString("GREATEST(", ", ", ") % 16")
  }

  /** The BM25 inverted index as a TABLE: posting lists
    * ([[graft.operators.Retrieval.indexPostings]] — term, doc_id, tf,
    * dl, df) bucketed by `term`, plus the one-row corpus stats beside
    * them — the lexical-retrieval 100 TB layout mirroring
    * [[writeIvfBucketed]] for the dense side. Build once at ingest;
    * every probe reads the tiny stats row and term-pruned postings
    * instead of re-tokenizing the corpus. Like the IVF build, an index
    * that silently dropped postings would make every later query
    * quietly partial — the build recounts and fails loudly instead.
    */
  def writeInvertedIndex(docs: DataFrame, tableName: String, path: String,
                         buckets: Int = 32): Unit = {
    val postings = graft.operators.Retrieval.indexPostings(docs)
    val built = postings.persist()
    val nPostings = built.count()
    built.write.mode(SaveMode.Overwrite)
      .option("path", s"$path/postings")
      .bucketBy(buckets, "term")
      .sortBy("term")
      .saveAsTable(tableName)
    val stored = docs.sparkSession.table(tableName).count()
    require(stored == nPostings,
      s"inverted-index build lost ${nPostings - stored} of $nPostings postings")
    built.unpersist()
    graft.operators.Retrieval.corpusStats(docs)
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$path/stats")
  }

  /** Probe-side readers for [[writeInvertedIndex]]. */
  def readInvertedIndex(spark: SparkSession, tableName: String): DataFrame =
    spark.table(tableName)

  def readIndexStats(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/stats")

  /** A graph adjacency `(src, dst, outdeg)` as a TABLE bucketed by
    * `src` — the iterative-analytics layout
    * ([[graft.operators.GraphOps.pageRankInt]]): every round's
    * contribution join reads the bucketed scan's hash distribution
    * directly, so the edge-sized side of the per-round join never
    * re-shuffles AND never needs to fit in executor memory — the
    * cache-based path degrades to lineage recompute under pressure,
    * the bucketed table just re-scans parquet. Build once per graph;
    * every iteration (and every later algorithm keyed on src with the
    * same bucket count) amortizes it.
    */
  def writeSrcBucketed(adj: DataFrame, tableName: String, path: String,
                       buckets: Int = 32): Unit =
    adj.write.mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(buckets, "src")
      .sortBy("src")
      .saveAsTable(tableName)

  /** Persist a trained model's parameter frame (k-means centroids,
    * classifier (token, weight) rows, …) as single-file parquet with a
    * deterministic row order: training runs on a cluster, but the model
    * artifact must be a stable, diffable, re-loadable file — two
    * identical training runs produce byte-identical parameter sets, and
    * a scorer in another session gets bit-identical doubles back
    * (parquet is exact for DOUBLE/BIGINT — no text round-trip loss).
    * Models are bounded driver-scale state (the KMeans/QualityClassifier
    * contract), so coalesce(1) is by design, not a scale hazard.
    */
  def writeModel(params: DataFrame, path: String, orderCols: String*): Unit = {
    val ordered =
      if (orderCols.nonEmpty) params.orderBy(orderCols.map(col): _*)
      else params
    ordered.coalesce(1).write.mode(SaveMode.Overwrite).parquet(path)
  }

  def readModel(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
