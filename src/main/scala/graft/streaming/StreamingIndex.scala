package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.functions.TextOps

/** Streaming maintenance of the BM25 inverted index — the retrieval
  * member of the ingest-time state family ([[StreamingSketch]]'s CMS /
  * Bloom / HLL tables): documents are TOKENIZED ONCE as they arrive,
  * each micro-batch's partial postings land in their own overwritten
  * `batch=<id>` partition (the replay-idempotence discipline — a
  * re-delivered epoch rewrites its partition instead of double-counting
  * term frequencies), and the probe side reassembles the GLOBAL index
  * cheaply:
  *
  *  - tf and dl are batch-local facts (a document lives in exactly one
  *    batch), so the stored rows are already correct globally;
  *  - df is the one corpus-global statistic — recomputed at read time
  *    as a term-keyed window over the POSTING-dim table (never the raw
  *    corpus);
  *  - corpus stats (n_docs, Σdl) are per-batch one-row facts summed at
  *    read (counter linearity, the sketch-table argument).
  *
  * The probe then runs [[graft.operators.Retrieval.bm25TopKFromIndex]]
  * unchanged — spec-pinned to equal the direct batch BM25 exactly.
  */
object StreamingIndex {

  /** Maintain partial postings + per-batch stats at `path` from a
    * streaming (doc_id, text) frame.
    */
  def maintainPostings(df: DataFrame, path: String,
                       trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    df.writeStream
      .trigger(trigger)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeBatch(batch, path, batchId)
      }
      .start()

  /** One micro-batch → one overwritten postings partition + one stats
    * row (exposed for specs and replay-repair jobs).
    */
  def writeBatch(batch: DataFrame, path: String, batchId: Long): Unit = {
    val wDoc = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
    batch
      .select(col("doc_id"), explode(TextOps.words(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .withColumn("dl", sum("tf").over(wDoc))
      .write.mode(SaveMode.Overwrite).parquet(s"$path/postings/batch=$batchId")
    batch
      .agg(count(lit(1)).as("n_docs"),
        sum(size(TextOps.words(col("text")))).as("sdl"))
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/stats/batch=$batchId")
  }

  /** The global posting frame: stored batch-local rows + the one
    * read-time term-keyed df window (posting-dim work, no corpus
    * re-scan). Shape-compatible with
    * [[graft.operators.Retrieval.bm25TopKFromIndex]].
    */
  def readPostings(spark: org.apache.spark.sql.SparkSession,
                   path: String): DataFrame = {
    val wTerm = org.apache.spark.sql.expressions.Window.partitionBy("term")
    spark.read.parquet(s"$path/postings/batch=*")
      .select("doc_id", "term", "tf", "dl")
      .withColumn("df", count(lit(1)).over(wTerm))
  }

  /** Global corpus stats by summing the per-batch one-row facts. */
  def readStats(spark: org.apache.spark.sql.SparkSession,
                path: String): DataFrame =
    spark.read.parquet(s"$path/stats/batch=*")
      .agg(sum("n_docs").as("n_docs"), sum("sdl").as("sdl"))
}
