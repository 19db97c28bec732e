package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sequence packing for LLM training: lay the corpus out in doc_id order
  * and chunk the token stream into fixed-size training sequences —
  * `seq_id = floor((running_tokens − 1) / maxTokens)`, i.e. deterministic
  * sequential packing where a document belongs to the sequence its last
  * token lands in.
  *
  * The global running token count is the textbook single-partition-window
  * trap (`SUM OVER (ORDER BY doc_id)` serializes the corpus through one
  * task). This is the TWO-PHASE PREFIX SUM instead:
  *   1. per-bucket token totals (bucket = doc_id div bucketSize) — one
  *      keyed partial aggregation;
  *   2. an exclusive prefix over the bucket totals — a window over the
  *      TINY bucket dim (corpus/bucketSize rows), not the corpus;
  *   3. broadcast the offsets back and cumsum WITHIN each bucket — the
  *      per-bucket window partitions by bucket, so the corpus-sized sort
  *      is sharded across executors.
  * Identical arithmetic to the naive global window (integer sums), so the
  * output is exact, bucketSize-invariant, and oracle-verifiable against
  * the single-window formulation.
  *
  * Sizing contract: the bucket dim is corpus/bucketSize rows and passes
  * through one window task, so choose bucketSize ≈ corpus/10⁵–10⁶ at
  * scale (10¹¹ docs → bucketSize 10⁶, offset dim 10⁵ rows). The
  * offsets join carries no broadcast hint — AQE broadcasts the dim while
  * it fits and falls back to a keyed shuffle join when it doesn't (a
  * forced hint would OOM instead of falling back). For a corpus where
  * even corpus/bucketSize won't window on one task, apply the same
  * two-phase trick recursively over super-buckets.
  */
object SequencePack {

  def pack(docs: DataFrame, maxTokens: Long, bucketSize: Long = 1000L): DataFrame = {
    // (doc_id, n_tokens, bucket) — three longs/row — persisted so the
    // regex tokenization scans the document text ONCE, not once per
    // consuming branch (offsets aggregation + final join). Session-scoped
    // and evictable like ivfIndex; the entry cannot be unpersisted before
    // the returned (lazy) DataFrame is consumed, so callers batching many
    // corpora through one session reclaim via spark.catalog.clearCache
    // between batches.
    val toks = docs.select(col("doc_id"),
      size(split(trim(col("text")), "\\s+")).cast(LongType).as("n_tokens"),
      expr(s"doc_id div $bucketSize").as("bucket"))
      .persist()
    val wBuckets = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = toks.groupBy("bucket").agg(sum("n_tokens").as("bucket_total"))
      .withColumn("offset", coalesce(sum("bucket_total").over(wBuckets), lit(0L)))
      .select("bucket", "offset")
    val wInBucket = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    toks.join(offsets, Seq("bucket"))
      .withColumn("running_tokens", sum("n_tokens").over(wInBucket) + col("offset"))
      .withColumn("seq_id", expr(s"(running_tokens - 1) div $maxTokens"))
      .select("doc_id", "n_tokens", "running_tokens", "seq_id")
  }
}
