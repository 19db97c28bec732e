package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL (one JSON object per line) ingest — the lingua franca of LLM
  * corpus distribution (crawl dumps, instruction sets, eval suites all
  * ship as .jsonl). The reference has no semi-structured path; this is
  * the schema-enforced entry every text pipeline starts at.
  *
  * The read contract is PERMISSIVE-with-accounting: a malformed line
  * must neither kill the job (FAILFAST at corpus scale = one bad line
  * in 100 TB aborts everything) nor vanish silently (DROPMALFORMED
  * loses data with no audit trail) — it lands as a row whose typed
  * fields are null and whose raw bytes sit in the corrupt-record
  * column, so downstream can COUNT and quarantine it.
  */
object Jsonl {

  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType),
    StructField("text", StringType),
    StructField("_corrupt_record", StringType)))

  /** Corpus → per-partition JSONL shards in `dir` with deterministic
    * CORRUPT lines injected (every doc_id ≡ 0 mod `corruptEvery` also
    * emits a truncated object — the classic mid-write crash artifact).
    */
  def write(docs: DataFrame, dir: String, corruptEvery: Int = 50): Unit = {
    val good = docs.select(to_json(struct(
      col("doc_id"), col("lang"), col("source"), col("n_chars"), col("text")))
      .as("line"))
    val corrupt = docs.filter(col("doc_id") % corruptEvery === 0)
      .select(concat(lit("{\"doc_id\": "), col("doc_id").cast("string"),
        lit(", \"lang\": \"")).as("line"))
    good.unionByName(corrupt).write.mode("overwrite").text(dir)
  }

  /** Read a JSONL directory under the permissive-with-accounting
    * contract; corrupt rows carry the raw line, typed fields null.
    */
  def read(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir)

  /** Write→read round trip summarized per language: good rows group
    * under their lang with their exact char mass; corrupt lines group
    * under NULL lang and are counted, never dropped. The emitted rows
    * come from the RE-PARSED files, so the query proves the full
    * serialize→shard→parse path.
    */
  def roundTrip(docs: DataFrame, corruptEvery: Int = 50): DataFrame = {
    // ONE deterministic directory per (input plan, corruptEvery), not a
    // fresh createTempDirectory per call: the returned frame lazily
    // re-reads the files, so the dir cannot be deleted here — and a bench
    // run (warm + timed passes + retries) was leaving ~200 MB of orphaned
    // JSONL per pass at sf10, ~2 GB per pass at the sf100 audit, on the
    // same disk whose headroom the containment heavies spill into. The
    // plan-keyed name makes repeat calls overwrite ONE dir (bounded churn)
    // while distinct corpora still get distinct dirs.
    val key = docs.queryExecution.analyzed.canonicalized.hashCode()
    val dir = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"),
      f"graft-jsonl-$corruptEvery-$key%08x").toString
    write(docs, dir, corruptEvery)
    read(docs.sparkSession, dir)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("_corrupt_record").isNotNull, 1L).otherwise(0L))
          .as("n_corrupt"),
        coalesce(sum("n_chars"), lit(0L)).as("sum_chars"))
  }
}
