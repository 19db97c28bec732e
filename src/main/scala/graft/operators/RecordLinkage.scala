package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Record linkage / entity resolution between two systems' records of
  * the same entities: corruption-invariant blocking, character-bigram
  * set overlap scoring, and per-record argmax survivorship — the
  * classic three-stage ER shape (block → compare → resolve), with the
  * board's exactness conventions (integer overlap counts, deterministic
  * ties) so the whole linkage is oracle-verifiable.
  *
  * Scale shape: candidate pairs come ONLY from the (block, bigram)
  * join — records sharing no block or no bigram never pair, so the
  * comparison space is Σ per-(block,bigram) a·b, bounded by the
  * blocking key's selectivity, never |A|·|B|. The resolve step is one
  * (b_id)-keyed window over the candidate-pair frame.
  */
object RecordLinkage {

  /** Distinct character bigrams of a string column (empty below 2
    * chars — Spark's `sequence(1, 0)` counts DOWN, the bigrams()
    * lesson, so the guard is correctness, not style).
    */
  def charBigrams(s: Column): Column =
    when(length(s) >= 2,
      array_distinct(transform(sequence(lit(1), length(s) - 1),
        i => s.substr(i, lit(2)))))
      .otherwise(expr("cast(array() as array<string>)"))

  /** Link each `b` record to its best `a` record: inputs carry
    * (id, block, key) where `block` is a corruption-invariant blocking
    * key and `key` the comparison string. Score = |bigrams(a) ∩
    * bigrams(b)| (set semantics); each b_id resolves to the highest
    * score, ties to the smallest a_id; scores below `minOverlap` drop.
    */
  def link(a: DataFrame, b: DataFrame, minOverlap: Int): DataFrame = {
    def grams(df: DataFrame, idAs: String) = df
      .select(col("id").as(idAs), col("block"),
        explode(charBigrams(col("key"))).as("bigram"))
    val pairs = grams(a, "a_id")
      .join(grams(b, "b_id"), Seq("block", "bigram"))
      .groupBy("b_id", "a_id")
      .agg(count(lit(1)).cast(IntegerType).as("score"))
    val w = Window.partitionBy("b_id")
      .orderBy(col("score").desc, col("a_id").asc)
    pairs
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1 && col("score") >= minOverlap)
      .select(col("b_id"), col("a_id"), col("score"))
  }
}
