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
    *
    * `maxBlockWidth` is the standard linkage guard at scale (the one the
    * round-8 scaling audit names for q178): a (block, bigram) key matched
    * by more than the cap records ON EITHER SIDE fans out a·b candidate
    * pairs, and such a key is by definition a non-discriminating blocker
    * (corpus-common name fragments). Oversized keys are SKIPPED — a pair
    * is lost only if every key it shares is oversized, and a surviving
    * pair's score only counts its surviving shared keys. Default None
    * keeps the linkage exhaustive (q178's pinned hashes);
    * RecordLinkageSpec quantifies the trade on a hot-block fixture.
    */
  def link(a: DataFrame, b: DataFrame, minOverlap: Int,
           maxBlockWidth: Option[Int] = None): DataFrame = {
    require(maxBlockWidth.forall(_ > 0), "maxBlockWidth must be positive when set")
    def grams(df: DataFrame, idAs: String) = df
      .select(col("id").as(idAs), col("block"),
        explode(charBigrams(col("key"))).as("bigram"))
    def capped(g: DataFrame): DataFrame = maxBlockWidth match {
      case None => g
      case Some(cap) =>
        // width computed per side over the SAME (block, bigram) exchange
        // the join shuffles on — one extra window, no new partitioning
        val w = Window.partitionBy("block", "bigram")
        g.withColumn("__bw", count(lit(1)).over(w))
          .filter(col("__bw") <= cap).drop("__bw")
    }
    val pairs = capped(grams(a, "a_id"))
      .join(capped(grams(b, "b_id")), Seq("block", "bigram"))
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
