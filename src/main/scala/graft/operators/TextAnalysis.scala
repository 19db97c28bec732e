package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.TextOps

/** Text analysis for training-data curation: token counting, quality
  * scoring, language-ID heuristics, document fingerprinting. All pure
  * Column algebra (codegen'd, map-side only — embarrassingly parallel at
  * any scale; zero shuffles).
  */
object TextAnalysis {

  val Stopwords = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Whitespace + BPE-ish token counts per document. The "BPE-ish" regex
    * splits letter runs, digit runs, and single punctuation marks — a
    * deterministic stand-in for a real tokenizer's pre-tokenization.
    */
  def tokenStats(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(split(trim(col("text")), "\\s+")).cast(LongType).as("n_ws_tokens"),
      regexp_count(col("text"), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")).cast(LongType).as("n_bpe_tokens"))

  /** Quality features + a composite score. All ratios are single double
    * divisions of exact integers (engine-reproducible).
    */
  def qualityScore(docs: DataFrame): DataFrame = {
    val ws = TextOps.words(col("text"))
    val stopArr = array(Stopwords.map(lit): _*)
    docs
      .withColumn("n_chars_m", length(col("text")).cast(LongType))
      .withColumn("n_words", size(ws).cast(LongType))
      .withColumn("n_punct",
        length(regexp_replace(col("text"), "[A-Za-z0-9\\s]", "")).cast(LongType))
      .withColumn("n_stop", size(filter(ws, w => array_contains(stopArr, w))).cast(LongType))
      .withColumn("sum_word_len",
        aggregate(transform(ws, w => length(w).cast(LongType)), lit(0L), (acc, x) => acc + x))
      .withColumn("punct_ratio", col("n_punct").cast(DoubleType) / col("n_chars_m"))
      .withColumn("stop_ratio", col("n_stop").cast(DoubleType) / col("n_words"))
      .withColumn("avg_word_len", col("sum_word_len").cast(DoubleType) / col("n_words"))
      .withColumn("quality_score",
        col("stop_ratio") * 0.4 +
          when(col("n_words").between(50, 200), 1.0).otherwise(0.0) * 0.3 +
          (lit(1.0) - col("punct_ratio")) * 0.3)
      .select("doc_id", "n_chars_m", "n_words", "n_punct", "n_stop",
        "punct_ratio", "stop_ratio", "avg_word_len", "quality_score")
  }

  /** Heuristic language ID: CJK codepoints ⇒ zh; else English stopword
    * density ⇒ en / unknown. (The fixture corpus is synthetic English-like
    * text with random `lang` labels, so accuracy is meaningless — the
    * operator shape and determinism are what is exercised.)
    */
  def langId(docs: DataFrame): DataFrame = {
    val ws = TextOps.words(col("text"))
    val markers = array(Seq("the", "and", "a", "of").map(lit): _*)
    docs
      .withColumn("n_words", size(ws).cast(LongType))
      .withColumn("n_en", size(filter(ws, w => array_contains(markers, w))).cast(LongType))
      .withColumn("en_score", col("n_en").cast(DoubleType) / col("n_words"))
      .withColumn("predicted_lang",
        when(col("text").rlike("[\\x{4e00}-\\x{9fff}]"), "zh")
          .when(col("en_score") >= 0.03, "en")
          .otherwise("unknown"))
      .withColumn("label_match", (col("predicted_lang") === col("lang")).cast(IntegerType))
      .select("doc_id", "lang", "predicted_lang", "en_score", "label_match")
  }

  /** Rolling polynomial fingerprint over normalized words:
    * h := (h*31 + md5_32(w) mod p) mod p, p = 1e9+7. Order-sensitive (true
    * rolling hash), left fold — reproduced exactly by the oracle's
    * list_reduce.
    */
  def fingerprint(docs: DataFrame): DataFrame = {
    val p = 1000000007L
    docs
      .withColumn("ws", TextOps.words(col("text")))
      .withColumn("hs", transform(col("ws"), w => TextOps.hash32(w) % p))
      .withColumn("rolling_hash",
        aggregate(col("hs"), lit(0L), (acc, x) => (acc * 31L + x) % p))
      .select("doc_id", "rolling_hash")
  }
}
