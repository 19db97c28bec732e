package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.TextOps

/** Unigram-LM tokenization (the SentencePiece family, Kudo 2018 — the
  * other public tokenizer lineage beside BPE, `bpeLearn`/`bpeTrainState`).
  * The reference engine has no tokenizer; this is part of the
  * training-data-pipeline extension surface.
  *
  * Two layers, mirroring the repo's exact-twin-plus-measured-float
  * pattern (q71/q72, q40/q59):
  *
  *  - '''Integer-exact seed + Viterbi''' (oracled, q126/q127): the seed
  *    vocabulary is every substring up to [[MaxPiece]] chars scored by
  *    frequency-weighted occurrence count — pure integer aggregation —
  *    and segmentation is the dictionary objective ''fewest pieces,
  *    then highest count-sum, then longest piece at each DP cell''.
  *    Engine-exact (no floats), so DuckDB can replay it bit-for-bit.
  *  - '''EM refinement''' (spec-verified, UnigramLmSpec): expected piece
  *    counts via forward–backward over each word's segmentation lattice
  *    (distributed E-step), driver M-step over the vocab-sized state,
  *    then pruning to a target size. Floats, so correctness is pinned by
  *    monotone corpus likelihood + brute-force agreement, not an oracle.
  *
  * Scale posture: the corpus-sized work is ONE word-count aggregation
  * (the same Heaps-law argument as BPE training — the distinct-word dim
  * is small even for billion-word corpora). The Viterbi DP runs as a
  * single `aggregate` higher-order expression over the word dim with
  * the vocabulary as a broadcast literal map — no join, no shuffle, no
  * UDF. (Spark HOFs are CodegenFallback — the DP subtree evaluates
  * interpreted inside the codegen'd projection; fine here, because it
  * runs once per DISTINCT word, a vocab-dim-sized stage, never
  * corpus-sized.) EM keeps words distributed (mapPartitions E-step,
  * vocab broadcast) and only vocab-sized statistics cross to the driver.
  */
object UnigramLm {

  /** Longest candidate piece, in characters. */
  val MaxPiece = 6

  /** Words longer than this are excluded from segmentation (bounds the
    * oracle's unrolled DP; raise freely for a real corpus — the Spark
    * DP is length-generic).
    */
  val MaxWord = 16

  /** Multi-character pieces kept in the seed vocabulary (single chars
    * are always kept so every word has at least one segmentation).
    */
  val TopPieces = 200

  /** Distinct words with corpus frequency (len >= 2, the q93 dim). */
  def wordDim(docs: DataFrame): DataFrame =
    docs.select(explode(TextOps.words(col("text"))).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy("w").agg(count(lit(1)).as("freq"))

  /** Seed vocabulary: all substrings of length 1..[[MaxPiece]] of the
    * word dim, scored by SUM(word freq) over every occurrence; keeps all
    * single characters plus the [[TopPieces]] most frequent multi-char
    * pieces (count desc, piece asc). Integer throughout.
    */
  def seedVocab(docs: DataFrame): DataFrame = {
    val counts = wordDim(docs)
      .select(col("freq"), explode(expr(
        s"""flatten(transform(sequence(1, length(w)),
           |  i -> transform(sequence(1, least($MaxPiece, length(w) - i + 1)),
           |    l -> substring(w, i, l))))""".stripMargin)).as("piece"))
      .groupBy("piece").agg(sum("freq").as("cnt"))
    val singles = counts.filter(length(col("piece")) === 1)
    val multis = counts.filter(length(col("piece")) >= 2)
      .orderBy(col("cnt").desc, col("piece")).limit(TopPieces)
    singles.unionByName(multis).select("piece", "cnt")
  }

  /** Viterbi segmentation of the word dim under the integer-scored seed
    * vocabulary. Objective per word, lexicographic: minimize piece
    * count, then maximize count-sum, then prefer the longer piece at
    * each cell (a unique argmax — same-length same-position pieces are
    * identical strings). Output per word: `(w, freq, score, n_tokens,
    * toks)` with `toks` the space-joined segmentation.
    *
    * The whole DP — forward table and backtrack — is two `aggregate`
    * higher-order expressions in one projection: vocabulary lookups hit
    * a broadcast literal map (`try_element_at`, null on miss), so the
    * plan is a scan + one agg exchange (the word dim) + a map stage.
    * Nothing corpus-sized is collected; the vocab collect is bounded by
    * TopPieces + alphabet.
    */
  def viterbiSegment(docs: DataFrame): DataFrame = {
    val vocab: Map[String, Long] = seedVocab(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val vmap = typedLit(vocab)

    // dp(p) at array index p+1: best (score, ntoks, bl) for the prefix
    // of length p; bl = the winning piece length at p (0 at p=0).
    // Each candidate subtree appears ONCE (array + sort comparator over
    // lambda leaves) — a `when`-chain reduce would duplicate candidate
    // expressions multiplicatively and blow up codegen.
    val dpCell = { (acc: Column, i: Column) =>
      val cands = array((MaxPiece to 1 by -1).map { l =>
        val ll = lit(l)
        val piece = col("w").substr(i - ll + lit(1), ll)
        val s = try_element_at(vmap, piece)
        when(ll <= i && s.isNotNull, {
          val prev = element_at(acc, i - ll + lit(1))
          struct((prev("score") + s).as("score"),
            (prev("ntoks") + lit(1)).as("ntoks"), ll.as("bl"))
        })
      }: _*)
      // fewest tokens, then highest score, then the longer piece.
      val best = element_at(array_sort(
        filter(cands, x => x.isNotNull),
        (x, y) => when(x("ntoks") < y("ntoks"), -1).when(x("ntoks") > y("ntoks"), 1)
          .when(x("score") > y("score"), -1).when(x("score") < y("score"), 1)
          .when(x("bl") > y("bl"), -1).when(x("bl") < y("bl"), 1)
          .otherwise(0)), 1)
      concat(acc, array(best))
    }
    val dpInit = array(struct(lit(0L).as("score"), lit(0).as("ntoks"), lit(0).as("bl")))

    wordDim(docs)
      .filter(length(col("w")).between(2, MaxWord))
      .withColumn("dp", aggregate(sequence(lit(1), length(col("w"))), dpInit, dpCell))
      .withColumn("best", element_at(col("dp"), size(col("dp"))))
      // backtrack: walk pos -> pos - bl(pos), prepending pieces; at most
      // len(w) steps, idempotent once pos hits 0.
      .withColumn("toks", aggregate(
        sequence(lit(1), length(col("w"))),
        struct(length(col("w")).as("pos"), expr("array()").cast(ArrayType(StringType)).as("ts")),
        (st, _) => {
          val pos = st("pos")
          when(pos > lit(0), {
            val bl = element_at(col("dp"), pos + lit(1))("bl")
            struct((pos - bl).as("pos"),
              concat(array(col("w").substr(pos - bl + lit(1), bl)), st("ts")).as("ts"))
          }).otherwise(st)
        },
        st => st("ts")))
      .select(col("w"), col("freq"),
        col("best")("score").as("score"),
        col("best")("ntoks").as("n_tokens"),
        array_join(col("toks"), " ").as("toks"))
  }

  /** Trained-unigram corpus encoding (the `bpeApply`/q124 analog): per
    * document, whitespace word count and unigram-token count under the
    * [[viterbiSegment]] segmentation. Words outside the segmented dim
    * (sub-2-char, over-[[MaxWord]]) encode as one token. The corpus
    * pass is one explode + a word-keyed join against the Heaps-law-small
    * segmentation dim (AQE broadcasts it) + a doc-keyed agg — the
    * sequential DP never runs corpus-side.
    */
  def encodeCorpus(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(TextOps.words(col("text"))).as("w"))
      .join(viterbiSegment(docs).select(col("w"), col("n_tokens")), Seq("w"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(coalesce(col("n_tokens").cast(LongType), lit(1L))).as("n_unigram_tokens"))

  // ---------------------------------------------------------------- EM

  /** One word's segmentation lattice statistics under log-probs `lp`:
    * forward–backward expected counts per piece and the word's log
    * marginal probability. Pieces absent from `lp` are unusable; single
    * characters are expected present (the seed guarantees it).
    */
  private[operators] def latticeStats(
      w: String, lp: collection.Map[String, Double])
      : (collection.mutable.HashMap[String, Double], Double) = {
    val n = w.length
    val NegInf = Double.NegativeInfinity
    def logAdd(a: Double, b: Double): Double =
      if (a == NegInf) b else if (b == NegInf) a
      else if (a > b) a + math.log1p(math.exp(b - a))
      else b + math.log1p(math.exp(a - b))
    // alpha(i): log sum of path probs over segmentations of w[0,i)
    val alpha = Array.fill(n + 1)(NegInf); alpha(0) = 0.0
    for (i <- 1 to n; l <- 1 to math.min(i, MaxPiece)) {
      lp.get(w.substring(i - l, i)).foreach { s =>
        alpha(i) = logAdd(alpha(i), alpha(i - l) + s)
      }
    }
    val beta = Array.fill(n + 1)(NegInf); beta(n) = 0.0
    for (i <- n - 1 to 0 by -1; l <- 1 to math.min(n - i, MaxPiece)) {
      lp.get(w.substring(i, i + l)).foreach { s =>
        beta(i) = logAdd(beta(i), s + beta(i + l))
      }
    }
    val ll = alpha(n)
    val exp = collection.mutable.HashMap.empty[String, Double]
    if (ll != NegInf) {
      for (i <- 0 until n; l <- 1 to math.min(n - i, MaxPiece)) {
        val p = w.substring(i, i + l)
        lp.get(p).foreach { s =>
          val post = math.exp(alpha(i) + s + beta(i + l) - ll)
          if (post > 0.0) exp.update(p, exp.getOrElse(p, 0.0) + post)
        }
      }
    }
    (exp, ll)
  }

  /** EM refinement of the seed vocabulary (Kudo 2018 §3): E-step =
    * distributed forward–backward expected counts over the word dim
    * (freq-weighted, vocab broadcast); M-step = renormalize on the
    * driver (vocab-sized). After `iters` rounds, prunes to `targetSize`
    * by dropping the lowest-probability multi-char pieces (singles stay
    * — every word must remain segmentable). Returns the trained
    * log-probs and the per-iteration corpus log-likelihoods (which the
    * spec asserts are non-decreasing).
    */
  def emTrain(docs: DataFrame, iters: Int, targetSize: Int)
      : (Map[String, Double], Seq[Double]) = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = wordDim(docs)
      .filter(length(col("w")).between(2, MaxWord))
      .as[(String, Long)]
      .persist()
    try {
      val seed = seedVocab(docs).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val total = seed.values.sum.toDouble
      var lp: Map[String, Double] =
        seed.map { case (p, c) => p -> math.log(c / total) }
      val lls = Vector.newBuilder[Double]
      for (_ <- 1 to iters) {
        val bc = spark.sparkContext.broadcast(lp)
        val stats = words.mapPartitions { it =>
          val m = bc.value
          val acc = collection.mutable.HashMap.empty[String, Double]
          var ll = 0.0
          it.foreach { case (w, freq) =>
            val (exp, wll) = latticeStats(w, m)
            ll += freq * wll
            exp.foreach { case (p, c) =>
              acc.update(p, acc.getOrElse(p, 0.0) + freq * c)
            }
          }
          Iterator.single((acc.toMap, ll))
        }.collect()
        bc.destroy()
        val counts = collection.mutable.HashMap.empty[String, Double]
        var ll = 0.0
        stats.foreach { case (m, l) =>
          ll += l
          m.foreach { case (p, c) => counts.update(p, counts.getOrElse(p, 0.0) + c) }
        }
        lls += ll
        val z = counts.values.sum
        lp = counts.map { case (p, c) => p -> math.log(c / z) }.toMap
      }
      // prune: keep all singles + the highest-prob multis up to target
      val (singles, multis) = lp.partition(_._1.length == 1)
      val kept = singles ++ multis.toSeq
        .sortBy { case (p, s) => (-s, p) }
        .take(math.max(0, targetSize - singles.size))
      val z = kept.values.map(math.exp).sum
      (kept.map { case (p, s) => p -> (s - math.log(z)) }.toMap, lls.result())
    } finally words.unpersist()
  }

  /** Trained model as a (piece, log_prob) frame for
    * `Storage.writeModel` (the QualityClassifier/KMeans persistence
    * contract: deterministic row order, exact DOUBLE round-trip).
    */
  def toFrame(spark: org.apache.spark.sql.SparkSession,
      lp: Map[String, Double]): DataFrame = {
    import spark.implicits._
    lp.toSeq.sortBy(_._1).toDF("piece", "log_prob")
  }

  /** Inverse of [[toFrame]]. */
  def fromFrame(params: DataFrame): Map[String, Double] =
    params.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  /** Viterbi segmentation under trained float log-probs (max log-prob
    * path, longest-piece tie-break) — the EM twin of [[viterbiSegment]],
    * driver/executor Scala because its scores are floats (spec-verified,
    * not oracled). Exposed for UnigramLmSpec's brute-force comparison.
    */
  def segmentWithProbs(w: String, lp: collection.Map[String, Double]): Seq[String] = {
    val n = w.length
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val bl = Array.fill(n + 1)(0)
    best(0) = 0.0
    for (i <- 1 to n; l <- MaxPiece.min(i) to 1 by -1) {
      lp.get(w.substring(i - l, i)).foreach { s =>
        if (best(i - l) + s > best(i)) { best(i) = best(i - l) + s; bl(i) = l }
      }
    }
    if (best(n) == Double.NegativeInfinity) Seq(w)
    else {
      var segs = List.empty[String]
      var pos = n
      while (pos > 0) { segs = w.substring(pos - bl(pos), pos) :: segs; pos -= bl(pos) }
      segs
    }
  }
}
