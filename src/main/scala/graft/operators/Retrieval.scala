package graft.operators

import org.apache.spark.sql.{DataFrame, expressions}
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Lexical (inverted-index) retrieval over the document corpus — the
  * sparse half of the hybrid-retrieval story whose dense half is
  * [[Similarity]] (brute force / LSH / IVF / PQ) and whose fusion is
  * [[Similarity.rrfFuse]]. The reference pipeline has no retrieval
  * surface; this is the standard training-data consumer (mining,
  * decontamination-by-retrieval, more-like-this expansion).
  *
  * BM25 here is the INTEGER-SCALED ratio-idf variant: scores are exact
  * BIGINTs built from one truncating division per term (the q156 RRF
  * convention), so per-(query, doc) score SUMS are order-independent
  * and the ranking hash-matches any engine — the float form's
  * summation-order sensitivity would not. The idf uses the Robertson
  * ratio `(N − df + 0.5)/(df + 0.5)` directly (×1000, exact integer
  * arithmetic on doubled counts) rather than its log — the same
  * monotone-surrogate trick [[TextAnalysis.tfidfTopK]] documents.
  * The surrogate is monotone PER TERM only: BM25 scores are sums over
  * query terms, and a sum of per-term monotone transforms is not a
  * monotone transform of the sum, so multi-term rankings are a
  * spec-pinned variant of log-idf BM25, not equivalent to it
  * (single-term rankings are identical). The trade is deliberate: an
  * exact cross-engine `ln` is not a portable contract, and the exact
  * integer form keeps per-(query, doc) sums order-independent.
  */
object Retrieval {

  // BM25 constants, pre-scaled into the expressions below: k1 = 1.2,
  // b = 0.75, scores ×1000. All arithmetic is exact Long provided
  // `idf1000 · 2 200 000 · tf < 2^63`, i.e. `N · tf ≲ 6·10^9` in the
  // df=1 worst case (idf1000 ≈ 667·N). Fine through billion-doc
  // corpora with bounded tf; past that, shard the corpus per index
  // partition (each partition scores against its own N — the standard
  // distributed-IR layout) rather than widening the scale.

  /** The posting-list frame — the INDEX: (term, doc_id, tf, dl, df).
    * One (doc, term) aggregation; dl and df are windows over that SAME
    * frame (one doc-keyed + one term-keyed exchange — no corpus
    * re-scan, the q61 rewrite). Built once at ingest and persisted
    * term-bucketed via [[graft.sources.Storage.writeInvertedIndex]],
    * it amortizes tokenize + tf + df + dl across every future query.
    */
  def indexPostings(docs: DataFrame): DataFrame = {
    val tf = docs
      .select(col("doc_id"), explode(TextOps.words(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val wDoc = expressions.Window.partitionBy("doc_id")
    val wTerm = expressions.Window.partitionBy("term")
    tf.withColumn("dl", sum("tf").over(wDoc))
      .withColumn("df", count(lit(1)).over(wTerm))
  }

  /** One-row corpus stats the scorer needs beside the postings:
    * (n_docs, sdl = total corpus words).
    */
  def corpusStats(docs: DataFrame): DataFrame =
    docs.agg(
      count(lit(1)).as("n_docs"),
      sum(size(TextOps.words(col("text")))).as("sdl"))

  /** BM25 scoring against a prebuilt index — `postings` as
    * [[indexPostings]] (possibly read back from the stored table),
    * `stats` as [[corpusStats]], `queryTerms` a bounded (q_id, term)
    * dim. Each candidate doc scores
    * `Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))` over
    * shared terms; top `k` per query survive (score desc, doc_id).
    *
    * Integer forms (`div` truncates toward zero in both engines):
    * {{{
    * idf1000 = ((2N − 2·df + 1) · 1000) div (2·df + 1)
    * norm    = 250 + (750 · dl · N) div SDL    // 1000·(1−b+b·dl/avgdl)
    * score   = (idf1000 · 2 200 000 · tf) div (tf·1 000 000 + 1200·norm)
    * }}}
    *
    * The probe is one broadcast term join + one (q, doc) aggregation +
    * the per-query top-k window; the index never re-shuffles.
    */
  def bm25TopKFromIndex(postings: DataFrame, stats: DataFrame,
                        queryTerms: DataFrame, k: Int): DataFrame = {
    val scored = postings
      .join(broadcast(queryTerms), Seq("term"))
      .filter(col("doc_id") =!= col("q_id"))
      .crossJoin(broadcast(stats))
      .withColumn("idf1000",
        expr("((2 * n_docs - 2 * df + 1) * 1000) div (2 * df + 1)"))
      .withColumn("norm", expr("250 + (750 * dl * n_docs) div sdl"))
      .withColumn("s",
        expr("(idf1000 * 2200000 * tf) div (tf * 1000000 + 1200 * norm)"))
      .groupBy("q_id", "doc_id")
      .agg(sum("s").as("score1000"), count(lit(1)).as("n_terms"))
    val w = expressions.Window.partitionBy("q_id")
      .orderBy(col("score1000").desc, col("doc_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("q_id"), col("doc_id").as("n_id"),
        col("score1000"), col("n_terms"), col("rk"))
  }

  def bm25TopK(docs: DataFrame, queryMaxId: Long, k: Int): DataFrame = {
    // Query term sets: distinct words of the bounded query docs — built
    // straight off the (pruned) doc scan, not the windowed stats frame,
    // so the broadcast side doesn't replay the corpus windows.
    val qTerms = docs.filter(col("doc_id") < queryMaxId)
      .select(col("doc_id").as("q_id"),
        explode(TextOps.words(col("text"))).as("term"))
      .distinct()
    bm25TopKFromIndex(indexPostings(docs), corpusStats(docs), qTerms, k)
  }

  /** Ranking-quality evaluation of an approximate retrieval run against
    * exhaustive ground truth — the offline gate every ANN/lexical recall
    * lever ([[Similarity.lshTopK]], IVF, PQ, [[bm25TopK]]) is tuned by.
    * Both inputs carry (q_id, n_id, rk) and are already top-k-bounded
    * per query, so the whole evaluation is k²-per-query work regardless
    * of corpus size: one keyed join of two k-bounded lists + one
    * per-query aggregation. Per query:
    *
    *  - `n_truth`     truth-list size (≤ k),
    *  - `hits_at_k`   |truth ∩ approx| — recall@k numerator,
    *  - `rank_true1`  the approx rank of the TRUE nearest neighbor
    *                  (0 when the approx run missed it entirely),
    *  - `rr1000`     `1000 div rank_true1` — integer-scaled reciprocal
    *                  rank (truncating div, the q156 convention), whose
    *                  mean over queries is MRR×1000.
    *
    * All outputs are exact integers — no float metric arithmetic to
    * drift cross-engine.
    */
  def rankingEval(truth: DataFrame, approx: DataFrame): DataFrame = {
    val t = truth.select(col("q_id"), col("n_id"), col("rk").as("t_rk"))
    val a = approx.select(col("q_id"), col("n_id"), col("rk").as("a_rk"))
    t.join(a, Seq("q_id", "n_id"), "left")
      .groupBy("q_id")
      .agg(
        count(lit(1)).as("n_truth"),
        sum(when(col("a_rk").isNotNull, 1L).otherwise(0L)).as("hits_at_k"),
        max(when(col("t_rk") === 1, coalesce(col("a_rk"), lit(0))))
          .as("rank_true1"))
      .withColumn("rr1000",
        when(col("rank_true1") > 0, expr("1000 div rank_true1"))
          .otherwise(lit(0L)))
  }

  /** nDCG position-discount weights, ×2^20: `w(r) = round(2^20 /
    * log2(r+1))`. Computed ONCE here and interpolated as LITERALS into
    * both engines (the SpectralTrig convention) — cross-engine
    * agreement never depends on two log implementations rounding
    * alike.
    */
  def dcgWeights(k: Int): IndexedSeq[Long] =
    (1 to k).map(r => math.round((1L << 20).toDouble / (math.log(r + 1.0) / math.log(2.0))))

  /** nDCG@k of an approximate ranking against exhaustive truth — the
    * graded companion of [[rankingEval]]'s binary hits: truth position
    * r contributes gain k+1−r, approx position r discounts by the
    * [[dcgWeights]] table, `ndcg1e6 = dcg·10⁶ div idcg`. All integers
    * end to end — gains, weights, both DCG sums, the final ratio — so
    * the metric is engine- and partition-invariant. k-bounded inputs →
    * constant work per query at any corpus size.
    *
    * Output: (q_id, dcg, idcg, ndcg1e6).
    */
  def ndcgEval(truth: DataFrame, approx: DataFrame, k: Int): DataFrame = {
    val spark = truth.sparkSession
    import spark.implicits._
    val w = dcgWeights(k).zipWithIndex
      .map { case (wt, i) => (i + 1, wt) }.toDF("rk", "wt")
    val t = truth.filter(col("rk") <= k)
      .select(col("q_id"), col("n_id"), col("rk"),
        (lit(k + 1) - col("rk")).cast("long").as("gain"))
    val a = approx.filter(col("rk") <= k).select("q_id", "n_id", "rk")
    val dcg = a
      .join(t.select(col("q_id"), col("n_id"), col("gain")), Seq("q_id", "n_id"), "left")
      .join(broadcast(w), Seq("rk"))
      .groupBy("q_id")
      .agg(sum(coalesce(col("gain"), lit(0L)) * col("wt")).as("dcg"))
    val idcg = t.join(broadcast(w), Seq("rk"))
      .groupBy("q_id").agg(sum(col("gain") * col("wt")).as("idcg"))
    dcg.join(idcg, Seq("q_id"))
      .withColumn("ndcg1e6", expr("(dcg * 1000000) div idcg"))
  }

  /** Maximal-marginal-relevance selection (Carbonell & Goldstein 1998):
    * greedily re-rank each query's candidate pool so the final k trade
    * relevance against redundancy — `score = λ·rel(d) − (1−λ)·max_{s∈S}
    * sim(d, s)` — the standard answer to "my top-k are five copies of
    * the same page" after any dedup-light retrieval run.
    *
    * The greedy loop is inherently sequential in k but strictly LOCAL
    * to one query's pool, so it runs inside ONE `mapGroups` pass over
    * q_id — a single exchange of the pool-bounded candidate frame,
    * O(k·pool²) arithmetic per group, no cluster-wide rounds. (The
    * first cut ran k unrolled DataFrame rounds: correct, but ~10 s of
    * pure stage-scheduling overhead at sf0.1 for frames of a hundred
    * rows — job orchestration is the wrong tool for per-group loops.)
    *
    * Cosines replicate [[graft.functions.NativeVectorOps]]'s exact
    * left-to-right fold (`s += a_i·b_i`, then dot/(√·√)) in plain
    * Scala, and the MMR arithmetic is the same literal-double
    * expression every engine evaluates, so picks AND scores
    * hash-match the unrolled-SQL oracle bit for bit.
    *
    * `candidates`: (q_id, n_id, rel, embedding) — the pool with each
    * candidate's embedding attached (pool-bounded per query).
    * Output: (q_id, n_id, pick 1..k, score).
    */
  def mmrSelect(candidates: DataFrame, k: Int, relWeight: Double = 0.7,
                divWeight: Double = 0.3): DataFrame = {
    require(k >= 1, "mmrSelect needs k >= 1")
    val spark = candidates.sparkSession
    import spark.implicits._
    // divWeight is a SEPARATE literal, never computed as 1 − relWeight:
    // 1.0 − 0.7 is 0.30000000000000004 in IEEE doubles — one ulp off
    // the 0.3 both engines parse — and the scores stop hash-matching.
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    candidates
      .select(col("q_id").cast("long"), col("n_id").cast("long"),
        col("rel").cast("double"), col("embedding").cast("array<double>"))
      .as[(Long, Long, Double, Seq[Double])]
      .groupByKey(_._1)
      .flatMapGroups { (qId, it) =>
        // zero-norm embeddings are excluded from the pool: their cosine
        // is NaN, and one selected NaN row would poison every later
        // max-sim (Scala's `> bestScore` argmax then degenerates to
        // lowest-index while DuckDB sorts NaN greatest — engines
        // diverge). Matches the q208 audit assumption (n_zero_norm = 0
        // on a clean table); on clean pools this filter is a no-op.
        val pool = it.map { case (_, n, rel, e) => (n, rel, e.toArray) }
          .filter(p => dot(p._3, p._3) > 0.0)
          .toArray.sortBy(_._1)
        val n = pool.length
        val norm = pool.map(p => math.sqrt(dot(p._3, p._3)))
        def sim(i: Int, j: Int): Double =
          dot(pool(i)._3, pool(j)._3) / (norm(i) * norm(j))
        val taken = new Array[Boolean](n)
        val out = Vector.newBuilder[(Long, Long, Int, Double)]
        var pick = 1
        var sel = List.empty[Int]
        while (pick <= k && pick <= n) {
          var best = -1
          var bestScore = 0.0
          var i = 0
          while (i < n) {
            if (!taken(i)) {
              var maxsim = 0.0
              var first = true
              sel.foreach { s =>
                val v = sim(i, s)
                if (first || v > maxsim) { maxsim = v; first = false }
              }
              val score =
                if (sel.isEmpty) relWeight * pool(i)._2
                else relWeight * pool(i)._2 - divWeight * maxsim
              // argmax (score desc, n_id asc); pool is n_id-sorted so
              // the first strict improvement wins ties correctly
              if (best < 0 || score > bestScore) { best = i; bestScore = score }
            }
            i += 1
          }
          taken(best) = true
          sel = best :: sel
          out += ((qId, pool(best)._1, pick, bestScore))
          pick += 1
        }
        out.result().iterator
      }
      .toDF("q_id", "n_id", "pick", "score")
  }
}
