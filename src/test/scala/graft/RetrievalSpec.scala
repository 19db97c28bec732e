package graft

import graft.operators.Retrieval

/** BM25 retrieval on a hand-computed corpus: the integer-scaled score
  * formula, idf's rare-term preference, length normalization, self
  * exclusion, and the top-k/tiebreak contract.
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  // 4 docs; doc 0 is the query ("more-like-this" over its word set).
  //   N = 4, SDL = 3 + 3 + 3 + 3 = 12 words.
  private def corpus = Seq(
    (0L, "apple banana cherry"),
    (1L, "apple apple durian"),   // tf(apple)=2, shares 1 query term
    (2L, "banana cherry durian"), // shares 2 query terms
    (3L, "durian elder fig")      // shares 0 query terms
  ).toDF("doc_id", "text")

  // Hand arithmetic (dl = 3 for every doc, so norm is uniform):
  //   t1 = (750*3*4) div 12 = 750; norm = 1000.
  //   df: apple=2, banana=2, cherry=2 (durian never scores for q0).
  //   idf1000(df=2) = ((8-4+1)*1000) div 5 = 1000.
  //   score(tf=1) = (1000*2200000*1) div (1000000 + 1200000) = 1000.
  //   score(tf=2) = (1000*2200000*2) div (2000000 + 1200000) = 1375.
  test("BM25: hand-computed scores, self exclusion, rank order") {
    val out = Retrieval.bm25TopK(corpus, queryMaxId = 1L, k = 10)
      .orderBy("rk")
      .select("q_id", "n_id", "score1000", "n_terms", "rk")
      .as[(Long, Long, Long, Long, Int)].collect().toSeq
    // doc2 shares banana+cherry (1000+1000=2000); doc1 shares apple at
    // tf=2 (1375); doc3 shares nothing and must be absent; doc0 is self.
    assert(out === Seq((0L, 2L, 2000L, 2L, 1), (0L, 1L, 1375L, 1L, 2)))
  }

  test("BM25: rarer terms score higher at equal tf and dl") {
    // "rare" appears in 1 doc, "common" in 3; both tf=1, dl equal.
    val docs = Seq(
      (0L, "rare common pad1"),
      (1L, "rare pad2 pad3"),
      (2L, "common pad4 pad5"),
      (3L, "common pad6 pad7")
    ).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, queryMaxId = 1L, k = 10)
      .select("n_id", "score1000").as[(Long, Long)].collect().toMap
    assert(out(1L) > out(2L), s"rare-term doc must outrank common-term doc: $out")
    assert(out(2L) === out(3L))
  }

  test("BM25: longer documents are penalized at equal tf") {
    val docs = Seq(
      (0L, "apple query"),
      (1L, "apple short"),
      (2L, "apple padded with many extra words here")
    ).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, queryMaxId = 1L, k = 10)
      .select("n_id", "score1000").as[(Long, Long)].collect().toMap
    assert(out(1L) > out(2L), s"short doc must outrank long doc: $out")
  }

  test("rankingEval: hits, true-top1 rank, reciprocal rank, total miss") {
    // Truth for q0: [10, 11, 12]; approx found 11 (rk1), 10 (rk3) — the
    // true top-1 sits at approx rank 3 → rr1000 = 333.
    // Truth for q1: [20, 21]; approx found neither → rank_true1 = 0.
    val truth = Seq((0L, 10L, 1), (0L, 11L, 2), (0L, 12L, 3),
      (1L, 20L, 1), (1L, 21L, 2)).toDF("q_id", "n_id", "rk")
    val approx = Seq((0L, 11L, 1), (0L, 99L, 2), (0L, 10L, 3),
      (1L, 98L, 1)).toDF("q_id", "n_id", "rk")
    val out = Retrieval.rankingEval(truth, approx)
      .select("q_id", "n_truth", "hits_at_k", "rank_true1", "rr1000")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getInt(3), r.getLong(4)))).toMap
    assert(out(0L) === ((3L, 2L, 3, 333L)))
    assert(out(1L) === ((2L, 0L, 0, 0L)))
  }

  test("mmrSelect: a redundant near-copy of pick 1 is deferred behind a diverse item") {
    // Candidates for q0: n=1 is the most relevant; n=2 is an exact COPY
    // of n=1 (sim 1.0) with slightly lower relevance; n=3 is orthogonal
    // with much lower relevance. Plain top-2 = {1, 2}; MMR's round-2
    // score for the copy is 0.7·0.9 − 0.3·1.0 = 0.33, for the diverse
    // item 0.7·0.5 − 0.3·0 = 0.35 → MMR picks {1, 3}.
    val e1 = Seq(1.0f, 0.0f)
    val e3 = Seq(0.0f, 1.0f)
    val cand = Seq(
      (0L, 1L, 1.0, e1), (0L, 2L, 0.9, e1), (0L, 3L, 0.5, e3)
    ).toDF("q_id", "n_id", "rel", "embedding")
    val picks = Retrieval.mmrSelect(cand, k = 3)
      .orderBy("pick").select("n_id", "pick")
      .as[(Long, Int)].collect().toSeq
    assert(picks === Seq((1L, 1), (3L, 2), (2L, 3)))
  }

  test("ndcgEval: perfect ranking scores exactly 1e6; swaps and misses lower it") {
    val truth = Seq((0L, 10L, 1), (0L, 11L, 2), (0L, 12L, 3)).toDF("q_id", "n_id", "rk")
    val perfect = Retrieval.ndcgEval(truth, truth, k = 3)
      .select("ndcg1e6").as[Long].collect().head
    assert(perfect === 1000000L)
    // swapping positions 1 and 2 keeps the same items → dcg < idcg
    val swapped = Seq((0L, 11L, 1), (0L, 10L, 2), (0L, 12L, 3)).toDF("q_id", "n_id", "rk")
    val sw = Retrieval.ndcgEval(truth, swapped, k = 3)
      .select("ndcg1e6").as[Long].collect().head
    // missing the top item entirely is worse than swapping it down
    val missed = Seq((0L, 99L, 1), (0L, 11L, 2), (0L, 12L, 3)).toDF("q_id", "n_id", "rk")
    val ms = Retrieval.ndcgEval(truth, missed, k = 3)
      .select("ndcg1e6").as[Long].collect().head
    assert(ms < sw && sw < 1000000L, s"expected $ms < $sw < 1e6")
  }

  test("mmrSelect: ranks per query independently and respects k") {
    val e = (i: Int) => Seq.tabulate(4)(j => if (j == i) 1.0f else 0.0f)
    val cand = (for (q <- 0L to 1L; n <- 0 to 3)
      yield (q, n.toLong + 10, 1.0 - 0.1 * n, e(n)))
      .toDF("q_id", "n_id", "rel", "embedding")
    val picks = Retrieval.mmrSelect(cand, k = 2)
      .select("q_id", "n_id", "pick").as[(Long, Long, Int)].collect()
    assert(picks.length === 4)
    assert(picks.groupBy(_._1).values.forall(_.map(_._3).sorted.toSeq == Seq(1, 2)))
  }
}
