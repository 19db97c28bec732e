package graft

/** Plan-shape regression guard over EVERY SparkEntry query: builds each
  * physical plan at sf0.001 and rejects unexpected cartesian products /
  * nested-loop joins — the class of regression (a dropped join key, a
  * lost broadcast) that stays silently correct at test SF and detonates
  * at corpus scale. The allowlist names the queries whose nested-loop is
  * the DESIGN (brute-force baselines cross-joining a broadcast query/
  * centroid set); anything else fails the suite with its plan.
  */
class PlanGuardSpec extends SparkSpec {

  // crossJoin(broadcast(...)) against a deliberately tiny set IS the
  // documented shape for these: q40/q43 brute-force ANN baselines,
  // q44/q72/q77-style broadcast of a one-row/sketch aggregate, IVF
  // centroid scoring, TF-IDF's corpus-count scalar.
  private val NestedLoopByDesign = Set(
    "q40_ann_bruteforce", "q43_embedding_neardup", "q44_ann_ivf",
    "q61_tfidf", "q64_curation_pipeline", "q72_deciles_scalable",
    "q51_frame_sample",
    // mixture total T = min(count/share) is a ONE-ROW broadcast aggregate
    "q85_lang_mixture",
    // q92: IVF centroid scoring (the q44 shape) inside semantic dedup
    "q92_semantic_dedup",
    // q98: robots prefix rules are a deliberately tiny broadcast dim;
    // the prefix match is a non-equi anti-join by design
    "q98_robots_filter",
    // q101: the per-query PQ distance tables are a tiny broadcast set,
    // ≠-joined against the codes scan (the ADC shape)
    "q101_ann_pq",
    // q102: IVF centroid scoring + the same broadcast distance tables
    "q102_ann_ivfpq",
    // q94/q95: the SQ8 bounds row is a ONE-ROW broadcast aggregate, and
    // the quantized shortlist ≠-joins the broadcast 5-query code set —
    // both deliberately tiny build sides
    "q94_sq8_quantize", "q95_ann_sq8",
    // the reference pipeline's batch "now" (max source_ts) joins in as a
    // ONE-ROW broadcast aggregate — the scalar-subquery shape
    "q02_staleness", "q06_liveness", "q07_current_values",
    "q10_heartbeat", "q11_offline_reset", "q15_ts_age",
    // q105: the Misra-Gries summary and the stream total are each a
    // ONE-ROW broadcast aggregate joined back for the verdict
    "q105_heavy_hitters",
    // q108: the corpus token total is a ONE-ROW broadcast aggregate
    // (q61's n_docs shape) under the interpolated-likelihood arithmetic
    "q108_interpolated_lm",
    // q111: Lloyd assignment scores the corpus against the broadcast
    // k-row centroid set (the q44 IVF shape, k·dim model state)
    "q111_kmeans",
    // q113: the positive-class total is a ONE-ROW broadcast aggregate
    // joined onto the distinct-score PR dim (q108's shape)
    "q113_classifier_eval",
    // q117: scores the corpus against the broadcast k-row centroid set
    // (q111's assignment shape)
    "q117_cluster_quality",
    // q120: trained-IVF — corpus and queries both score the broadcast
    // k-row trained centroid set (q44 + q111 composed)
    "q120_ann_ivf_trained",
    // q150: the weighted-minhash probe set is all pairs of a 40-row
    // signature table — a deliberately tiny broadcast self-join (the
    // q43 brute-force shape)
    "q150_weighted_minhash",
    // q156: both input rankings are the q40 brute-force baseline shape
    // (corpus crossJoin broadcast 5-query set); the fusion itself is
    // rank-arithmetic on k-bounded lists
    "q156_rrf_fusion",
    // q160/q161: full- and prefix-dim brute-force rankings plus the
    // candidate grid — all the q40 corpus × broadcast-query-set shape
    "q160_matryoshka_recall", "q161_contrastive_negatives",
    // q187: bitext mining scores the target scan against the broadcast
    // bounded-dim source set (the q40 brute-force baseline shape)
    "q187_bitext_mining",
    // q188: the corpus (N, total-words) pair is a ONE-ROW broadcast
    // aggregate (q61's n_docs shape) under the BM25 arithmetic
    "q188_bm25_topk",
    // q189: the truth side is the q40 brute-force baseline by definition
    "q189_ranking_eval",
    // q191: fuses the q40 brute-force dense ranking with q188's BM25
    // (its one-row corpus aggregate) — both documented shapes
    "q191_hybrid_retrieval",
    // q196: the candidate pool is the q40 brute-force baseline shape
    "q196_mmr_select",
    // q200: the truth side is the q40 brute-force baseline (q189's shape)
    "q200_ndcg",
    // q207: the corpus token total is a ONE-ROW broadcast aggregate
    // (q61's n_docs shape)
    "q207_vocab_coverage",
    // q215: the batch "now" cutoff is the q02/q15 ONE-ROW broadcast
    // aggregate
    "q215_as_of_snapshot")

  test("no query plan contains an unexpected cartesian or nested-loop join") {
    val dir = "/root/testdata/sf0.001"
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val cartesian = plan.contains("CartesianProduct")
      val nestedLoop = plan.contains("BroadcastNestedLoopJoin")
      if (cartesian) Some(s"$name: CartesianProduct")
      else if (nestedLoop && !NestedLoopByDesign(name)) Some(s"$name: BroadcastNestedLoopJoin")
      else None
    }
    assert(offenders.isEmpty, s"scale-hostile join shapes:\n${offenders.mkString("\n")}")
  }
}
