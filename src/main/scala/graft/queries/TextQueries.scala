package graft.queries

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.functions.TextOps
import graft.operators.{Dedup, H264, Multimodal, TextAnalysis, UnigramLm}

/** Text-analysis + multimodal-plumbing queries over `documents`. */
object TextQueries {

  private val W = TextOps.wordsSql

  /** Merge rounds for the q123/q124 distributed-BPE pair. */
  private val BpeRounds = 8

  /** DuckDB replay of `rounds` distributed-BPE training rounds (see
    * q123): defines `best_r` (the round-r merge) and `seg_r` (the
    * segmentation after it) for r = 1..rounds, over the q93 word dim.
    * Greedy left-to-right non-overlapping match selection = islands of
    * consecutive match positions (overlap is only possible for equal
    * pairs), keep the odd ranks within each island. Every per-round CTE
    * the next round re-reads is MATERIALIZED — inlining doubles the plan
    * per round.
    */
  private def bpeReplaySeg(rounds: Int): String = {
    val rb = (1 to rounds).map { r =>
      val p = r - 1
      s"""px_$r AS MATERIALIZED (SELECT w, freq, toks, unnest(range(1, len(toks))) AS i FROM seg_$p),
        |pc_$r AS (SELECT toks[i] AS lhs, toks[i+1] AS rhs, CAST(SUM(freq) AS BIGINT) AS cnt
        |          FROM px_$r GROUP BY 1, 2),
        |best_$r AS MATERIALIZED (SELECT lhs, rhs, cnt FROM pc_$r ORDER BY cnt DESC, lhs, rhs LIMIT 1),
        |m_$r AS (SELECT px.w, px.i FROM px_$r px, best_$r b
        |         WHERE px.toks[px.i] = b.lhs AND px.toks[px.i+1] = b.rhs),
        |sel_$r AS (SELECT w, i FROM (
        |             SELECT w, i, ROW_NUMBER() OVER (PARTITION BY w, grp ORDER BY i) AS rn
        |             FROM (SELECT w, i, i - ROW_NUMBER() OVER (PARTITION BY w ORDER BY i) AS grp
        |                   FROM m_$r)) WHERE rn % 2 = 1),
        |seg_$r AS MATERIALIZED (
        |  SELECT p.w, p.freq,
        |         list(CASE WHEN s.i IS NOT NULL THEN b.lhs || b.rhs ELSE p.toks[p.i0] END
        |              ORDER BY p.i0) AS toks
        |  FROM (SELECT w, freq, toks, unnest(range(1, len(toks)+1)) AS i0 FROM seg_$p) p
        |  CROSS JOIN best_$r b
        |  LEFT JOIN sel_$r s ON s.w = p.w AND s.i = p.i0
        |  LEFT JOIN sel_$r c ON c.w = p.w AND c.i = p.i0 - 1
        |  WHERE c.i IS NULL
        |  GROUP BY p.w, p.freq)""".stripMargin
    }.mkString(",\n")
    s"""WITH wx AS (SELECT unnest($W) AS w FROM documents),
      |v AS (SELECT w, COUNT(*) AS freq FROM wx WHERE len(w) >= 2 GROUP BY w),
      |seg_0 AS MATERIALIZED (
      |  SELECT w, freq, list_transform(range(1, len(w)+1), i -> w[i]) AS toks FROM v),
      |""".stripMargin + rb
  }

  /** Merge rounds for the q170/q171 WordPiece pair. */
  private val WpRounds = 8

  /** DuckDB replay of `rounds` WordPiece training rounds: identical
    * machinery to [[bpeReplaySeg]] (positions, islands-parity merge
    * selection, positional rebuild) except the per-round argmax ranks by
    * the LIKELIHOOD score cnt(pair)/(cnt(lhs)·cnt(rhs)) — token counts
    * `tc_r` taken from the current segmentation — as one IEEE division
    * of exact BIGINTs, ties (lhs, rhs) lexicographic.
    */
  private def wpReplaySeg(rounds: Int): String = {
    val rb = (1 to rounds).map { r =>
      val p = r - 1
      s"""px_$r AS MATERIALIZED (SELECT w, freq, toks, unnest(range(1, len(toks))) AS i FROM seg_$p),
        |pc_$r AS (SELECT toks[i] AS lhs, toks[i+1] AS rhs, CAST(SUM(freq) AS BIGINT) AS cnt
        |          FROM px_$r GROUP BY 1, 2),
        |tx_$r AS (SELECT freq, toks, unnest(range(1, len(toks)+1)) AS i FROM seg_$p),
        |tc_$r AS (SELECT toks[i] AS tok, CAST(SUM(freq) AS BIGINT) AS c FROM tx_$r GROUP BY 1),
        |best_$r AS MATERIALIZED (
        |  SELECT pc.lhs, pc.rhs, pc.cnt,
        |         CAST(pc.cnt AS DOUBLE) / CAST(cl.c * cr.c AS DOUBLE) AS score
        |  FROM pc_$r pc
        |  JOIN tc_$r cl ON cl.tok = pc.lhs
        |  JOIN tc_$r cr ON cr.tok = pc.rhs
        |  ORDER BY score DESC, pc.lhs, pc.rhs LIMIT 1),
        |m_$r AS (SELECT px.w, px.i FROM px_$r px, best_$r b
        |         WHERE px.toks[px.i] = b.lhs AND px.toks[px.i+1] = b.rhs),
        |sel_$r AS (SELECT w, i FROM (
        |             SELECT w, i, ROW_NUMBER() OVER (PARTITION BY w, grp ORDER BY i) AS rn
        |             FROM (SELECT w, i, i - ROW_NUMBER() OVER (PARTITION BY w ORDER BY i) AS grp
        |                   FROM m_$r)) WHERE rn % 2 = 1),
        |seg_$r AS MATERIALIZED (
        |  SELECT p.w, p.freq,
        |         list(CASE WHEN s.i IS NOT NULL THEN b.lhs || b.rhs ELSE p.toks[p.i0] END
        |              ORDER BY p.i0) AS toks
        |  FROM (SELECT w, freq, toks, unnest(range(1, len(toks)+1)) AS i0 FROM seg_$p) p
        |  CROSS JOIN best_$r b
        |  LEFT JOIN sel_$r s ON s.w = p.w AND s.i = p.i0
        |  LEFT JOIN sel_$r c ON c.w = p.w AND c.i = p.i0 - 1
        |  WHERE c.i IS NULL
        |  GROUP BY p.w, p.freq)""".stripMargin
    }.mkString(",\n")
    s"""WITH wx AS (SELECT unnest($W) AS w FROM documents),
      |v AS (SELECT w, COUNT(*) AS freq FROM wx WHERE len(w) >= 2 GROUP BY w),
      |seg_0 AS MATERIALIZED (
      |  SELECT w, freq, list_transform(range(1, len(w)+1), i -> w[i]) AS toks FROM v),
      |""".stripMargin + rb
  }

  val defs: Seq[QueryDef] = Seq(

    // Token counting: whitespace + BPE-ish pre-tokenization counts.
    QueryDef("q45_token_stats",
      """SELECT doc_id,
        |       CAST(length(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_ws_tokens,
        |       CAST(length(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      TextAnalysis.tokenStats(Tables.documents(s, dir)).orderBy("doc_id")
    },

    // Quality scoring: length/punct/stopword features + composite score.
    QueryDef("q46_text_quality",
      s"""WITH f AS (
        |  SELECT doc_id,
        |         CAST(length(text) AS BIGINT) AS n_chars_m,
        |         CAST(length($W) AS BIGINT) AS n_words,
        |         CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS BIGINT) AS n_punct,
        |         CAST(length(list_filter($W, w -> list_contains(['the','a','of','and','to','in','is'], w))) AS BIGINT) AS n_stop,
        |         list_reduce(list_transform($W, w -> CAST(length(w) AS BIGINT)), (x, y) -> x + y) AS sum_word_len
        |  FROM documents)
        |SELECT doc_id, n_chars_m, n_words, n_punct, n_stop,
        |       CASE WHEN n_chars_m > 0 THEN CAST(n_punct AS DOUBLE) / n_chars_m ELSE 0.0 END AS punct_ratio,
        |       CASE WHEN n_words > 0 THEN CAST(n_stop AS DOUBLE) / n_words ELSE 0.0 END AS stop_ratio,
        |       CASE WHEN n_words > 0 THEN CAST(sum_word_len AS DOUBLE) / n_words ELSE 0.0 END AS avg_word_len,
        |       (CASE WHEN n_words > 0 THEN CAST(n_stop AS DOUBLE) / n_words ELSE 0.0 END) * 0.4
        |         + (CASE WHEN n_words BETWEEN 50 AND 200 THEN 1.0 ELSE 0.0 END) * 0.3
        |         + (1.0 - CASE WHEN n_chars_m > 0 THEN CAST(n_punct AS DOUBLE) / n_chars_m ELSE 0.0 END) * 0.3 AS quality_score
        |FROM f ORDER BY doc_id""".stripMargin) { (s, dir) =>
      TextAnalysis.qualityScore(Tables.documents(s, dir)).orderBy("doc_id")
    },

    // Heuristic language ID (CJK range + English stopword density).
    QueryDef("q47_lang_id",
      s"""WITH f AS (
        |  SELECT doc_id, lang, text,
        |         CAST(length($W) AS BIGINT) AS n_words,
        |         CAST(length(list_filter($W, w -> list_contains(['the','and','a','of'], w))) AS BIGINT) AS n_en
        |  FROM documents)
        |SELECT doc_id, lang,
        |       CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
        |            WHEN (CASE WHEN n_words > 0 THEN CAST(n_en AS DOUBLE) / n_words ELSE 0.0 END) >= 0.03 THEN 'en'
        |            ELSE 'unknown' END AS predicted_lang,
        |       (CASE WHEN n_words > 0 THEN CAST(n_en AS DOUBLE) / n_words ELSE 0.0 END) AS en_score,
        |       CAST(lang = (CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
        |            WHEN (CASE WHEN n_words > 0 THEN CAST(n_en AS DOUBLE) / n_words ELSE 0.0 END) >= 0.03 THEN 'en'
        |            ELSE 'unknown' END) AS INT) AS label_match
        |FROM f ORDER BY doc_id""".stripMargin) { (s, dir) =>
      TextAnalysis.langId(Tables.documents(s, dir))
        .select("doc_id", "lang", "predicted_lang", "en_score", "label_match")
        .orderBy("doc_id")
    },

    // Rolling polynomial document fingerprint (order-sensitive left fold).
    QueryDef("q48_doc_fingerprint",
      s"""SELECT doc_id,
        |       list_reduce(
        |         list_prepend(CAST(0 AS BIGINT),
        |           list_transform($W, w -> ${TextOps.hash32Sql("w")} % 1000000007)),
        |         (acc, x) -> (acc * 31 + x) % 1000000007) AS rolling_hash
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      TextAnalysis.fingerprint(Tables.documents(s, dir)).orderBy("doc_id")
    },

    // The composed curation pipeline: quality gate -> language filter ->
    // near-exact dedup, one chained DataFrame (gates before the dedup
    // shuffle). Oracle composes the q46/q47/q31 fragments identically.
    QueryDef("q64_curation_pipeline",
      s"""WITH f AS (
        |  SELECT doc_id, lang, text,
        |         CAST(length(text) AS BIGINT) AS n_chars_m,
        |         CAST(length($W) AS BIGINT) AS n_words,
        |         CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS BIGINT) AS n_punct,
        |         CAST(length(list_filter($W, w -> list_contains(['the','a','of','and','to','in','is'], w))) AS BIGINT) AS n_stop,
        |         CAST(length(list_filter($W, w -> list_contains(['the','and','a','of'], w))) AS BIGINT) AS n_en
        |  FROM documents),
        |q AS (
        |  SELECT doc_id, lang, text, n_words,
        |         (CASE WHEN n_words > 0 THEN CAST(n_stop AS DOUBLE) / n_words ELSE 0.0 END) * 0.4
        |           + (CASE WHEN n_words BETWEEN 50 AND 200 THEN 1.0 ELSE 0.0 END) * 0.3
        |           + (1.0 - CASE WHEN n_chars_m > 0 THEN CAST(n_punct AS DOUBLE) / n_chars_m ELSE 0.0 END) * 0.3 AS quality_score,
        |         CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
        |              WHEN (CASE WHEN n_words > 0 THEN CAST(n_en AS DOUBLE) / n_words ELSE 0.0 END) >= 0.03 THEN 'en'
        |              ELSE 'unknown' END AS predicted_lang
        |  FROM f),
        |g AS (SELECT * FROM q WHERE quality_score >= 0.55 AND predicted_lang = 'en'),
        |d AS (SELECT doc_id, lang, n_words, quality_score,
        |             min(doc_id) OVER (PARTITION BY md5(${TextOps.normalizedSql})) AS canonical_id
        |      FROM g)
        |SELECT doc_id, lang, n_words, quality_score
        |FROM d WHERE doc_id = canonical_id
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      TextAnalysis.curate(Tables.documents(s, dir), 0.55, "en").orderBy("doc_id")
    },

    // TF-IDF top-3 terms per document (log-free idf ratio — see
    // TextAnalysis.tfidfTopK for the cross-engine exactness rationale).
    QueryDef("q61_tfidf",
      s"""WITH ws AS (SELECT doc_id, unnest($W) AS term FROM documents),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM ws GROUP BY doc_id, term),
        |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT doc_id, term, tf, df,
        |         CAST(tf AS DOUBLE) * ((CAST(n_docs AS DOUBLE) + 1.0)
        |                               / (CAST(df AS DOUBLE) + 1.0)) AS score
        |  FROM tf JOIN df USING (term), n)
        |SELECT doc_id, term, tf, df, score,
        |       CAST(row_number() OVER (PARTITION BY doc_id
        |            ORDER BY score DESC, term) AS INT) AS rk
        |FROM scored QUALIFY rk <= 3
        |ORDER BY doc_id, rk""".stripMargin) { (s, dir) =>
      TextAnalysis.tfidfTopK(Tables.documents(s, dir), 3).orderBy("doc_id", "rk")
    },

    // Repetition quality signals: duplicate-word fraction + top-bigram
    // fraction (boilerplate/spam detectors for training-data curation).
    QueryDef("q62_repetition",
      s"""WITH ws AS (SELECT doc_id, unnest($W) AS w FROM documents),
        |wstat AS (SELECT doc_id, COUNT(*) AS n_words,
        |                 COUNT(DISTINCT w) AS n_distinct
        |          FROM ws GROUP BY doc_id),
        |bg AS (SELECT doc_id, unnest(${TextOps.bigramsSql(W)}) AS bg
        |       FROM documents),
        |bgc AS (SELECT doc_id, bg, COUNT(*) AS c FROM bg GROUP BY doc_id, bg),
        |bstat AS (SELECT doc_id, MAX(c) AS top_bigram,
        |                 CAST(SUM(c) AS BIGINT) AS n_bigrams
        |          FROM bgc GROUP BY doc_id)
        |SELECT doc_id, n_words, n_distinct,
        |       1.0 - CAST(n_distinct AS DOUBLE) / n_words AS dup_word_ratio,
        |       top_bigram, n_bigrams,
        |       CAST(top_bigram AS DOUBLE) / n_bigrams AS top_bigram_frac
        |FROM wstat JOIN bstat USING (doc_id)
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      TextAnalysis.repetition(Tables.documents(s, dir)).orderBy("doc_id")
    },

    // Curriculum difficulty deciles: ntile(10) over the quality score
    // (deterministic tie-break on doc_id). Exact global ntile needs one
    // total order — the correctness baseline, like brute-force ANN; at
    // 100 TB compute approx_percentile cutpoints and broadcast them
    // instead (one pass, no single-partition window).
    QueryDef("q71_quality_deciles",
      s"""WITH f AS (
        |  SELECT doc_id,
        |         CAST(length(text) AS BIGINT) AS n_chars_m,
        |         CAST(length($W) AS BIGINT) AS n_words,
        |         CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS BIGINT) AS n_punct,
        |         CAST(length(list_filter($W, w -> list_contains(['the','a','of','and','to','in','is'], w))) AS BIGINT) AS n_stop
        |  FROM documents),
        |q AS (SELECT doc_id,
        |        (CASE WHEN n_words > 0 THEN CAST(n_stop AS DOUBLE) / n_words ELSE 0.0 END) * 0.4
        |          + (CASE WHEN n_words BETWEEN 50 AND 200 THEN 1.0 ELSE 0.0 END) * 0.3
        |          + (1.0 - CASE WHEN n_chars_m > 0 THEN CAST(n_punct AS DOUBLE) / n_chars_m ELSE 0.0 END) * 0.3 AS quality_score
        |      FROM f)
        |SELECT doc_id, quality_score,
        |       CAST(ntile(10) OVER (ORDER BY quality_score DESC, doc_id) AS INT) AS decile
        |FROM q ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(org.apache.spark.sql.functions.col("quality_score").desc,
          org.apache.spark.sql.functions.col("doc_id"))
      TextAnalysis.qualityScore(Tables.documents(s, dir))
        .select("doc_id", "quality_score")
        .withColumn("decile", org.apache.spark.sql.functions.ntile(10).over(w))
        .orderBy("doc_id")
    },

    // The SCALE form of q71: cutpoint deciles from one percentile_approx
    // aggregation (broadcast back; no global sort / single-partition
    // window). In the accuracy ≥ n regime the sketch is exact and each
    // cutpoint is the order statistic at asc rank ceil(p*n) — which is
    // what the oracle computes via row_number (measured: floor/round/
    // ceil(p*(n+1)) variants are each refuted by some corpus size).
    QueryDef("q72_deciles_scalable",
      s"""WITH f AS (
        |  SELECT doc_id,
        |         CAST(length(text) AS BIGINT) AS n_chars_m,
        |         CAST(length($W) AS BIGINT) AS n_words,
        |         CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS BIGINT) AS n_punct,
        |         CAST(length(list_filter($W, w -> list_contains(['the','a','of','and','to','in','is'], w))) AS BIGINT) AS n_stop
        |  FROM documents),
        |q AS (SELECT doc_id,
        |        (CASE WHEN n_words > 0 THEN CAST(n_stop AS DOUBLE) / n_words ELSE 0.0 END) * 0.4
        |          + (CASE WHEN n_words BETWEEN 50 AND 200 THEN 1.0 ELSE 0.0 END) * 0.3
        |          + (1.0 - CASE WHEN n_chars_m > 0 THEN CAST(n_punct AS DOUBLE) / n_chars_m ELSE 0.0 END) * 0.3 AS quality_score
        |      FROM f),
        |r AS (SELECT quality_score,
        |             row_number() OVER (ORDER BY quality_score) AS rn,
        |             COUNT(*) OVER () AS n
        |      FROM q),
        |cuts AS (SELECT r.quality_score AS cut
        |         FROM (SELECT unnest(range(1, 10)) AS i) i
        |         JOIN r ON r.rn = CAST(ceil((i.i / 10.0) * r.n) AS BIGINT))
        |SELECT q.doc_id, q.quality_score,
        |       CAST(10 - SUM(CASE WHEN q.quality_score > c.cut THEN 1 ELSE 0 END) AS INT) AS decile
        |FROM q CROSS JOIN cuts c
        |GROUP BY q.doc_id, q.quality_score
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      TextAnalysis.qualityDecilesApprox(Tables.documents(s, dir)).orderBy("doc_id")
    },

    // Corpus-LM likelihood proxy (CCNet-style): per-doc bigram mass vs
    // the corpus bigram model — integer sums, one double division.
    QueryDef("q78_bigram_likelihood",
      s"""WITH t AS (SELECT doc_id, $W AS ws FROM documents),
        |bg AS (SELECT doc_id, unnest(${TextOps.bigramsSql("ws")}) AS bg FROM t),
        |cb AS (SELECT bg, COUNT(*) AS c_bg FROM bg GROUP BY bg),
        |cc AS (SELECT split_part(bg, ' ', 1) AS w1, COUNT(*) AS c_ctx
        |       FROM bg GROUP BY 1),
        |j AS (SELECT b.doc_id, cb.c_bg, cc.c_ctx
        |      FROM bg b JOIN cb USING (bg)
        |                JOIN cc ON cc.w1 = split_part(b.bg, ' ', 1))
        |SELECT doc_id, COUNT(*) AS n_bigrams,
        |       CAST(SUM(c_bg) AS BIGINT) AS sum_bigram_count,
        |       CAST(SUM(c_ctx) AS BIGINT) AS sum_context_count,
        |       CAST(CAST(SUM(c_bg) AS BIGINT) AS DOUBLE)
        |         / CAST(SUM(c_ctx) AS BIGINT) AS likelihood
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      TextAnalysis.bigramLikelihood(Tables.documents(s, dir)).orderBy("doc_id")
    },

    // CCNet head/middle/tail bucketing: per-language likelihood terciles
    // under the corpus bigram LM (q78's CTEs verbatim), cutpoints at the
    // exact-regime ranks ceil(p*n) per language (q77's convention),
    // bucket_id = 3 - #cutpoints strictly below (q72's convention; 1 =
    // head = most model-like third).
    QueryDef("q104_ccnet_buckets",
      s"""WITH t AS (SELECT doc_id, $W AS ws FROM documents),
        |bg AS (SELECT doc_id, unnest(${TextOps.bigramsSql("ws")}) AS bg FROM t),
        |cb AS (SELECT bg, COUNT(*) AS c_bg FROM bg GROUP BY bg),
        |cc AS (SELECT split_part(bg, ' ', 1) AS w1, COUNT(*) AS c_ctx
        |       FROM bg GROUP BY 1),
        |j AS (SELECT b.doc_id, cb.c_bg, cc.c_ctx
        |      FROM bg b JOIN cb USING (bg)
        |                JOIN cc ON cc.w1 = split_part(b.bg, ' ', 1)),
        |lik AS (SELECT doc_id,
        |          CAST(CAST(SUM(c_bg) AS BIGINT) AS DOUBLE)
        |            / CAST(SUM(c_ctx) AS BIGINT) AS likelihood
        |        FROM j GROUP BY doc_id),
        |l AS (SELECT lik.doc_id, d.lang, lik.likelihood
        |      FROM lik JOIN documents d USING (doc_id)),
        |r AS (SELECT lang, likelihood,
        |             row_number() OVER (PARTITION BY lang ORDER BY likelihood) AS rn,
        |             COUNT(*) OVER (PARTITION BY lang) AS n
        |      FROM l),
        |cuts AS (SELECT lang,
        |           min(CASE WHEN rn = CAST(ceil((1.0/3)*n) AS BIGINT) THEN likelihood END) AS c1,
        |           min(CASE WHEN rn = CAST(ceil((2.0/3)*n) AS BIGINT) THEN likelihood END) AS c2
        |         FROM r GROUP BY lang)
        |SELECT l.doc_id, l.lang, l.likelihood,
        |       CAST(3 - CASE WHEN l.likelihood > c.c1 THEN 1 ELSE 0 END
        |              - CASE WHEN l.likelihood > c.c2 THEN 1 ELSE 0 END AS INT) AS bucket_id,
        |       CASE 3 - CASE WHEN l.likelihood > c.c1 THEN 1 ELSE 0 END
        |              - CASE WHEN l.likelihood > c.c2 THEN 1 ELSE 0 END
        |         WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
        |FROM l JOIN cuts c USING (lang)
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      TextAnalysis.ccnetBuckets(Tables.documents(s, dir)).orderBy("doc_id")
    },

    // Misra-Gries heavy hitters: the sketch content depends on partition
    // layout and merge order (mergeable-summaries semantics), so — like
    // q81's HLL bound — the oracle verifies the THEOREM, not the bytes:
    // every token with true count > N/(k+1) must be present with
    // undercount ≤ N/(k+1) and no overcount. The stream replicates
    // hash-selected tokens ×10 in both engines so true heavy hitters
    // exist and the 31-token vocab exceeds the 2k working buffer (k=8),
    // forcing real compressions.
    QueryDef("q105_heavy_hitters",
      s"""WITH w AS (SELECT unnest($W) AS tok FROM documents),
        |st AS (SELECT w.tok
        |       FROM (SELECT tok,
        |               CASE WHEN ${TextOps.hash32Sql("tok")} % 7 = 0
        |                    THEN 10 ELSE 1 END AS wt FROM w) w,
        |            (SELECT unnest(range(0, 10)) AS r) r
        |       WHERE r.r < w.wt),
        |e AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_exact FROM st GROUP BY tok),
        |t AS (SELECT COUNT(*) AS n_total FROM st)
        |SELECT tok, n_exact, TRUE AS in_sketch, TRUE AS within_bound
        |FROM e, t WHERE n_exact > n_total / 9.0
        |ORDER BY tok""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.functions._
      val toks = Tables.documents(s, dir)
        .select(explode(TextOps.words(col("text"))).as("tok"))
      val stream = toks
        .withColumn("wt", when(pmod(TextOps.hash32(col("tok")), lit(7)) === 0, 10).otherwise(1))
        .select(explode(array_repeat(col("tok"), col("wt"))).as("tok"))
      val sketch = stream.agg(graft.functions.HeavyHitters.misraGries(8)(col("tok")).as("sketch"))
      val exact = stream.groupBy("tok").agg(count(lit(1)).as("n_exact"))
      val total = stream.agg(count(lit(1)).as("n_total"))
      exact.crossJoin(broadcast(total)).crossJoin(broadcast(sketch))
        .filter(col("n_exact") > col("n_total") / lit(9.0))
        .withColumn("est", element_at(col("sketch"), col("tok")))
        .select(col("tok"), col("n_exact"),
          col("est").isNotNull.as("in_sketch"),
          (col("est").isNotNull && col("est") <= col("n_exact") &&
            (col("n_exact") - col("est")).cast("double") <= col("n_total") / lit(9.0))
            .as("within_bound"))
        .orderBy("tok")
    },

    // Jelinek-Mercer smoothed LM: λ·bigram ⊕ (1−λ)·unigram backoff.
    // Integer sums only; the interpolation is the same fixed IEEE op
    // sequence in both engines. Gotcha: DuckDB folds (1.0 - 0.7) in
    // exact DECIMAL (= 0.3, one ulp off Spark's double subtraction), so
    // the oracle forces the subtraction into DOUBLE.
    QueryDef("q108_interpolated_lm",
      s"""WITH t AS (SELECT doc_id, $W AS ws FROM documents),
        |u AS (SELECT unnest(ws) AS w FROM t),
        |cu AS (SELECT w, COUNT(*) AS c_w FROM u GROUP BY w),
        |nt AS (SELECT COUNT(*) AS n_total FROM u),
        |bg AS (SELECT doc_id, unnest(${TextOps.bigramsSql("ws")}) AS bg FROM t),
        |cb AS (SELECT bg, COUNT(*) AS c_bg FROM bg GROUP BY bg),
        |cc AS (SELECT split_part(bg, ' ', 1) AS w1, COUNT(*) AS c_ctx
        |       FROM bg GROUP BY 1),
        |j AS (SELECT b.doc_id, cb.c_bg, cc.c_ctx, cu.c_w
        |      FROM bg b JOIN cb USING (bg)
        |                JOIN cc ON cc.w1 = split_part(b.bg, ' ', 1)
        |                JOIN cu ON cu.w = split_part(b.bg, ' ', 2))
        |SELECT doc_id,
        |       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |       CAST(SUM(c_bg) AS BIGINT) AS sum_bigram_count,
        |       CAST(SUM(c_ctx) AS BIGINT) AS sum_context_count,
        |       CAST(SUM(c_w) AS BIGINT) AS sum_unigram_count,
        |       nt.n_total AS n_total,
        |       0.7 * (CAST(CAST(SUM(c_bg) AS BIGINT) AS DOUBLE)
        |              / CAST(SUM(c_ctx) AS BIGINT))
        |         + (CAST(1.0 AS DOUBLE) - 0.7) * (CAST(CAST(SUM(c_w) AS BIGINT) AS DOUBLE)
        |              / (CAST(COUNT(*) AS DOUBLE) * nt.n_total)) AS likelihood
        |FROM j, nt GROUP BY doc_id, nt.n_total
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      TextAnalysis.interpolatedLikelihood(Tables.documents(s, dir)).orderBy("doc_id")
    },

    // Per-language quality quartiles (the per-domain curation thresholds):
    // grouped percentile_approx — one sketch per group crosses the
    // exchange. Oracle: the group's order statistic at asc rank
    // ceil(p*n_g), the measured exact-regime semantics (see q72).
    QueryDef("q77_grouped_quantiles",
      s"""WITH f AS (
        |  SELECT doc_id, lang,
        |         CAST(length(text) AS BIGINT) AS n_chars_m,
        |         CAST(length($W) AS BIGINT) AS n_words,
        |         CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS BIGINT) AS n_punct,
        |         CAST(length(list_filter($W, w -> list_contains(['the','a','of','and','to','in','is'], w))) AS BIGINT) AS n_stop
        |  FROM documents),
        |q AS (SELECT doc_id, lang,
        |        (CASE WHEN n_words > 0 THEN CAST(n_stop AS DOUBLE) / n_words ELSE 0.0 END) * 0.4
        |          + (CASE WHEN n_words BETWEEN 50 AND 200 THEN 1.0 ELSE 0.0 END) * 0.3
        |          + (1.0 - CASE WHEN n_chars_m > 0 THEN CAST(n_punct AS DOUBLE) / n_chars_m ELSE 0.0 END) * 0.3 AS quality_score
        |      FROM f),
        |r AS (SELECT lang, quality_score,
        |             row_number() OVER (PARTITION BY lang ORDER BY quality_score) AS rn,
        |             COUNT(*) OVER (PARTITION BY lang) AS n
        |      FROM q)
        |SELECT lang, CAST(max(n) AS BIGINT) AS n_docs,
        |       min(CASE WHEN rn = CAST(ceil(0.25 * n) AS BIGINT) THEN quality_score END) AS p25,
        |       min(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN quality_score END) AS p50,
        |       min(CASE WHEN rn = CAST(ceil(0.75 * n) AS BIGINT) THEN quality_score END) AS p75
        |FROM r GROUP BY lang
        |ORDER BY lang""".stripMargin) { (s, dir) =>
      TextAnalysis.groupedQuantiles(Tables.documents(s, dir), "lang",
        Seq(0.25, 0.5, 0.75)).orderBy("lang")
    },

    // Multimodal plumbing: binary payload + deterministic metadata.
    QueryDef("q50_multimodal_meta",
      s"""SELECT doc_id AS media_id, 'image' AS modality,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |       ${TextOps.hash32Sql("text")} AS content_hash,
        |       CAST(64 + (${TextOps.hash32Sql("text")} % 512) AS INT) AS width,
        |       CAST(64 + (${TextOps.hash32Sql("text")} % 256) AS INT) AS height,
        |       CAST(n_chars % 30 AS INT) AS frame_count
        |FROM documents ORDER BY media_id""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.functions.col
      Multimodal.attachBinary(Tables.documents(s, dir))
        .select(col("media_id"), col("modality"),
          col("meta.byte_len").as("byte_len"),
          col("meta.content_hash").as("content_hash"),
          col("meta.width").as("width"),
          col("meta.height").as("height"),
          col("meta.frame_count").as("frame_count"))
        .orderBy("media_id")
    },

    // Frame-sampling explode over the fake video metadata.
    QueryDef("q51_frame_sample",
      """SELECT doc_id AS media_id, 'image' AS modality, CAST(f AS INT) AS frame_idx
        |FROM documents,
        |     (SELECT unnest(range(0, 30, 4)) AS f) g
        |WHERE f < n_chars % 30
        |ORDER BY media_id, frame_idx""".stripMargin) { (s, dir) =>
      Multimodal.frameSample(Multimodal.attachBinary(Tables.documents(s, dir)), 4)
        .orderBy("media_id", "frame_idx")
    },

    // The mapPartitions decode stage itself: deterministic per-row features
    // over the raw bytes. Oracle uses char arithmetic, valid because the
    // corpus is ASCII (octet_length == length for every row).
    QueryDef("q52_decode_features",
      """SELECT doc_id AS media_id, 'image' AS modality,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |       ascii(substr(text, 1, 1)) AS first_byte,
        |       CAST(list_reduce(list_transform(range(1, least(65, length(text) + 1)),
        |                                       i -> ascii(text[i])),
        |                        (a, b) -> a + b) AS BIGINT) AS byte_sum_64
        |FROM documents ORDER BY media_id""".stripMargin) { (s, dir) =>
      Multimodal.decodeStub(Multimodal.attachBinary(Tables.documents(s, dir)))
        .orderBy("media_id")
    },

    // REAL image decode: BMP/PPM/PNG bytes are synthesized executor-side
    // from the closed-form TestPattern, decoded by the hand-written codecs
    // (+ JDK ImageIO for PNG), and every decoded feature — dimensions,
    // exact channel sums, means, orientation-sensitive top-row sums — is
    // recomputed by the oracle from the formula alone. 432 = max w·h of
    // the pattern (24×18), so the fixed-range cross join covers every
    // pixel (q51's bounded-unnest idiom).
    QueryDef("q80_image_decode",
      """WITH m AS (
        |  SELECT doc_id, CAST(doc_id % 9973 AS INT) AS seed,
        |         CAST(8 + doc_id % 17 AS INT) AS w,
        |         CAST(8 + doc_id % 11 AS INT) AS h
        |  FROM documents),
        |px AS (
        |  SELECT m.doc_id, m.w, m.h, gi.i,
        |         (seed + 3*i) % 256 AS r,
        |         (seed + 5*i + 7) % 256 AS g,
        |         (seed + 11*i + 13) % 256 AS b
        |  FROM m, (SELECT unnest(range(0, 432)) AS i) gi
        |  WHERE gi.i < m.w * m.h)
        |SELECT doc_id AS media_id,
        |       CASE doc_id % 3 WHEN 0 THEN 'bmp' WHEN 1 THEN 'ppm' ELSE 'png' END AS format,
        |       w AS width, h AS height,
        |       CAST(SUM(r) AS BIGINT) AS sum_r,
        |       CAST(SUM(g) AS BIGINT) AS sum_g,
        |       CAST(SUM(b) AS BIGINT) AS sum_b,
        |       CAST(SUM(CASE WHEN i < w THEN r END) AS BIGINT) AS row0_sum_r,
        |       CAST(SUM(CASE WHEN i < w THEN g END) AS BIGINT) AS row0_sum_g,
        |       CAST(SUM(CASE WHEN i < w THEN b END) AS BIGINT) AS row0_sum_b,
        |       CAST(SUM(r) AS DOUBLE) / (w * h) AS mean_r,
        |       CAST(SUM(g) AS DOUBLE) / (w * h) AS mean_g,
        |       CAST(SUM(b) AS DOUBLE) / (w * h) AS mean_b
        |FROM px GROUP BY doc_id, w, h ORDER BY media_id""".stripMargin) { (s, dir) =>
      Multimodal.decodeMedia(Multimodal.syntheticMedia(Tables.documents(s, dir)))
        .orderBy("media_id")
    },

    // REAL audio decode: WAV/PCM bytes are synthesized executor-side from
    // the closed-form AudioTestPattern (every 5th file carries an unknown
    // pre-`data` RIFF chunk, so the decoder's chunk walk is load-bearing),
    // decoded by the hand-written RIFF parser, and every feature — rate,
    // channels, frames, µs duration, channel-0 moments, all-channel peak —
    // is recomputed by the oracle from the formula alone. 320 = max frame
    // count of the pattern; mean/RMS are division (+ sqrt) on exact
    // integers, the cross-engine-safe IEEE sequence.
    QueryDef("q103_audio_decode",
      """WITH m AS (
        |  SELECT doc_id, CAST(doc_id % 9973 AS INT) AS seed,
        |         CAST(CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000
        |              ELSE 44100 END AS INT) AS sr,
        |         CAST(1 + doc_id % 2 AS INT) AS ch,
        |         CAST(200 + doc_id % 120 AS INT) AS nf
        |  FROM documents),
        |s AS (
        |  SELECT m.doc_id, m.sr, m.ch, m.nf, gi.i,
        |         (seed + 7*gi.i + 29) % 4001 - 2000 AS s0,
        |         (seed + 7*gi.i + 13 + 29) % 4001 - 2000 AS s1
        |  FROM m, (SELECT unnest(range(0, 320)) AS i) gi
        |  WHERE gi.i < m.nf)
        |SELECT doc_id AS media_id, 'wav' AS format,
        |       sr AS sample_rate, ch AS channels, nf AS n_frames,
        |       CAST(nf AS BIGINT) * 1000000 // sr AS duration_us,
        |       CAST(SUM(s0) AS BIGINT) AS sum_ch0,
        |       CAST(SUM(CAST(s0 AS BIGINT) * s0) AS BIGINT) AS sumsq_ch0,
        |       CAST(MAX(CASE WHEN ch = 2 THEN greatest(abs(s0), abs(s1))
        |                ELSE abs(s0) END) AS INT) AS peak,
        |       CAST(SUM(s0) AS DOUBLE) / nf AS mean_ch0,
        |       sqrt(CAST(SUM(CAST(s0 AS BIGINT) * s0) AS DOUBLE) / nf) AS rms_ch0
        |FROM s GROUP BY doc_id, sr, ch, nf ORDER BY media_id""".stripMargin) { (s, dir) =>
      Multimodal.decodeAudio(Multimodal.syntheticAudio(Tables.documents(s, dir)))
        .orderBy("media_id")
    },

    // Spectral audio features: 64-point integer DFT over the first 64
    // decoded channel-0 PCM samples — dominant AC bin, its power, total
    // AC power, spectral centroid. The twiddle factors are ONE Q7
    // integer table (SpectralTrig) interpolated into this SQL, so the
    // oracle replays the exact same integer arithmetic from the
    // closed-form sample formula; centroid is the one IEEE division.
    QueryDef("q173_audio_spectral",
      s"""WITH m AS (SELECT doc_id, CAST(doc_id % 9973 AS INT) AS seed FROM documents),
        |x AS (SELECT m.doc_id, gi.i,
        |             CAST((seed + 7*gi.i + 29) % 4001 - 2000 AS BIGINT) AS v
        |      FROM m, (SELECT unnest(range(0, 64)) AS i) gi),
        |trig(j, c, s) AS (VALUES ${Multimodal.SpectralTrig.sqlValues}),
        |f AS (SELECT x.doc_id, gk.k,
        |             CAST(SUM(x.v * t.c) AS BIGINT) AS re,
        |             CAST(SUM(x.v * t.s) AS BIGINT) AS im
        |      FROM x, (SELECT unnest(range(1, 33)) AS k) gk
        |      JOIN trig t ON t.j = (gk.k * x.i) % 64
        |      GROUP BY 1, 2),
        |p AS (SELECT doc_id, k, re*re + im*im AS pw FROM f),
        |agg AS (SELECT doc_id, CAST(SUM(pw) AS BIGINT) AS total_power,
        |               CAST(SUM(k * pw) AS BIGINT) AS num
        |        FROM p GROUP BY doc_id),
        |dom AS (SELECT doc_id, CAST(k AS INT) AS dom_bin, pw AS dom_power FROM (
        |          SELECT doc_id, k, pw,
        |                 ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pw DESC, k) AS rn
        |          FROM p) WHERE rn = 1)
        |SELECT a.doc_id AS media_id, d.dom_bin, d.dom_power, a.total_power,
        |       CASE WHEN a.total_power > 0
        |            THEN CAST(a.num AS DOUBLE) / CAST(a.total_power AS DOUBLE) END AS centroid
        |FROM agg a JOIN dom d USING (doc_id) ORDER BY media_id""".stripMargin) { (s, dir) =>
      Multimodal.audioSpectral(Multimodal.syntheticAudio(Tables.documents(s, dir)))
        .orderBy("media_id")
    },

    // REAL video frame essence: AVI bytes whose movi LIST carries full
    // uncompressed DIB frames (bottom-up BGR, padded rows) are
    // synthesized from the closed-form pattern, then every 2nd frame is
    // container-walked + decoded back to exact channel sums — the
    // frame-sampling feature pass. The oracle recomputes every sampled
    // frame's features from (doc_id, frame, pixel) alone; 192 = max w·h,
    // 10 = max frames of the pattern (the q80 bounded-unnest idiom).
    QueryDef("q180_video_frames",
      """WITH m AS (
        |  SELECT doc_id, CAST(doc_id % 9973 AS INT) AS seed,
        |         CAST(8 + doc_id % 9 AS INT) AS w,
        |         CAST(6 + doc_id % 7 AS INT) AS h,
        |         CAST(6 + doc_id % 5 AS INT) AS nf
        |  FROM documents),
        |fx AS (SELECT m.*, gf.f
        |       FROM m, (SELECT unnest(range(0, 10)) AS f) gf
        |       WHERE gf.f < m.nf AND gf.f % 2 = 0),
        |px AS (SELECT fx.doc_id, fx.w, fx.h, fx.f, gi.i,
        |              (seed + 3*gi.i + 17*fx.f) % 256 AS r,
        |              (seed + 5*gi.i + 23*fx.f + 7) % 256 AS g,
        |              (seed + 11*gi.i + 31*fx.f + 13) % 256 AS b
        |       FROM fx, (SELECT unnest(range(0, 192)) AS i) gi
        |       WHERE gi.i < fx.w * fx.h)
        |SELECT doc_id AS media_id, CAST(f AS INT) AS frame_idx,
        |       w AS width, h AS height,
        |       CAST(SUM(r) AS BIGINT) AS sum_r,
        |       CAST(SUM(g) AS BIGINT) AS sum_g,
        |       CAST(SUM(b) AS BIGINT) AS sum_b,
        |       CAST(SUM(CASE WHEN i < w THEN r END) AS BIGINT) AS row0_sum_r,
        |       CAST(SUM(r) AS DOUBLE) / (w * h) AS mean_r
        |FROM px GROUP BY doc_id, f, w, h
        |ORDER BY media_id, frame_idx""".stripMargin) { (s, dir) =>
      Multimodal.decodeVideoFrames(
        Multimodal.syntheticVideoEssence(Tables.documents(s, dir)), stride = 2)
        .orderBy("media_id", "frame_idx")
    },

    // REAL MJPEG frame essence: AVI bytes whose movi `00dc` chunks each
    // carry a COMPLETE hand-encoded baseline JPEG (DC-only gray blocks —
    // the exactly-round-trippable T.81 subset, so lossy-format plumbing
    // gets a lossless oracle), container-walked and decoded through the
    // repo's own JPEG decoder back to exact channel sums. The oracle
    // recomputes every frame's features from (doc_id, frame, block)
    // alone: each 8×8 block is constant, so sums are 64·Σv and row 0 is
    // 8·Σv over the top block row. 12 = max blocks (4×3), 7 > max
    // frames of the pattern (the q180 bounded-unnest idiom).
    QueryDef("q219_mjpeg_frames",
      """WITH m AS (
        |  SELECT doc_id, CAST(doc_id % 9973 AS INT) AS seed,
        |         CAST(2 + doc_id % 3 AS INT) AS bw,
        |         CAST(1 + doc_id % 3 AS INT) AS bh,
        |         CAST(3 + doc_id % 4 AS INT) AS nf
        |  FROM documents),
        |fx AS (SELECT m.*, gf.f
        |       FROM m, (SELECT unnest(range(0, 7)) AS f) gf
        |       WHERE gf.f < m.nf),
        |bx AS (SELECT fx.doc_id, fx.bw, fx.bh, fx.f, gb.j,
        |              gb.j // fx.bw AS byi,
        |              (seed + 37*gb.j + 101*fx.f) % 256 AS v
        |       FROM fx, (SELECT unnest(range(0, 12)) AS j) gb
        |       WHERE gb.j < fx.bw * fx.bh)
        |SELECT doc_id AS media_id, CAST(f AS INT) AS frame_idx,
        |       CAST(8 * bw AS INT) AS width, CAST(8 * bh AS INT) AS height,
        |       CAST(64 * SUM(v) AS BIGINT) AS sum_r,
        |       CAST(64 * SUM(v) AS BIGINT) AS sum_g,
        |       CAST(64 * SUM(v) AS BIGINT) AS sum_b,
        |       CAST(8 * SUM(CASE WHEN byi = 0 THEN v END) AS BIGINT) AS row0_sum_r,
        |       CAST(64 * SUM(v) AS DOUBLE) / (64 * bw * bh) AS mean_r
        |FROM bx GROUP BY doc_id, f, bw, bh
        |ORDER BY media_id, frame_idx""".stripMargin) { (s, dir) =>
      Multimodal.decodeVideoFrames(
        Multimodal.syntheticMjpeg(Tables.documents(s, dir)), stride = 1)
        .orderBy("media_id", "frame_idx")
    },

    // Gopher quality rules (Rae et al. 2021) in integer-exact form: six
    // published heuristic gates as cross-multiplied integer comparisons
    // (no float thresholds anywhere), keep = all six. Complements q46's
    // composite score with the binary rule-gate most pipelines run first.
    QueryDef("q221_gopher_rules",
      s"""WITH w AS (SELECT doc_id, $W AS ws FROM documents),
        |f AS (SELECT doc_id,
        |  CAST(len(ws) AS BIGINT) AS n_words,
        |  CAST(COALESCE(list_sum(list_transform(ws, x -> length(x))), 0) AS BIGINT) AS char_mass,
        |  CAST(len(list_filter(ws, x -> regexp_matches(x, '[a-zA-Z]'))) AS BIGINT) AS n_alpha,
        |  CAST(len(list_intersect(list_distinct(ws),
        |       ['the','be','to','of','and','that','have','with'])) AS BIGINT) AS n_stop_kinds,
        |  CAST(len(list_filter(ws, x -> x LIKE '%...')) AS BIGINT) AS n_ellipsis,
        |  CAST(len(list_filter(ws, x -> contains(x, '#'))) AS BIGINT) AS n_symbol
        |  FROM w),
        |r AS (SELECT *,
        |  CAST(n_words BETWEEN 50 AND 100000 AS INT) AS r_wordcount,
        |  CAST(char_mass >= n_words * 3 AND char_mass <= n_words * 10 AS INT) AS r_meanlen,
        |  CAST(n_alpha * 5 >= n_words * 4 AS INT) AS r_alpha,
        |  CAST(n_stop_kinds >= 2 AS INT) AS r_stop,
        |  CAST(n_ellipsis * 10 <= n_words AS INT) AS r_ellipsis,
        |  CAST(n_symbol * 10 <= n_words AS INT) AS r_symbol
        |  FROM f)
        |SELECT doc_id, n_words, char_mass, n_alpha, n_stop_kinds, n_ellipsis,
        |       n_symbol, r_wordcount, r_meanlen, r_alpha, r_stop, r_ellipsis,
        |       r_symbol,
        |       r_wordcount * r_meanlen * r_alpha * r_stop * r_ellipsis * r_symbol AS keep
        |FROM r ORDER BY doc_id""".stripMargin) { (s, dir) =>
      TextAnalysis.gopherRules(Tables.documents(s, dir)).orderBy("doc_id")
    },

    // REAL H.264 keyframe index: Annex-B streams (hand exp-Golomb SPS +
    // PPS + slice NALs, IDR every 3rd frame, SEI noise on every 4th id)
    // are synthesized from the closed-form pattern, then NAL-walked: SPS
    // parsed for profile/level/dimensions, VCL NALs counted in stream
    // order, one row per IDR with its payload essence (length, byte
    // sum). Slice payload bytes are 1..251 (never zero), so the stream
    // carries no emulation-prevention inside slices and the oracle
    // recomputes every feature from (doc_id, frame, k) alone. 60 = max
    // payload len, 9 > max frames (the q180 bounded-unnest idiom).
    // Entropy decode of slice data stays the decodeStub boundary.
    QueryDef("q220_h264_idr_index",
      """WITH m AS (
        |  SELECT doc_id, CAST(doc_id % 9973 AS INT) AS seed,
        |         CAST(1 + doc_id % 4 AS INT) AS wmbs,
        |         CAST(1 + doc_id % 3 AS INT) AS hmbs,
        |         CAST(4 + doc_id % 5 AS INT) AS nf
        |  FROM documents),
        |fx AS (SELECT m.*, gf.f
        |       FROM m, (SELECT unnest(range(0, 9)) AS f) gf
        |       WHERE gf.f < m.nf AND gf.f % 3 = 0),
        |bx AS (SELECT fx.doc_id, fx.f, fx.wmbs, fx.hmbs, gk.k,
        |              (seed + 3*gk.k + 17*fx.f) % 251 + 1 AS v
        |       FROM fx, (SELECT unnest(range(0, 60)) AS k) gk
        |       WHERE gk.k < 20 + (7*fx.doc_id + 11*fx.f) % 40)
        |SELECT doc_id AS media_id, CAST(f AS INT) AS frame_idx,
        |       CAST(16 * wmbs AS INT) AS width,
        |       CAST(16 * hmbs AS INT) AS height,
        |       CAST(66 AS INT) AS profile_idc, CAST(30 AS INT) AS level_idc,
        |       CAST(COUNT(*) AS BIGINT) AS payload_len,
        |       CAST(SUM(v) AS BIGINT) AS payload_sum
        |FROM bx GROUP BY doc_id, f, wmbs, hmbs
        |ORDER BY media_id, frame_idx""".stripMargin) { (s, dir) =>
      H264.idrIndex(H264.syntheticStreams(Tables.documents(s, dir)))
        .orderBy("media_id", "frame_idx")
    },

    // Image perceptual hash over the REAL-bytes image corpus
    // (BMP/PPM/PNG round-robin): the image member of the fingerprint
    // family, same integer cross-multiply contract as q181 — the whole
    // signature table hash-matches the closed-form pattern.
    QueryDef("q183_image_phash",
      """WITH m AS (
        |  SELECT doc_id, CAST(doc_id % 9973 AS INT) AS seed,
        |         CAST(8 + doc_id % 17 AS INT) AS w,
        |         CAST(8 + doc_id % 11 AS INT) AS h
        |  FROM documents),
        |px AS (SELECT m.doc_id, m.w, m.h,
        |              gi.i % m.w AS x, gi.i // m.w AS y,
        |              (seed + 3*gi.i) % 256 AS r
        |       FROM m, (SELECT unnest(range(0, 432)) AS i) gi
        |       WHERE gi.i < m.w * m.h),
        |cells AS (SELECT doc_id, (y*4 // h)*4 + (x*4 // w) AS c,
        |                 CAST(SUM(r) AS BIGINT) AS cs,
        |                 CAST(COUNT(*) AS BIGINT) AS cc
        |          FROM px GROUP BY 1, 2),
        |tot AS (SELECT doc_id, CAST(SUM(cs) AS BIGINT) AS ts,
        |               CAST(SUM(cc) AS BIGINT) AS n
        |        FROM cells GROUP BY 1)
        |SELECT cells.doc_id AS media_id,
        |       CASE cells.doc_id % 3 WHEN 0 THEN 'bmp' WHEN 1 THEN 'ppm'
        |            ELSE 'png' END AS format,
        |       CAST(SUM(CASE WHEN cs * n >= ts * cc THEN 1 ELSE 0 END
        |                * (1 << c)) AS INT) AS sig
        |FROM cells JOIN tot USING (doc_id)
        |GROUP BY 1, 2 ORDER BY media_id""".stripMargin) { (s, dir) =>
      Multimodal.imageHashes(
        Multimodal.syntheticMedia(Tables.documents(s, dir)))
        .orderBy("media_id")
    },

    // Hamming-near fingerprint pairs (the multi-probe trick applied to
    // perceptual hashes): Hamming ≤ 1 pairs surface from bucket lookups,
    // never an all-pairs distance scan, with hot signatures (> 100
    // carriers) dropped as fingerprint stop-words (the q182 df-cap).
    // The probe explosion runs on the ≤ 2^16-row SIGNATURE DIM, not per
    // record — see Dedup.hammingNearPairs for the exchange accounting
    // (r11 verdict #8 restructure; oracle hash unchanged).
    QueryDef("q185_phash_hamming",
      """WITH m AS (
        |  SELECT doc_id, CAST(doc_id % 9973 AS INT) AS seed,
        |         CAST(8 + doc_id % 17 AS INT) AS w,
        |         CAST(8 + doc_id % 11 AS INT) AS h
        |  FROM documents),
        |px AS (SELECT m.doc_id, m.w, m.h,
        |              gi.i % m.w AS x, gi.i // m.w AS y,
        |              (seed + 3*gi.i) % 256 AS r
        |       FROM m, (SELECT unnest(range(0, 432)) AS i) gi
        |       WHERE gi.i < m.w * m.h),
        |cells AS (SELECT doc_id, (y*4 // h)*4 + (x*4 // w) AS c,
        |                 CAST(SUM(r) AS BIGINT) AS cs,
        |                 CAST(COUNT(*) AS BIGINT) AS cc
        |          FROM px GROUP BY 1, 2),
        |tot AS (SELECT doc_id, CAST(SUM(cs) AS BIGINT) AS ts,
        |               CAST(SUM(cc) AS BIGINT) AS n
        |        FROM cells GROUP BY 1),
        |sigs0 AS (SELECT cells.doc_id,
        |                CAST(SUM(CASE WHEN cs * n >= ts * cc THEN 1 ELSE 0 END
        |                     * (1 << c)) AS INT) AS sig
        |         FROM cells JOIN tot USING (doc_id) GROUP BY 1),
        |sigs AS (SELECT doc_id, sig FROM sigs0
        |         QUALIFY COUNT(*) OVER (PARTITION BY sig) <= 100),
        |pr AS (SELECT doc_id AS v1, sig AS s1,
        |              CASE WHEN fl = 0 THEN sig
        |                   ELSE CAST(xor(sig, 1 << (fl - 1)) AS INT) END AS probe
        |       FROM sigs, (SELECT unnest(range(0, 17)) AS fl) f),
        |cand AS (SELECT DISTINCT a.v1, b.doc_id AS v2, a.s1, b.sig AS s2
        |         FROM pr a JOIN sigs b ON a.probe = b.sig AND a.v1 < b.doc_id)
        |SELECT v1, v2,
        |       CAST(CASE WHEN s1 = s2 THEN 0 ELSE 1 END AS INT) AS hamming
        |FROM cand ORDER BY v1, v2""".stripMargin) { (s, dir) =>
      val sigs = Multimodal.imageHashes(
        Multimodal.syntheticMedia(Tables.documents(s, dir)))
        .select(col("media_id"), col("sig"))
      Dedup.hammingNearPairs(sigs, bits = 16, maxBucket = 100)
        .orderBy("v1", "v2")
    },

    // Perceptual frame fingerprints (aHash, 4x4 grid, red channel):
    // every cell-vs-frame-mean comparison is an integer cross-multiply
    // (cellSum·n ≥ frameSum·cellCnt — no division), so the 16-bit
    // signature is engine-exact and the whole fingerprint table
    // hash-matches. The standard per-frame signature near-dup video
    // detection builds on.
    QueryDef("q181_frame_phash",
      """WITH m AS (
        |  SELECT doc_id, CAST(doc_id % 9973 AS INT) AS seed,
        |         CAST(8 + doc_id % 9 AS INT) AS w,
        |         CAST(6 + doc_id % 7 AS INT) AS h,
        |         CAST(6 + doc_id % 5 AS INT) AS nf
        |  FROM documents),
        |fx AS (SELECT m.*, gf.f
        |       FROM m, (SELECT unnest(range(0, 10)) AS f) gf WHERE gf.f < m.nf),
        |px AS (SELECT fx.doc_id, fx.w, fx.h, fx.f,
        |              gi.i % fx.w AS x, gi.i // fx.w AS y,
        |              (seed + 3*gi.i + 17*fx.f) % 256 AS r
        |       FROM fx, (SELECT unnest(range(0, 192)) AS i) gi
        |       WHERE gi.i < fx.w * fx.h),
        |cells AS (SELECT doc_id, f, (y*4 // h)*4 + (x*4 // w) AS c,
        |                 CAST(SUM(r) AS BIGINT) AS cs,
        |                 CAST(COUNT(*) AS BIGINT) AS cc
        |          FROM px GROUP BY 1, 2, 3),
        |tot AS (SELECT doc_id, f, CAST(SUM(cs) AS BIGINT) AS ts,
        |               CAST(SUM(cc) AS BIGINT) AS n
        |        FROM cells GROUP BY 1, 2),
        |bits AS (SELECT cells.doc_id, cells.f, c,
        |                CASE WHEN cs * n >= ts * cc THEN 1 ELSE 0 END AS bit
        |         FROM cells JOIN tot USING (doc_id, f))
        |SELECT doc_id AS media_id, CAST(f AS INT) AS frame_idx,
        |       CAST(SUM(bit * (1 << c)) AS INT) AS sig
        |FROM bits GROUP BY doc_id, f
        |ORDER BY media_id, frame_idx""".stripMargin) { (s, dir) =>
      Multimodal.videoFrameHashes(
        Multimodal.syntheticVideoEssence(Tables.documents(s, dir)), stride = 1)
        .orderBy("media_id", "frame_idx")
    },

    // Video near-dup detection over the fingerprint table: candidate
    // pairs come ONLY from the signature bucket join on DISTINCT
    // (video, sig) rows — never all-pairs — ranked by shared-signature
    // count with a total (shared, v1, v2) order so the top-100 cut is
    // deterministic. Signatures carried by more than 100 videos are
    // DROPPED as non-discriminative (fingerprint stop-words — the
    // PPJoin df-cap convention): without the cap a hot signature makes
    // the bucket join quadratic in its occupancy, the superlinearity
    // the round-7 scaling audit caught. The video member of the dedup
    // family.
    QueryDef("q182_video_neardup",
      """WITH m AS (
        |  SELECT doc_id, CAST(doc_id % 9973 AS INT) AS seed,
        |         CAST(8 + doc_id % 9 AS INT) AS w,
        |         CAST(6 + doc_id % 7 AS INT) AS h,
        |         CAST(6 + doc_id % 5 AS INT) AS nf
        |  FROM documents),
        |fx AS (SELECT m.*, gf.f
        |       FROM m, (SELECT unnest(range(0, 10)) AS f) gf WHERE gf.f < m.nf),
        |px AS (SELECT fx.doc_id, fx.w, fx.h, fx.f,
        |              gi.i % fx.w AS x, gi.i // fx.w AS y,
        |              (seed + 3*gi.i + 17*fx.f) % 256 AS r
        |       FROM fx, (SELECT unnest(range(0, 192)) AS i) gi
        |       WHERE gi.i < fx.w * fx.h),
        |cells AS (SELECT doc_id, f, (y*4 // h)*4 + (x*4 // w) AS c,
        |                 CAST(SUM(r) AS BIGINT) AS cs,
        |                 CAST(COUNT(*) AS BIGINT) AS cc
        |          FROM px GROUP BY 1, 2, 3),
        |tot AS (SELECT doc_id, f, CAST(SUM(cs) AS BIGINT) AS ts,
        |               CAST(SUM(cc) AS BIGINT) AS n
        |        FROM cells GROUP BY 1, 2),
        |sigrows AS (SELECT doc_id, f, CAST(SUM(CASE WHEN cs * n >= ts * cc
        |                   THEN 1 ELSE 0 END * (1 << c)) AS INT) AS sig
        |            FROM cells JOIN tot USING (doc_id, f) GROUP BY doc_id, f),
        |sigs AS (SELECT DISTINCT doc_id, sig FROM sigrows),
        |disc AS (SELECT doc_id, sig FROM sigs
        |         QUALIFY COUNT(*) OVER (PARTITION BY sig) <= 100)
        |SELECT a.doc_id AS v1, b.doc_id AS v2,
        |       CAST(COUNT(*) AS BIGINT) AS shared
        |FROM disc a JOIN disc b ON a.sig = b.sig AND a.doc_id < b.doc_id
        |GROUP BY 1, 2
        |ORDER BY shared DESC, v1, v2 LIMIT 100""".stripMargin) { (s, dir) =>
      val sigs = Multimodal.videoFrameHashes(
        Multimodal.syntheticVideoEssence(Tables.documents(s, dir)), stride = 1)
        .select("media_id", "sig").distinct()
        .withColumn("__nsig", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("sig")))
        .filter(col("__nsig") <= 100).drop("__nsig")
      sigs.select(col("media_id").as("v1"), col("sig"))
        .join(sigs.select(col("media_id").as("v2"), col("sig")), Seq("sig"))
        .filter(col("v1") < col("v2"))
        .groupBy("v1", "v2").agg(count(lit(1)).as("shared"))
        .orderBy(col("shared").desc, col("v1"), col("v2"))
        .limit(100)
    },

    // Audio fingerprint (the audio member of the fingerprint family):
    // the two strongest DFT bins packed as one integer signature, plus
    // the exact-dup group size per signature — integer-only, so the
    // whole fingerprint table hash-matches the closed-form replay.
    QueryDef("q184_audio_fingerprint",
      s"""WITH m AS (SELECT doc_id, CAST(doc_id % 9973 AS INT) AS seed FROM documents),
        |x AS (SELECT m.doc_id, gi.i,
        |             CAST((seed + 7*gi.i + 29) % 4001 - 2000 AS BIGINT) AS v
        |      FROM m, (SELECT unnest(range(0, 64)) AS i) gi),
        |trig(j, c, s) AS (VALUES ${Multimodal.SpectralTrig.sqlValues}),
        |f AS (SELECT x.doc_id, gk.k,
        |             CAST(SUM(x.v * t.c) AS BIGINT) AS re,
        |             CAST(SUM(x.v * t.s) AS BIGINT) AS im
        |      FROM x, (SELECT unnest(range(1, 33)) AS k) gk
        |      JOIN trig t ON t.j = (gk.k * x.i) % 64
        |      GROUP BY 1, 2),
        |p AS (SELECT doc_id, k, re*re + im*im AS pw FROM f),
        |rk AS (SELECT doc_id, k,
        |              ROW_NUMBER() OVER (PARTITION BY doc_id
        |                                 ORDER BY pw DESC, k) AS rn FROM p),
        |fp AS (SELECT doc_id,
        |              CAST(MAX(CASE WHEN rn = 1 THEN k END) AS INT) AS b1,
        |              CAST(MAX(CASE WHEN rn = 2 THEN k END) AS INT) AS b2
        |       FROM rk GROUP BY doc_id)
        |SELECT doc_id AS media_id, b1, b2,
        |       CAST(b1 * 33 + b2 AS INT) AS sig,
        |       CAST(COUNT(*) OVER (PARTITION BY b1 * 33 + b2) AS BIGINT) AS n_same
        |FROM fp ORDER BY media_id""".stripMargin) { (s, dir) =>
      Multimodal.audioFingerprints(
        Multimodal.syntheticAudio(Tables.documents(s, dir)))
        .orderBy("media_id")
    },

    // REAL video-container metadata: AVI bytes (RIFF, same chunk
    // discipline as WAV; every 4th file carries the JUNK padding chunk
    // real muxers emit) are synthesized from closed-form metadata and
    // re-extracted by walking RIFF → LIST hdrl → avih. Pixel decode
    // stays honestly out of scope; the container fields are what corpus
    // pipelines filter and frame-sample on.
    QueryDef("q107_video_meta",
      """SELECT doc_id AS media_id, 'avi' AS format,
        |       CAST(320 + doc_id % 16 AS INT) AS width,
        |       CAST(240 + doc_id % 12 AS INT) AS height,
        |       CAST(100 + doc_id % 50 AS INT) AS n_frames,
        |       CAST(CASE WHEN doc_id % 2 = 0 THEN 33333 ELSE 40000 END AS INT) AS usec_per_frame,
        |       CAST((100 + doc_id % 50) *
        |            CASE WHEN doc_id % 2 = 0 THEN 33333 ELSE 40000 END AS BIGINT) AS duration_us,
        |       CAST(1 + doc_id % 2 AS INT) AS n_streams
        |FROM documents ORDER BY media_id""".stripMargin) { (s, dir) =>
      Multimodal.decodeVideoMeta(Multimodal.syntheticVideo(Tables.documents(s, dir)))
        .orderBy("media_id")
    },

    // Cross-document duplicated-span removal (Lee et al. exact-substring
    // dedup): word 3-grams in >= 5 docs are boilerplate; every token they
    // cover is cut everywhere, order preserved. Integer/string only —
    // engine-exact including the rebuilt text.
    QueryDef("q83_drop_frequent_spans",
      s"""WITH w AS (SELECT doc_id, ${TextOps.wordsSql} AS ws FROM documents),
        |toks AS (SELECT doc_id, i AS pos, ws[i] AS w
        |         FROM (SELECT doc_id, ws, generate_subscripts(ws, 1) AS i FROM w)),
        |sh AS (SELECT doc_id, i AS sp, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
        |       FROM (SELECT doc_id, ws, generate_subscripts(ws, 1) AS i FROM w)
        |       WHERE i <= len(ws) - 2),
        |f AS (SELECT shingle FROM (SELECT shingle, COUNT(DISTINCT doc_id) AS nd
        |                           FROM sh GROUP BY shingle) WHERE nd >= 5),
        |cov AS (SELECT DISTINCT s.doc_id, s.sp + o.o AS pos
        |        FROM sh s JOIN f USING (shingle), (VALUES (0), (1), (2)) o(o)),
        |kept AS (SELECT t.* FROM toks t ANTI JOIN cov c
        |         ON t.doc_id = c.doc_id AND t.pos = c.pos),
        |reb AS (SELECT doc_id, COUNT(*) AS n_kept,
        |               string_agg(w, ' ' ORDER BY pos) AS cleaned_text
        |        FROM kept GROUP BY doc_id)
        |SELECT w.doc_id, CAST(len(w.ws) AS BIGINT) AS n_words,
        |       CAST(COALESCE(reb.n_kept, 0) AS BIGINT) AS n_kept,
        |       CAST(len(w.ws) - COALESCE(reb.n_kept, 0) AS BIGINT) AS n_dropped,
        |       COALESCE(reb.cleaned_text, '') AS cleaned_text
        |FROM w LEFT JOIN reb USING (doc_id)
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      TextAnalysis.dropFrequentSpans(Tables.documents(s, dir), 5L)
        .orderBy("doc_id")
    },

    // Maximal repeated intervals: the reporting side of q83 — covered
    // positions merged into per-doc maximal runs by gaps-and-islands
    // (pos − row_number constant per run). Integer-only.
    QueryDef("q109_repeated_intervals",
      s"""WITH w AS (SELECT doc_id, $W AS ws FROM documents),
        |sh AS (SELECT doc_id, i AS sp, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
        |       FROM (SELECT doc_id, ws, generate_subscripts(ws, 1) AS i FROM w)
        |       WHERE i <= len(ws) - 2),
        |f AS (SELECT shingle FROM (SELECT shingle, COUNT(DISTINCT doc_id) AS nd
        |                           FROM sh GROUP BY shingle) WHERE nd >= 5),
        |cov AS (SELECT DISTINCT s.doc_id, s.sp + o.o AS pos
        |        FROM sh s JOIN f USING (shingle), (VALUES (0), (1), (2)) o(o)),
        |isl AS (SELECT doc_id, pos,
        |               pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS island
        |        FROM cov)
        |SELECT doc_id, CAST(min(pos) AS BIGINT) AS start_pos,
        |       CAST(max(pos) AS BIGINT) AS end_pos,
        |       CAST(COUNT(*) AS BIGINT) AS span_len
        |FROM isl GROUP BY doc_id, island
        |ORDER BY doc_id, start_pos""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.functions.col
      TextAnalysis.repeatedIntervals(Tables.documents(s, dir), 5L)
        .select(col("doc_id"), col("start_pos").cast("long").as("start_pos"),
          col("end_pos").cast("long").as("end_pos"), col("span_len"))
        .orderBy("doc_id", "start_pos")
    },

    // Shard-assignment stats (the plan Storage.exportTrainingShards
    // executes): deterministic md5 shard ids, per-shard doc/token mass
    // and id range — what an export manifest records. Deterministic, so
    // fully oracle-checkable (unlike the filesystem write, specced in
    // StorageSpec).
    QueryDef("q110_shard_stats",
      s"""WITH a AS (
        |  SELECT doc_id, n_chars,
        |         ${TextOps.hash32Sql("CAST(doc_id AS VARCHAR)")} % 8 AS shard
        |  FROM documents)
        |SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |       CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
        |       CAST(MAX(doc_id) AS BIGINT) AS max_doc_id
        |FROM a GROUP BY shard ORDER BY shard""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.functions._
      Tables.documents(s, dir)
        .withColumn("shard",
          pmod(graft.functions.ScalarOps.md5Hash32(col("doc_id").cast("string")), lit(8L)))
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          min(col("doc_id")).as("min_doc_id"),
          max(col("doc_id")).as("max_doc_id"))
        .orderBy("shard")
    },

    // PII redaction: the synthetic corpus carries no contact data, so the
    // query first derives a deterministic contact-laden text from
    // (text, doc_id) — SAME derivation in both engines — then redacts.
    // Counts are pre-replacement; replacement order email → IP → phone is
    // part of the operator contract. Patterns live in TextAnalysis and
    // are restricted to the Java ∩ RE2 regex subset.
    QueryDef("q91_pii_redaction",
      s"""WITH c AS (SELECT doc_id,
        |  text || ' reach user' || CAST(doc_id AS VARCHAR) ||
        |  '@mail' || CAST(doc_id % 7 AS VARCHAR) || '.com or 10.' ||
        |  CAST(doc_id % 256 AS VARCHAR) || '.0.' || CAST(doc_id % 100 AS VARCHAR) ||
        |  ' tel 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') ||
        |  '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '${TextAnalysis.EmailRe}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(text, '${TextAnalysis.Ipv4Re}')) AS BIGINT) AS n_ips,
        |  CAST(len(regexp_extract_all(text, '${TextAnalysis.PhoneRe}')) AS BIGINT) AS n_phones,
        |  regexp_replace(regexp_replace(regexp_replace(text,
        |    '${TextAnalysis.EmailRe}', '<EMAIL>', 'g'),
        |    '${TextAnalysis.Ipv4Re}', '<IP>', 'g'),
        |    '${TextAnalysis.PhoneRe}', '<PHONE>', 'g') AS redacted
        |FROM c ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val contact = concat(col("text"), lit(" reach user"),
        col("doc_id").cast("string"), lit("@mail"),
        (col("doc_id") % 7).cast("string"), lit(".com or 10."),
        (col("doc_id") % 256).cast("string"), lit(".0."),
        (col("doc_id") % 100).cast("string"), lit(" tel 555-"),
        lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"))
      TextAnalysis.redactPii(
        Tables.documents(s, dir).withColumn("text", contact)).orderBy("doc_id")
    },

    // BPE training, iteration zero: frequency-weighted adjacent character
    // pairs over the distinct-word vocabulary — the argmax a BPE trainer
    // merges first is row 1. Corpus-scale work is one word-count agg; the
    // pair explode runs on the Heaps-law-small vocab. (The full merge
    // LOOP is TextAnalysis.bpeLearn, spec-verified — its per-iteration
    // counting is exactly this query.)
    QueryDef("q93_bpe_pairs",
      """WITH t AS (SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
        |           FROM documents),
        |v AS (SELECT w, COUNT(*) AS freq FROM t WHERE len(w) >= 2 GROUP BY w),
        |px AS (SELECT freq, w, unnest(range(1, len(w))) AS i FROM v),
        |p AS (SELECT w[i] || ' ' || w[i+1] AS pair, CAST(SUM(freq) AS BIGINT) AS cnt
        |      FROM px GROUP BY 1)
        |SELECT pair, cnt,
        |       CAST(row_number() OVER (ORDER BY cnt DESC, pair) AS INT) AS rk
        |FROM p QUALIFY rk <= 50 ORDER BY rk""".stripMargin) { (s, dir) =>
      TextAnalysis.bpePairCounts(Tables.documents(s, dir), 50).orderBy("rk")
    },

    // BPE encode over the corpus with 20 learned merges: segmentation
    // computed once per DISTINCT word and broadcast back — the
    // corpus-scale pass never runs the sequential merge loop. The merge
    // loop itself is not SQL-expressible (ordered rewriting), so this is
    // a rows-only entry by contract; TextAnalysisSpec pins the merge
    // sequence and the apply semantics on hand-computed fixtures.
    QueryDef.sparkOnly("q96_bpe_apply") { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val merges = TextAnalysis.bpeLearn(docs, nMerges = 20)
      TextAnalysis.bpeApply(docs, merges).orderBy("doc_id")
    },

    // Distributed BPE training (8 merge rounds): the vocabulary never
    // leaves the executors — each round is one pair-count agg over the
    // word dim + a ONE-ROW argmax collect + a map-side greedy re-segment
    // fold. The oracle replays all 8 rounds: per round the pair argmax,
    // then greedy non-overlapping match selection as gaps-and-islands +
    // parity (consecutive matches overlap only for equal pairs like
    // (a,a); within an island the 1st, 3rd, … merge — exactly the
    // left-to-right fold), then the segmentation rebuilt positionally.
    // MATERIALIZED pins each round's state, or DuckDB inlines the CTE
    // chain into 2^rounds plan copies.
    QueryDef("q123_bpe_train",
      bpeReplaySeg(BpeRounds) + "\n" +
        (1 to BpeRounds).map(r => s"SELECT $r AS rk, lhs, rhs, cnt FROM best_$r")
          .mkString("SELECT * FROM (", " UNION ALL ", ") ORDER BY rk")) { (s, dir) =>
      TextAnalysis.bpeLearnDistributed(Tables.documents(s, dir), BpeRounds)
        .orderBy("rk")
    },

    // Corpus encoding under the TRAINED segmentation: per document the
    // word count and the BPE token count after the 8 learned merges —
    // q96's shape, but against the distributed trainer's final state and
    // fully oracle-replayed (the merge loop itself was the reason q96 is
    // rows-only). Words shorter than the trainer's 2-char floor encode
    // as themselves (1 subtoken). The corpus-side pass is one explode +
    // word-keyed join against the vocab-dim segmentation + doc-keyed agg.
    QueryDef("q124_bpe_segment",
      bpeReplaySeg(BpeRounds) +
        s""",
        |t AS (SELECT doc_id, unnest($W) AS w FROM documents)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
        |       CAST(SUM(coalesce(len(s.toks), 1)) AS BIGINT) AS n_bpe_tokens
        |FROM t LEFT JOIN seg_$BpeRounds s USING (w)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val seg = TextAnalysis.bpeTrainState(docs, BpeRounds)._2
      docs.select(col("doc_id"), explode(TextOps.words(col("text"))).as("w"))
        .join(seg.select(col("w"), size(col("toks")).cast("long").as("n_subtokens")),
          Seq("w"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"),
          sum(coalesce(col("n_subtokens"), lit(1L))).as("n_bpe_tokens"))
        .orderBy("doc_id")
    },

    // Distributed WordPiece training (8 merge rounds): BPE's loop shape
    // — pair-count agg + one-row argmax collect + map-side re-segment —
    // ranked by the likelihood score cnt/(cnt_lhs·cnt_rhs) instead of
    // raw count, which is what makes it WordPiece (pairs whose parts
    // rarely occur apart win over merely-frequent pairs). The score is
    // one division of exact integers, so the oracle replays all 8
    // argmaxes hash-exactly, score included.
    QueryDef("q170_wordpiece_train",
      wpReplaySeg(WpRounds) + "\n" +
        (1 to WpRounds).map(r =>
          s"SELECT $r AS rk, lhs, rhs, cnt, score FROM best_$r")
          .mkString("SELECT * FROM (", " UNION ALL ", ") ORDER BY rk")) { (s, dir) =>
      TextAnalysis.wordpieceLearnDistributed(Tables.documents(s, dir), WpRounds)
        .orderBy("rk")
    },

    // Corpus encoding under the trained WordPiece segmentation — q124's
    // shape against the likelihood-trained state: per document the word
    // count and subtoken count after the 8 learned merges; sub-2-char
    // words encode as themselves. One explode + word-keyed join against
    // the vocab-dim segmentation + doc-keyed agg.
    QueryDef("q171_wordpiece_segment",
      wpReplaySeg(WpRounds) +
        s""",
        |t AS (SELECT doc_id, unnest($W) AS w FROM documents)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
        |       CAST(SUM(coalesce(len(s.toks), 1)) AS BIGINT) AS n_wp_tokens
        |FROM t LEFT JOIN seg_$WpRounds s USING (w)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val seg = TextAnalysis.wordpieceTrainState(docs, WpRounds)._2
      docs.select(col("doc_id"), explode(TextOps.words(col("text"))).as("w"))
        .join(seg.select(col("w"), size(col("toks")).cast("long").as("n_subtokens")),
          Seq("w"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"),
          sum(coalesce(col("n_subtokens"), lit(1L))).as("n_wp_tokens"))
        .orderBy("doc_id")
    },

    // WordPiece INFERENCE: greedy longest-match against the trained
    // vocabulary (alphabet + merge products) — the serving tokenizer,
    // which can segment differently from the merge-derived state. The
    // variable-iteration greedy loop is not SQL-expressible (the q96
    // contract), so this is rows-only; TextAnalysisSpec pins the greedy
    // semantics, the train-vs-apply divergence, and UNK handling on
    // hand-computed fixtures.
    QueryDef.sparkOnly("q172_wordpiece_apply") { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val (merges, seg) = TextAnalysis.wordpieceTrainState(docs, WpRounds)
      TextAnalysis.wordpieceApply(docs, TextAnalysis.wordpieceVocab(seg, merges))
        .orderBy("doc_id")
    },

    // C4-style URL curation: the corpus carries no URLs, so the query
    // derives one deterministically from (source, doc_id) — the query
    // string varies per doc while the path repeats, so normalization
    // (strip ?…/#…) creates real duplicate groups; src1/src3 domains are
    // blocklisted; min-doc_id survivor per normalized URL.
    QueryDef("q97_url_curation",
      """WITH u AS (SELECT doc_id,
        |  'https://' || source || '.example.com/docs/' ||
        |  CAST(doc_id % 40 AS VARCHAR) || '?session=' || CAST(doc_id AS VARCHAR) ||
        |  '#top' AS url FROM documents),
        |n AS (SELECT doc_id,
        |  regexp_replace(url, '[?#].*$', '') AS norm_url,
        |  lower(regexp_extract(regexp_replace(url, '[?#].*$', ''),
        |        '^https?://([^/]+)', 1)) AS domain
        |  FROM u)
        |SELECT norm_url, domain, CAST(MIN(doc_id) AS BIGINT) AS doc_id,
        |       CAST(COUNT(*) AS BIGINT) AS n_dups
        |FROM n
        |WHERE domain NOT IN ('src1.example.com', 'src3.example.com')
        |GROUP BY norm_url, domain
        |ORDER BY norm_url""".stripMargin) { (s, dir) =>
      import s.implicits._
      val urls = Tables.documents(s, dir).select(col("doc_id"),
        concat(lit("https://"), col("source"), lit(".example.com/docs/"),
          (col("doc_id") % 40).cast("string"), lit("?session="),
          col("doc_id").cast("string"), lit("#top")).as("url"))
      val blocklist = Seq("src1.example.com", "src3.example.com").toDF("domain")
      TextAnalysis.urlCurate(urls, blocklist).orderBy("norm_url")
    },

    // Robots-style path-prefix filtering over the q97-derived URLs:
    // '/docs/1' disallows /docs/1 and /docs/10–19 (prefix semantics,
    // exactly robots.txt's), '/docs/33' a single path. Rule dim
    // broadcast; non-equi prefix anti-join.
    QueryDef("q98_robots_filter",
      """WITH u AS (SELECT doc_id,
        |  'https://' || source || '.example.com/docs/' ||
        |  CAST(doc_id % 40 AS VARCHAR) || '?session=' || CAST(doc_id AS VARCHAR) ||
        |  '#top' AS url FROM documents),
        |p AS (SELECT doc_id,
        |  regexp_replace(regexp_replace(url, '[?#].*$', ''), '^https?://[^/]*', '')
        |    AS path FROM u)
        |SELECT doc_id, path FROM p
        |WHERE NOT EXISTS (SELECT 1 FROM (VALUES ('/docs/1'), ('/docs/33')) r(prefix)
        |                  WHERE starts_with(p.path, prefix))
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val urls = Tables.documents(s, dir).select(col("doc_id"),
        concat(lit("https://"), col("source"), lit(".example.com/docs/"),
          (col("doc_id") % 40).cast("string"), lit("?session="),
          col("doc_id").cast("string"), lit("#top")).as("url"))
      val disallow = Seq("/docs/1", "/docs/33").toDF("prefix")
      TextAnalysis.robotsFilter(urls, disallow).orderBy("doc_id")
    },

    // Curation funnel: cumulative survival counts through q64's stages
    // (quality gate → language gate → exact dedup) — the observability
    // report a production curation run publishes beside its output. One
    // fused verdict projection + one fingerprint window + one global agg.
    QueryDef("q99_curation_funnel",
      s"""WITH f AS (
        |  SELECT doc_id, text,
        |         CAST(length(text) AS BIGINT) AS n_chars_m,
        |         CAST(length($W) AS BIGINT) AS n_words,
        |         CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS BIGINT) AS n_punct,
        |         CAST(length(list_filter($W, w -> list_contains(['the','a','of','and','to','in','is'], w))) AS BIGINT) AS n_stop,
        |         CAST(length(list_filter($W, w -> list_contains(['the','and','a','of'], w))) AS BIGINT) AS n_en
        |  FROM documents),
        |q AS (
        |  SELECT doc_id, text,
        |         (CASE WHEN n_words > 0 THEN CAST(n_stop AS DOUBLE) / n_words ELSE 0.0 END) * 0.4
        |           + (CASE WHEN n_words BETWEEN 50 AND 200 THEN 1.0 ELSE 0.0 END) * 0.3
        |           + (1.0 - CASE WHEN n_chars_m > 0 THEN CAST(n_punct AS DOUBLE) / n_chars_m ELSE 0.0 END) * 0.3 AS quality_score,
        |         CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
        |              WHEN (CASE WHEN n_words > 0 THEN CAST(n_en AS DOUBLE) / n_words ELSE 0.0 END) >= 0.03 THEN 'en'
        |              ELSE 'unknown' END AS predicted_lang
        |  FROM f),
        |v AS (SELECT doc_id, text,
        |             quality_score >= 0.55 AS pass_q,
        |             (quality_score >= 0.55 AND predicted_lang = 'en') AS pass_l
        |      FROM q),
        |v2 AS (SELECT *,
        |              min(CASE WHEN pass_l THEN doc_id END)
        |                OVER (PARTITION BY md5(${TextOps.normalizedSql})) AS canon
        |       FROM v),
        |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS total,
        |             CAST(SUM(CASE WHEN pass_q THEN 1 ELSE 0 END) AS BIGINT) AS s_q,
        |             CAST(SUM(CASE WHEN pass_l THEN 1 ELSE 0 END) AS BIGINT) AS s_l,
        |             CAST(SUM(CASE WHEN pass_l AND doc_id = canon THEN 1 ELSE 0 END) AS BIGINT) AS s_d
        |      FROM v2)
        |SELECT stage, docs_in, docs_out, docs_in - docs_out AS dropped FROM (
        |  SELECT '1_total' AS stage, total AS docs_in, total AS docs_out FROM a
        |  UNION ALL SELECT '2_quality', total, s_q FROM a
        |  UNION ALL SELECT '3_language', s_q, s_l FROM a
        |  UNION ALL SELECT '4_exact_dedup', s_l, s_d FROM a)
        |ORDER BY stage""".stripMargin) { (s, dir) =>
      TextAnalysis.curationFunnel(Tables.documents(s, dir), 0.55, "en")
        .orderBy("stage")
    },

    // HTML → text normalization (the C4/CCNet extraction step). The
    // corpus text is plain, so the markup is synthesized in-query from a
    // closed form (the q103 WAV-bytes pattern) — entities in fixed
    // positions, no replace ambiguity — and the operator under test is
    // the stripper: tag drop, entity decode (&amp; LAST — '&lt;x&gt;'
    // decodes to literal '<x>' because tags are already gone), collapse.
    QueryDef("q119_html_strip",
      """WITH h AS (SELECT doc_id,
        |   '<html><head><title>d</title></head><body><p class="doc">' || text ||
        |   ' &amp; tail&nbsp;&lt;x&gt;</p><br/><div>footer</div></body></html>' AS html
        |           FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(html, '<[^>]*>')) AS BIGINT) AS n_tags,
        |  CAST(len(regexp_extract_all(html, '&(amp|lt|gt|quot|nbsp|#39);')) AS BIGINT) AS n_entities,
        |  trim(regexp_replace(
        |    replace(
        |      replace(
        |        replace(
        |          replace(
        |            replace(
        |              replace(regexp_replace(html, '<[^>]*>', ' ', 'g'),
        |                '&lt;', '<'),
        |              '&gt;', '>'),
        |            '&quot;', '"'),
        |          '&#39;', ''''),
        |        '&nbsp;', ' '),
        |      '&amp;', '&'),
        |    '\s+', ' ', 'g')) AS text_clean
        |FROM documents JOIN h USING (doc_id)
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val wrapped = Tables.documents(s, dir).select(col("doc_id"),
        concat(lit("<html><head><title>d</title></head><body><p class=\"doc\">"),
          col("text"),
          lit(" &amp; tail&nbsp;&lt;x&gt;</p><br/><div>footer</div></body></html>"))
          .as("html"))
      TextAnalysis.normalizeHtml(wrapped).orderBy("doc_id")
    },

    // Train/val distribution drift per language: TVD between the splits'
    // unigram distributions (q53 hash rule). No ln on the cross-engine
    // path; per-term |Δp| quantizes to round_even(·2⁴⁰) longs (the q79
    // contract, Σ ≤ 2 — overflow-free at any scale) so the drift number
    // hash-matches exactly.
    QueryDef("q122_distribution_drift",
      s"""WITH toks AS (SELECT d.lang, d.doc_id, unnest($W) AS token FROM documents d),
        |s AS (SELECT lang, token,
        |             CAST(SUM(CASE WHEN (${TextOps.hash32Sql("CAST(doc_id AS VARCHAR)")} % 100) < 90
        |                      THEN 1 ELSE 0 END) AS BIGINT) AS c_t,
        |             CAST(SUM(CASE WHEN (${TextOps.hash32Sql("CAST(doc_id AS VARCHAR)")} % 100) < 90
        |                      THEN 0 ELSE 1 END) AS BIGINT) AS c_v
        |      FROM toks GROUP BY 1, 2),
        |t AS (SELECT lang, CAST(SUM(c_t) AS BIGINT) AS n_train_tokens,
        |             CAST(SUM(c_v) AS BIGINT) AS n_val_tokens,
        |             COUNT(*) AS vocab
        |      FROM s GROUP BY lang
        |      HAVING SUM(c_t) > 0 AND SUM(c_v) > 0),
        |q AS (SELECT s.lang,
        |             CAST(round_even(abs(s.c_t / t.n_train_tokens - s.c_v / t.n_val_tokens)
        |                  * 1099511627776.0, 0) AS BIGINT) AS qq
        |      FROM s JOIN t USING (lang))
        |SELECT lang, t.n_train_tokens, t.n_val_tokens, t.vocab,
        |       CAST(SUM(q.qq) AS DOUBLE) / 1099511627776.0 / 2.0 AS tvd
        |FROM q JOIN t USING (lang)
        |GROUP BY 1, 2, 3, 4
        |ORDER BY lang""".stripMargin) { (s, dir) =>
      TextAnalysis.distributionDrift(Tables.documents(s, dir)).orderBy("lang")
    },

    // Unigram-LM tokenizer, integer-exact layer (Kudo 2018 seed stage;
    // the EM refinement is float and lives in UnigramLmSpec). Seed
    // vocabulary: every substring piece scored by freq-weighted
    // occurrence count — all single chars + top-TopPieces multis.
    QueryDef("q126_unigram_vocab",
      s"""WITH t AS (SELECT unnest($W) AS w FROM documents),
        |v AS (SELECT w, COUNT(*) AS freq FROM t WHERE len(w) >= 2 GROUP BY w),
        |px AS (SELECT freq, w, unnest(range(1, len(w)+1)) AS i FROM v),
        |c AS (SELECT substr(w, i, l.l) AS piece, CAST(SUM(freq) AS BIGINT) AS cnt
        |      FROM px CROSS JOIN (SELECT unnest(range(1, ${UnigramLm.MaxPiece + 1})) AS l) l
        |      WHERE i + l.l - 1 <= len(w) GROUP BY 1)
        |SELECT piece, cnt FROM c WHERE len(piece) = 1
        |UNION ALL
        |SELECT piece, cnt FROM (
        |  SELECT piece, cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, piece) AS rk
        |  FROM c WHERE len(piece) >= 2) WHERE rk <= ${UnigramLm.TopPieces}
        |ORDER BY cnt DESC, piece""".stripMargin) { (s, dir) =>
      UnigramLm.seedVocab(Tables.documents(s, dir))
        .orderBy(col("cnt").desc, col("piece"))
    },

    // Viterbi segmentation of the word dim under the q126 vocabulary:
    // fewest pieces, then highest count-sum, then longest piece at each
    // cell. Spark runs the DP as one `aggregate` HOF over a broadcast
    // literal map (interpreted inside the codegen'd projection — a
    // vocab-dim-sized stage); the oracle replays it as an unrolled
    // per-position DP (the q123/q124 replay style) plus a recursive-CTE
    // backtrack walk.
    QueryDef("q127_unigram_viterbi",
      s"""$unigramDpCtes,
        |walk(w, pos, toks) AS (
        |  SELECT d.w, CAST(len(d.w) AS INT), []::VARCHAR[] FROM wv d
        |  UNION ALL
        |  SELECT k.w, k.pos - d.l, list_prepend(substr(k.w, k.pos - d.l + 1, d.l), k.toks)
        |  FROM walk k JOIN dp d ON d.w = k.w AND d.pos = k.pos WHERE k.pos > 0)
        |SELECT v.w, CAST(v.freq AS BIGINT) AS freq, d.score,
        |       CAST(d.ntoks AS INT) AS n_tokens,
        |       array_to_string(k.toks, ' ') AS toks
        |FROM wv v
        |JOIN dp d ON d.w = v.w AND d.pos = len(v.w)
        |JOIN walk k ON k.w = v.w AND k.pos = 0
        |ORDER BY v.w""".stripMargin) { (s, dir) =>
      UnigramLm.viterbiSegment(Tables.documents(s, dir)).orderBy("w")
    },

    // Trained-unigram corpus encoding (the q124 analog for this
    // tokenizer family): per-doc word count and unigram-token count
    // under the q127 segmentation; words outside the dim (sub-2-char or
    // over-MaxWord) encode as themselves. Corpus pass = one explode +
    // word-keyed join against the word-dim segmentation + doc agg.
    // Content-defined chunking dedup: Rabin-style window-hash boundaries
    // (local content only, so insertions re-synchronize at the next
    // boundary — the property q88's fixed windows lack), then q125-style
    // first-occurrence chunk dedup. Pure integer char arithmetic; the
    // oracle recomputes every boundary from the same polynomial.
    QueryDef("q131_cdc_dedup", cdcOracle) { (s, dir) =>
      TextAnalysis.cdcDedup(Tables.documents(s, dir)).orderBy("doc_id")
    },

    // REAL GIF decode: GIF89a bytes with a 256-entry grayscale palette
    // are synthesized executor-side (hand-written variable-width LZW
    // COMPRESSION — the first compressed hand codec), decoded back by
    // the hand-written LZW decoder, and every feature is recomputed by
    // the oracle from the GrayPattern formula alone (pixel index IS the
    // gray value, so r=g=b=(seed+3i)%256). The compression round-trip is
    // load-bearing: a single bit-packing or width-bump error corrupts
    // every pixel sum.
    QueryDef("q130_gif_decode",
      """WITH m AS (
        |  SELECT doc_id, CAST(doc_id % 9973 AS INT) AS seed,
        |         CAST(8 + doc_id % 17 AS INT) AS w,
        |         CAST(8 + doc_id % 11 AS INT) AS h
        |  FROM documents),
        |px AS (
        |  SELECT m.doc_id, m.w, m.h, gi.i, (seed + 3*i) % 256 AS v
        |  FROM m, (SELECT unnest(range(0, 432)) AS i) gi
        |  WHERE gi.i < m.w * m.h)
        |SELECT doc_id AS media_id, 'gif' AS format, w AS width, h AS height,
        |       CAST(SUM(v) AS BIGINT) AS sum_r,
        |       CAST(SUM(v) AS BIGINT) AS sum_g,
        |       CAST(SUM(v) AS BIGINT) AS sum_b,
        |       CAST(SUM(CASE WHEN i < w THEN v END) AS BIGINT) AS row0_sum_r,
        |       CAST(SUM(CASE WHEN i < w THEN v END) AS BIGINT) AS row0_sum_g,
        |       CAST(SUM(CASE WHEN i < w THEN v END) AS BIGINT) AS row0_sum_b,
        |       CAST(SUM(v) AS DOUBLE) / (w * h) AS mean_r,
        |       CAST(SUM(v) AS DOUBLE) / (w * h) AS mean_g,
        |       CAST(SUM(v) AS DOUBLE) / (w * h) AS mean_b
        |FROM px GROUP BY doc_id, w, h ORDER BY media_id""".stripMargin) { (s, dir) =>
      Multimodal.decodeMedia(Multimodal.syntheticGifMedia(Tables.documents(s, dir)))
        .orderBy("media_id")
    },

    // Compressibility quality signal: per-doc DEFLATE ratio (the
    // compression heuristic used beside q62's repetition counts to drop
    // template/machine-generated spam). DEFLATE is deterministic on a
    // fixed zlib build but not SQL-expressible → rows-only by contract;
    // TextAnalysisSpec pins the behavioral invariants (repetitive <
    // prose < shuffled-entropy ordering, partition invariance,
    // self-concatenation compresses sublinearly).
    QueryDef.sparkOnly("q129_compressibility") { (s, dir) =>
      TextAnalysis.compressibility(Tables.documents(s, dir)).orderBy("doc_id")
    },

    QueryDef("q128_unigram_encode",
      s"""$unigramDpCtes,
        |fin AS (SELECT w, ntoks FROM dp JOIN wv USING (w) WHERE pos = len(w)),
        |t2 AS (SELECT doc_id, unnest($W) AS w FROM documents)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
        |       CAST(SUM(coalesce(f.ntoks, 1)) AS BIGINT) AS n_unigram_tokens
        |FROM t2 LEFT JOIN fin f USING (w)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      UnigramLm.encodeCorpus(Tables.documents(s, dir)).orderBy("doc_id")
    },

    // Chi-square collocations (round 6): corpus-level bigram association
    // — which word pairs co-occur far beyond chance (q78 scores DOCS
    // under a bigram model; this MINES the model's strong pairs). The
    // 2×2 contingency per bigram lives entirely in bigram space
    // (c1 = bigrams starting with w1, c2 = ending with w2, N = total),
    // all counts exact integers; chi2 is computed as ONE double
    // expression with identical operation order in both engines, so the
    // doubles hash-match (the cosine-fold convention). Support ≥ 5,
    // top-30 by (chi2, bigram).
    QueryDef("q152_collocations",
      s"""WITH t AS (SELECT doc_id, ${TextOps.wordsSql} AS ws FROM documents),
        |bg AS (SELECT unnest(${TextOps.bigramsSql("ws")}) AS bigram FROM t),
        |sp AS (SELECT bigram, string_split(bigram, ' ')[1] AS w1,
        |              string_split(bigram, ' ')[2] AS w2 FROM bg),
        |a AS (SELECT bigram, ANY_VALUE(w1) AS w1, ANY_VALUE(w2) AS w2,
        |             CAST(COUNT(*) AS BIGINT) AS a FROM sp GROUP BY bigram),
        |c1 AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1 FROM sp GROUP BY w1),
        |c2 AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS c2 FROM sp GROUP BY w2),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM sp),
        |sc AS (SELECT bigram, a.a, c1.c1, c2.c2, n.n,
        |              a.a * (n.n - c1.c1 - c2.c2 + a.a) - (c1.c1 - a.a) * (c2.c2 - a.a) AS x
        |       FROM a JOIN c1 USING (w1) JOIN c2 USING (w2) CROSS JOIN n
        |       WHERE a.a >= 5 AND c1.c1 < n.n AND c2.c2 < n.n),
        |chi AS (SELECT bigram, a,
        |               CAST(n AS DOUBLE) * CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
        |               / (CAST(c1 AS DOUBLE) * CAST(n - c1 AS DOUBLE)
        |                  * CAST(c2 AS DOUBLE) * CAST(n - c2 AS DOUBLE)) AS chi2
        |        FROM sc)
        |SELECT bigram, a AS support, chi2,
        |       CAST(ROW_NUMBER() OVER (ORDER BY chi2 DESC, bigram) AS INT) AS rk
        |FROM chi QUALIFY rk <= 30 ORDER BY rk""".stripMargin) { (s, dir) =>
      val sp = Tables.documents(s, dir)
        .withColumn("ws", TextOps.words(col("text")))
        .select(explode(TextOps.bigrams("ws")).as("bigram"))
        .withColumn("w1", split(col("bigram"), " ").getItem(0))
        .withColumn("w2", split(col("bigram"), " ").getItem(1))
      val aDf = sp.groupBy("bigram")
        .agg(first(col("w1")).as("w1"), first(col("w2")).as("w2"),
          count(lit(1)).as("a"))
      val c1 = sp.groupBy("w1").agg(count(lit(1)).as("c1"))
      val c2 = sp.groupBy("w2").agg(count(lit(1)).as("c2"))
      val n = sp.count() // bounded scalar (total bigram tokens)
      val sc = aDf
        .join(c1, Seq("w1")).join(c2, Seq("w2"))
        .withColumn("n", lit(n))
        .filter(col("a") >= 5 && col("c1") < col("n") && col("c2") < col("n"))
        .withColumn("x",
          col("a") * (col("n") - col("c1") - col("c2") + col("a"))
            - (col("c1") - col("a")) * (col("c2") - col("a")))
        .withColumn("chi2",
          col("n").cast("double") * col("x").cast("double") * col("x").cast("double")
            / (col("c1").cast("double") * (col("n") - col("c1")).cast("double")
              * col("c2").cast("double") * (col("n") - col("c2")).cast("double")))
      sc.select(col("bigram"), col("a").as("support"), col("chi2"))
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("chi2").desc, col("bigram"))).cast("int"))
        .filter(col("rk") <= 30)
        .orderBy("rk")
    },

    // BM25 lexical retrieval (integer-scaled ratio-idf variant — see
    // Retrieval.bm25TopK): the bounded query docs (doc_id < 5) retrieve
    // their top-10 "more-like-this" neighbors over shared terms. Every
    // per-term score is one truncating division of exact BIGINTs, so
    // the per-(query, doc) SUM is order-independent and the ranking
    // hash-matches cross-engine — the property the float BM25 lacks.
    QueryDef("q188_bm25_topk",
      s"""WITH ws AS (SELECT doc_id, unnest($W) AS term FROM documents),
        |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        |       FROM ws GROUP BY doc_id, term),
        |st AS (SELECT doc_id, term, tf,
        |              CAST(SUM(tf) OVER (PARTITION BY doc_id) AS BIGINT) AS dl,
        |              CAST(COUNT(*) OVER (PARTITION BY term) AS BIGINT) AS df
        |       FROM tf),
        |c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
        |             CAST(SUM(len($W)) AS BIGINT) AS sdl FROM documents),
        |qt AS (SELECT DISTINCT doc_id AS q_id, term
        |       FROM ws WHERE doc_id < 5),
        |sc AS (SELECT qt.q_id, st.doc_id, st.tf,
        |              ((2 * n_docs - 2 * df + 1) * 1000) // (2 * df + 1) AS idf1000,
        |              250 + (750 * dl * n_docs) // sdl AS norm
        |       FROM st JOIN qt USING (term), c
        |       WHERE st.doc_id <> qt.q_id),
        |agg AS (SELECT q_id, doc_id,
        |        CAST(SUM((idf1000 * 2200000 * tf)
        |                 // (tf * 1000000 + 1200 * norm)) AS BIGINT) AS score1000,
        |        CAST(COUNT(*) AS BIGINT) AS n_terms
        |        FROM sc GROUP BY q_id, doc_id)
        |SELECT q_id, doc_id AS n_id, score1000, n_terms,
        |       CAST(row_number() OVER (PARTITION BY q_id
        |            ORDER BY score1000 DESC, doc_id) AS INT) AS rk
        |FROM agg QUALIFY rk <= 10
        |ORDER BY q_id, rk""".stripMargin) { (s, dir) =>
      graft.operators.Retrieval.bm25TopK(Tables.documents(s, dir),
        queryMaxId = 5L, k = 10).orderBy("q_id", "rk")
    },

    // WARC crawl-container round-trip (sources/Warc.scala): the corpus
    // written as per-record gzip-member WARC/1.0 response records (one
    // blob per partition — the .warc.gz shard layout), then parsed back
    // by the Content-Length-framed reader; emitted rows come from the
    // PARSED bytes. The oracle states what a lossless round trip must
    // recover: URI, HTTP status, and the UTF-8 byte length of the body.
    QueryDef("q190_warc_roundtrip",
      """SELECT doc_id,
        |       'https://' || source || '.example.com/docs/' ||
        |         CAST(doc_id AS VARCHAR) AS url,
        |       200 AS http_status,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS content_length
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.sources.Warc.roundTrip(Tables.documents(s, dir)).orderBy("doc_id")
    },

    // .warc.zst round-trip (Common Crawl's newer shard format): same
    // lossless-recovery oracle as q190, but each partition blob is a
    // leading skippable-frame dictionary (itself zstd-compressed) + one
    // zstd frame per record compressed AGAINST that dictionary — the
    // reader must extract the dict, decode it, and continuous-decode
    // the member frames with it before Content-Length framing even
    // starts. Codec is zstd-jni, the library Spark ships for its own
    // zstd paths.
    QueryDef("q222_warc_zstd_roundtrip",
      """SELECT doc_id,
        |       'https://' || source || '.example.com/docs/' ||
        |         CAST(doc_id AS VARCHAR) AS url,
        |       200 AS http_status,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS content_length
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.sources.Warc.roundTripZstd(Tables.documents(s, dir)).orderBy("doc_id")
    },

    // TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank over
    // the word co-occurrence graph — adjacent content words (len ≥ 3)
    // are edges; the stationary rank surfaces the corpus's central
    // vocabulary. Composes q138's integer PageRank verbatim (fixed-point
    // BIGINT ranks, truncating division), so five unrolled rounds
    // hash-match cross-engine; top-30 by rank.
    QueryDef("q194_textrank", {
      val rounds = (1 to 5).map { r =>
        val p = r - 1
        s"""r_$r AS (SELECT adj.dst AS node,
          |       150000000 + (85 * CAST(SUM(r_$p.rank_fp // adj.outdeg) AS BIGINT)) // 100 AS rank_fp
          |       FROM adj JOIN r_$p ON adj.src = r_$p.node GROUP BY 1)""".stripMargin
      }.mkString(",\n")
      s"""WITH ws0 AS (SELECT $W AS ws FROM documents),
        |pr AS (SELECT ws[i] AS w1, ws[i+1] AS w2
        |       FROM (SELECT ws, unnest(range(1, len(ws))) AS i FROM ws0)),
        |e0 AS (SELECT DISTINCT w1 AS src, w2 AS dst FROM pr
        |       WHERE len(w1) >= 3 AND len(w2) >= 3 AND w1 <> w2),
        |e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
        |d AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg FROM e GROUP BY 1),
        |adj AS (SELECT e.src, e.dst, d.outdeg FROM e JOIN d ON e.src = d.src),
        |r_0 AS (SELECT src AS node, CAST(1000000000 AS BIGINT) AS rank_fp FROM d),
        |$rounds
        |SELECT node AS word, rank_fp,
        |       CAST(row_number() OVER (ORDER BY rank_fp DESC, node) AS INT) AS rk
        |FROM r_5 QUALIFY rk <= 30 ORDER BY rk""".stripMargin
    }) { (s, dir) =>
      val pairs = Tables.documents(s, dir)
        .select(TextOps.words(col("text")).as("ws"))
        .select(explode(expr(
          "CASE WHEN size(ws) >= 2 THEN transform(sequence(1, size(ws) - 1), " +
            "i -> struct(ws[i-1] AS w1, ws[i] AS w2)) ELSE array() END")).as("p"))
        .select(col("p.w1").as("src"), col("p.w2").as("dst"))
        .filter(length(col("src")) >= 3 && length(col("dst")) >= 3 &&
          col("src") =!= col("dst"))
      graft.operators.GraphOps.pageRankInt(pairs, iters = 5)
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("rank_fp").desc, col("node")))
          .cast(org.apache.spark.sql.types.IntegerType))
        .filter(col("rk") <= 30)
        .select(col("node").as("word"), col("rank_fp"), col("rk"))
        .orderBy("rk")
    },

    // JSONL ingest round trip (sources/Jsonl.scala): the corpus
    // serialized to per-partition JSONL shards with deterministic
    // truncated lines injected (the mid-write crash artifact), read
    // back under the PERMISSIVE-with-accounting contract — a bad line
    // neither kills the job (FAILFAST at 100 TB = one line aborts
    // everything) nor vanishes (DROPMALFORMED loses data silently); it
    // groups under NULL lang and is COUNTED. The oracle states what the
    // round trip must recover: per-lang row counts and exact char mass,
    // plus the corrupt-line ledger.
    QueryDef("q201_jsonl_roundtrip",
      """SELECT lang, n_rows, n_corrupt, sum_chars FROM (
        |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |         CAST(0 AS BIGINT) AS n_corrupt,
        |         CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |  FROM documents GROUP BY lang
        |  UNION ALL
        |  SELECT NULL, CAST(COUNT(*) AS BIGINT), CAST(COUNT(*) AS BIGINT),
        |         CAST(0 AS BIGINT)
        |  FROM documents WHERE doc_id % 50 = 0 HAVING COUNT(*) > 0)
        |ORDER BY lang NULLS FIRST""".stripMargin) { (s, dir) =>
      graft.sources.Jsonl.roundTrip(Tables.documents(s, dir)).orderBy("lang")
    },

    // Vocabulary coverage curve: what fraction of corpus TOKEN MASS do
    // the top-k vocabulary entries cover (k = 10/20/30/50) — the number
    // a vocab-size decision actually needs (Heaps/Zipf make the curve
    // steep; the tail buys almost nothing). Exact integers: token
    // counts, frequency-ranked cumulative sums, and a 10⁶-scaled
    // coverage ratio via truncating division. Vocab ranking is a
    // vocab-dim window, never a corpus sort. A k beyond the vocabulary
    // size is omitted — coverage is already total there (the fixture's
    // 30-word vocab drops the k=50 row in both engines).
    QueryDef("q207_vocab_coverage",
      s"""WITH wx AS (SELECT unnest($W) AS w FROM documents),
        |v AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM wx GROUP BY w),
        |t AS (SELECT CAST(SUM(c) AS BIGINT) AS total FROM v),
        |r AS (SELECT w, c,
        |             CAST(row_number() OVER (ORDER BY c DESC, w) AS BIGINT) AS rk,
        |             CAST(SUM(c) OVER (ORDER BY c DESC, w
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |                  AS BIGINT) AS cum
        |      FROM v)
        |SELECT ks.k, r.cum AS covered, t.total,
        |       (r.cum * 1000000) // t.total AS coverage_1e6
        |FROM (SELECT unnest([10, 20, 30, 50]) AS k) ks
        |JOIN r ON r.rk = ks.k, t
        |ORDER BY ks.k""".stripMargin) { (s, dir) =>
      val v = Tables.documents(s, dir)
        .select(explode(TextOps.words(col("text"))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c"))
      val wRank = org.apache.spark.sql.expressions.Window
        .orderBy(col("c").desc, col("w"))
      val total = v.agg(sum("c").as("total"))
      val r = v.withColumn("rk", row_number().over(wRank).cast("long"))
        .withColumn("cum", sum("c").over(
          wRank.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      import s.implicits._
      r.join(Seq(10L, 20L, 30L, 50L).toDF("k"), col("rk") === col("k"))
        .crossJoin(broadcast(total))
        .select(col("k"), col("cum").as("covered"), col("total"),
          expr("(cum * 1000000) div total").as("coverage_1e6"))
        .orderBy("k")
    },

    // Dataset card: the one-frame release summary every shared corpus
    // ships — document/token/char totals, language and source
    // cardinalities, exact duplicate mass (q30's exact-dedup surplus),
    // and length extremes, as (metric, value) rows. Each line is one
    // bounded aggregation; the card is the artifact a release pipeline
    // versions beside the shards.
    QueryDef("q216_dataset_card",
      s"""WITH base AS (SELECT doc_id, lang, source, n_chars,
        |                     CAST(len($W) AS BIGINT) AS n_words, text
        |              FROM documents),
        |dup AS (SELECT CAST(SUM(cnt - 1) AS BIGINT) AS surplus
        |        FROM (SELECT COUNT(*) AS cnt FROM base GROUP BY text))
        |SELECT metric, value FROM (
        |  SELECT 'n_docs' AS metric, CAST(COUNT(*) AS BIGINT) AS value FROM base
        |  UNION ALL SELECT 'n_tokens', CAST(SUM(n_words) AS BIGINT) FROM base
        |  UNION ALL SELECT 'n_chars', CAST(SUM(n_chars) AS BIGINT) FROM base
        |  UNION ALL SELECT 'n_langs', CAST(COUNT(DISTINCT lang) AS BIGINT) FROM base
        |  UNION ALL SELECT 'n_sources', CAST(COUNT(DISTINCT source) AS BIGINT) FROM base
        |  UNION ALL SELECT 'exact_dup_surplus', surplus FROM dup
        |  UNION ALL SELECT 'min_chars', CAST(MIN(n_chars) AS BIGINT) FROM base
        |  UNION ALL SELECT 'max_chars', CAST(MAX(n_chars) AS BIGINT) FROM base)
        |ORDER BY metric""".stripMargin) { (s, dir) =>
      import s.implicits._
      val base = Tables.documents(s, dir)
        .withColumn("n_words", size(TextOps.words(col("text"))).cast("long"))
      val dup = base.groupBy("text").agg(count(lit(1)).as("cnt"))
        .agg(sum(col("cnt") - 1).as("v"))
        .select(lit("exact_dup_surplus").as("metric"), col("v").as("value"))
      val scalars = base.agg(
        count(lit(1)).as("n_docs"), sum("n_words").as("n_tokens"),
        sum("n_chars").as("n_chars"), countDistinct("lang").as("n_langs"),
        countDistinct("source").as("n_sources"),
        min("n_chars").as("min_chars"), max("n_chars").as("max_chars"))
      val rows = Seq("n_docs", "n_tokens", "n_chars", "n_langs", "n_sources",
        "min_chars", "max_chars").map(m =>
        scalars.select(lit(m).as("metric"), col(m).cast("long").as("value")))
      (rows :+ dup).reduce(_ unionByName _).orderBy("metric")
    }
  )

  /** DuckDB replay of [[TextAnalysis.cdcDedup]]: the window hash at each
    * position as an explicit [[TextAnalysis.CdcWindow]]-term polynomial
    * (same B^j mod 2^31 weights, generated from the one Scala source of
    * truth), lag-paired boundary intervals, and the first-occurrence
    * verdict partitioned by the chunk itself (identical strings — the
    * md5 the Spark side shuffles is just a narrower key).
    */
  private def cdcOracle: String = {
    val W = TextAnalysis.CdcWindow
    val terms = (0 until W)
      .map(j => s"CAST(ascii(text[i - $j]) AS BIGINT) * ${TextAnalysis.CdcPows(j)}")
      .mkString(" + ")
    s"""WITH d AS (SELECT doc_id, text, len(text) AS n FROM documents),
      |p AS (SELECT doc_id, text, n, unnest(range($W, n + 1)) AS i FROM d),
      |h AS (SELECT doc_id, n, i, ($terms) % ${TextAnalysis.CdcMod} AS hh FROM p),
      |b AS (SELECT doc_id, i FROM h WHERE hh % ${TextAnalysis.CdcDivisor} = 0 AND i < n),
      |iv AS (
      |  SELECT doc_id, lag(i, 1, 0) OVER (PARTITION BY doc_id ORDER BY i) + 1 AS s, i AS e
      |  FROM b
      |  UNION ALL
      |  SELECT d.doc_id, coalesce(max(b.i), 0) + 1 AS s, any_value(d.n) AS e
      |  FROM d LEFT JOIN b USING (doc_id) GROUP BY d.doc_id),
      |ck AS (SELECT iv.doc_id, iv.s, substr(d2.text, iv.s, iv.e - iv.s + 1) AS chunk
      |       FROM iv JOIN d d2 USING (doc_id)),
      |kv AS (SELECT doc_id, chunk,
      |         CASE WHEN row_number() OVER (PARTITION BY chunk ORDER BY doc_id, s) = 1
      |              THEN 1 ELSE 0 END AS kept
      |       FROM ck)
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
      |       CAST(SUM(1 - kept) AS BIGINT) AS n_dup_chunks,
      |       CAST(SUM(kept * len(chunk)) AS BIGINT) AS n_kept_chars
      |FROM kv GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** Shared DuckDB replay of [[UnigramLm.viterbiSegment]]'s DP (q127,
    * q128): vocab CTE (as q126), then dp_1..dp_MaxWord each keeping the
    * per-word best (ntoks ASC, score DESC, l DESC) over the <= MaxPiece
    * ways to end a segmentation at that position. Ends with `dp` (all
    * positions, for the q127 backtrack) and `wv` (the capped word dim).
    */
  private def unigramDpCtes: String = {
    val mp = UnigramLm.MaxPiece
    val mw = UnigramLm.MaxWord
    val dps = (1 to mw).map { i =>
      val cand = (1 to math.min(i, mp)).map { l =>
        s"""SELECT d.w, d.score + v.cnt AS score, d.ntoks + 1 AS ntoks, $l AS l
          |    FROM dp_${i - l} d JOIN vocab v ON v.piece = substr(d.w, ${i - l + 1}, $l)
          |    WHERE len(d.w) >= $i""".stripMargin
      }.mkString("\n    UNION ALL\n")
      s"""dp_$i AS MATERIALIZED (
        |  SELECT w, score, ntoks, l, $i AS pos FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY w
        |             ORDER BY ntoks ASC, score DESC, l DESC) AS rn
        |    FROM ($cand)) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    val dpAll = (1 to mw)
      .map(i => s"SELECT w, score, ntoks, l, pos FROM dp_$i")
      .mkString(" UNION ALL ")
    s"""WITH RECURSIVE t AS (SELECT unnest($W) AS w FROM documents),
      |v AS (SELECT w, COUNT(*) AS freq FROM t WHERE len(w) >= 2 GROUP BY w),
      |px AS (SELECT freq, w, unnest(range(1, len(w)+1)) AS i FROM v),
      |c AS (SELECT substr(w, i, l.l) AS piece, CAST(SUM(freq) AS BIGINT) AS cnt
      |      FROM px CROSS JOIN (SELECT unnest(range(1, ${mp + 1})) AS l) l
      |      WHERE i + l.l - 1 <= len(w) GROUP BY 1),
      |vocab AS MATERIALIZED (
      |  SELECT piece, cnt FROM c WHERE len(piece) = 1
      |  UNION ALL
      |  SELECT piece, cnt FROM (
      |    SELECT piece, cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, piece) AS rk
      |    FROM c WHERE len(piece) >= 2) WHERE rk <= ${UnigramLm.TopPieces}),
      |wv AS (SELECT w, freq FROM v WHERE len(w) <= $mw),
      |dp_0 AS (SELECT w, CAST(0 AS BIGINT) AS score, 0 AS ntoks FROM wv),
      |$dps,
      |dp AS ($dpAll)""".stripMargin
  }
}
