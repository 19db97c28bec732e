package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.VectorOps
import graft.operators.Similarity

/** ANN / embedding queries over `embeddings`. Oracles reproduce the exact
  * double fold of the dot products (see VectorOps), so raw cosine doubles
  * hash-match without tolerance.
  */
object SimilarityQueries {

  private val D = Similarity.Dim
  private def cos(a: String, b: String) = VectorOps.cosineSql(a, b, D)

  // doubled embeddings view
  private val eCte = "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings)"

  private val bucketCte =
    eCte +
      s""",
      |bv AS (SELECT vec_id, j,
      |              CASE WHEN ${VectorOps.planeDotSql("emb", "j", 64)} > 0
      |                   THEN (1::BIGINT << j) ELSE 0 END AS bitv
      |       FROM e, (SELECT unnest(range(0, ${Similarity.NumPlanes})) AS j) g),
      |bk AS (SELECT vec_id, CAST(SUM(bitv) AS BIGINT) AS bucket FROM bv GROUP BY vec_id)""".stripMargin

  /** q73's near-dup connected-components chain (multi-table LSH buckets
    * → verified near-dup edges at cosine ≥ 0.40 → recursive min-label
    * components), ending at `cc` (v, cluster_id) and `cs` (cluster
    * sizes). Composed by q73 and q192's leakage-safe split.
    */
  private lazy val ccCte =
    eCte.replaceFirst("WITH", "WITH RECURSIVE") +
      s""",
      |bvm AS (SELECT vec_id, t, j,
      |               CASE WHEN ${VectorOps.planeDotSql("emb", "(t * 4 + j)", 64)} > 0
      |                    THEN (1::BIGINT << j) ELSE 0 END AS bitv
      |        FROM e, (SELECT unnest(range(0, 8)) AS t) tt,
      |                (SELECT unnest(range(0, 4)) AS j) jj),
      |bkm AS (SELECT vec_id, t, CAST(SUM(bitv) AS BIGINT) AS bucket
      |        FROM bvm GROUP BY vec_id, t),
      |cand AS (SELECT DISTINCT a.vec_id AS d1, b.vec_id AS d2
      |         FROM bkm a JOIN bkm b ON a.t = b.t AND a.bucket = b.bucket
      |                               AND a.vec_id < b.vec_id),
      |nd AS (SELECT c.d1, c.d2
      |       FROM cand c JOIN e x ON x.vec_id = c.d1
      |                   JOIN e y ON y.vec_id = c.d2
      |       WHERE ${cos("x.emb", "y.emb")} >= 0.40),
      |edges AS (SELECT d1 AS src, d2 AS dst FROM nd
      |          UNION SELECT d2, d1 FROM nd),
      |verts AS (SELECT DISTINCT src AS v FROM edges),
      |r(v, label) AS (
      |    SELECT v, v FROM verts
      |    UNION
      |    SELECT e2.dst, r.label FROM r JOIN edges e2 ON e2.src = r.v),
      |cc AS (SELECT v, min(label) AS cluster_id FROM r GROUP BY v),
      |cs AS (SELECT cluster_id, COUNT(*) AS cluster_size FROM cc GROUP BY cluster_id)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // Brute-force top-10 cosine neighbors for queries vec_id < 5.
    QueryDef("q40_ann_bruteforce",
      eCte +
        s"""
        |SELECT q.vec_id AS q_id, d.vec_id AS n_id,
        |       ${cos("q.emb", "d.emb")} AS cosine,
        |       CAST(row_number() OVER (PARTITION BY q.vec_id
        |            ORDER BY ${cos("q.emb", "d.emb")} DESC, d.vec_id) AS INT) AS rk
        |FROM e q JOIN e d ON d.vec_id <> q.vec_id
        |WHERE q.vec_id < 5
        |QUALIFY rk <= 10
        |ORDER BY q_id, rk""".stripMargin) { (s, dir) =>
      Similarity.bruteForceTopK(Tables.embeddings(s, dir), 5L, 10)
        .orderBy("q_id", "rk")
    },

    // Sign-LSH bucket histogram (8 hyperplanes → 256 buckets).
    QueryDef("q41_lsh_buckets",
      bucketCte +
        """
        |SELECT bucket, COUNT(*) AS n FROM bk GROUP BY bucket ORDER BY bucket""".stripMargin) { (s, dir) =>
      Similarity.lshBuckets(Tables.embeddings(s, dir))
        .groupBy("bucket").count().withColumnRenamed("count", "n")
        .orderBy("bucket")
    },

    // ANN via LSH: top-5 same-bucket candidates per query by cosine.
    QueryDef("q42_ann_lsh_topk",
      bucketCte +
        s""",
        |eb AS (SELECT e.vec_id, emb, bucket FROM e JOIN bk USING (vec_id)),
        |cand AS (SELECT q.vec_id AS q_id, d.vec_id AS n_id, q.bucket AS bucket,
        |                ${cos("q.emb", "d.emb")} AS cosine
        |         FROM eb q JOIN eb d ON q.bucket = d.bucket AND d.vec_id <> q.vec_id
        |         WHERE q.vec_id < 5)
        |SELECT q_id, n_id, bucket, cosine,
        |       CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) AS INT) AS rk
        |FROM cand
        |QUALIFY rk <= 5
        |ORDER BY q_id, rk""".stripMargin) { (s, dir) =>
      Similarity.lshTopK(Tables.embeddings(s, dir), 5L, 5)
        .orderBy("q_id", "rk")
    },

    // IVF ANN: training-free coarse quantizer (centroids = vec_id ≡ 0
    // mod 100), nprobe=2 cells per query, top-5 by cosine within probed
    // cells — the bucketed scale path beside q40's brute-force baseline.
    QueryDef("q44_ann_ivf",
      eCte +
        s""",
        |cent AS (SELECT vec_id AS cell, emb AS c_emb FROM e WHERE vec_id % 100 = 0),
        |asn AS (SELECT vec_id, cell FROM (
        |    SELECT e.vec_id, cent.cell,
        |           row_number() OVER (PARTITION BY e.vec_id
        |               ORDER BY ${cos("e.emb", "cent.c_emb")} DESC, cent.cell DESC) AS rn
        |    FROM e, cent) WHERE rn = 1),
        |qc AS (SELECT q_id, q_emb, cell FROM (
        |    SELECT e.vec_id AS q_id, e.emb AS q_emb, cent.cell,
        |           row_number() OVER (PARTITION BY e.vec_id
        |               ORDER BY ${cos("e.emb", "cent.c_emb")} DESC, cent.cell DESC) AS rn
        |    FROM e, cent WHERE e.vec_id < 5) WHERE rn <= 2),
        |cand AS (SELECT qc.q_id, d.vec_id AS n_id, qc.cell,
        |                ${cos("qc.q_emb", "d.emb")} AS cosine
        |         FROM qc JOIN asn ON asn.cell = qc.cell
        |         JOIN e d ON d.vec_id = asn.vec_id
        |         WHERE d.vec_id <> qc.q_id)
        |SELECT q_id, n_id, cell, cosine,
        |       CAST(row_number() OVER (PARTITION BY q_id
        |            ORDER BY cosine DESC, n_id) AS INT) AS rk
        |FROM cand QUALIFY rk <= 5
        |ORDER BY q_id, rk""".stripMargin) { (s, dir) =>
      Similarity.ivfTopK(Tables.embeddings(s, dir), 5L, 5, nprobe = 2, step = 100L)
        .orderBy("q_id", "rk")
    },

    // ANN via MULTI-TABLE LSH (8 tables × 4 planes): candidate union over
    // tables, dedup'd, top-5 by cosine — the production recall lever
    // (recall@10 ≈ 0.57 vs 0.045 single-table on sf0.001, AnnRecallSpec).
    QueryDef("q59_ann_lsh_multi",
      eCte +
        s""",
        |bvm AS (SELECT vec_id, t, j,
        |               CASE WHEN ${VectorOps.planeDotSql("emb", "(t * 4 + j)", 64)} > 0
        |                    THEN (1::BIGINT << j) ELSE 0 END AS bitv
        |        FROM e, (SELECT unnest(range(0, 8)) AS t) tt,
        |                (SELECT unnest(range(0, 4)) AS j) jj),
        |bkm AS (SELECT vec_id, t, CAST(SUM(bitv) AS BIGINT) AS bucket
        |        FROM bvm GROUP BY vec_id, t),
        |ebm AS (SELECT e.vec_id, emb, t, bucket FROM e JOIN bkm USING (vec_id)),
        |cand AS (SELECT DISTINCT q.vec_id AS q_id, d.vec_id AS n_id
        |         FROM ebm q JOIN ebm d ON q.t = d.t AND q.bucket = d.bucket
        |                               AND d.vec_id <> q.vec_id
        |         WHERE q.vec_id < 5),
        |scored AS (SELECT c.q_id, c.n_id, ${cos("qe.emb", "de.emb")} AS cosine
        |           FROM cand c JOIN e qe ON qe.vec_id = c.q_id
        |                       JOIN e de ON de.vec_id = c.n_id)
        |SELECT q_id, n_id, cosine,
        |       CAST(row_number() OVER (PARTITION BY q_id
        |            ORDER BY cosine DESC, n_id) AS INT) AS rk
        |FROM scored QUALIFY rk <= 5
        |ORDER BY q_id, rk""".stripMargin) { (s, dir) =>
      Similarity.lshTopKMulti(Tables.embeddings(s, dir), 5L, 5)
        .orderBy("q_id", "rk")
    },

    // MULTI-PROBE multi-table LSH: each query additionally probes, per
    // table, the 2 Hamming-1 buckets whose flipped plane has the smallest
    // |margin| — the oracle reproduces the probe sequence exactly
    // (row_number over (|dot| asc, plane asc), xor the flipped bit), so
    // the candidate expansion itself is cross-engine-verified, not just
    // the final ranking. Recall@10 floor 0.79 measured in AnnRecallSpec
    // vs 0.57 for q59's plain multi-table form.
    QueryDef("q82_ann_multiprobe",
      eCte +
        s""",
        |dvm AS (SELECT vec_id, t, j,
        |               ${VectorOps.planeDotSql("emb", "(t * 4 + j)", 64)} AS d
        |        FROM e, (SELECT unnest(range(0, 8)) AS t) tt,
        |                (SELECT unnest(range(0, 4)) AS j) jj),
        |bkm AS (SELECT vec_id, t,
        |               CAST(SUM(CASE WHEN d > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS bucket
        |        FROM dvm GROUP BY vec_id, t),
        |qfl AS (SELECT vec_id, t, j,
        |               row_number() OVER (PARTITION BY vec_id, t ORDER BY abs(d), j) AS rn
        |        FROM dvm WHERE vec_id < 5),
        |qpb AS (SELECT vec_id AS q_id, t, bucket FROM bkm WHERE vec_id < 5
        |        UNION
        |        SELECT f.vec_id, f.t, xor(b.bucket, (1::BIGINT << f.j))
        |        FROM qfl f JOIN bkm b ON b.vec_id = f.vec_id AND b.t = f.t
        |        WHERE f.rn <= 2),
        |ebm AS (SELECT e.vec_id, emb, t, bucket FROM e JOIN bkm USING (vec_id)),
        |cand AS (SELECT DISTINCT q.q_id, d.vec_id AS n_id
        |         FROM qpb q JOIN ebm d ON q.t = d.t AND q.bucket = d.bucket
        |                               AND d.vec_id <> q.q_id),
        |scored AS (SELECT c.q_id, c.n_id, ${cos("qe.emb", "de.emb")} AS cosine
        |           FROM cand c JOIN e qe ON qe.vec_id = c.q_id
        |                       JOIN e de ON de.vec_id = c.n_id)
        |SELECT q_id, n_id, cosine,
        |       CAST(row_number() OVER (PARTITION BY q_id
        |            ORDER BY cosine DESC, n_id) AS INT) AS rk
        |FROM scored QUALIFY rk <= 5
        |ORDER BY q_id, rk""".stripMargin) { (s, dir) =>
      Similarity.lshTopKMultiProbe(Tables.embeddings(s, dir), 5L, 5)
        .orderBy("q_id", "rk")
    },

    // Embedding near-dup at corpus scale: candidate pairs ONLY within
    // multi-table LSH buckets (dedup'd across tables), scored and kept at
    // cosine >= 0.40 — the bucketed production form of q43.
    QueryDef("q60_neardup_lsh",
      eCte +
        s""",
        |bvm AS (SELECT vec_id, t, j,
        |               CASE WHEN ${VectorOps.planeDotSql("emb", "(t * 4 + j)", 64)} > 0
        |                    THEN (1::BIGINT << j) ELSE 0 END AS bitv
        |        FROM e, (SELECT unnest(range(0, 8)) AS t) tt,
        |                (SELECT unnest(range(0, 4)) AS j) jj),
        |bkm AS (SELECT vec_id, t, CAST(SUM(bitv) AS BIGINT) AS bucket
        |        FROM bvm GROUP BY vec_id, t),
        |pairs AS (SELECT DISTINCT a.vec_id AS d1, b.vec_id AS d2
        |          FROM bkm a JOIN bkm b ON a.t = b.t AND a.bucket = b.bucket
        |                                AND a.vec_id < b.vec_id),
        |scored AS (SELECT p.d1, p.d2, ${cos("x.emb", "y.emb")} AS cosine
        |           FROM pairs p JOIN e x ON x.vec_id = p.d1
        |                        JOIN e y ON y.vec_id = p.d2)
        |SELECT d1, d2, cosine FROM scored WHERE cosine >= 0.40
        |ORDER BY d1, d2""".stripMargin) { (s, dir) =>
      Similarity.nearDupPairsLsh(Tables.embeddings(s, dir), 0.40)
        .orderBy("d1", "d2")
    },

    // Near-dup CLUSTERS: q60's bucketed pairs closed transitively into
    // duplicate groups (min-label connected components) — cluster_id is
    // the canonical survivor. Oracle walks the same graph with a
    // recursive CTE (min reachable id ≡ min propagated label).
    QueryDef("q73_neardup_clusters",
      ccCte +
        """
        |SELECT cc.v AS vec_id, cc.cluster_id, cs.cluster_size
        |FROM cc JOIN cs USING (cluster_id)
        |ORDER BY vec_id""".stripMargin) { (s, dir) =>
      Similarity.nearDupClusters(Tables.embeddings(s, dir), 0.40)
        .orderBy("vec_id")
    },

    // Per-language centroid outliers: fixed-point (round_even(v*2^20)
    // integer-sum) centroids make the mean exact across partitionings
    // and engines; bottom-5 cosines per language are the outliers.
    QueryDef("q79_centroid_outliers",
      eCte +
        s""",
        |l AS (SELECT e.vec_id, d.lang, emb
        |      FROM e JOIN documents d ON d.doc_id = e.vec_id),
        |comp AS (SELECT lang, pos,
        |                CAST(SUM(CAST(round_even(emb[pos] * 1048576, 0) AS BIGINT)) AS BIGINT) AS s,
        |                COUNT(*) AS n
        |         FROM l, (SELECT unnest(range(1, ${D + 1})) AS pos) p
        |         GROUP BY lang, pos),
        |cent AS (SELECT lang,
        |                list(CAST(s AS DOUBLE) / 1048576.0 / n ORDER BY pos) AS centroid
        |         FROM comp GROUP BY lang),
        |scored AS (SELECT l.lang, l.vec_id,
        |                  ${cos("l.emb", "cent.centroid")} AS centroid_cosine
        |           FROM l JOIN cent USING (lang))
        |SELECT lang, vec_id, centroid_cosine,
        |       CAST(row_number() OVER (PARTITION BY lang
        |            ORDER BY centroid_cosine, vec_id) AS INT) AS rk
        |FROM scored QUALIFY rk <= 5
        |ORDER BY lang, rk""".stripMargin) { (s, dir) =>
      Similarity.centroidOutliers(Tables.embeddings(s, dir),
        Tables.documents(s, dir), 5).orderBy("lang", "rk")
    },

    // Top-PC projections via fixed-point power iteration (round 6): the
    // distributed pass is ONE Gram build (double position explode,
    // map-side partial agg — the shuffle carries d² rows, never the
    // corpus); the 64×64 iteration runs on the collected bounded dim
    // (the KMeans-centroid convention) with integer-only arithmetic, so
    // the oracle replays all 8 rounds as unrolled CTEs (q138-style) and
    // the per-vector projections hash-match exactly. DuckDB's `//`
    // truncates toward zero like JVM Long division — verified, the one
    // operator where that distinction matters (signed eigenvector
    // components).
    QueryDef("q141_pca_project",
      eCte +
        s""",
        |q AS (SELECT vec_id, pos AS i,
        |             CAST(round_even(emb[pos] * ${graft.operators.Pca.QScale}, 0) AS BIGINT) AS qi
        |      FROM e, (SELECT unnest(range(1, ${D + 1})) AS pos) p),
        |s AS (SELECT a.i, b.i AS j, CAST(SUM(a.qi * b.qi) AS BIGINT) AS s
        |      FROM q a JOIN q b ON a.vec_id = b.vec_id GROUP BY 1, 2),
        |${graft.operators.Pca.oracleIterCtes(D, 8)},
        |proj AS (SELECT q.vec_id, CAST(SUM(q.qi * v8.v) AS BIGINT) AS proj
        |         FROM q JOIN v8 ON v8.i = q.i WHERE q.vec_id < 100 GROUP BY 1)
        |SELECT vec_id, proj FROM proj ORDER BY vec_id""".stripMargin) { (s, dir) =>
      graft.operators.Pca.projectTop(Tables.embeddings(s, dir), D, 8, 100L)
        .orderBy("vec_id")
    },

    // JL random projection 64 → 16 (round 6): deterministic ±1 matrix
    // regenerated from two integer literals per output dim (the exported
    // hash family) — no stored matrix, no RNG; entirely map-side (the
    // sign arrays are codegen literals, each component one zip_with
    // fold), integer-exact so components hash-match cross-engine.
    QueryDef("q142_random_projection", {
      val ks = graft.functions.RandomProjection.oracleKs(16)
      eCte +
        s""",
        |$ks,
        |q AS (SELECT vec_id, pos AS i,
        |             CAST(round_even(emb[pos] * 1024, 0) AS BIGINT) AS qi
        |      FROM e, (SELECT unnest(range(1, ${D + 1})) AS pos) p
        |      WHERE vec_id < 200),
        |signs AS (SELECT k, i, 1 - 2 * ((i * a + b) % 2147483647 // 1024 % 2) AS s
        |          FROM ks, (SELECT unnest(range(1, ${D + 1})) AS i) p)
        |SELECT q.vec_id, signs.k, CAST(SUM(signs.s * q.qi) AS BIGINT) AS comp
        |FROM q JOIN signs ON signs.i = q.i
        |GROUP BY 1, 2 ORDER BY vec_id, k""".stripMargin
    }) { (s, dir) =>
      graft.functions.RandomProjection.project(
        Tables.embeddings(s, dir)
          .filter(org.apache.spark.sql.functions.col("vec_id") < 200), D, 16)
        .orderBy("vec_id", "k")
    },

    // Embedding near-dup: global top-20 cosine pairs among vec_id < 300.
    QueryDef("q43_embedding_neardup",
      eCte +
        s"""
        |SELECT a.vec_id AS d1, b.vec_id AS d2,
        |       ${cos("a.emb", "b.emb")} AS cosine,
        |       CAST(row_number() OVER (ORDER BY ${cos("a.emb", "b.emb")} DESC, a.vec_id, b.vec_id) AS INT) AS rk
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE a.vec_id < 300 AND b.vec_id < 300
        |QUALIFY rk <= 20
        |ORDER BY rk""".stripMargin) { (s, dir) =>
      Similarity.nearDupPairs(Tables.embeddings(s, dir), 300L, 20)
        .orderBy("rk")
    },

    // SemDeDup-style semantic dedup: IVF-cell assignment (q44's coarse
    // quantizer), then within-cell cosine >= 0.40 drops the higher-id
    // member — pairs never form across cells, which is what bounds the
    // O(n²) at corpus scale. The oracle replays assignment AND verdicts.
    QueryDef("q92_semantic_dedup",
      eCte +
        s""",
        |cent AS (SELECT vec_id AS cell, emb AS c_emb FROM e WHERE vec_id % 100 = 0),
        |asn AS (SELECT vec_id, cell FROM (
        |    SELECT e.vec_id, cent.cell,
        |           row_number() OVER (PARTITION BY e.vec_id
        |               ORDER BY ${cos("e.emb", "cent.c_emb")} DESC, cent.cell DESC) AS rn
        |    FROM e, cent) WHERE rn = 1),
        |drops AS (SELECT DISTINCT b.vec_id AS drop_id
        |          FROM asn a JOIN asn b ON a.cell = b.cell AND a.vec_id < b.vec_id
        |          JOIN e ea ON ea.vec_id = a.vec_id
        |          JOIN e eb ON eb.vec_id = b.vec_id
        |          WHERE ${cos("ea.emb", "eb.emb")} >= 0.40)
        |SELECT asn.vec_id, asn.cell, drops.drop_id IS NULL AS kept
        |FROM asn LEFT JOIN drops ON asn.vec_id = drops.drop_id
        |ORDER BY vec_id""".stripMargin) { (s, dir) =>
      Similarity.semanticDedup(Tables.embeddings(s, dir), 0.40, step = 100L)
        .orderBy("vec_id")
    },

    // SQ8 scalar quantization: per-dim corpus bounds → integer codes in
    // [0,255]. All outputs integer-exact; the floor's inner arithmetic is
    // the same IEEE double sequence in both engines.
    QueryDef("q94_sq8_quantize",
      eCte +
        s""",
        |x AS (SELECT vec_id, i, emb[i] AS v
        |      FROM (SELECT vec_id, emb, unnest(range(1, ${D + 1})) AS i FROM e)),
        |b AS (SELECT i, min(v) AS mn, max(v) AS mx FROM x GROUP BY i),
        |c AS (SELECT x.vec_id,
        |             CAST(CASE WHEN b.mx = b.mn THEN 0.0
        |                  ELSE least(255.0, floor((x.v - b.mn) * 256.0 / (b.mx - b.mn)))
        |                  END AS BIGINT) AS code
        |      FROM x JOIN b USING (i))
        |SELECT vec_id, CAST(SUM(code) AS BIGINT) AS code_sum,
        |       CAST(MIN(code) AS BIGINT) AS code_min,
        |       CAST(MAX(code) AS BIGINT) AS code_max,
        |       CAST(SUM(CASE WHEN code = 255 THEN 1 ELSE 0 END) AS BIGINT) AS n_saturated
        |FROM c GROUP BY vec_id ORDER BY vec_id""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.functions._
      Similarity.sq8Codes(Tables.embeddings(s, dir))
        .select(col("vec_id"),
          expr("aggregate(codes, 0L, (a, x) -> a + x)").as("code_sum"),
          array_min(col("codes")).as("code_min"),
          array_max(col("codes")).as("code_max"),
          expr("cast(size(filter(codes, c -> c = 255)) as long)").as("n_saturated"))
        .orderBy("vec_id")
    },

    // Quantize-then-rerank ANN: top-20 shortlist by the APPROXIMATE
    // cosine of cell-midpoint-dequantized codes (a raw code dot would
    // deform the geometry — the per-dim quantization is affine), exact
    // cosine only on the shortlist, top-5 — FAISS's SQ + refine pattern;
    // candidate generation scans the 8×-smaller codes table at the
    // 100 TB layout.
    QueryDef("q95_ann_sq8",
      eCte +
        s""",
        |x AS (SELECT vec_id, i, emb[i] AS v
        |      FROM (SELECT vec_id, emb, unnest(range(1, ${D + 1})) AS i FROM e)),
        |b AS (SELECT i, min(v) AS mn, max(v) AS mx FROM x GROUP BY i),
        |bl AS (SELECT list(mn ORDER BY i) AS mns, list(mx ORDER BY i) AS mxs FROM b),
        |r AS (SELECT e.vec_id, list_transform(range(1, ${D + 1}), i ->
        |        mns[i] + (CAST(CASE WHEN mxs[i] = mns[i] THEN 0.0
        |             ELSE least(255.0, floor((emb[i] - mns[i]) * 256.0 / (mxs[i] - mns[i])))
        |             END AS DOUBLE) + 0.5)
        |          * (mxs[i] - mns[i]) / 256.0) AS remb
        |      FROM e, bl),
        |ap AS (SELECT q.vec_id AS q_id, d.vec_id AS n_id,
        |              ${cos("q.remb", "d.remb")} AS approx_cosine
        |       FROM r q JOIN r d ON d.vec_id <> q.vec_id WHERE q.vec_id < 5),
        |sl AS (SELECT q_id, n_id, approx_cosine FROM (
        |       SELECT q_id, n_id, approx_cosine,
        |              row_number() OVER (PARTITION BY q_id
        |                  ORDER BY approx_cosine DESC, n_id) AS cn FROM ap) WHERE cn <= 20)
        |SELECT sl.q_id, sl.n_id, sl.approx_cosine,
        |       ${cos("q.emb", "d.emb")} AS cosine,
        |       CAST(row_number() OVER (PARTITION BY sl.q_id
        |            ORDER BY ${cos("q.emb", "d.emb")} DESC, sl.n_id) AS INT) AS rk
        |FROM sl JOIN e q ON q.vec_id = sl.q_id JOIN e d ON d.vec_id = sl.n_id
        |QUALIFY rk <= 5
        |ORDER BY q_id, rk""".stripMargin) { (s, dir) =>
      Similarity.sq8TopK(Tables.embeddings(s, dir), 5L, 5, candidates = 20)
        .orderBy("q_id", "rk")
    },

    // Product quantization: 8 subspaces × 8 dims, 8 centroids/subspace
    // seeded from the first 8 vectors' subvectors (training-free, the
    // ivfCells convention). Codes packed 4 bits/subspace into one BIGINT
    // — integer-exact across engines.
    QueryDef("q100_pq_codes",
      eCte +
        s""",
        |g AS (SELECT unnest(range(0, ${Similarity.PqSubspaces})) AS j),
        |cent AS (SELECT vec_id AS c, j,
        |                list_transform(range(1, ${Similarity.PqSubDim + 1}),
        |                               i -> emb[j * ${Similarity.PqSubDim} + i]) AS cent
        |         FROM e, g WHERE vec_id < ${Similarity.PqCodebook}),
        |sub AS (SELECT vec_id, j,
        |               list_transform(range(1, ${Similarity.PqSubDim + 1}),
        |                              i -> emb[j * ${Similarity.PqSubDim} + i]) AS sub
        |        FROM e, g),
        |d AS (SELECT sub.vec_id, sub.j, cent.c,
        |             list_reduce(list_transform(range(1, ${Similarity.PqSubDim + 1}),
        |                 i -> (sub.sub[i] - cent.cent[i]) * (sub.sub[i] - cent.cent[i])),
        |                 (x, y) -> x + y) AS d2
        |      FROM sub JOIN cent USING (j)),
        |a AS (SELECT vec_id, j, c FROM (
        |      SELECT *, row_number() OVER (PARTITION BY vec_id, j ORDER BY d2, c) AS rn
        |      FROM d) WHERE rn = 1)
        |SELECT vec_id, CAST(SUM(c * (CAST(1 AS BIGINT) << (4 * j))) AS BIGINT) AS packed_code
        |FROM a GROUP BY vec_id ORDER BY vec_id""".stripMargin) { (s, dir) =>
      Similarity.pqCodes(Tables.embeddings(s, dir))
        .select("vec_id", "packed_code").orderBy("vec_id")
    },

    // PQ ANN with asymmetric distance computation: per-query 64-entry
    // distance table, ADC via an ORDERED fold over subspaces (a grouped
    // SUM of doubles is addition-order-nondeterministic across engines),
    // top-20 shortlist by ADC, exact cosine rerank top-5.
    QueryDef("q101_ann_pq",
      eCte +
        s""",
        |g AS (SELECT unnest(range(0, ${Similarity.PqSubspaces})) AS j),
        |cent AS (SELECT vec_id AS c, j,
        |                list_transform(range(1, ${Similarity.PqSubDim + 1}),
        |                               i -> emb[j * ${Similarity.PqSubDim} + i]) AS cent
        |         FROM e, g WHERE vec_id < ${Similarity.PqCodebook}),
        |sub AS (SELECT vec_id, j,
        |               list_transform(range(1, ${Similarity.PqSubDim + 1}),
        |                              i -> emb[j * ${Similarity.PqSubDim} + i]) AS sub
        |        FROM e, g),
        |d AS (SELECT sub.vec_id, sub.j, cent.c,
        |             list_reduce(list_transform(range(1, ${Similarity.PqSubDim + 1}),
        |                 i -> (sub.sub[i] - cent.cent[i]) * (sub.sub[i] - cent.cent[i])),
        |                 (x, y) -> x + y) AS d2
        |      FROM sub JOIN cent USING (j)),
        |a AS (SELECT vec_id, j, c FROM (
        |      SELECT *, row_number() OVER (PARTITION BY vec_id, j ORDER BY d2, c) AS rn
        |      FROM d) WHERE rn = 1),
        |dt AS (SELECT sub.vec_id AS q_id, sub.j, cent.c,
        |              list_reduce(list_transform(range(1, ${Similarity.PqSubDim + 1}),
        |                  i -> (sub.sub[i] - cent.cent[i]) * (sub.sub[i] - cent.cent[i])),
        |                  (x, y) -> x + y) AS d2
        |       FROM sub JOIN cent USING (j) WHERE sub.vec_id < 5),
        |adc AS (SELECT dt.q_id, a.vec_id,
        |               list_reduce(list(dt.d2 ORDER BY a.j), (x, y) -> x + y) AS adc
        |        FROM a JOIN dt ON dt.j = a.j AND dt.c = a.c AND a.vec_id <> dt.q_id
        |        GROUP BY dt.q_id, a.vec_id),
        |sl AS (SELECT q_id, vec_id AS n_id, adc FROM (
        |       SELECT *, row_number() OVER (PARTITION BY q_id
        |           ORDER BY adc, vec_id) AS cn FROM adc) WHERE cn <= 20)
        |SELECT sl.q_id, sl.n_id, sl.adc,
        |       ${cos("q.emb", "dd.emb")} AS cosine,
        |       CAST(row_number() OVER (PARTITION BY sl.q_id
        |            ORDER BY ${cos("q.emb", "dd.emb")} DESC, sl.n_id) AS INT) AS rk
        |FROM sl JOIN e q ON q.vec_id = sl.q_id JOIN e dd ON dd.vec_id = sl.n_id
        |QUALIFY rk <= 5
        |ORDER BY q_id, rk""".stripMargin) { (s, dir) =>
      Similarity.pqTopK(Tables.embeddings(s, dir), 5L, 5, candidates = 20)
        .orderBy("q_id", "rk")
    },

    // IVF-PQ, the FAISS composition and THE 100 TB ANN layout: IVF cells
    // bound the candidates (nprobe=2), ADC scores them from 8-byte codes,
    // exact cosine reranks the shortlist. The oracle composes q44's
    // assignment/probe CTEs with q101's codebook/ADC CTEs verbatim.
    QueryDef("q102_ann_ivfpq",
      eCte +
        s""",
        |icent AS (SELECT vec_id AS cell, emb AS c_emb FROM e WHERE vec_id % 100 = 0),
        |asn AS (SELECT vec_id, cell FROM (
        |    SELECT e.vec_id, icent.cell,
        |           row_number() OVER (PARTITION BY e.vec_id
        |               ORDER BY ${cos("e.emb", "icent.c_emb")} DESC, icent.cell DESC) AS rn
        |    FROM e, icent) WHERE rn = 1),
        |qc AS (SELECT q_id, cell FROM (
        |    SELECT e.vec_id AS q_id, icent.cell,
        |           row_number() OVER (PARTITION BY e.vec_id
        |               ORDER BY ${cos("e.emb", "icent.c_emb")} DESC, icent.cell DESC) AS rn
        |    FROM e, icent WHERE e.vec_id < 5) WHERE rn <= 2),
        |g AS (SELECT unnest(range(0, ${Similarity.PqSubspaces})) AS j),
        |pcent AS (SELECT vec_id AS c, j,
        |                 list_transform(range(1, ${Similarity.PqSubDim + 1}),
        |                                i -> emb[j * ${Similarity.PqSubDim} + i]) AS cent
        |          FROM e, g WHERE vec_id < ${Similarity.PqCodebook}),
        |sub AS (SELECT vec_id, j,
        |               list_transform(range(1, ${Similarity.PqSubDim + 1}),
        |                              i -> emb[j * ${Similarity.PqSubDim} + i]) AS sub
        |        FROM e, g),
        |d AS (SELECT sub.vec_id, sub.j, pcent.c,
        |             list_reduce(list_transform(range(1, ${Similarity.PqSubDim + 1}),
        |                 i -> (sub.sub[i] - pcent.cent[i]) * (sub.sub[i] - pcent.cent[i])),
        |                 (x, y) -> x + y) AS d2
        |      FROM sub JOIN pcent USING (j)),
        |a AS (SELECT vec_id, j, c FROM (
        |      SELECT *, row_number() OVER (PARTITION BY vec_id, j ORDER BY d2, c) AS rn
        |      FROM d) WHERE rn = 1),
        |dt AS (SELECT sub.vec_id AS q_id, sub.j, pcent.c,
        |              list_reduce(list_transform(range(1, ${Similarity.PqSubDim + 1}),
        |                  i -> (sub.sub[i] - pcent.cent[i]) * (sub.sub[i] - pcent.cent[i])),
        |                  (x, y) -> x + y) AS d2
        |       FROM sub JOIN pcent USING (j) WHERE sub.vec_id < 5),
        |adc AS (SELECT qc.q_id, a.vec_id, qc.cell,
        |               list_reduce(list(dt.d2 ORDER BY a.j), (x, y) -> x + y) AS adc
        |        FROM qc JOIN asn ON asn.cell = qc.cell
        |        JOIN a ON a.vec_id = asn.vec_id
        |        JOIN dt ON dt.q_id = qc.q_id AND dt.j = a.j AND dt.c = a.c
        |        WHERE asn.vec_id <> qc.q_id
        |        GROUP BY qc.q_id, a.vec_id, qc.cell),
        |sl AS (SELECT q_id, vec_id AS n_id, cell, adc FROM (
        |       SELECT *, row_number() OVER (PARTITION BY q_id
        |           ORDER BY adc, vec_id) AS cn FROM adc) WHERE cn <= 20)
        |SELECT sl.q_id, sl.n_id, sl.cell, sl.adc,
        |       ${cos("q.emb", "dd.emb")} AS cosine,
        |       CAST(row_number() OVER (PARTITION BY sl.q_id
        |            ORDER BY ${cos("q.emb", "dd.emb")} DESC, sl.n_id) AS INT) AS rk
        |FROM sl JOIN e q ON q.vec_id = sl.q_id JOIN e dd ON dd.vec_id = sl.n_id
        |QUALIFY rk <= 5
        |ORDER BY q_id, rk""".stripMargin) { (s, dir) =>
      Similarity.ivfPqTopK(Tables.embeddings(s, dir), 5L, 5, nprobe = 2,
        step = 100L, candidates = 20)
        .orderBy("q_id", "rk")
    },

    // Distributed Lloyd's k-means (spherical): k=5 mod-100 seeds, two
    // full assign→update rounds, then the final assignment. The oracle
    // replays both rounds CTE-by-CTE — fixed-point centroid means (the
    // q79 contract) make every intermediate engine-exact, so the integer
    // (vec_id, cluster) labeling hash-matches with no tolerance. Ties
    // break cluster-DESC (the max(struct) argmax order, as q44).
    QueryDef("q111_kmeans",
      lloyd2Cte +
        s""",
        |a3 AS (SELECT vec_id, cluster FROM (
        |       SELECT e.vec_id, c2.cluster,
        |              row_number() OVER (PARTITION BY e.vec_id
        |                  ORDER BY ${cos("e.emb", "c2.c")} DESC, c2.cluster DESC) AS rn
        |       FROM e, c2) WHERE rn = 1)
        |SELECT vec_id, cluster FROM a3 ORDER BY vec_id""".stripMargin) { (s, dir) =>
      graft.operators.KMeans.fit(Tables.embeddings(s, dir), k = 5, iters = 2)
        .orderBy("vec_id")
    },

    // Cluster-quality report over the q111 centroids: per cluster the
    // size, mean assigned cosine (spherical cohesion), and mean
    // SIMPLIFIED silhouette (centroid distances, the corpus-scale
    // substitute for the O(n²) pairwise form). Per-vector doubles follow
    // a fixed IEEE sequence; the per-cluster means accumulate fixed-point
    // (round_even(x·2²⁰) longs — the q79 contract) so the report is
    // engine-exact. The oracle composes q111's Lloyd CTEs verbatim.
    QueryDef("q117_cluster_quality",
      lloyd2Cte +
        s""",
        |ranked AS (SELECT e.vec_id, c2.cluster,
        |                  ${cos("e.emb", "c2.c")} AS cs,
        |                  row_number() OVER (PARTITION BY e.vec_id
        |                      ORDER BY ${cos("e.emb", "c2.c")} DESC, c2.cluster DESC) AS rn
        |           FROM e, c2),
        |own AS (SELECT vec_id, cluster, cs AS cos_own FROM ranked WHERE rn = 1),
        |nxt AS (SELECT vec_id, cs AS cos_next FROM ranked WHERE rn = 2),
        |per AS (SELECT own.vec_id, own.cluster, cos_own,
        |               (1.0 - cos_own) AS a, (1.0 - cos_next) AS b
        |        FROM own JOIN nxt USING (vec_id)),
        |sil AS (SELECT vec_id, cluster, cos_own,
        |               CASE WHEN GREATEST(a, b) = 0 THEN 0.0
        |                    ELSE (b - a) / GREATEST(a, b) END AS sl
        |        FROM per)
        |SELECT cluster, COUNT(*) AS n,
        |       CAST(SUM(CAST(round_even(cos_own * 1048576, 0) AS BIGINT)) AS DOUBLE)
        |           / 1048576.0 / COUNT(*) AS mean_cosine,
        |       CAST(SUM(CAST(round_even(sl * 1048576, 0) AS BIGINT)) AS DOUBLE)
        |           / 1048576.0 / COUNT(*) AS mean_silhouette
        |FROM sil GROUP BY cluster ORDER BY cluster""".stripMargin) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val cents = graft.operators.KMeans.fitCentroids(emb, k = 5, iters = 2)
      graft.operators.KMeans.clusterQuality(emb, cents)
        .orderBy("cluster")
    },

    // Semantic train→eval contamination: q53's hash split over the
    // embeddings, q60's multi-table LSH bucketing bounds the train×eval
    // pairing, best train match per eval vector (cosine DESC, train_id
    // DESC — the max-struct order), verdict = cosine ≥ 0.40. The oracle
    // replays split, bucketing, pairing, and argmax.
    QueryDef("q118_semantic_contamination",
      eCte +
        s""",
        |bvm AS (SELECT vec_id, t, j,
        |               CASE WHEN ${VectorOps.planeDotSql("emb", "(t * 4 + j)", 64)} > 0
        |                    THEN (1::BIGINT << j) ELSE 0 END AS bitv
        |        FROM e, (SELECT unnest(range(0, 8)) AS t) tt,
        |                (SELECT unnest(range(0, 4)) AS j) jj),
        |bkm AS (SELECT vec_id, t, CAST(SUM(bitv) AS BIGINT) AS bucket
        |        FROM bvm GROUP BY vec_id, t),
        |sp AS (SELECT vec_id,
        |              (${graft.functions.TextOps.hash32Sql("CAST(vec_id AS VARCHAR)")} % 100) < 90 AS is_train
        |       FROM e),
        |pairs AS (SELECT DISTINCT v.vec_id AS eval_id, tr.vec_id AS train_id
        |          FROM bkm v JOIN sp sv ON sv.vec_id = v.vec_id AND NOT sv.is_train
        |               JOIN bkm tr ON tr.t = v.t AND tr.bucket = v.bucket
        |               JOIN sp st ON st.vec_id = tr.vec_id AND st.is_train),
        |scored AS (SELECT p.eval_id, p.train_id, ${cos("x.emb", "y.emb")} AS cosine
        |           FROM pairs p JOIN e x ON x.vec_id = p.eval_id
        |                        JOIN e y ON y.vec_id = p.train_id),
        |best AS (SELECT eval_id, train_id, cosine,
        |                row_number() OVER (PARTITION BY eval_id
        |                    ORDER BY cosine DESC, train_id DESC) AS rn
        |         FROM scored)
        |SELECT eval_id, train_id, cosine, cosine >= 0.40 AS contaminated
        |FROM best WHERE rn = 1 ORDER BY eval_id""".stripMargin) { (s, dir) =>
      Similarity.semanticContamination(Tables.embeddings(s, dir), 0.40)
        .orderBy("eval_id")
    },

    // TRAINED IVF: the q44 probe with q111's Lloyd centroids as the
    // coarse quantizer — the composition that closes the IVF story
    // (training-free seeds → trained cells). Corpus assignment is the
    // trainer's own argmax (a3), probes take their nprobe=2 best trained
    // cells, exact cosine ranks the candidates. Oracle composes q111's
    // Lloyd CTEs with q44's probe CTEs.
    QueryDef("q120_ann_ivf_trained",
      lloyd2Cte +
        s""",
        |a3 AS (SELECT vec_id, cluster FROM (
        |       SELECT e.vec_id, c2.cluster,
        |              row_number() OVER (PARTITION BY e.vec_id
        |                  ORDER BY ${cos("e.emb", "c2.c")} DESC, c2.cluster DESC) AS rn
        |       FROM e, c2) WHERE rn = 1),
        |qc AS (SELECT q_id, cluster AS cell FROM (
        |       SELECT e.vec_id AS q_id, c2.cluster,
        |              row_number() OVER (PARTITION BY e.vec_id
        |                  ORDER BY ${cos("e.emb", "c2.c")} DESC, c2.cluster DESC) AS rn
        |       FROM e, c2 WHERE e.vec_id < 5) WHERE rn <= 2),
        |scored AS (SELECT qc.q_id, a3.vec_id AS n_id, qc.cell,
        |                  ${cos("q.emb", "d.emb")} AS cosine
        |           FROM qc JOIN a3 ON a3.cluster = qc.cell
        |                JOIN e q ON q.vec_id = qc.q_id
        |                JOIN e d ON d.vec_id = a3.vec_id
        |           WHERE a3.vec_id <> qc.q_id)
        |SELECT q_id, n_id, cell, cosine,
        |       CAST(row_number() OVER (PARTITION BY q_id
        |            ORDER BY cosine DESC, n_id) AS INT) AS rk
        |FROM scored QUALIFY rk <= 5 ORDER BY q_id, rk""".stripMargin) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val cents = graft.operators.KMeans.fitCentroids(emb, k = 5, iters = 2)
      Similarity.ivfTopKTrained(emb, cents, queryMaxId = 5L, k = 5, nprobe = 2)
        .orderBy("q_id", "rk")
    },

    // Reciprocal-rank fusion (round 7): fuse two per-query rankings over
    // the same corpus — cosine top-20 and euclidean top-20 — by
    // fused = SUM(scale div (60 + rank)) per item, the standard
    // calibration-free retrieval combiner. Integer-scaled reciprocal
    // ranks (truncating div in both engines) make the fused board
    // hash-exact; the float form's summation order would not be. dist2
    // is q.q + d.d - 2*q.d from the SAME element-order dot folds the
    // oracle replays, so both input rankings agree rank-for-rank first.
    QueryDef("q156_rrf_fusion",
      eCte +
        s""",
        |cosr AS (
        |  SELECT q.vec_id AS q_id, d.vec_id AS n_id,
        |         CAST(row_number() OVER (PARTITION BY q.vec_id
        |              ORDER BY ${cos("q.emb", "d.emb")} DESC, d.vec_id) AS INT) AS rk
        |  FROM e q JOIN e d ON d.vec_id <> q.vec_id
        |  WHERE q.vec_id < 5
        |  QUALIFY rk <= 20),
        |l2r AS (
        |  SELECT q.vec_id AS q_id, d.vec_id AS n_id,
        |         CAST(row_number() OVER (PARTITION BY q.vec_id
        |              ORDER BY (${VectorOps.dotSql("q.emb", "q.emb", D)}
        |                        + ${VectorOps.dotSql("d.emb", "d.emb", D)}
        |                        - 2 * ${VectorOps.dotSql("q.emb", "d.emb", D)}),
        |                       d.vec_id) AS INT) AS rk
        |  FROM e q JOIN e d ON d.vec_id <> q.vec_id
        |  WHERE q.vec_id < 5
        |  QUALIFY rk <= 20),
        |u AS (SELECT * FROM cosr UNION ALL SELECT * FROM l2r),
        |f AS (SELECT q_id, n_id,
        |             CAST(SUM(1000000 // (60 + rk)) AS BIGINT) AS rrf,
        |             CAST(COUNT(*) AS BIGINT) AS n_lists
        |      FROM u GROUP BY 1, 2)
        |SELECT q_id, n_id, rrf, n_lists,
        |       CAST(row_number() OVER (PARTITION BY q_id
        |            ORDER BY rrf DESC, n_id) AS INT) AS frk
        |FROM f QUALIFY frk <= 10 ORDER BY q_id, frk""".stripMargin) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val cosR = Similarity.bruteForceTopK(emb, 5L, 20).select("q_id", "n_id", "rk")
      val l2R = Similarity.bruteForceTopKL2(emb, 5L, 20).select("q_id", "n_id", "rk")
      Similarity.rrfFuse(Seq(cosR, l2R), topK = 10)
        .select("q_id", "n_id", "rrf", "n_lists", "frk")
        .orderBy("q_id", "frk")
    },

    // Matryoshka truncation eval (round 7): per query, how many of the
    // full-dim cosine top-10 survive when ranking on only the FIRST 16
    // of 64 components — the measurement behind "can we store/serve a
    // prefix of the embedding". Integer overlap counts (left join +
    // count), hash-exact; the prefix fold touches the same 16 elements
    // in the same order in both engines.
    QueryDef("q160_matryoshka_recall",
      eCte +
        s""",
        |fd AS (
        |  SELECT q.vec_id AS q_id, d.vec_id AS n_id,
        |         CAST(row_number() OVER (PARTITION BY q.vec_id
        |              ORDER BY ${cos("q.emb", "d.emb")} DESC, d.vec_id) AS INT) AS rk
        |  FROM e q JOIN e d ON d.vec_id <> q.vec_id
        |  WHERE q.vec_id < 20 QUALIFY rk <= 10),
        |pre AS (
        |  SELECT q.vec_id AS q_id, d.vec_id AS n_id,
        |         CAST(row_number() OVER (PARTITION BY q.vec_id
        |              ORDER BY ${VectorOps.cosineSql("q.emb", "d.emb", 16)} DESC, d.vec_id) AS INT) AS rk
        |  FROM e q JOIN e d ON d.vec_id <> q.vec_id
        |  WHERE q.vec_id < 20 QUALIFY rk <= 10)
        |SELECT f.q_id, CAST(COUNT(p.n_id) AS BIGINT) AS n_overlap
        |FROM fd f LEFT JOIN pre p ON p.q_id = f.q_id AND p.n_id = f.n_id
        |GROUP BY f.q_id ORDER BY f.q_id""".stripMargin) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val full = Similarity.bruteForceTopK(emb, 20L, 10).select("q_id", "n_id")
      val pre = Similarity.bruteForceTopKPrefix(emb, 20L, 10, dims = 16)
        .select(col("q_id").as("pq"), col("n_id").as("pn"))
      full.join(pre,
        col("q_id") === col("pq") && col("n_id") === col("pn"), "left_outer")
        .groupBy("q_id").agg(count(col("pn")).as("n_overlap"))
        .orderBy("q_id")
    },

    // Deterministic contrastive negative sampling (round 7): for each
    // query, 5 corpus items drawn by (md5-hash, id) rank — the q157
    // reservoir draw — EXCLUDING the query's cosine top-20 (and itself):
    // "random negatives away from the positives", the contrastive-
    // training staple, reproducible across engines and re-runs so a
    // training set can be rebuilt byte-identically.
    QueryDef("q161_contrastive_negatives",
      eCte +
        s""",
        |top AS (
        |  SELECT q.vec_id AS q_id, d.vec_id AS n_id,
        |         CAST(row_number() OVER (PARTITION BY q.vec_id
        |              ORDER BY ${cos("q.emb", "d.emb")} DESC, d.vec_id) AS INT) AS rk
        |  FROM e q JOIN e d ON d.vec_id <> q.vec_id
        |  WHERE q.vec_id < 10 QUALIFY rk <= 20),
        |cand AS (
        |  SELECT q.vec_id AS q_id, d.vec_id AS n_id
        |  FROM e q JOIN e d ON d.vec_id <> q.vec_id
        |  WHERE q.vec_id < 10),
        |neg AS (SELECT c.q_id, c.n_id FROM cand c
        |        ANTI JOIN top t ON t.q_id = c.q_id AND t.n_id = c.n_id)
        |SELECT q_id, n_id, rn FROM (
        |  SELECT q_id, n_id,
        |         CAST(row_number() OVER (PARTITION BY q_id
        |              ORDER BY ('0x' || substr(md5(CAST(q_id AS VARCHAR) || ':' || CAST(n_id AS VARCHAR)), 1, 8))::BIGINT,
        |                       n_id) AS INT) AS rn
        |  FROM neg)
        |WHERE rn <= 5 ORDER BY q_id, rn""".stripMargin) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val top = Similarity.bruteForceTopK(emb, 10L, 20)
        .select(col("q_id").as("tq"), col("n_id").as("tn"))
      val q = emb.filter(col("vec_id") < 10).select(col("vec_id").as("q_id"))
      val cand = emb.select(col("vec_id").as("n_id"))
        .crossJoin(broadcast(q))
        .filter(col("n_id") =!= col("q_id"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("q_id")
        .orderBy(graft.functions.ScalarOps.md5Hash32(
          concat(col("q_id").cast("string"), lit(":"), col("n_id").cast("string"))),
          col("n_id"))
      cand
        .join(top, col("q_id") === col("tq") && col("n_id") === col("tn"), "left_anti")
        .withColumn("rn", row_number().over(w).cast(org.apache.spark.sql.types.IntegerType))
        .filter(col("rn") <= 5)
        .select("q_id", "n_id", "rn")
        .orderBy("q_id", "rn")
    },

    // Margin-based bitext mining (CCMatrix/LASER): best cross-"language"
    // neighbor per source vector scored by c1/mean(top-4) — the ratio
    // that rejects hubs whose whole neighborhood is uniformly close
    // (margin ≈ 1). Labels stand in for languages; the margin is a fixed
    // left-associated sum ÷ 4 + one division over the shared cosine
    // folds, so scores AND accept verdicts hash-match.
    QueryDef("q187_bitext_mining",
      eCte.replace("WITH e AS (SELECT vec_id",
        "WITH e AS (SELECT vec_id, label") +
        s""",
        |q AS (SELECT vec_id AS q_id, emb AS q_emb FROM e
        |      WHERE label = 0 AND vec_id < 1000),
        |t AS (SELECT vec_id, emb FROM e WHERE label = 1),
        |sc AS (SELECT q.q_id, t.vec_id, ${cos("q.q_emb", "t.emb")} AS cosine,
        |              CAST(row_number() OVER (PARTITION BY q.q_id
        |                   ORDER BY ${cos("q.q_emb", "t.emb")} DESC, t.vec_id)
        |                   AS INT) AS rk
        |       FROM q, t QUALIFY rk <= 4),
        |p AS (SELECT q_id,
        |             MAX(CASE WHEN rk = 1 THEN vec_id END) AS tgt_id,
        |             MAX(CASE WHEN rk = 1 THEN cosine END) AS c1,
        |             MAX(CASE WHEN rk = 2 THEN cosine END) AS c2,
        |             MAX(CASE WHEN rk = 3 THEN cosine END) AS c3,
        |             MAX(CASE WHEN rk = 4 THEN cosine END) AS c4
        |      FROM sc GROUP BY q_id)
        |SELECT q_id, tgt_id, c1,
        |       c1 / ((c1 + c2 + c3 + c4) / 4.0) AS margin,
        |       c1 / ((c1 + c2 + c3 + c4) / 4.0) > 1.15 AS accepted
        |FROM p ORDER BY q_id""".stripMargin) { (s, dir) =>
      Similarity.bitextMine(Tables.embeddings(s, dir),
        srcLabel = 0, tgtLabel = 1, srcMaxId = 1000L, threshold = 1.15)
        .orderBy("q_id")
    },

    // Ranking-quality eval (Retrieval.rankingEval): the single-table
    // LSH run (q42's shape, top-10) scored against brute-force truth
    // (q40, top-10) — per query the recall@10 numerator, the approx
    // rank of the true nearest neighbor, and integer-scaled reciprocal
    // rank. All-integer metrics; the eval itself is k-bounded per query
    // regardless of corpus size.
    QueryDef("q189_ranking_eval",
      bucketCte +
        s""",
        |tr AS (SELECT q.vec_id AS q_id, d.vec_id AS n_id,
        |              CAST(row_number() OVER (PARTITION BY q.vec_id
        |                   ORDER BY ${cos("q.emb", "d.emb")} DESC, d.vec_id)
        |                   AS INT) AS t_rk
        |       FROM e q JOIN e d ON d.vec_id <> q.vec_id
        |       WHERE q.vec_id < 5 QUALIFY t_rk <= 10),
        |eb AS (SELECT e.vec_id, emb, bucket FROM e JOIN bk USING (vec_id)),
        |ap AS (SELECT q.vec_id AS q_id, d.vec_id AS n_id,
        |              CAST(row_number() OVER (PARTITION BY q.vec_id
        |                   ORDER BY ${cos("q.emb", "d.emb")} DESC, d.vec_id)
        |                   AS INT) AS a_rk
        |       FROM eb q JOIN eb d ON q.bucket = d.bucket AND d.vec_id <> q.vec_id
        |       WHERE q.vec_id < 5 QUALIFY a_rk <= 10),
        |j AS (SELECT tr.q_id, tr.n_id, tr.t_rk, ap.a_rk
        |      FROM tr LEFT JOIN ap ON tr.q_id = ap.q_id AND tr.n_id = ap.n_id),
        |agg AS (SELECT q_id, CAST(COUNT(*) AS BIGINT) AS n_truth,
        |               CAST(SUM(CASE WHEN a_rk IS NOT NULL THEN 1 ELSE 0 END)
        |                    AS BIGINT) AS hits_at_k,
        |               MAX(CASE WHEN t_rk = 1 THEN coalesce(a_rk, 0) END)
        |                 AS rank_true1
        |        FROM j GROUP BY q_id)
        |SELECT q_id, n_truth, hits_at_k, rank_true1,
        |       CASE WHEN rank_true1 > 0 THEN 1000 // rank_true1 ELSE 0 END
        |         AS rr1000
        |FROM agg ORDER BY q_id""".stripMargin) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      graft.operators.Retrieval.rankingEval(
        Similarity.bruteForceTopK(emb, 5L, 10),
        Similarity.lshTopK(emb, 5L, 10))
        .orderBy("q_id")
    },

    // HYBRID retrieval — the q156 RRF fusion applied across MODALITIES:
    // the dense cosine ranking (embeddings) fused with the sparse BM25
    // ranking (documents, q188's integer-scaled scorer) for the same
    // query ids (vec_id ≡ doc_id in the corpus). This is the standard
    // production retrieval stack: neither signal alone ranks what both
    // agree on first; all arithmetic stays integer so the fused board
    // hash-matches cross-engine.
    QueryDef("q191_hybrid_retrieval",
      eCte +
        s""",
        |dr AS (
        |  SELECT q.vec_id AS q_id, d.vec_id AS n_id,
        |         CAST(row_number() OVER (PARTITION BY q.vec_id
        |              ORDER BY ${cos("q.emb", "d.emb")} DESC, d.vec_id) AS INT) AS rk
        |  FROM e q JOIN e d ON d.vec_id <> q.vec_id
        |  WHERE q.vec_id < 5
        |  QUALIFY rk <= 10),
        |ws AS (SELECT doc_id, unnest(${graft.functions.TextOps.wordsSql}) AS term
        |       FROM documents),
        |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        |       FROM ws GROUP BY doc_id, term),
        |st AS (SELECT doc_id, term, tf,
        |              CAST(SUM(tf) OVER (PARTITION BY doc_id) AS BIGINT) AS dl,
        |              CAST(COUNT(*) OVER (PARTITION BY term) AS BIGINT) AS df
        |       FROM tf),
        |c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
        |             CAST(SUM(len(${graft.functions.TextOps.wordsSql})) AS BIGINT)
        |               AS sdl FROM documents),
        |qt AS (SELECT DISTINCT doc_id AS q_id, term FROM ws WHERE doc_id < 5),
        |sc AS (SELECT qt.q_id, st.doc_id, st.tf,
        |              ((2 * n_docs - 2 * df + 1) * 1000) // (2 * df + 1) AS idf1000,
        |              250 + (750 * dl * n_docs) // sdl AS norm
        |       FROM st JOIN qt USING (term), c
        |       WHERE st.doc_id <> qt.q_id),
        |bagg AS (SELECT q_id, doc_id,
        |         CAST(SUM((idf1000 * 2200000 * tf)
        |                  // (tf * 1000000 + 1200 * norm)) AS BIGINT) AS s1000
        |         FROM sc GROUP BY q_id, doc_id),
        |lr AS (SELECT q_id, doc_id AS n_id,
        |              CAST(row_number() OVER (PARTITION BY q_id
        |                   ORDER BY s1000 DESC, doc_id) AS INT) AS rk
        |       FROM bagg QUALIFY rk <= 10),
        |u AS (SELECT q_id, n_id, rk FROM dr
        |      UNION ALL SELECT q_id, n_id, rk FROM lr),
        |f AS (SELECT q_id, n_id,
        |             CAST(SUM(1000000 // (60 + rk)) AS BIGINT) AS rrf,
        |             CAST(COUNT(*) AS BIGINT) AS n_lists
        |      FROM u GROUP BY 1, 2)
        |SELECT q_id, n_id, rrf, n_lists,
        |       CAST(row_number() OVER (PARTITION BY q_id
        |            ORDER BY rrf DESC, n_id) AS INT) AS frk
        |FROM f QUALIFY frk <= 10 ORDER BY q_id, frk""".stripMargin) { (s, dir) =>
      val dense = Similarity.bruteForceTopK(Tables.embeddings(s, dir), 5L, 10)
        .select("q_id", "n_id", "rk")
      val lex = graft.operators.Retrieval.bm25TopK(Tables.documents(s, dir), 5L, 10)
        .select("q_id", "n_id", "rk")
      Similarity.rrfFuse(Seq(dense, lex), topK = 10)
        .select("q_id", "n_id", "rrf", "n_lists", "frk")
        .orderBy("q_id", "frk")
    },

    // Leakage-safe split (Sampling.leakageSafeSplit): q53's hash split
    // keyed by the NEAR-DUP CLUSTER id (q73's components) instead of
    // the raw doc id, so a val document's near-copies cannot land in
    // train — the contamination path raw-id splits leave open on any
    // near-dup-heavy corpus. Unclustered docs are clusters of one.
    QueryDef("q192_leakage_safe_split",
      ccCte +
        s""",
        |sk AS (SELECT d.doc_id, coalesce(cc.cluster_id, d.doc_id) AS split_key
        |       FROM documents d LEFT JOIN cc ON cc.v = d.doc_id)
        |SELECT doc_id, split_key,
        |       CASE WHEN (${graft.functions.TextOps.hash32Sql(
                  "CAST(split_key AS VARCHAR)")} % 100) < 90
        |            THEN 'train' ELSE 'val' END AS split
        |FROM sk ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val clusters = Similarity.nearDupClusters(Tables.embeddings(s, dir), 0.40)
        .select(col("vec_id").as("id"), col("cluster_id"))
      graft.operators.Sampling.leakageSafeSplit(
        Tables.documents(s, dir).select("doc_id"), col("doc_id"), clusters,
        trainPct = 90)
        .select("doc_id", "split_key", "split")
        .orderBy("doc_id")
    },

    // Density outliers (Similarity.knnDistanceOutliers): the 30 vectors
    // whose 5th-most-similar same-bucket neighbor is farthest — sparse-
    // region/garbage embeddings a curation pass drops. Bucketed with the
    // q185 hot-bucket cap, never all-pairs; NULL k-th cosine (thin
    // neighborhood) sorts most-outlying. Complements q79: centroid
    // distance finds global strays, k-th-neighbor distance local ones.
    QueryDef("q195_knn_outliers",
      bucketCte +
        s""",
        |nb AS (SELECT bucket, COUNT(*) AS n FROM bk GROUP BY bucket),
        |cb AS (SELECT bk.vec_id, bk.bucket FROM bk
        |       JOIN nb USING (bucket) WHERE nb.n <= 200),
        |eb AS (SELECT cb.vec_id, e.emb, cb.bucket FROM cb JOIN e USING (vec_id)),
        |pr AS (SELECT a.vec_id, b.vec_id AS n_id,
        |              ${cos("a.emb", "b.emb")} AS cosine,
        |              CAST(row_number() OVER (PARTITION BY a.vec_id
        |                   ORDER BY ${cos("a.emb", "b.emb")} DESC, b.vec_id)
        |                   AS INT) AS rk
        |       FROM eb a JOIN eb b ON a.bucket = b.bucket
        |                          AND a.vec_id <> b.vec_id),
        |kt AS (SELECT vec_id, CAST(COUNT(*) AS BIGINT) AS n_cand,
        |              MAX(CASE WHEN rk = 5 THEN cosine END) AS kth_cos
        |       FROM pr GROUP BY vec_id),
        |al AS (SELECT cb.vec_id,
        |              CAST(coalesce(kt.n_cand, 0) AS BIGINT) AS n_cand,
        |              kt.kth_cos
        |       FROM cb LEFT JOIN kt USING (vec_id))
        |SELECT vec_id, n_cand, kth_cos,
        |       CAST(row_number() OVER (ORDER BY kth_cos ASC NULLS FIRST,
        |            vec_id) AS INT) AS rk
        |FROM al QUALIFY rk <= 30 ORDER BY rk""".stripMargin) { (s, dir) =>
      Similarity.knnDistanceOutliers(Tables.embeddings(s, dir), k = 5,
        bottomN = 30).orderBy("rk")
    },

    // MMR diversity selection (Retrieval.mmrSelect): greedy re-rank of
    // each query's 20-candidate pool, score = 0.7·rel − 0.3·max-sim to
    // the already-picked set — the standard fix for "my top-k are five
    // copies of the same page". The greedy loop is sequential in k, so
    // the oracle unrolls the 5 rounds (anti-join selected, max-sim,
    // per-query argmax). Both weights are LITERALS on both sides —
    // deriving 0.3 as 1.0−0.7 lands one ulp off the parsed literal and
    // the scores stop hash-matching. Picks AND scores hash-match.
    QueryDef("q196_mmr_select", {
      def round(r: Int) = {
        val p = r - 1
        s"""ms_$r AS (SELECT sm.q_id, sm.a AS n_id, MAX(sm.sim) AS maxsim
          |        FROM sm JOIN sel_$p s ON s.q_id = sm.q_id AND s.n_id = sm.b
          |        GROUP BY 1, 2),
          |sc_$r AS (SELECT cd.q_id, cd.n_id,
          |               0.7 * cd.rel - 0.3 * ms.maxsim AS score
          |        FROM cd JOIN ms_$r ms ON ms.q_id = cd.q_id AND ms.n_id = cd.n_id
          |        WHERE NOT EXISTS (SELECT 1 FROM sel_$p s
          |                          WHERE s.q_id = cd.q_id AND s.n_id = cd.n_id)),
          |pk_$r AS (SELECT q_id, n_id, $r AS pick, score FROM (
          |          SELECT q_id, n_id, score, row_number() OVER (PARTITION BY q_id
          |                 ORDER BY score DESC, n_id) AS rn FROM sc_$r)
          |        WHERE rn = 1),
          |sel_$r AS (SELECT q_id, n_id FROM sel_$p
          |         UNION ALL SELECT q_id, n_id FROM pk_$r)""".stripMargin
      }
      eCte +
        s""",
        |cd AS MATERIALIZED (
        |  SELECT q.vec_id AS q_id, d.vec_id AS n_id,
        |         ${cos("q.emb", "d.emb")} AS rel, d.emb AS emb,
        |         CAST(row_number() OVER (PARTITION BY q.vec_id
        |              ORDER BY ${cos("q.emb", "d.emb")} DESC, d.vec_id) AS INT) AS rk
        |  FROM e q JOIN e d ON d.vec_id <> q.vec_id
        |  WHERE q.vec_id < 5
        |  QUALIFY rk <= 20),
        |sm AS MATERIALIZED (
        |  SELECT a.q_id, a.n_id AS a, b.n_id AS b,
        |         ${cos("a.emb", "b.emb")} AS sim
        |  FROM cd a JOIN cd b USING (q_id) WHERE a.n_id <> b.n_id),
        |pk_1 AS (SELECT q_id, n_id, 1 AS pick, 0.7 * rel AS score
        |         FROM cd WHERE rk = 1),
        |sel_1 AS (SELECT q_id, n_id FROM pk_1),
        |${round(2)},
        |${round(3)},
        |${round(4)},
        |${round(5)}
        |SELECT q_id, n_id, pick, score FROM (
        |  SELECT * FROM pk_1 UNION ALL SELECT * FROM pk_2
        |  UNION ALL SELECT * FROM pk_3 UNION ALL SELECT * FROM pk_4
        |  UNION ALL SELECT * FROM pk_5)
        |ORDER BY q_id, pick""".stripMargin
    }) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val cand = Similarity.bruteForceTopK(emb, 5L, 20)
        .select(col("q_id"), col("n_id"), col("cosine").as("rel"))
        .join(emb.select(col("vec_id").as("n_id"), col("embedding")), Seq("n_id"))
      graft.operators.Retrieval.mmrSelect(cand, k = 5)
        .orderBy("q_id", "pick")
    },

    // nDCG@10 of the LSH run vs brute-force truth (Retrieval.ndcgEval)
    // — the graded companion of q189's binary hits. Position-discount
    // weights are ONE Scala-computed ×2^20 table interpolated into
    // both engines as literals (the SpectralTrig convention), so the
    // metric is integer end to end: gains, weights, both DCG sums, and
    // the final ratio.
    QueryDef("q200_ndcg", {
      val wVals = graft.operators.Retrieval.dcgWeights(10).zipWithIndex
        .map { case (wt, i) => s"(${i + 1}, ${wt})" }.mkString(", ")
      bucketCte +
        s""",
        |tr AS (SELECT q.vec_id AS q_id, d.vec_id AS n_id,
        |              CAST(row_number() OVER (PARTITION BY q.vec_id
        |                   ORDER BY ${cos("q.emb", "d.emb")} DESC, d.vec_id)
        |                   AS INT) AS t_rk
        |       FROM e q JOIN e d ON d.vec_id <> q.vec_id
        |       WHERE q.vec_id < 5 QUALIFY t_rk <= 10),
        |eb AS (SELECT e.vec_id, emb, bucket FROM e JOIN bk USING (vec_id)),
        |ap AS (SELECT q.vec_id AS q_id, d.vec_id AS n_id,
        |              CAST(row_number() OVER (PARTITION BY q.vec_id
        |                   ORDER BY ${cos("q.emb", "d.emb")} DESC, d.vec_id)
        |                   AS INT) AS a_rk
        |       FROM eb q JOIN eb d ON q.bucket = d.bucket AND d.vec_id <> q.vec_id
        |       WHERE q.vec_id < 5 QUALIFY a_rk <= 10),
        |w AS (SELECT * FROM (VALUES $wVals) AS t(rk, wt)),
        |g AS (SELECT q_id, n_id, CAST(11 - t_rk AS BIGINT) AS gain, t_rk FROM tr),
        |dc AS (SELECT ap.q_id,
        |              CAST(SUM(coalesce(g.gain, 0) * w.wt) AS BIGINT) AS dcg
        |       FROM ap JOIN w ON w.rk = ap.a_rk
        |               LEFT JOIN g ON g.q_id = ap.q_id AND g.n_id = ap.n_id
        |       GROUP BY 1),
        |ic AS (SELECT q_id, CAST(SUM(gain * w.wt) AS BIGINT) AS idcg
        |       FROM g JOIN w ON w.rk = g.t_rk GROUP BY 1)
        |SELECT dc.q_id, dcg, idcg, (dcg * 1000000) // idcg AS ndcg1e6
        |FROM dc JOIN ic USING (q_id) ORDER BY q_id""".stripMargin
    }) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      graft.operators.Retrieval.ndcgEval(
        Similarity.bruteForceTopK(emb, 5L, 10),
        Similarity.lshTopK(emb, 5L, 10), k = 10)
        .orderBy("q_id")
    },

    // Embedding-space drift (Similarity.embeddingDrift): per label, the
    // cosine between two snapshots' fixed-point centroids (vec_id
    // parity stands in for the snapshots) — q122's drift monitor lifted
    // to the embedding domain; a drifted re-crawl or silently-updated
    // embedding model surfaces as sub-1 centroid cosine before it
    // poisons training. Integer centroid sums (q79's convention) keep
    // the number engine-exact.
    QueryDef("q204_embedding_drift",
      eCte.replace("WITH e AS (SELECT vec_id",
        "WITH e AS (SELECT vec_id, label") +
        s""",
        |hx AS (SELECT label, vec_id % 2 AS half, emb FROM e
        |       WHERE len(emb) = $D),
        |comp AS (SELECT label, half, pos,
        |               CAST(SUM(CAST(round_even(emb[pos] * 1048576, 0) AS BIGINT))
        |                    AS BIGINT) AS s,
        |               COUNT(*) AS n
        |        FROM hx, (SELECT unnest(range(1, ${D + 1})) AS pos) p
        |        GROUP BY label, half, pos),
        |cent AS (SELECT label, half,
        |                list(CAST(s AS DOUBLE) / 1048576.0 / n ORDER BY pos)
        |                  AS centroid,
        |                MAX(n) AS n
        |         FROM comp GROUP BY label, half),
        |av AS (SELECT label, centroid AS ca, CAST(n AS BIGINT) AS n_a
        |       FROM cent WHERE half = 0),
        |bv AS (SELECT label, centroid AS cb, CAST(n AS BIGINT) AS n_b
        |       FROM cent WHERE half = 1)
        |SELECT av.label, n_a, n_b, ${cos("ca", "cb")} AS drift_cosine
        |FROM av JOIN bv USING (label) ORDER BY label""".stripMargin) { (s, dir) =>
      Similarity.embeddingDrift(Tables.embeddings(s, dir)).orderBy("label")
    },

    // Embedding-table audit gate — the DataQuality posture applied to
    // the vector column: per label, how many vectors are NULL, carry a
    // wrong dimension, contain a non-finite component, or are all-zero
    // (cosine-undefined). Every ANN/dedup operator upstream assumes
    // these are zero; the audit is the loud check that assumption rides
    // on. One map-side pass + one label-keyed aggregation.
    QueryDef("q208_embedding_audit",
      s"""SELECT label,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(CASE WHEN embedding IS NULL THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_null,
        |       CAST(SUM(CASE WHEN embedding IS NOT NULL
        |                     AND len(embedding) <> $D THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_wrong_dim,
        |       CAST(SUM(CASE WHEN embedding IS NOT NULL AND
        |                 len(list_filter(embedding,
        |                     x -> isnan(x) OR isinf(x))) > 0
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_nonfinite,
        |       CAST(SUM(CASE WHEN embedding IS NOT NULL AND
        |                 len(list_filter(embedding, x -> x <> 0)) = 0
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_zero
        |FROM embeddings GROUP BY label ORDER BY label""".stripMargin) { (s, dir) =>
      val e = col("embedding")
      Tables.embeddings(s, dir)
        .groupBy("label")
        .agg(count(lit(1)).as("n"),
          sum(when(e.isNull, 1L).otherwise(0L)).as("n_null"),
          sum(when(e.isNotNull && size(e) =!= Similarity.Dim, 1L).otherwise(0L))
            .as("n_wrong_dim"),
          sum(when(e.isNotNull &&
            size(filter(e, x => isnan(x) || x === Double.PositiveInfinity ||
              x === Double.NegativeInfinity)) > 0, 1L).otherwise(0L))
            .as("n_nonfinite"),
          sum(when(e.isNotNull && size(filter(e, x => x =!= 0f)) === 0, 1L)
            .otherwise(0L)).as("n_zero"))
        .orderBy("label")
    }
  )

  /** q111's two full Lloyd rounds (seeds → assign → fixed-point update,
    * twice) as a reusable CTE chain ending at `c2`, the final centroid
    * set. Composed by q111 (final assignment) and q117 (quality report).
    */
  private lazy val lloyd2Cte =
    eCte +
      s""",
      |cand AS (SELECT vec_id, emb FROM e WHERE vec_id % 100 = 0
      |         ORDER BY vec_id LIMIT 5),
      |c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cluster,
      |              emb AS c
      |       FROM cand),
      |a1 AS (SELECT vec_id, cluster FROM (
      |       SELECT e.vec_id, c0.cluster,
      |              row_number() OVER (PARTITION BY e.vec_id
      |                  ORDER BY ${cos("e.emb", "c0.c")} DESC, c0.cluster DESC) AS rn
      |       FROM e, c0) WHERE rn = 1),
      |m1 AS (SELECT a1.cluster, pos,
      |              CAST(SUM(CAST(round_even(emb[pos] * 1048576, 0) AS BIGINT)) AS BIGINT) AS s,
      |              COUNT(*) AS n
      |       FROM e JOIN a1 USING (vec_id),
      |            (SELECT unnest(range(1, ${D + 1})) AS pos) p
      |       GROUP BY a1.cluster, pos),
      |c1 AS (SELECT cluster, list(CAST(s AS DOUBLE) / 1048576.0 / n ORDER BY pos) AS c
      |       FROM m1 GROUP BY cluster),
      |a2 AS (SELECT vec_id, cluster FROM (
      |       SELECT e.vec_id, c1.cluster,
      |              row_number() OVER (PARTITION BY e.vec_id
      |                  ORDER BY ${cos("e.emb", "c1.c")} DESC, c1.cluster DESC) AS rn
      |       FROM e, c1) WHERE rn = 1),
      |m2 AS (SELECT a2.cluster, pos,
      |              CAST(SUM(CAST(round_even(emb[pos] * 1048576, 0) AS BIGINT)) AS BIGINT) AS s,
      |              COUNT(*) AS n
      |       FROM e JOIN a2 USING (vec_id),
      |            (SELECT unnest(range(1, ${D + 1})) AS pos) p
      |       GROUP BY a2.cluster, pos),
      |c2 AS (SELECT cluster, list(CAST(s AS DOUBLE) / 1048576.0 / n ORDER BY pos) AS c
      |       FROM m2 GROUP BY cluster)""".stripMargin
}
