package graft

import org.apache.spark.sql.DataFrame
import graft.operators.Similarity

/** Recall@k of the approximate ANN paths (sign-LSH, IVF) against the
  * brute-force ground truth on the sf0.001 embeddings corpus — the
  * quality number that makes "approximate" a measured trade, not a hope.
  * Floors are set below the measured values (see README) so a regression
  * in the bucketing/probing logic fails the suite, while run-to-run
  * stability (everything here is deterministic) keeps it exact.
  */
class AnnRecallSpec extends SparkSpec {

  private val SfDir = "/root/testdata/sf0.001"
  private val QueryMaxId = 20L
  private val K = 10

  private def recallVs(truth: DataFrame, approx: DataFrame): Double = {
    val t = truth.select("q_id", "n_id")
    val hit = approx.select("q_id", "n_id").intersect(t).count().toDouble
    hit / t.count()
  }

  test("LSH and IVF top-k recall vs brute force stays above the measured floor") {
    val emb = Tables.embeddings(spark, SfDir).cache()
    try {
      val truth = Similarity.bruteForceTopK(emb, QueryMaxId, K).cache()
      val lsh1 = recallVs(truth, Similarity.lshTopK(emb, QueryMaxId, K))
      val lshM = recallVs(truth, Similarity.lshTopKMulti(emb, QueryMaxId, K))
      val lshP = recallVs(truth, Similarity.lshTopKMultiProbe(emb, QueryMaxId, K))
      val ivf = recallVs(truth, Similarity.ivfTopK(emb, QueryMaxId, K))
      val ivfT = recallVs(truth, Similarity.ivfTopKTrained(emb,
        graft.operators.KMeans.fitCentroids(emb, k = 5, iters = 2),
        QueryMaxId, K, nprobe = 2))
      info(f"recall@$K vs brute force: lsh1=$lsh1%.3f lshMulti=$lshM%.3f " +
        f"lshMultiProbe=$lshP%.3f ivf=$ivf%.3f ivfTrained=$ivfT%.3f")
      // trained cells must not degrade the untrained probe's floor
      assert(ivfT >= 0.40, s"trained-IVF recall collapsed: $ivfT")
      // a single 8-plane table keeps a neighbor only when all 8 signs
      // match — it exists as the bucketing primitive, not the prod path.
      // Floor 0.005: under the DECORRELATED plane weights (round 9) the
      // 8 bits are honest ~independent bits (256 buckets over 2000
      // vectors), so p^8 at moderate cosine is legitimately ~1% — the
      // old 0.02 was an artifact of the raw-LCG planes' adjacent-bit
      // correlation making buckets effectively coarser. The check still
      // catches collapse-to-zero; the production floors (multi-table
      // 0.50, multi-probe 0.75) are unchanged and pass.
      assert(lsh1 >= 0.005, s"single-table LSH recall collapsed: $lsh1")
      // 8 tables x 4 planes is the production path: 1-(1-p^4)^8
      assert(lshM >= 0.50, s"multi-table LSH recall collapsed: $lshM")
      assert(ivf >= 0.40, s"IVF recall collapsed: $ivf")
      assert(lshM > lsh1, "multi-table must dominate single-table recall")
      // multi-probe (2 Hamming-1 probes/table) is the high-recall path
      assert(lshP >= 0.75, s"multi-probe LSH recall below floor: $lshP")
      assert(lshP > lshM, "multi-probe must dominate plain multi-table recall")
      // the approximations must actually cut candidate work vs brute
      // force — candidates are bounded by bucket/cell collisions; probing
      // grows candidates by at most ×(1+probes) over plain multi-table
      val n = emb.count()
      val lshCand = Similarity.lshTopK(emb, QueryMaxId, Int.MaxValue).count()
      val multiCand = Similarity.lshTopKMulti(emb, QueryMaxId, Int.MaxValue).count()
      val probeCand = Similarity.lshTopKMultiProbe(emb, QueryMaxId, Int.MaxValue).count()
      info(s"candidates (of ${n * QueryMaxId} brute-force pairs): " +
        s"lsh1=$lshCand multi=$multiCand multiProbe=$probeCand")
      assert(lshCand < n * QueryMaxId, "LSH candidate set degenerated to brute force")
      assert(probeCand < n * QueryMaxId, "multi-probe candidate set degenerated to brute force")
      assert(probeCand <= multiCand * 3, "multi-probe candidate growth exceeds its ×(1+probes) bound")
      truth.unpersist()
    } finally emb.unpersist()
  }

  test("bucketed near-dup: no false positives, candidate recall above floor") {
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, SfDir).cache()
    try {
      val th = 0.40
      val n = emb.count()
      // ground truth: the quadratic pair set at the same threshold
      val truth = Similarity.nearDupPairs(emb, n, Int.MaxValue)
        .filter(col("cosine") >= th).select("d1", "d2").cache()
      val lsh = Similarity.nearDupPairsLsh(emb, th).select("d1", "d2").cache()
      val nTruth = truth.count().toDouble
      val hits = lsh.intersect(truth).count().toDouble
      info(f"near-dup pairs: truth=${nTruth.toLong} lsh=${lsh.count()} recall=${hits / nTruth}%.3f")
      assert(lsh.count() == hits, "bucketed near-dup produced a pair below threshold")
      assert(hits / nTruth >= 0.40, s"candidate recall collapsed: ${hits / nTruth}")
      truth.unpersist(); lsh.unpersist()
    } finally emb.unpersist()
  }

  test("SQ8 quantize-then-rerank recall vs brute force stays above its floor") {
    val emb = Tables.embeddings(spark, SfDir).cache()
    try {
      val truth = Similarity.bruteForceTopK(emb, QueryMaxId, K).cache()
      // a 2×k shortlist from the 8-bit codes, exact rerank on top
      val sq8 = recallVs(truth, Similarity.sq8TopK(emb, QueryMaxId, K, candidates = 2 * K))
      val pq = recallVs(truth, Similarity.pqTopK(emb, QueryMaxId, K, candidates = 2 * K))
      info(f"recall@$K vs brute force: sq8(rerank 2k)=$sq8%.3f pq(rerank 2k)=$pq%.3f")
      // PQ at 8×3-bit codes is far coarser than SQ8's 64×8-bit — its ADC
      // shortlist misses more, but must beat the hashing families' floor
      assert(pq >= 0.30, s"PQ ADC rerank recall below floor: $pq")
      val ivfpq = recallVs(truth, Similarity.ivfPqTopK(emb, QueryMaxId, K,
        nprobe = 2, step = 100L, candidates = 2 * K))
      info(f"recall@$K vs brute force: ivfpq(nprobe 2, rerank 2k)=$ivfpq%.3f")
      // bounded by the IVF probe recall times the PQ shortlist quality
      assert(ivfpq >= 0.20, s"IVF-PQ recall below floor: $ivfpq")
      // 8-bit scalar quantization preserves neighborhoods far better than
      // the hashing families (measured 1.000 here); floor pinned just
      // below so any geometry regression — e.g. ranking by raw code dot,
      // which measured 0.110 — fails loudly
      assert(sq8 >= 0.95, s"SQ8 rerank recall below floor: $sq8")
      truth.unpersist()
    } finally emb.unpersist()
  }

  test("RRF fusion: consensus items outrank single-list items; integer-deterministic") {
    import spark.implicits._
    // two rankings for one query: item 100 is rank 1 in BOTH lists;
    // item 200 is rank 1 in one list only. RRF must put 100 first
    // (2/(60+1) beats 1/(60+1) + nothing), and every single-list item's
    // fused score is dominated by any item in both lists at decent ranks.
    val listA = Seq((0L, 100L, 1), (0L, 200L, 2), (0L, 300L, 3)).toDF("q_id", "n_id", "rk")
    val listB = Seq((0L, 100L, 1), (0L, 400L, 2), (0L, 300L, 4)).toDF("q_id", "n_id", "rk")
    val fused = Similarity.rrfFuse(Seq(listA, listB), topK = 10)
      .select("n_id", "rrf", "n_lists", "frk")
      .as[(Long, Long, Long, Int)].collect().sortBy(_._4)
    assert(fused.head._1 == 100L, s"consensus item not first: ${fused.toList}")
    assert(fused.head._3 == 2L, "n_lists must count both contributing lists")
    // 300 appears in both lists (ranks 3 and 4) and must beat the
    // single-list rank-2 items: 1e6/63 + 1e6/64 > 1e6/62
    val byId = fused.map(f => f._1 -> f._4).toMap
    assert(byId(300L) < byId(200L) && byId(300L) < byId(400L),
      s"two-list item must outrank one-list items: ${fused.toList}")
    // integer scores: exact values, no float drift
    assert(fused.head._2 == 2L * (1000000L / 61L))
  }

  test("RRF fusion on the corpus: cosine+L2 fusion stays consistent with cosine truth") {
    val emb = Tables.embeddings(spark, SfDir)
    val cosR = Similarity.bruteForceTopK(emb, QueryMaxId, K).select("q_id", "n_id", "rk")
    val l2R = Similarity.bruteForceTopKL2(emb, QueryMaxId, K).select("q_id", "n_id", "rk")
    val fused = Similarity.rrfFuse(Seq(cosR, l2R), topK = K)
    // fusing two strongly-correlated rankings keeps recall near 1 vs
    // either input; floor pinned below the measured value
    val rec = recallVs(cosR.withColumnRenamed("rk", "r"), fused)
    assert(rec >= 0.8, s"fused recall vs cosine list below floor: $rec")
  }

  test("embeddingDrift: identical snapshots score exactly 1.0; a shifted half scores below") {
    import spark.implicits._
    // label 0: both halves identical vectors → centroids equal → cos = 1.0
    // label 1: odd half rotated toward the second axis → cos < 1
    val rows =
      (0L until 40L).map(i => (i, Seq(1.0f, 0.0f, 0.0f, 0.0f), 0)) ++
        (100L until 140L).map(i => (i,
          if (i % 2 == 0) Seq(1.0f, 0.0f, 0.0f, 0.0f)
          else Seq(0.0f, 1.0f, 0.0f, 0.0f), 1))
    val emb = rows.toDF("vec_id", "embedding", "label")
    val out = Similarity.embeddingDrift(emb, dim = 4)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    assert(out(0) === ((20L, 20L, 1.0)))
    assert(out(1)._3 < 0.01, s"orthogonal halves must show full drift: ${out(1)}")
  }

  test("calibrateLshGeometry: default floor at test-SF sizes, width bound and recall target beyond") {
    import Similarity.calibrateLshGeometry
    // the floor is the reproducibility contract: every driver SF keeps
    // the default 8x4 geometry the DuckDB oracles hard-code
    assert(calibrateLshGeometry(500L) === ((8, 4)))   // sf0.001 / sf0.01
    assert(calibrateLshGeometry(2000L) === ((8, 4)))  // sf0.1
    assert(calibrateLshGeometry(0L) === ((8, 4)))
    // one vector past the floor the bands widen
    assert(calibrateLshGeometry(2001L)._2 > 4)
    // the r8 scaling-audit corpus (20k) gets 2^8 = 256 buckets/table
    assert(calibrateLshGeometry(20000L) === ((9, 8)))
    for (n <- Seq(5000L, 20000L, 1000000L, 100000000L)) {
      val (l, b) = calibrateLshGeometry(n)
      // expected bucket width stays at or under the target
      assert(n.toDouble / (1L << b) <= 125.0, s"n=$n geometry=($l,$b)")
      // closed-form multi-table recall at the design similarity holds
      val p = 1.0 - math.acos(0.90) / math.Pi
      val r = 1.0 - math.pow(1.0 - math.pow(p, b), l)
      assert(r >= 0.95, s"n=$n geometry=($l,$b) design recall $r")
      // planes never exceed the Long-bucket/codegen bound
      assert(b <= 24 && l <= 128)
    }
    // monotone: more data never narrows the bands
    val bs = Seq(2000L, 4000L, 16000L, 64000L, 1000000L)
      .map(calibrateLshGeometry(_)._2)
    assert(bs === bs.sorted)
  }

  test("calibrated geometry: planted near-dup recall >= target, candidate work bounded") {
    import spark.implicits._
    // 6000 vectors — past the 2000-vector floor, so calibration fires
    // (expected (6, 6): 64 buckets/table). 5880 independent gaussians +
    // 60 planted near-dup pairs at cosine ~0.995.
    val rnd = new scala.util.Random(42)
    def gauss(): Array[Float] = Array.fill(Similarity.Dim)(rnd.nextGaussian().toFloat)
    val base = (0 until 5880).map(i => (i.toLong, gauss()))
    val planted = (0 until 60).flatMap { i =>
      val u = gauss()
      val v = u.zip(gauss()).map { case (x, g) => x + 0.08f * g }
      Seq((10000L + 2 * i, u), (10000L + 2 * i + 1, v))
    }
    val emb = (base ++ planted).toDF("vec_id", "embedding")
    val geo = Similarity.calibrateLshGeometry(6000L)
    assert(geo !== ((8, 4)), "calibration must fire past the floor")
    val got = Similarity.nearDupPairsLsh(emb, 0.90)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    // random 64-dim gaussian cosines concentrate at ~N(0, 1/64): nothing
    // unplanted clears 0.90, so found pairs ARE the planted recall
    val truth = (0 until 60).map(i => (10000L + 2 * i, 10000L + 2 * i + 1)).toSet
    assert(got.subsetOf(truth), s"false positives: ${got -- truth}")
    val recall = got.size.toDouble / truth.size
    info(f"calibrated geometry=$geo planted recall=$recall%.3f")
    assert(recall >= 0.95, s"calibrated recall below the 0.95 target: $recall")
    // the point of calibration: within-bucket pair work under the
    // calibrated geometry is a fraction of the default geometry's
    def pairWork(tables: Int, planes: Int): Long =
      Similarity.lshBucketsMulti(emb, tables, planes)
        .groupBy("t", "bucket").count()
        .agg(org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.expr("count * (count - 1) div 2")))
        .as[Long].head()
    val calibrated = pairWork(geo._1, geo._2)
    val fixed = pairWork(8, 4)
    info(s"within-bucket candidate pairs: calibrated=$calibrated fixed-default=$fixed")
    assert(calibrated * 2 < fixed,
      s"calibration must at least halve candidate work: $calibrated vs $fixed")
  }

  test("calibrateIvfStep: default floor at test-SF sizes, sqrt(2n) balance beyond, broadcast clamp") {
    import Similarity.calibrateIvfStep
    // floor: every driver SF keeps the oracle-pinned step-100 cells
    assert(calibrateIvfStep(500L) === 100L)   // sf0.001 / sf0.01
    assert(calibrateIvfStep(2000L) === 100L)  // sf0.1
    assert(calibrateIvfStep(10000L) === 100L) // floor edge: n <= step^2
    assert(calibrateIvfStep(10001L) !== 100L)
    // sqrt(2n): where assignment work n^2/step meets pair work n*step/2
    assert(calibrateIvfStep(200000L) === math.round(math.sqrt(400000.0)))
    // the centroid broadcast stays bounded: cells = n/step <= 65536
    for (n <- Seq(20000L, 200000L, 10000000L, 10000000000L)) {
      val s = calibrateIvfStep(n)
      assert(n / s <= 65536L, s"n=$n step=$s cells=${n / s}")
    }
    // monotone: more data never shrinks the step
    val ss = Seq(10001L, 50000L, 200000L, 5000000L).map(calibrateIvfStep(_))
    assert(ss === ss.sorted)
  }

  test("calibrated IVF cells: planted semantic dups survive calibration, no false drops") {
    import spark.implicits._
    // 12000 vectors — past the 10000-vector floor, so calibration fires
    // (step 155, ~77 cells). 11880 independent gaussians + 60 planted
    // near-dup pairs at cosine ~0.999; semanticDedup must drop exactly
    // the higher-id twin (twins share their argmax centroid almost
    // surely at this noise level — the recall the calibrated cell size
    // is allowed to cost is pinned at 0.9).
    val rnd = new scala.util.Random(43)
    def gauss(): Array[Float] = Array.fill(Similarity.Dim)(rnd.nextGaussian().toFloat)
    val base = (0 until 11880).map(i => (i.toLong, gauss()))
    val planted = (0 until 60).flatMap { i =>
      val u = gauss()
      val v = u.zip(gauss()).map { case (x, g) => x + 0.05f * g }
      Seq((20000L + 2 * i, u), (20000L + 2 * i + 1, v))
    }
    val emb = (base ++ planted).toDF("vec_id", "embedding")
    val step = Similarity.calibrateIvfStep(12000L)
    assert(step !== 100L, "calibration must fire past the floor")
    val dropped = Similarity.semanticDedup(emb, 0.90)
      .filter(!org.apache.spark.sql.functions.col("kept"))
      .select("vec_id").as[Long].collect().toSet
    val expected = (0 until 60).map(i => 20000L + 2 * i + 1).toSet
    val found = dropped.intersect(expected)
    info(s"planted dups dropped: ${found.size}/60 under calibrated step=$step; " +
      s"false drops: ${(dropped -- expected).size}")
    // random 64-dim gaussian cosines are ~N(0, 1/64): 0.90 is 7.2 sigma,
    // so any non-planted drop is a real defect, not noise
    assert((dropped -- expected).isEmpty, s"false drops: ${dropped -- expected}")
    assert(found.size >= 54, s"calibrated-cell dup recall collapsed: ${found.size}/60")
  }

  test("capBucketWidth bounds a degenerate bucket and the lost pairs are exactly quantified") {
    import spark.implicits._
    // adversarial skew: 300 IDENTICAL vectors — every table maps all of
    // them to one bucket, so uncapped pair work is C(300,2) per table
    val v = Array.tabulate(Similarity.Dim)(d => (math.sin(d + 1).toFloat))
    val emb = (0L until 300L).map(i => (i, v)).toDF("vec_id", "embedding")
    val noCap = Similarity.nearDupPairsLsh(emb, 0.99, capBucketWidth = None,
      calibrate = false).select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(noCap.size === 300 * 299 / 2)
    val capped = Similarity.nearDupPairsLsh(emb, 0.99, capBucketWidth = Some(50),
      calibrate = false).select("d1", "d2").as[(Long, Long)].collect().toSet
    // deterministic cap: the 50 lowest vec_ids survive in every table,
    // so the surviving pairs are exactly C(50,2) and a strict subset
    assert(capped.size === 50 * 49 / 2)
    assert(capped.subsetOf(noCap))
    assert(capped.forall { case (a, b) => a < 50 && b < 50 })
    info(s"cap=50 on a 300-wide degenerate bucket: kept=${capped.size} " +
      s"lost=${noCap.size - capped.size} of ${noCap.size}")
    // and the default cap (1000) is a no-op here — widths under it
    val dflt = Similarity.nearDupPairsLsh(emb, 0.99, calibrate = false)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(dflt === noCap)
  }

  test("kNN-distance outliers: board sorted most-isolated-first, thin neighborhoods lead") {
    val emb = Tables.embeddings(spark, SfDir)
    val out = Similarity.knnDistanceOutliers(emb, k = 5, bottomN = 30)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)), r.getInt(3)))
    assert(out.length === 30 && out.map(_._4).toSeq === (1 to 30))
    // non-null kth cosines ascend (most isolated first)...
    val cos = out.flatMap(_._3)
    assert(cos.toSeq === cos.sorted.toSeq)
    // ...and every NULL (fewer than k same-bucket neighbors) outranks
    // every scored vector
    val firstScored = out.indexWhere(_._3.isDefined)
    if (firstScored >= 0)
      assert(out.take(firstScored).forall(_._3.isEmpty) &&
        out.drop(firstScored).forall(_._3.isDefined))
    // the board is deterministic: re-running yields the same rows
    val again = Similarity.knnDistanceOutliers(emb, k = 5, bottomN = 30)
      .collect().map(r => (r.getLong(0), r.getInt(3)))
    assert(again.toSeq === out.map(t => (t._1, t._4)).toSeq)
  }
}
