package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

/** Deterministic stratified sampling: rate accuracy, stability, and the
  * monotone-subset property that makes resampling incremental (raising a
  * rate only ADDS rows — the kept set at r1 is a subset of the kept set
  * at r2 > r1, so a curriculum can grow a sample without reshuffling it).
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val rows =
    (1L to 4000L).map(i => (i, if (i % 4 == 0) "en" else "de")).toDF("k", "g").cache()

  test("keep fraction tracks the basis-point rate per group") {
    val kept = Sampling.stratified(rows, col("k"), col("g"),
      Map("en" -> 9000), defaultBp = 2500)
      .groupBy("g").count().as[(String, Long)].collect().toMap
    val nEn = 1000.0
    val nDe = 3000.0
    assert(math.abs(kept("en") / nEn - 0.90) < 0.05, s"en kept ${kept("en")}")
    assert(math.abs(kept("de") / nDe - 0.25) < 0.05, s"de kept ${kept("de")}")
  }

  test("membership is deterministic and monotone in the rate") {
    def keys(bp: Int): Set[Long] =
      Sampling.stratified(rows, col("k"), col("g"), Map.empty, defaultBp = bp)
        .select("k").as[Long].collect().toSet
    val half = keys(5000)
    assert(keys(5000) == half) // stable across runs
    assert(half.subsetOf(keys(9000))) // raising the rate only adds rows
  }

  test("mixture keeps ALL of the binding group despite IEEE quota round-down") {
    // share 0.7 with count 3: T = 3/0.7, 0.7·T = 2.9999999999999996 in
    // IEEE — a bare floor() would drop one row of the SCARCEST group,
    // the one group the contract keeps whole (regression)
    val df = ((1 to 3).map(i => (i.toLong, "a")) ++ (1 to 50).map(i => (100L + i, "b")))
      .toDF("k", "g")
    val kept = Sampling.mixture(df, col("k"), col("g"), Map("a" -> 0.7, "b" -> 0.3))
      .groupBy("g").count().as[(String, Long)].collect().toMap
    assert(kept("a") == 3L, s"binding group must survive whole, kept ${kept.get("a")}")
    // the rest resample toward their share: quota_b = floor(0.3·(3/0.7)+ε) = 1
    assert(kept.getOrElse("b", 0L) == 1L)
  }

  test("upsample: multiplicity tracks bp/10000 and whole copies are exact") {
    val up = Sampling.upsample(rows, col("k"), col("g"),
      Map("en" -> 24000, "de" -> 5000), defaultBp = 10000).cache()
    val byGroup = up.groupBy("g").count().as[(String, Long)].collect().toMap
    // en: 1000 rows × 2.4 epochs; de: 3000 × 0.5
    assert(math.abs(byGroup("en") / 1000.0 - 2.4) < 0.1, s"en ${byGroup("en")}")
    assert(math.abs(byGroup("de") / 3000.0 - 0.5) < 0.05, s"de ${byGroup("de")}")
    // every en row appears at least twice (whole part), copies numbered 1..n
    val copies = up.filter(col("g") === "en").groupBy("k")
      .agg(count(lit(1)).as("n"), max("copy").as("mx"), min("copy").as("mn"))
      .as[(Long, Long, Long, Long)].collect()
    assert(copies.length == 1000)
    copies.foreach { case (k, n, mx, mn) =>
      assert(n >= 2 && n <= 3 && mn == 1 && mx == n, s"row $k: n=$n")
    }
    // weight 1.0 (default group) reproduces the input exactly
    val ones = Sampling.upsample(rows, col("k"), col("g"), Map.empty, 10000)
    assert(ones.count() == 4000 && ones.select(max("copy")).head().getLong(0) == 1L)
    up.unpersist()
  }

  test("reservoirK: exactly k per group, deterministic, prefix-stable") {
    val r20 = Sampling.reservoirK(rows, col("k"), col("g"), 20)
    val sizes = r20.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(sizes == Map("en" -> 20L, "de" -> 20L), s"sizes $sizes")
    // deterministic across partitionings
    val again = Sampling.reservoirK(rows.repartition(13), col("k"), col("g"), 20)
      .select("k", "g", "rn").as[(Long, String, Int)].collect().toSet
    assert(again == r20.select("k", "g", "rn").as[(Long, String, Int)].collect().toSet)
    // the k=5 draw is exactly the rn <= 5 prefix of the k=20 draw
    val r5 = Sampling.reservoirK(rows, col("k"), col("g"), 5)
      .select("k", "g", "rn").as[(Long, String, Int)].collect().toSet
    assert(r5 == again.filter(_._3 <= 5), "prefix property violated")
    // a group smaller than k returns the whole group
    val tiny = Sampling.reservoirK(
      Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("k", "g"), col("k"), col("g"), 20)
    assert(tiny.count() == 3)
  }

  test("reservoirK: rank filter pushes down to a per-partition group limit") {
    // Spark's WindowGroupLimit turns rn <= k into a partial top-k BEFORE
    // the shuffle — the property that keeps a billion-row group from
    // moving wholesale. If the optimizer stops seeing the pattern, the
    // operator silently degrades to a full-group sort: pin the plan.
    val plan = Sampling.reservoirK(rows, col("k"), col("g"), 20)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank pushdown missing from plan:\n$plan")
  }

  test("sqrtCapped: big groups downsample to c*sqrt(n), small groups pass whole") {
    // en: 3600 rows → quota 3·60 = 180; de: 100 → 3·10 = 30; xx: 5 → min(5, 3·2=6) = 5
    val df = ((1L to 3600L).map(i => (i, "en")) ++
      (4001L to 4100L).map(i => (i, "de")) ++
      (5001L to 5005L).map(i => (i, "xx"))).toDF("k", "g")
    val kept = Sampling.sqrtCapped(df, col("k"), col("g"), c = 3L)
      .groupBy("g").count().as[(String, Long)].collect().toMap
    assert(kept === Map("en" -> 180L, "de" -> 30L, "xx" -> 5L))
    // deterministic membership, not just counts
    val a = Sampling.sqrtCapped(df, col("k"), col("g"), c = 3L)
      .select("k").as[Long].collect().sorted.toSeq
    val b = Sampling.sqrtCapped(df.repartition(13), col("k"), col("g"), c = 3L)
      .select("k").as[Long].collect().sorted.toSeq
    assert(a === b)
  }

  test("curriculum: epochs anneal wider, final epoch is the corpus, shard seqs contiguous") {
    val docs = (1L to 400L).map(i => (i, i)).toDF("doc_id", "q") // quality = id
    val out = Sampling.curriculum(docs, col("doc_id"), col("q"),
      epochCaps = Seq(3, 6, 10), nShards = 4)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getInt(4)))
    val byEpoch = out.groupBy(_._1)
    // strictly widening admission, everything admitted at the end
    assert(byEpoch(1).size < byEpoch(2).size && byEpoch(2).size < byEpoch(3).size)
    assert(byEpoch(3).size === 400)
    // epoch 1 admits only deciles ≤ 3, and they are the HIGH-quality docs
    assert(byEpoch(1).forall(_._5 <= 3))
    val epoch1MinQ = byEpoch(1).map(_._4).min
    assert(byEpoch(3).filter(_._5 > 3).forall(_._4 < epoch1MinQ),
      "every decile>3 doc must rank below epoch-1's worst admit")
    // per (epoch, shard) the sequence is 1..count with no gaps
    out.groupBy(t => (t._1, t._2)).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (1L to rows.size).toSeq)
    }
    // deterministic: same input, same schedule
    val again = Sampling.curriculum(docs, col("doc_id"), col("q"),
      epochCaps = Seq(3, 6, 10), nShards = 4)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(again.sortBy(t => (t._1, t._2, t._3)).toSeq ===
      out.map(t => (t._1, t._2, t._3, t._4)).sortBy(t => (t._1, t._2, t._3)).toSeq)
  }

  test("leakageSafeSplit: cluster members co-travel; singletons hash their own id") {
    val docs = (1L to 400L).toDF("doc_id")
    // two clusters: {1..10} labeled 1, {11..14} labeled 11; rest unclustered
    val clusters = ((1L to 10L).map(_ -> 1L) ++ (11L to 14L).map(_ -> 11L))
      .toDF("id", "cluster_id")
    val out = Sampling.leakageSafeSplit(docs, col("doc_id"), clusters, trainPct = 90)
      .select("doc_id", "split_key", "split")
      .as[(Long, Long, String)].collect().toSeq
    val byDoc = out.map(r => r._1 -> ((r._2, r._3))).toMap
    // every member of a cluster carries the cluster key and ONE split
    assert((1L to 10L).map(byDoc(_)).toSet.size === 1)
    assert((11L to 14L).map(byDoc(_)).toSet.size === 1)
    assert(byDoc(3L)._1 === 1L && byDoc(12L)._1 === 11L)
    // unclustered docs key on themselves, and both splits actually occur
    assert(byDoc(200L)._1 === 200L)
    assert(out.map(_._3).toSet === Set("train", "val"))
    // ~90 % lands in train (hash-deterministic, so exact per fixture)
    val trainFrac = out.count(_._3 == "train").toDouble / out.size
    assert(math.abs(trainFrac - 0.9) < 0.06, s"train fraction $trainFrac")
  }
}
