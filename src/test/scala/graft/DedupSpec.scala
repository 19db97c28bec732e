package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextAnalysis}

/** Dedup family invariants on a tiny hand-built corpus. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),    // exact dup of 1
    (3L, "The  quick BROWN fox, jumps over the lazy dog!"), // normalized dup of 1
    (4L, "completely different text with no overlap at all here"),
    (5L, "the quick brown fox jumps over the sleepy dog")   // near-dup of 1
  ).toDF("doc_id", "text")

  test("exact: identical texts collapse to min doc_id") {
    val m = Dedup.exact(docs).select("canonical_id", "n_copies")
      .as[(Long, Long)].collect().toMap
    assert(m(1L) == 2) // docs 1,2
    assert(m.values.sum == 5 && m.size == 4)
  }

  test("fingerprint: normalization collapses punctuation/case/whitespace variants") {
    val got = Dedup.fingerprint(docs).select("doc_id", "canonical_id", "is_dup")
      .as[(Long, Long, Int)].collect().map { case (d, c, i) => d -> ((c, i)) }.toMap
    assert(got(1L) == ((1L, 0)) && got(2L) == ((1L, 1)) && got(3L) == ((1L, 1)))
    assert(got(4L) == ((4L, 0)) && got(5L) == ((5L, 0)))
  }

  test("shingles: n-3 word 3-grams, distinct, empty under 3 words") {
    val short = Seq((9L, "only two")).toDF("doc_id", "text")
    assert(Dedup.shingles(short).isEmpty)
    val s1 = Dedup.shingles(docs.filter(col("doc_id") === 1)).as[(Long, String)].collect()
    assert(s1.length == 7) // 9 words → 7 shingles, all distinct here
    assert(s1.map(_._2).contains("the quick brown"))
  }

  test("minhash long form equals the naive per-permutation formulation") {
    val naive = Dedup.shingles(docs)
      .withColumn("base31",
        graft.functions.TextOps.hash32(col("shingle")).bitwiseAND(lit(0x7FFFFFFFL)))
      .withColumn("perm", explode(sequence(lit(0), lit(7))))
      .groupBy("doc_id", "perm")
      .agg(min(expr(s"(CASE perm ${(0 until 8).map(j =>
        s"WHEN $j THEN ${Dedup.permA(j)} * base31 + ${Dedup.permB(j)}").mkString(" ")} END) % ${Dedup.MinhashMod}")).as("h"))
      .select("doc_id", "perm", "h").as[(Long, Int, Long)].collect().toSet
    val wide = Dedup.minhashSignatures(docs, 8)
      .select("doc_id", "perm", "h").as[(Long, Int, Long)].collect().toSet
    assert(wide == naive)
  }

  test("lsh: identical docs always collide; disjoint docs never do") {
    val wide = Dedup.minhashWide(docs, 8)
    val pairs = Dedup.lshCandidatePairs(wide, 2, 8)
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))             // identical signatures
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L)) // no shared shingles
  }

  test("simhash: identical docs get identical hashes; hamming(1,5) < hamming(1,4)") {
    val h = Dedup.simhash(docs).as[(Long, Long)].collect().toMap
    assert(h(1L) == h(2L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(h(1L), h(5L)) < hamming(h(1L), h(4L)))
  }

  test("connectedComponents: transitive closure to min-id labels; disjoint stay disjoint") {
    // chain 1-2-3-4-5 (diameter 4, needs several propagation rounds),
    // pair 10-11, and 3-1 closing a cycle — still one component
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L), (3L, 1L))
      .toDF("d1", "d2")
    // both the driver (small-graph) and distributed paths must agree
    val driver = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    val distributed = Dedup.connectedComponents(pairs, smallGraphEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(driver == distributed)
    val cc = driver
    assert(Seq(1L, 2L, 3L, 4L, 5L).forall(cc(_) == 1L))
    assert(cc(10L) == 10L && cc(11L) == 10L)
    assert(cc.size == 7) // vertices with no edges never appear
  }

  test("connectedComponents: reliable-checkpoint mode reclaims superseded rounds") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cc").toFile
    spark.sparkContext.setCheckpointDir(dir.getAbsolutePath)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("d1", "d2")
    // smallGraphEdges = 0 forces the DISTRIBUTED loop (the driver path
    // would solve this graph in one collect and snapshot nothing)
    val cc = Dedup.connectedComponents(pairs, smallGraphEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(cc(_) == 1L) && cc(11L) == 10L)
    // SparkContext nests a UUID dir under the configured path
    val ccDirs = dir.listFiles().flatMap(d =>
      if (d.getName.startsWith("graft-cc-")) Array(d)
      else Option(d.listFiles()).getOrElse(Array.empty[java.io.File])
        .filter(_.getName.startsWith("graft-cc-")))
    assert(ccDirs.length == 1)
    // only the FINAL round's edge snapshot survives (it backs the
    // returned labels) — every superseded round, including the initial
    // oriented edge set, was deleted as soon as its successor materialized
    val steps = ccDirs.head.listFiles().map(_.getName).filter(_.startsWith("step-"))
    assert(steps.length == 1, s"leaked round snapshots: ${steps.mkString(",")}")
  }

  test("stars CC: premature-convergence counterexample labels correctly (regression)") {
    // after one large+small round these edges reach {(2,1),(4,1),(2,0),
    // (5,0)}: sources and targets disjoint, but vertex 2 points at two
    // would-be centers — the src/dst-disjoint check ALONE declared
    // convergence here and split one component into clusters {1,2,4} and
    // {0,2,5} with conflicting labels for 2 (found in review; the
    // out-degree-1 condition now forces further rounds)
    val pairs = Seq((1L, 4L), (5L, 0L), (4L, 2L), (5L, 2L)).toDF("d1", "d2")
    val got = Dedup.connectedComponentsStars(pairs).as[(Long, Long)].collect()
    assert(got.length == got.map(_._1).distinct.length, "conflicting labels for one vertex")
    val m = got.toMap
    assert(m == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 4L -> 0L, 5L -> 0L),
      s"one component, min id 0; got $m")
  }

  test("stars CC ≡ min-label CC ≡ driver BFS on random graphs (property)") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      val pairs = (1 to 120)
        .map(_ => (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
        .filter(p => p._1 != p._2).toDF("d1", "d2")
      val stars = Dedup.connectedComponentsStars(pairs)
        .as[(Long, Long)].collect().toMap
      val minLabel = Dedup.connectedComponentsMinLabel(pairs, maxIter = 100)
        .as[(Long, Long)].collect().toMap
      val bfs = Dedup.connectedComponents(pairs).as[(Long, Long)].collect().toMap
      assert(stars == minLabel, s"trial $trial: stars disagree with min-label")
      assert(stars == bfs, s"trial $trial: stars disagree with driver BFS")
    }
  }

  test("stars CC: 1000-vertex chain (diameter 999) converges in O(log n) rounds") {
    val pairs = (0L until 999L).map(i => (i, i + 1)).toDF("d1", "d2")
    val sym = pairs.select($"d1".as("src"), $"d2".as("dst"))
      .union(pairs.select($"d2".as("src"), $"d1".as("dst"))).distinct()
    val (labels, rounds) = Dedup.starsWithRounds(sym, maxIter = 30)
    info(s"1000-chain converged in $rounds rounds")
    assert(rounds <= 10, s"expected O(log n) rounds, took $rounds")
    val m = labels.as[(Long, Long)].collect().toMap
    assert(m.size == 1000 && m.values.forall(_ == 0L),
      "every chain vertex must label to the minimum id 0")
    // min-label would need ≈999 rounds here — it is the oracle twin, not
    // the production path (connectedComponents routes large graphs to stars)
  }

  test("contamination: flags are consistent and exact duplicates across the split leak") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val got = TextAnalysis.contamination(docs, 90)
      .select("doc_id", "n_shingles", "n_shared", "contamination", "is_contaminated")
      .as[(Long, Long, Long, Double, Int)].collect()
    assert(got.nonEmpty)
    got.foreach { case (_, total, shared, ratio, flag) =>
      assert(shared >= 0L && shared <= total)
      assert(ratio >= 0.0 && ratio <= 1.0)
      assert(flag == (if (shared > 0) 1 else 0))
    }
    // the fixture corpus has exact duplicate texts (q30), so with a 90/10
    // split some eval doc shares shingles with train
    assert(got.exists(_._5 == 1))
  }

  test("jaccardTopK: near-dup ranks first for the query, bounded by k") {
    val got = Dedup.jaccardTopK(docs, queryMaxId = 2L, k = 3)
      .select("q_id", "d_id", "rk").as[(Long, Long, Int)].collect()
    val q1 = got.filter(_._1 == 1L).sortBy(_._3)
    assert(q1.head._2 == 2L)     // exact dup: jaccard 1.0
    assert(q1.length <= 3)
  }

  test("containment: a truncated doc scores 1.0 toward its container, asymmetrically") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      // doc 2 is a strict prefix of doc 1: every shingle of 2 is in 1
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "totally unrelated words in this other document here now")
    ).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(corpus, tauPct = 70)
      .select("a", "b", "containment").as[(Long, Long, Double)].collect()
      .map { case (a, b, c) => (a, b) -> c }.toMap
    assert(got((2L, 1L)) == 1.0, "the truncation is fully contained")
    // symmetric Jaccard here is 3/8 — a 0.7 Jaccard pass would keep both
    assert(!got.contains((1L, 2L)), "the container is NOT contained in the fragment")
    assert(!got.keys.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("hammingNearPairs: equals brute-force hamming<=1, each pair exactly once") {
    val fixture = Seq(
      (1L, 0x0000), (2L, 0x0001), (3L, 0x0001), (4L, 0x8001),
      (5L, 0x00FF), (6L, 0x00FE), (7L, 0x1234))
    val got = Dedup.hammingNearPairs(fixture.toDF("media_id", "sig"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    // exactly-once: the dim-grain formulation needs no DISTINCT — a
    // duplicate here means the direction argument in the scaladoc broke
    assert(got.map(p => (p._1, p._2)).distinct.length == got.length,
      s"duplicate pairs emitted: $got")
    val brute = for {
      (a, sa) <- fixture; (b, sb) <- fixture if a < b
      h = Integer.bitCount(sa ^ sb) if h <= 1
    } yield (a, b, h)
    assert(got.toSet == brute.toSet)
  }

  test("hammingNearPairs: hot signatures drop from BOTH probe and carrier sides") {
    // 101 carriers of sig 7 (over maxBucket=100) + one hamming-1 neighbor:
    // the hot bucket must vanish entirely — no within-bucket pairs AND no
    // cross pairs into it from the neighbor's probes
    val hot = (1L to 101L).map(i => (i, 7))
    val near = Seq((200L, 6), (201L, 6)) // 6 ^ 7 = 1 bit
    val got = Dedup.hammingNearPairs((hot ++ near).toDF("media_id", "sig"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set((200L, 201L, 0)))
  }

  test("containment cache hygiene: no orphaned cache survives the call (r11 ADVICE)") {
    val sc = spark.sparkContext
    spark.catalog.clearCache()
    assert(sc.getPersistentRDDs.isEmpty, "dirty cache going in")
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "totally unrelated words in this other document here now")
    ).toDF("doc_id", "text")
    val res = Dedup.containmentPairs(corpus, tauPct = 70)
    res.collect()
    // The call's documented working set — the corpus-grain shingle table
    // and the doc-grain aggregate, both reachable from the returned plan
    // and caller-releasable — may remain. The df≥2 dim (dfc2) must NOT:
    // it is unreachable from outside, so surviving = a per-call leak.
    val live = sc.getPersistentRDDs.size
    assert(live <= 2, s"containmentPairs leaked caches: $live persistent RDDs " +
      "survive (working-set contract allows sh + docAgg only; the df dim must " +
      "be unpersisted once docAgg materializes)")
    spark.catalog.clearCache()
    assert(sc.getPersistentRDDs.isEmpty, "clearCache must release the working set")
  }

  test("docAggMemo is a size-1 LRU: a second corpus evicts the first's aggregate (r12 verdict #2)") {
    val sc = spark.sparkContext
    spark.catalog.clearCache()
    assert(sc.getPersistentRDDs.isEmpty, "dirty cache going in")
    def corpus(tag: String) = Seq(
      (1L, s"alpha beta gamma delta epsilon zeta eta theta $tag one"),
      (2L, s"alpha beta gamma delta epsilon $tag two"),
      (3L, s"totally unrelated words in this other document $tag three")
    ).toDF("doc_id", "text")
    Dedup.containmentPairs(corpus("first"), tauPct = 70).collect()
    assert(Dedup.docAggMemoCensus(spark) == 1, "first corpus memoized")
    val liveAfterFirst = sc.getPersistentRDDs.size
    // A DIFFERENT corpus (different canonical plan) must REPLACE the slot,
    // unpersisting the first corpus's doc-grain aggregate — not accumulate
    // one cached corpus-scale aggregate per distinct input for the
    // session's lifetime.
    Dedup.containmentPairs(corpus("second"), tauPct = 70).collect()
    assert(Dedup.docAggMemoCensus(spark) == 1,
      "memo retains at most ONE aggregate after a distinct second corpus")
    // blocking=false eviction: census proves the slot flipped; the block
    // count must not GROW corpus-over-corpus (allow the in-flight one).
    val liveAfterSecond = sc.getPersistentRDDs.size
    assert(liveAfterSecond <= liveAfterFirst + 1,
      s"second corpus grew the cache census $liveAfterFirst -> $liveAfterSecond: " +
        "replaced aggregate was not unpersisted")
    // Same corpus again: the memo must HIT (no new persistent RDD).
    val before = sc.getPersistentRDDs.size
    Dedup.containmentPairs(corpus("second"), tauPct = 70).collect()
    assert(sc.getPersistentRDDs.size == before,
      "re-running the memoized corpus must not materialize a new aggregate")
    spark.catalog.clearCache()
  }

  test("containment: prefix filtering is lossless vs the naive all-pairs formulation") {
    // a corpus dense in shared shingles (the adversarial case for any
    // blocking scheme): every doc shares boilerplate with every other
    val boiler = "lorem ipsum dolor sit amet"
    val corpus = Seq(
      (1L, s"$boiler unique one text body alpha beta gamma"),
      (2L, s"$boiler unique one text body alpha beta gamma"), // dup of 1
      (3L, s"$boiler unique one text body"),                  // truncation of 1/2
      (4L, s"$boiler something else entirely different here"),
      (5L, s"$boiler yet another unrelated body text here")
    ).toDF("doc_id", "text")
    for (tauPct <- Seq(50, 70, 90, 100)) {
      val fast = Dedup.containmentPairs(corpus, tauPct)
        .select("a", "b", "common").as[(Long, Long, Long)].collect().toSet
      // naive truth: every co-occurring pair, exact intersection, same
      // integer threshold — no prefix pruning anywhere
      val sh = Dedup.shingles(corpus).persist()
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
      val naive = sh.select(col("doc_id").as("a"), col("shingle"))
        .join(sh.select(col("doc_id").as("b"), col("shingle")), Seq("shingle"))
        .filter(col("a") =!= col("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("common"))
        .join(sizes.select(col("doc_id").as("a"), col("sz").as("sz_a")), Seq("a"))
        .filter(col("common") * 100 >= lit(tauPct.toLong) * col("sz_a"))
        .select("a", "b", "common").as[(Long, Long, Long)].collect().toSet
      sh.unpersist()
      assert(fast == naive, s"tauPct=$tauPct: prefix filter must lose nothing, " +
        s"missing=${naive -- fast} extra=${fast -- naive}")
    }
  }

  test("containment maxShingleDf: hot-shingle pairs are the only loss, clean pairs survive intact") {
    // 40 docs that are containment pairs ONLY through a shared hot
    // boilerplate sentence (its interior shingles hit df=40), plus one
    // clean truncation pair whose shingles are rare (df=2). The cap
    // drops shingles hotter than 5 from the candidate join: boilerplate
    // pairs vanish (bounded work), the clean pair is untouched.
    val boiler = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"
    val hot = (1L to 40L).map(i => (i, s"$boiler tail$i"))
    val clean = Seq(
      (100L, "zebra quokka wombat numbat bilby dunnart"),
      (101L, "zebra quokka wombat numbat bilby dunnart plus extra words here"))
    val corpus = (hot ++ clean).toDF("doc_id", "text")
    val full = Dedup.containmentPairs(corpus, tauPct = 70)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val capped = Dedup.containmentPairs(corpus, tauPct = 70, maxShingleDf = Some(5))
      .select("a", "b").as[(Long, Long)].collect().toSet
    // never a false positive: the cap only loses pairs
    assert(capped.subsetOf(full))
    // the clean low-df pair survives with its exact scores
    assert(capped.contains((100L, 101L)))
    // every lost pair went through the hot boilerplate block
    val lost = full -- capped
    assert(lost.nonEmpty, "fixture must actually exercise the cap")
    assert(lost.forall { case (a, b) => a <= 40L && b <= 40L },
      s"cap must only drop boilerplate-mediated pairs: $lost")
    info(s"maxShingleDf=5: kept=${capped.size} lost=${lost.size} of ${full.size}")
  }

  test("calibrateShingleDfCap: exact floor covers every test SF, √n growth past it") {
    // the floor is load-bearing: every driver corpus (500/500/5000 docs)
    // must resolve to None so q86's pinned oracle hashes never move
    for (n <- Seq(0L, 500L, 5000L, 20000L))
      assert(Dedup.calibrateShingleDfCap(n).isEmpty, s"n=$n must stay exact")
    assert(Dedup.calibrateShingleDfCap(20001L).contains(284))  // 2·⌈√20001⌉
    assert(Dedup.calibrateShingleDfCap(500000L).contains(1416)) // 2·⌈√500000⌉
    // monotone non-decreasing past the floor (no calibration cliff)
    val caps = Seq(30000L, 100000L, 1000000L, 100000000L)
      .map(Dedup.calibrateShingleDfCap(_).get)
    assert(caps == caps.sorted)
  }

  test("containment calibrated default: zipf fixture past the floor — boilerplate capped, clean pair exact") {
    // zipf-shaped df distribution at n > floorDocs: one df=400 boilerplate
    // head, a df=2 clean truncation pair, and a 20k unique-shingle tail.
    // n = 20402 → calibrated cap = 2·⌈√20402⌉ = 286 < 400, so the cap
    // fires on exactly the boilerplate shingles and nothing else.
    val boiler = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"
    val hot = (1L to 400L).map(i => (i, s"$boiler tail$i"))
    val clean = Seq(
      (100100L, "zebra quokka wombat numbat bilby dunnart"),
      (100101L, "zebra quokka wombat numbat bilby dunnart plus extra words here"))
    val tail = (1L to 20000L).map(i => (200000L + i, s"u${i}a u${i}b u${i}c u${i}d u${i}e"))
    val corpus = (hot ++ clean ++ tail).toDF("doc_id", "text")
    val calibrated = Dedup.containmentPairs(corpus, tauPct = 70)
      .select("a", "b", "containment").as[(Long, Long, Double)].collect()
    val pairs = calibrated.map { case (a, b, _) => (a, b) }.toSet
    // the clean rare-shingle pair survives with its exact score
    assert(pairs.contains((100100L, 100101L)))
    assert(calibrated.collect { case (100100L, 100101L, c) => c }.head == 1.0)
    // boilerplate-mediated pairs are cut (the bounded-work trade) and the
    // unique-shingle tail generates nothing — survivors are ONLY clean
    assert(pairs == Set((100100L, 100101L)),
      s"calibrated cap must cut exactly the boilerplate pairs: $pairs")
    // calibrate = false restores the exact (super-linear) behavior
    val exactPairs = Dedup.containmentPairs(corpus, tauPct = 70, calibrate = false)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs.subsetOf(exactPairs) && (exactPairs -- pairs)
      .forall { case (a, b) => a <= 400L && b <= 400L })
    info(s"calibrated kept=${pairs.size}, exact=${exactPairs.size}")
  }

  test("keepCanonical: one best-quality survivor per cluster, singletons survive") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", 44L),
      (2L, "the quick brown fox jumps over the lazy dog", 44L),   // dup of 1
      (3L, "the quick brown fox jumps over the lazy dog extended with more text", 68L), // longer near-dup
      (4L, "completely different text with no overlap at all here", 54L)
    ).toDF("doc_id", "text", "n_chars")
    val got = Dedup.keepCanonical(corpus)
      .select("doc_id", "cluster_id", "kept").as[(Long, Long, Int)].collect()
      .map { case (d, c, k) => d -> ((c, k)) }.toMap
    assert(got.size == 4, "one row per input doc")
    assert(got(4L) == ((4L, 1)), "singleton keeps itself")
    val clustered = got.filter(_._2._1 != 4L)
    // whoever clustered with doc 3, the longest member is the survivor
    if (got(3L)._1 == got(1L)._1) {
      assert(got(3L)._2 == 1, "longest text must be the kept representative")
      assert(got(1L)._2 == 0 && got(2L)._2 == 0)
    } else {
      // LSH may not band 3 with 1/2 (2-row band hashes are strict): then
      // 1/2 form the cluster and min-id-on-tie keeps 1
      assert(got(1L)._2 == 1 && got(2L)._2 == 0)
      assert(got(3L)._2 == 1)
    }
    assert(clustered.nonEmpty)
  }

  test("incremental dedup == plain anti-join; bloom is invisible in the answer") {
    val corpus = Seq((1L, "aa bb"), (2L, "cc dd"), (3L, "ee ff")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "aa bb"),   // dup of corpus 1 → dropped
      (11L, "gg hh"),   // new
      (12L, "cc dd"),   // dup of corpus 2 → dropped
      (13L, "gg hh"),   // batch-INTERNAL dup of 11 — both survive by design
      (14L, "ii jj")).toDF("doc_id", "text")
    val key = (df: org.apache.spark.sql.DataFrame) => md5(col("text"))
    val got = Dedup.incremental(batch, corpus, key)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(got == Seq(11L, 13L, 14L))
    // equivalence with the unfiltered anti-join (the bloom only prunes)
    val plain = batch.withColumn("k", md5(col("text")))
      .join(corpus.select(md5(col("text")).as("k")), Seq("k"), "left_anti")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(got == plain)
  }

  test("incremental dedup against an EMPTY corpus keeps the whole batch") {
    val corpus = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val batch = Seq((1L, "aa"), (2L, "bb")).toDF("doc_id", "text")
    val got = Dedup.incremental(batch, corpus, df => md5(col("text")))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 2L), "null sketch must mean 'nothing seen', not 'drop everything'")
  }

  test("semanticDedup: min-id member of a tight neighborhood survives, distinct vectors keep") {
    // one cell (only centroid is vec_id 0): v1 duplicates v0 (cos = 1),
    // v2 is orthogonal to both, v3 duplicates v2 but at scaled magnitude
    // (cosine ignores norm)
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(2.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.0f, 5.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = graft.operators.Similarity.semanticDedup(emb, threshold = 0.9)
      .orderBy("vec_id").select("vec_id", "kept").as[(Long, Boolean)].collect().toSeq
    assert(got == Seq((0L, true), (1L, false), (2L, true), (3L, false)),
      "lower id survives each tight pair; orthogonal vectors are untouched")
  }

  test("semanticContamination: planted eval duplicate is flagged; split membership honored") {
    import org.apache.spark.sql.functions.col
    // replicate the operator's q53 split rule to pick ids on each side
    val ids = (0L until 200L).toSeq
    val h = ids.toDF("vec_id")
      .select(col("vec_id"),
        (graft.functions.TextOps.hash32(col("vec_id").cast("string")) % 100).as("h"))
      .as[(Long, Long)].collect().toMap
    val evalIds = ids.filter(h(_) >= 90)
    val trainIds = ids.filter(h(_) < 90)
    assert(evalIds.nonEmpty && trainIds.nonEmpty)
    val (dupEval, dupTrain) = (evalIds.head, trainIds.head)
    // dim 63 is unique to the planted pair; everyone else lives on dims 0-31
    def vec(i: Long): Array[Float] =
      if (i == dupEval || i == dupTrain)
        Array.tabulate(64)(d => if (d == 63) 10f else 0.01f)
      else Array.tabulate(64)(d => if (d == (i % 32).toInt) 10f else 0.01f)
    val emb = ids.map(i => (i, vec(i))).toDF("vec_id", "embedding")
    val got = graft.operators.Similarity.semanticContamination(emb, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    val evalSet = evalIds.toSet
    val trainSet = trainIds.toSet
    got.foreach { case (e2, t2, _, _) =>
      assert(evalSet.contains(e2), s"eval_id $e2 not in the eval split")
      assert(trainSet.contains(t2), s"train_id $t2 not in the train split")
    }
    val planted = got.find(_._1 == dupEval)
    assert(planted.isDefined, "planted duplicate must surface as a candidate")
    val (_, tId, cosv, flag) = planted.get
    assert(tId == dupTrain && cosv > 0.999 && flag,
      s"planted match wrong: $planted")
  }
  test("weighted minhash: repetition separates docs set minhash conflates") {
    import org.apache.spark.sql.functions._
    // same shingle SET, different bags: doc 1 repeats its phrase 4x
    val rep = Seq(
      (1L, Seq.fill(4)("alpha beta gamma").mkString(" . ").replace(" . ", " alpha beta gamma ")),
      (2L, "alpha beta gamma")
    ).toDF("doc_id", "text")
    val ws = Dedup.weightedShingles(rep, cap = 4)
      .as[(Long, String, Long)].collect().groupBy(_._1)
    // doc 1 carries weights > 1 somewhere; doc 2 all weight 1
    assert(ws(1L).exists(_._3 > 1L))
    assert(ws(2L).forall(_._3 == 1L))
    // expansion is capped: no weight exceeds 4 even for heavy repetition
    assert(ws.values.flatten.forall(_._3 <= 4L))
  }

  test("weighted minhash: identical bags produce identical signatures") {
    val two = Seq(
      (1L, "one two three one two three one two three"),
      (2L, "one two three one two three one two three")
    ).toDF("doc_id", "text")
    val sigs = Dedup.weightedMinhashWide(two, 16)
      .collect().map(r => r.toSeq.drop(1)).toList
    assert(sigs.size == 2 && sigs.head == sigs(1))
  }

  test("shingleNovelty: template clones score zero, a unique doc scores 1e6") {
    import spark.implicits._
    // docs 1 and 2 are identical templates (every shingle shared);
    // doc 3 is entirely its own; doc 4 half-shares doc 3's opening
    val docs = Seq(
      (1L, "terms of service apply to all users"),
      (2L, "terms of service apply to all users"),
      (3L, "completely original prose nothing repeats here at all"),
      (4L, "completely original prose but then it diverges")).toDF("doc_id", "text")
    val got = Dedup.shingleNovelty(docs)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(got(1L)._3 === 0L && got(2L)._3 === 0L, s"template clones: $got")
    // doc 3 shares exactly one shingle ("completely original prose") with 4
    assert(got(3L)._1 === 6L && got(3L)._2 === 1L)
    assert(got(3L)._3 === (5L * 1000000L) / 6L)
    assert(got(4L)._2 === 1L && got(4L)._3 === 800000L) // 4 of 5 own
  }
}
