package graft

import org.apache.spark.sql.functions._
import graft.operators.UnigramLm

/** Unigram-LM tokenizer invariants: the integer Viterbi layer against a
  * brute-force enumeration, and the float EM layer's likelihood
  * monotonicity (the Kudo 2018 contract an oracle can't express).
  */
class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "internal international nation national notation"),
    (2L, "internal internal nation station stationary"),
    (3L, "interns intern nation notation internal"),
    (4L, "art artist artistic station nation nations")
  ).toDF("doc_id", "text")

  /** All segmentations of `w` into vocab pieces (maxlen MaxPiece). */
  private def allSegs(w: String, vocab: Set[String]): Seq[List[String]] =
    if (w.isEmpty) Seq(Nil)
    else (1 to math.min(UnigramLm.MaxPiece, w.length)).flatMap { l =>
      val p = w.substring(0, l)
      if (vocab.contains(p)) allSegs(w.substring(l), vocab).map(p :: _) else Nil
    }

  test("seed vocab keeps every single char and exactly the top multis") {
    val v = UnigramLm.seedVocab(docs).as[(String, Long)].collect()
    val chars = docs.as[(Long, String)].collect()
      .flatMap(_._2.split("\\s+")).filter(_.length >= 2).flatMap(_.toSeq).toSet
    assert(v.filter(_._1.length == 1).map(_._1.head).toSet == chars)
    assert(v.count(_._1.length >= 2) <= UnigramLm.TopPieces)
    // counts are freq-weighted occurrence counts: "nation" appears as a
    // substring of national/nations/... so its count exceeds its word freq
    val cnt = v.toMap
    assert(cnt("nation") > cnt.getOrElse("notation", 0L))
  }

  test("integer viterbi matches brute-force enumeration of the objective") {
    val vocab = UnigramLm.seedVocab(docs).as[(String, Long)].collect().toMap
    val got = UnigramLm.viterbiSegment(docs)
      .select("w", "score", "n_tokens", "toks")
      .as[(String, Long, Int, String)].collect()
    assert(got.nonEmpty)
    got.foreach { case (w, score, ntoks, toks) =>
      val segs = allSegs(w, vocab.keySet)
      assert(segs.nonEmpty, s"no segmentation for $w")
      // objective: fewest pieces, then max count-sum
      val bestCost = segs.map(s => (s.length, -s.map(vocab).sum)).min
      assert((ntoks, -score) == bestCost, s"$w: got ($ntoks,$score) want $bestCost")
      assert(toks.replace(" ", "") == w && toks.split(" ").length == ntoks)
      toks.split(" ").foreach(p => assert(vocab.contains(p), s"$w used non-vocab piece $p"))
    }
  }

  test("corpus encode: doc token sums equal the per-word DP results") {
    val seg = UnigramLm.viterbiSegment(docs)
      .select("w", "n_tokens").as[(String, Int)].collect().toMap
    val got = UnigramLm.encodeCorpus(docs)
      .select("doc_id", "n_words", "n_unigram_tokens")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    docs.as[(Long, String)].collect().foreach { case (id, text) =>
      val ws = text.toLowerCase.trim.split("\\s+").toSeq
      val want = ws.map(w => seg.getOrElse(w, 1).toLong).sum
      assert(got(id) == ((ws.length.toLong, want)), s"doc $id")
    }
  }

  test("EM corpus log-likelihood is non-decreasing across iterations") {
    val (lp, lls) = UnigramLm.emTrain(docs, iters = 5, targetSize = 60)
    assert(lls.length == 5)
    lls.sliding(2).foreach { case Seq(a, b) =>
      assert(b >= a - 1e-9, s"likelihood decreased: $lls")
    }
    // trained model is a distribution: sum of probs ~ 1
    val z = lp.values.map(math.exp).sum
    assert(math.abs(z - 1.0) < 1e-6)
  }

  test("EM prune keeps singles, respects target size, words stay segmentable") {
    val (lp, _) = UnigramLm.emTrain(docs, iters = 3, targetSize = 40)
    val words = UnigramLm.wordDim(docs).as[(String, Long)].collect().map(_._1)
    val singles = words.flatMap(_.toSeq).toSet
    assert(singles.forall(c => lp.contains(c.toString)))
    assert(lp.size <= math.max(40, singles.size))
    words.filter(_.length <= UnigramLm.MaxWord).foreach { w =>
      val seg = UnigramLm.segmentWithProbs(w, lp)
      assert(seg.mkString == w, s"$w unsegmentable after prune")
    }
  }

  test("float viterbi agrees with brute-force max log-prob path") {
    val (lp, _) = UnigramLm.emTrain(docs, iters = 3, targetSize = 60)
    val words = UnigramLm.wordDim(docs).as[(String, Long)].collect().map(_._1)
    words.filter(_.length <= 12).foreach { w =>
      val segs = allSegs(w, lp.keySet)
      val bruteBest = segs.map(s => s.map(lp).sum).max
      val got = UnigramLm.segmentWithProbs(w, lp)
      assert(math.abs(got.map(lp).sum - bruteBest) < 1e-9,
        s"$w: viterbi ${got.mkString("+")} not optimal")
    }
  }

  test("model persistence: save -> load -> identical segmentations") {
    val (lp, _) = UnigramLm.emTrain(docs, iters = 3, targetSize = 60)
    val dir = java.nio.file.Files.createTempDirectory("graft-unigram").toString
    graft.sources.Storage.writeModel(UnigramLm.toFrame(spark, lp), s"$dir/unigram", "piece")
    val lp2 = UnigramLm.fromFrame(graft.sources.Storage.readModel(spark, s"$dir/unigram"))
    assert(lp2 == lp) // exact DOUBLE round-trip
    val words = UnigramLm.wordDim(docs).as[(String, Long)].collect().map(_._1)
    words.foreach { w =>
      assert(UnigramLm.segmentWithProbs(w, lp2) == UnigramLm.segmentWithProbs(w, lp))
    }
  }

  test("EM sharpens the model: trained likelihood beats the seed model's") {
    val (_, lls) = UnigramLm.emTrain(docs, iters = 4, targetSize = 200)
    assert(lls.last > lls.head - 1e-9)
  }
}
