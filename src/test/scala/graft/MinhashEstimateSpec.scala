package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Estimation quality of the MinHash sketch against exact shingle
  * Jaccard — the number that justifies replacing the all-pairs shingle
  * intersection with a 16-permutation signature at corpus scale.
  *
  * Endpoints are deterministic (identical shingle sets → identical
  * signatures, estimate exactly 1; disjoint sets → at most an accidental
  * collision) and test the plumbing. The statistical claim is tested in
  * the mean: a SINGLE pair's estimate from 16 linear-congruential
  * permutations can be far off (the family is only approximately
  * min-wise independent on small sets — measured: one j=0.30 pair
  * estimated 0.75), so the floor pins the average over ten independent
  * half-overlap pairs, where the per-draw bias washes out.
  */
class MinhashEstimateSpec extends SparkSpec {
  import spark.implicits._

  test("minhash component agreement estimates exact jaccard (endpoints exact, mean calibrated)") {
    val perms = 16
    // ten independent base/partner pairs sharing the first 15 of 30 words
    // (jaccard 13/43 ≈ 0.30 each), plus an identical and a disjoint pair
    val rows = (0 until 10).flatMap { g =>
      val base = (1 to 30).map(i => s"w${g}x$i")
      val partner = base.take(15) ++ (1 to 15).map(i => s"p${g}x$i")
      Seq((g * 2 + 10L, base.mkString(" ")), (g * 2 + 11L, partner.mkString(" ")))
    } ++ Seq(
      (1L, (1 to 30).map(i => s"same$i").mkString(" ")),
      (2L, (1 to 30).map(i => s"same$i").mkString(" ")),
      (4L, (1 to 30).map(i => s"other$i").mkString(" ")))
    val docs = rows.toDF("doc_id", "text")

    val sig = Dedup.minhashSignatures(docs, perms)
    def estimate(a: Long, b: Long): Double = {
      val agree = sig.filter(col("doc_id") === a)
        .select(col("perm"), col("h").as("ha"))
        .join(sig.filter(col("doc_id") === b)
          .select(col("perm"), col("h").as("hb")), Seq("perm"))
        .filter(col("ha") === col("hb")).count()
      agree.toDouble / perms
    }

    assert(estimate(1L, 2L) == 1.0) // identical sets → identical signatures
    assert(estimate(1L, 4L) <= 1.0 / perms) // disjoint: at most a collision

    val ests = (0 until 10).map(g => estimate(g * 2 + 10L, g * 2 + 11L))
    val meanEst = ests.sum / ests.length
    val trueJ = 13.0 / 43.0
    info(f"half-overlap pairs: trueJ=$trueJ%.3f meanEst=$meanEst%.3f (${ests.map(e => f"$e%.2f").mkString(",")})")
    assert(math.abs(meanEst - trueJ) <= 0.15,
      f"minhash calibration regressed: meanEst=$meanEst%.3f vs j=$trueJ%.3f")
    // separation from the disjoint level holds for the vast majority of
    // pairs (a single pair can graze 1/16 — the binomial tail)
    assert(ests.count(_ > 1.0 / perms) >= 8)
  }
}
