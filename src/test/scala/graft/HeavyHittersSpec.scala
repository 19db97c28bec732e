package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.HeavyHitters

/** The Misra-Gries mergeable summary (q105): exactness when the vocab
  * fits, the N/(k+1) presence + undercount guarantee on skewed streams
  * under every partition layout, and never-overcounting.
  */
class HeavyHittersSpec extends AnyFunSuite {

  private def sketchOf(tokens: Seq[String], k: Int, parts: Int): Map[String, Long] = {
    val spark = SparkSpec.spark
    import spark.implicits._
    tokens.toDF("tok").repartition(parts)
      .agg(HeavyHitters.misraGries(k)(col("tok")).as("mg"))
      .head.getMap[String, Long](0).toMap
  }

  test("distinct <= k: the sketch IS the exact count map") {
    val stream = Seq.tabulate(500)(i => s"t${i % 6}")
    val got = sketchOf(stream, k = 8, parts = 7)
    val exact = stream.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    assert(got == exact)
  }

  test("zipf stream: heavy hitters survive with bounded undercount, any partitioning") {
    // frequencies 1000, 500, 333, ... (zipf-ish) over 40 tokens + noise
    val stream = (1 to 40).flatMap(r => Seq.fill(1000 / r)(s"z$r")) ++
      (0 until 2000).map(i => s"noise${i % 400}")
    val n = stream.size.toLong
    val k = 10
    val bound = n.toDouble / (k + 1)
    val exact = stream.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    for (parts <- Seq(1, 4, 32)) {
      val sk = sketchOf(stream, k, parts)
      assert(sk.size <= k, s"parts=$parts size")
      sk.foreach { case (t, est) =>
        assert(est <= exact(t), s"parts=$parts $t overcounts: $est > ${exact(t)}")
        assert(exact(t) - est <= bound, s"parts=$parts $t undercount ${exact(t) - est} > $bound")
      }
      exact.collect { case (t, c) if c > bound => t }.foreach { t =>
        assert(sk.contains(t), s"parts=$parts true heavy hitter $t missing (count ${exact(t)}, bound $bound)")
      }
    }
  }

  test("guarantee is partition-order independent even when no true heavy hitter exists") {
    // uniform stream: nothing exceeds N/(k+1); the sketch may contain
    // anything, but must never overcount and never exceed k entries
    val stream = (0 until 3000).map(i => s"u${i % 300}")
    val exact = stream.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    for (parts <- Seq(2, 16)) {
      val sk = sketchOf(stream, k = 5, parts = parts)
      assert(sk.size <= 5)
      sk.foreach { case (t, est) => assert(est <= exact(t), s"$t overcounts") }
    }
  }
}
