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
}
