package graft

import org.apache.spark.sql.functions._
import graft.operators.Pca

/** Behavioral pins for fixed-point power-iteration PCA (q141). */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  // synthetic corpus with a dominant axis: dim 0 carries ±1, the other
  // three carry small deterministic noise
  private def synth = (0L until 200L).map { i =>
    val sign = if (i % 2 == 0) 1.0f else -1.0f
    (i, Array(sign, 0.01f * (i % 7), -0.02f * (i % 5), 0.015f * (i % 3)))
  }.toDF("vec_id", "embedding")

  test("recovers the dominant axis: |v(0)| dwarfs the noise dims") {
    val v = Pca.topComponentInt(synth, dim = 4, iters = 8)
    assert(math.abs(v(0)) == v.map(math.abs).max)
    assert(math.abs(v(0)) > 10L * v.drop(1).map(math.abs).max,
      s"dominant axis not separated: ${v.toList}")
  }

  test("deterministic across partition counts (Gram sums are integer)") {
    val a = Pca.topComponentInt(synth.repartition(1), 4, 8).toList
    val b = Pca.topComponentInt(synth.repartition(13), 4, 8).toList
    assert(a == b)
  }

  test("projections separate the two sign classes exactly") {
    val proj = Pca.projectTop(synth, 4, 8, 200L)
      .as[(Long, Long)].collect().toMap
    val evens = (0L until 200L by 2).map(proj)
    val odds = (1L until 200L by 2).map(proj)
    // the ±1 axis dominates: every even projection sits strictly on one
    // side of every odd projection
    assert(evens.min > odds.max || odds.min > evens.max)
  }
}
