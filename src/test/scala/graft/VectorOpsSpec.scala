package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorOps
import graft.operators.Similarity

/** Vector algebra + ANN invariants. */
class VectorOpsSpec extends SparkSpec {
  import spark.implicits._

  private def eval1(c: org.apache.spark.sql.Column): Any =
    Seq(1).toDF("x").select(c.as("r")).head.get(0)

  test("dot / norm / cosine on known vectors") {
    val a = array(lit(1.0), lit(2.0), lit(3.0))
    val b = array(lit(4.0), lit(-5.0), lit(6.0))
    assert(eval1(VectorOps.dot(a, b)) == 12.0)
    assert(eval1(VectorOps.norm(array(lit(3.0), lit(4.0)))) == 5.0)
    assert(math.abs(eval1(VectorOps.cosine(a, a)).asInstanceOf[Double] - 1.0) <= 1e-12)
    // orthogonal → 0
    val e1 = array(lit(1.0), lit(0.0)); val e2 = array(lit(0.0), lit(1.0))
    assert(eval1(VectorOps.cosine(e1, e2)) == 0.0)
  }

  test("planeWeight: deterministic, in [-0.5, 0.5)") {
    val vals = (0 until 4).flatMap { j =>
      (0 until 8).map { d =>
        eval1(VectorOps.planeWeight(lit(j), lit(d), 8)).asInstanceOf[Double]
      }
    }
    assert(vals.forall(v => v >= -0.5 && v < 0.5))
    assert(vals.distinct.size > 20) // not degenerate
    // re-evaluation yields identical values (pure function of (j, d))
    val again = eval1(VectorOps.planeWeight(lit(2), lit(3), 8))
    assert(again == vals(2 * 8 + 3))
  }

  test("ANN brute force: self excluded, k respected, ranks ordered by cosine desc") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f) ++ Array.fill(62)(0.0f)),
      (1L, Array(0.9f, 0.1f) ++ Array.fill(62)(0.0f)),
      (2L, Array(0.0f, 1.0f) ++ Array.fill(62)(0.0f)),
      (3L, Array(-1.0f, 0.0f) ++ Array.fill(62)(0.0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.bruteForceTopK(vecs, queryMaxId = 1L, k = 2)
      .select("q_id", "n_id", "rk").as[(Long, Long, Int)].collect().sortBy(_._3)
    assert(got.map(_._1).forall(_ == 0L))
    assert(!got.map(_._2).contains(0L))
    assert(got.map(_._2).toSeq == Seq(1L, 2L)) // nearest first
  }

  test("lshBuckets: identical vectors share a bucket") {
    val v = Array.tabulate(64)(i => (math.sin(i + 1)).toFloat)
    val vecs = Seq((0L, v), (1L, v), (2L, v.map(x => -x)))
      .toDF("vec_id", "embedding")
    val b = Similarity.lshBuckets(vecs).as[(Long, Long)].collect().toMap
    assert(b(0L) == b(1L))
    assert(b(0L) != b(2L)) // antipodal flips every plane sign
  }
}
