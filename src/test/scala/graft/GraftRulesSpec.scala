package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorOps
import graft.plans.{GraftRules, IntersectCount}

/** The Catalyst optimizer rules: that they FIRE on the intended shapes,
  * REFUSE the guarded ones, and never change a result.
  */
class GraftRulesSpec extends SparkSpec {
  import spark.implicits._

  GraftRules.install(spark)

  private def optimizedExprs(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  test("HOF dot rewrites to the native DotProduct and results are bit-identical") {
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(0.5, -1.0, 4.0)),
      (Array(0.1, 0.2, 0.3), Array(7.0, 8.0, 9.0))).toDF("a", "b").repartition(2)
    val hof = df.select(VectorOps.dot(col("a"), col("b")).as("d"))
    assert(optimizedExprs(hof).contains("graft_dot"),
      s"rule did not fire:\n${optimizedExprs(hof)}")
    // ground truth computed without the rule: plain Scala fold
    val expected = Seq(1.0 * 0.5 + 2.0 * -1.0 + 3.0 * 4.0,
      0.1 * 7.0 + 0.2 * 8.0 + 0.3 * 9.0)
    val got = hof.as[Double].collect().toSeq
    assert(got == expected)
  }

  test("HOF dot rule refuses nullable-element arrays (null semantics differ)") {
    val df = Seq(
      (Array[java.lang.Double](1.0, null, 3.0), Array[java.lang.Double](1.0, 1.0, 1.0)))
      .toDF("a", "b")
      .select(col("a").cast("array<double>").as("a"), col("b").cast("array<double>").as("b"))
      .repartition(2)
    val hof = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0), (s, v) => s + v)
        .as("d"))
    assert(!optimizedExprs(hof).contains("graft_dot"),
      "rule fired on containsNull=true arrays")
    // the HOF's null contract is observable — and preserved
    assert(hof.as[java.lang.Double].collect().toSeq == Seq(null))
  }

  test("size(array_intersect) on long arrays rewrites to IntersectCount, same counts") {
    val df = Seq(
      (0, Array(1L, 2L, 3L, 2L, 1L), Array(2L, 3L, 4L)), // distinct common: 2, 3
      (1, Array(5L, 5L, 5L), Array(5L)),                 // dups in a count once
      (2, Array.empty[Long], Array(1L, 2L)),
      (3, Array(7L, 8L), Array.empty[Long])).toDF("id", "a", "b").repartition(2)
    val q = df.select(col("id"), size(array_intersect(col("a"), col("b"))).as("n"))
    assert(optimizedExprs(q).contains("graft_intersect_count"),
      s"rule did not fire:\n${optimizedExprs(q)}")
    assert(q.orderBy("id").select("n").as[Int].collect().toSeq == Seq(2, 1, 0, 0))
    // parity with the unrewritten built-in on random data
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(200)((
      Array.fill(rnd.nextInt(30))(rnd.nextInt(20).toLong),
      Array.fill(rnd.nextInt(30))(rnd.nextInt(20).toLong)))
    val rdf = rows.zipWithIndex.map { case ((a, b), i) => (i, a, b) }
      .toDF("id", "a", "b").repartition(2)
    val rewritten = rdf.select(col("id"), size(array_intersect(col("a"), col("b"))).as("n"))
      .orderBy("id").select("n").as[Int].collect().toSeq
    val reference = rows.map { case (a, b) => a.distinct.count(b.contains) }
    assert(rewritten == reference)
  }

  test("intersect-count rule refuses double arrays (float equality minefield)") {
    val df = Seq((Array(1.0, 2.0), Array(2.0, 3.0))).toDF("a", "b").repartition(2)
    val q = df.select(size(array_intersect(col("a"), col("b"))).as("n"))
    assert(!optimizedExprs(q).contains("graft_intersect_count"))
    assert(q.as[Int].collect().toSeq == Seq(1))
  }

  test("IntersectCount propagates null arrays as NULL (non-legacy Size contract)") {
    val df = Seq((Some(Array(1L, 2L)), Option.empty[Array[Long]]))
      .toDF("a", "b").repartition(2)
    val q = df.select(size(array_intersect(col("a"), col("b"))).as("n"))
    assert(optimizedExprs(q).contains("graft_intersect_count"),
      "rule must fire on null-able ARRAYS (only null ELEMENTS are guarded)")
    assert(q.as[java.lang.Integer].collect().toSeq == Seq(null))
  }

  test("the rewrite is live inside the q86 containment verifier's plan") {
    val docs = Seq((1L, "a b c d e f"), (2L, "a b c d e")).toDF("doc_id", "text")
    val plan = graft.operators.Dedup.containmentPairs(docs, 70)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("graft_intersect_count"),
      "containment verification no longer runs the count-only intersect")
  }
}
