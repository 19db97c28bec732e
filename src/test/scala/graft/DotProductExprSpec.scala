package graft

import org.apache.spark.sql.functions._
import graft.functions.{NativeVectorOps, VectorOps}

/** The native codegen DotProduct expression must be bit-identical to the
  * higher-order-function formulation (same left-to-right IEEE fold).
  */
class DotProductExprSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = (0 until 200).map { i =>
    (i.toLong,
      Array.tabulate(64)(d => math.sin(i * 64 + d) * 10),
      Array.tabulate(64)(d => math.cos(i * 64 + d) * 10))
  }.toDF("id", "a", "b")

  /** Run with GraftRules UNINSTALLED: register() now also installs the
    * HOF-dot→native rewrite, which would silently turn the "HOF side" of
    * every parity assertion below into the native expression — parity
    * pinned against itself proves nothing, and this spec is the very
    * contract the rewrite rule's soundness rests on.
    */
  private def withoutGraftRules[T](body: => T): T = {
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = Seq.empty
    try body finally spark.experimental.extraOptimizations = saved
  }

  test("native dot == HOF dot, bit-for-bit, interpreted and codegen paths") {
    NativeVectorOps.register(spark)
    withoutGraftRules {
      val both = vecs.select(
        NativeVectorOps.dot(col("a"), col("b")).as("native"),
        VectorOps.dot(col("a"), col("b")).as("hof"))
      val rows = both.as[(Double, Double)].collect()
      assert(rows.length == 200)
      rows.foreach { case (n, h) =>
        assert(java.lang.Double.doubleToLongBits(n) == java.lang.Double.doubleToLongBits(h))
      }
    }
  }

  test("native cosine == HOF cosine; null array propagates null") {
    NativeVectorOps.register(spark)
    withoutGraftRules {
      val both = vecs.select(
        NativeVectorOps.cosine(col("a"), col("b")).as("native"),
        VectorOps.cosine(col("a"), col("b")).as("hof"))
      both.as[(Double, Double)].collect().foreach { case (n, h) =>
        assert(java.lang.Double.doubleToLongBits(n) == java.lang.Double.doubleToLongBits(h))
      }
      val withNull = vecs.select(
        NativeVectorOps.dot(when(col("id") === 0, col("a")), col("b")).as("d"))
      assert(withNull.filter(col("d").isNull).count() == 199)
    }
  }

  test("length mismatch: native dot == HOF dot == NULL (the rewrite's contract)") {
    NativeVectorOps.register(spark)
    withoutGraftRules {
      val df = Seq((Array(1.0, 2.0), Array(1.0, 2.0, 3.0))).toDF("a", "b")
        .repartition(2) // keep the expressions live (no constant folding)
      val both = df.select(
        NativeVectorOps.dot(col("a"), col("b")).as("native"),
        VectorOps.dot(col("a"), col("b")).as("hof"))
      val (n, h) = both.as[(Option[Double], Option[Double])].collect().head
      assert(n.isEmpty && h.isEmpty,
        "zip_with null-pads the shorter array → the fold is NULL; the native loop must agree")
    }
  }

  test("fused LSH buckets == composed per-plane sign sum, every table, bit-for-bit") {
    NativeVectorOps.register(spark)
    val (tables, planesPerTable, dim) = (8, 4, 64)
    // the composed formulation the fused expression replaced: one native
    // dot per plane against its literal weight array, sign → bit
    def composedBucket(t: Int) = (0 until planesPerTable).map { j =>
      when(NativeVectorOps.dot(col("a"),
        typedLit(VectorOps.planeArray(t * planesPerTable + j, dim))) > 0.0,
        lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    val df = vecs.select(
      NativeVectorOps.lshBuckets(col("a"), tables, planesPerTable, dim).as("fused"),
      array((0 until tables).map(composedBucket): _*).as("composed"))
    df.as[(Seq[Long], Seq[Long])].collect().foreach { case (f, c) =>
      assert(f == c, s"fused $f != composed $c")
    }
    // null embedding propagates null (UnaryExpression null plumbing)
    val n = vecs.select(
      NativeVectorOps.lshBuckets(when(col("id") === 0, col("a")), 2, 4, dim).as("b"))
    assert(n.filter(col("b").isNull).count() == 199)
  }
}
