package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import graft.operators.KMeans

/** Lloyd's k-means: recovery of planted clusters, monotone objective,
  * partition invariance (the fixed-point centroid contract), empty-cluster
  * drop, and seed determinism.
  */
class KMeansSpec extends SparkSpec {

  private val dim = 8

  /** Three well-separated axis blobs: cluster g's members are
    * basis-vector g·3 with a small deterministic per-member wiggle on an
    * unrelated coordinate — cosine-separable by construction. vec_ids are
    * laid out so that mod-100 seeding picks one seed per blob (0, 100,
    * 200 belong to blobs 0, 1, 2).
    */
  private def blobs(n: Int, parts: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val g = i % 3
      val e = Array.fill(dim)(0.05f)
      e(g * 3) = 10f
      e(7) = 0.05f + 0.001f * (i % 7) // wiggle, never dominant
      Row(i.toLong, e.toSeq)
    }
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = true))))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, parts), schema)
  }

  // ids 0,100,200 with blob = id%3 → 0→blob0, 100→blob1, 200→blob2 only
  // if 100%3==1 and 200%3==2 — true. So seeds(k=3, step=100) picks one
  // seed per blob and Lloyd's should label every vector by its blob.

  test("recovers planted clusters exactly") {
    val e = blobs(300, 4)
    val asn = KMeans.fit(e, k = 3, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(asn.size == 300)
    // seed g sits in blob g, so cluster labels equal blob ids
    (0 until 300).foreach { i => assert(asn(i.toLong) == i % 3, s"vec $i") }
  }

  test("objective (mean assigned cosine) never decreases across rounds") {
    val e = blobs(120, 4).cache()
    val m = (0 to 3).map { it =>
      val cents = KMeans.fitCentroids(e, k = 3, iters = it)
      KMeans.meanAssignedCosine(e, cents)
    }
    m.sliding(2).foreach { case Seq(a, b) => assert(b >= a - 1e-12, s"$m") }
    assert(m.last > m.head) // the seeds are raw members; one round must help
    e.unpersist()
  }

  test("assignment is identical across input partitionings") {
    val ref = KMeans.fit(blobs(150, 1), k = 3, iters = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1).toSeq
    Seq(4, 32).foreach { p =>
      val got = KMeans.fit(blobs(150, p), k = 3, iters = 2).collect()
        .map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1).toSeq
      assert(got == ref, s"parts=$p diverged")
    }
  }

  test("empty cluster drops and later rounds keep working") {
    // k=3 but only ids 0 and 100 are mod-100 — wait: craft 2 real blobs
    // with a third seed that immediately loses every vector: seed 200 is
    // a blob-0 lookalike but seed 0 is closer to every blob-0 member
    // (identical direction), so cluster 2 may or may not empty; instead
    // force it: only two distinct directions exist, three seeds, so one
    // seed captures nothing after the first update round's argmax
    // tie-break consolidates. The invariant under test: fit() returns a
    // total assignment (every vec labeled) and at most k labels, even
    // when a centroid starves.
    val rows = (0 until 90).map { i =>
      val e = Array.fill(dim)(0.01f)
      e(if (i % 2 == 0) 0 else 4) = 5f
      Row(i.toLong * 10, e.toSeq) // ids 0,10,…,890: mod-100 gives 0,100,…
    }
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = true))))
    val e = spark.createDataFrame(spark.sparkContext.parallelize(rows, 4), schema)
    val asn = KMeans.fit(e, k = 3, iters = 3).collect()
    assert(asn.length == 90)
    assert(asn.map(_.getInt(1)).distinct.length <= 3)
  }

  test("seeds are the k lowest mod-step ids, rank-labeled") {
    val e = blobs(300, 4)
    val s = KMeans.seeds(e, k = 3, step = 100).collect()
      .map(r => r.getInt(0)).sorted.toSeq
    assert(s == Seq(0, 1, 2))
  }

  test("clusterQuality: separated blobs score high cohesion + silhouette") {
    val e = blobs(300, 4)
    val cents = KMeans.fitCentroids(e, k = 3, iters = 2)
    val q = KMeans.clusterQuality(e, cents).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(q.map(_._1).toSeq == Seq(0, 1, 2))
    assert(q.map(_._2).sum == 300)
    q.foreach { case (c, _, cos, sil) =>
      assert(cos > 0.99, s"cluster $c cohesion $cos")
      assert(sil > 0.9, s"cluster $c silhouette $sil") // blobs are separated
    }
    // partition invariance: the fixed-point means make the report exact
    val q32 = KMeans.clusterQuality(blobs(300, 32),
      KMeans.fitCentroids(blobs(300, 32), k = 3, iters = 2)).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(q32.toSeq == q.toSeq)
  }
}
