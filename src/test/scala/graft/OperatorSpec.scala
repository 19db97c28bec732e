package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.{AsOfJoin, NodeTree, SequencePack, Similarity}

/** Specs for the graph/as-of/IVF extension operators. */
class OperatorSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("NodeTree.bfs: depth, path, opened flag; unreachable subtrees dropped") {
    val nodes = Seq(
      ("root", null.asInstanceOf[String], "Objects"),
      ("a", "root", "PlantA"),
      ("b", "root", "PlantB"),
      ("a1", "a", "Inverter1"),
      ("a11", "a1", "Power"),
      ("orphan", "missing", "Nowhere")).toDF("id", "parent_id", "text")
    val out = NodeTree.bfs(nodes, openDepth = 2)
      .select("id", "depth", "path", "opened")
      .as[(String, Int, String, Int)].collect().map(r => r._1 -> r).toMap
    assert(out("root") == ("root", 0, "Objects", 1))
    assert(out("a1") == ("a1", 2, "Objects/PlantA/Inverter1", 0))
    assert(out("a11") == ("a11", 3, "Objects/PlantA/Inverter1/Power", 0))
    assert(!out.contains("orphan")) // parent never reached
    assert(out.size == 5)
  }

  test("NodeTree.pruneExclusions: excluded node AND its subtree vanish from the walk") {
    val nodes = Seq(
      ("r", null.asInstanceOf[String], "Root"),
      ("x", "r", "Excluded"),
      ("x1", "x", "Child"),
      ("k", "r", "Kept")).toDF("id", "parent_id", "text")
    val excl = Seq("Excluded").toDF("text")
    val ids = NodeTree.bfs(NodeTree.pruneExclusions(nodes, excl))
      .select("id").as[String].collect().toSet
    assert(ids == Set("r", "k"))
  }

  test("AsOfJoin.leftAsOf: latest right at-or-before left ts, inclusive, null when none") {
    val left = Seq(
      (1L, "u1", ts("2024-01-01 00:10:00")),
      (2L, "u1", ts("2024-01-01 00:00:00")), // before any right row
      (3L, "u1", ts("2024-01-01 00:05:00")), // equal ts: right visible
      (4L, "u2", ts("2024-01-01 00:10:00"))  // other key
    ).toDF("event_id", "k", "ts")
    val right = Seq(
      ("u1", ts("2024-01-01 00:05:00"), 5.0),
      ("u1", ts("2024-01-01 00:08:00"), 8.0),
      ("u2", ts("2024-01-01 00:09:00"), 9.0)).toDF("k", "ts", "v")
    val got = AsOfJoin.leftAsOf(left, right, "k", "ts", Seq("v"))
      .select(col("event_id"), col("asof.v"))
      .as[(Long, Option[Double])].collect().toMap
    assert(got(1L).contains(8.0))
    assert(got(2L).isEmpty)
    assert(got(3L).contains(5.0)) // inclusive bound
    assert(got(4L).contains(9.0))
  }

  test("IVF: every vector lands in exactly one cell; probe results are a subset of brute force candidates") {
    val dim = Similarity.Dim
    // deterministic synthetic embeddings
    val emb = (0L until 40L).map { i =>
      (i, Array.tabulate(dim)(d => (((i * 31 + d * 7) % 13).toFloat - 6.0f) / 6.0f))
    }.toDF("vec_id", "embedding")
    val cells = Similarity.ivfCells(emb, step = 10L)
    assert(cells.count() == 40L)
    assert(cells.select("vec_id").distinct().count() == 40L)
    val cellVals = cells.select("cell").distinct().as[Long].collect().toSet
    assert(cellVals.subsetOf(Set(0L, 10L, 20L, 30L)))
    val res = Similarity.ivfTopK(emb, queryMaxId = 3L, k = 5, nprobe = 2, step = 10L)
      .select("q_id", "n_id", "rk").as[(Long, Long, Int)].collect()
    assert(res.nonEmpty)
    val byQ = res.groupBy(_._1)
    byQ.foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.sameElements(1 to rows.length))
      assert(rows.length <= 5)
    }
  }

  test("SequencePack: two-phase prefix sum equals the naive global window, bucketSize-invariant") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val w = org.apache.spark.sql.expressions.Window.orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val naive = docs
      .select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
      .withColumn("running_tokens", sum("n_tokens").over(w))
      .withColumn("seq_id", expr("(running_tokens - 1) div 2048"))
      .select("doc_id", "n_tokens", "running_tokens", "seq_id")
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    val twoPhase = SequencePack.pack(docs, 2048L, bucketSize = 7L)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    val coarse = SequencePack.pack(docs, 2048L, bucketSize = 100000L)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(twoPhase == naive)   // exact same integer arithmetic
    assert(coarse == naive)     // bucket boundaries are invisible
    // packing invariants: running total strictly increases, seq ids are
    // non-decreasing and start at 0
    assert(twoPhase.head._4 == 0L)
    assert(twoPhase.sliding(2).forall { case Seq(a, b) =>
      b._3 > a._3 && b._4 >= a._4; case _ => true })
  }

  test("pathTrigrams: sequences never cross a session boundary; counts and ties exact") {
    // user 1: session A = a,b,c,d (trigrams a>b>c, b>c>d); then a 2-hour
    // gap; session B = a,b,c (trigram a>b>c). A naive lead over the USER
    // would invent d>a>b and c>d>a across the gap.
    def t(m: Int) = Timestamp.valueOf(f"2024-03-01 ${10 + m / 60}%02d:${m % 60}%02d:00")
    val rows = Seq(
      (1L, t(0), 1L, "a"), (1L, t(1), 2L, "b"), (1L, t(2), 3L, "c"),
      (1L, t(3), 4L, "d"),
      (1L, t(150), 5L, "a"), (1L, t(151), 6L, "b"), (1L, t(152), 7L, "c"))
      .toDF("u", "ts", "id", "t")
    val got = graft.operators.Sessionize.pathTrigrams(rows,
      col("u"), col("ts"), col("id"), col("t"), gapSeconds = 1800L, topK = 10)
      .select("path", "n", "rk").as[(String, Long, Int)].collect().toSeq
    assert(got === Seq(("a>b>c", 2L, 1), ("b>c>d", 1L, 2)))
  }
}
