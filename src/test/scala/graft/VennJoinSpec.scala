package graft

import scala.util.Random
import graft.operators.VennJoin

/** J4 — GetVennSet parity (`Extensions/CommonExtensions.cs:9-47`): the
  * classification must partition the key union exactly.
  */
class VennJoinSpec extends SparkSpec {
  import spark.implicits._

  private def classify(a: Seq[String], b: Seq[String]): Map[String, Set[String]] =
    VennJoin.vennJoin(a.distinct.toDF("k"), b.distinct.toDF("k"), Seq("k"))
      .select("k", "status").as[(String, String)].collect()
      .groupBy(_._2).map { case (s, rows) => s -> rows.map(_._1).toSet }

  test("disjoint, identical, and empty inputs") {
    assert(classify(Seq("a"), Seq("b")) ==
      Map("left_only" -> Set("a"), "right_only" -> Set("b")))
    assert(classify(Seq("a", "b"), Seq("a", "b")) == Map("both" -> Set("a", "b")))
    assert(classify(Nil, Seq("x")) == Map("right_only" -> Set("x")))
    assert(classify(Nil, Nil) == Map.empty)
  }

  test("randomized: venn classification partitions A ∪ B exactly") {
    val rnd = new Random(42)
    for (_ <- 1 to 15) {
      val a = Seq.fill(rnd.nextInt(15))("k" + rnd.nextInt(20))
      val b = Seq.fill(rnd.nextInt(15))("k" + rnd.nextInt(20))
      val m = classify(a, b)
      val lo = m.getOrElse("left_only", Set.empty)
      val bo = m.getOrElse("both", Set.empty)
      val ro = m.getOrElse("right_only", Set.empty)
      assert(lo == (a.toSet -- b.toSet))
      assert(bo == (a.toSet intersect b.toSet))
      assert(ro == (b.toSet -- a.toSet))
      assert((lo ++ bo ++ ro) == (a.toSet ++ b.toSet))
    }
  }
}
