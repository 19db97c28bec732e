package graft

import org.apache.spark.sql.functions._
import graft.functions.BloomTable

/** Behavioral pins for the cross-engine-exact bloom table (q146). */
class BloomTableSpec extends SparkSpec {
  import spark.implicits._

  private def items = Seq(("g", 1L), ("g", 2L), ("g", 3L), ("h", 10L))
    .toDF("grp", "item")

  test("no false negatives: every inserted item probes maybe=true") {
    val f = BloomTable.build(items, Seq("grp"), col("item"))
    val got = BloomTable.probe(f, Seq("grp"), items)
      .as[(String, Long, Boolean)].collect()
    assert(got.length == 4 && got.forall(_._3), got.mkString(","))
  }

  test("definite-no: an absent item with clear bits probes maybe=false") {
    val f = BloomTable.build(items, Seq("grp"), col("item"))
    // probe many absent items; with 4 items in 3968 bits essentially all
    // must miss — require at least 95 of 100 definite-no
    val probes = (1000L to 1099L).map(("g", _)).toDF("grp", "item")
    val got = BloomTable.probe(f, Seq("grp"), probes)
      .as[(String, Long, Boolean)].collect()
    assert(got.count(!_._3) >= 95, s"too many FPs: ${got.count(_._3)}")
  }

  test("merge over slices equals one direct build (bitwise OR linearity)") {
    val a = BloomTable.build(items.filter(col("item") <= 2), Seq("grp"), col("item"))
    val b = BloomTable.build(items.filter(col("item") > 2), Seq("grp"), col("item"))
    val merged = BloomTable.merge(a.union(b), Seq("grp"))
      .orderBy("grp", "word").as[(String, Long, Long)].collect().toList
    val direct = BloomTable.build(items, Seq("grp"), col("item"))
      .orderBy("grp", "word").as[(String, Long, Long)].collect().toList
    assert(merged == direct)
  }

  test("words never set the two reserved high bits (engine portability)") {
    val many = (1L to 2000L).map(("g", _)).toDF("grp", "item")
    val f = BloomTable.build(many, Seq("grp"), col("item"))
    val words = f.select("bits").as[Long].collect()
    assert(words.nonEmpty)
    words.foreach(wd => assert((wd >>> BloomTable.BitsPerWord) == 0L,
      f"reserved bits set in $wd%x"))
  }
}
