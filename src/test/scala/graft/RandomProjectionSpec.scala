package graft

import org.apache.spark.sql.functions._
import graft.functions.RandomProjection

/** Behavioral pins for the deterministic JL projection (q142). */
class RandomProjectionSpec extends SparkSpec {
  import spark.implicits._

  private val SfDir = "/root/testdata/sf0.001"

  test("signs are ±1 and stable (pure function of the exported family)") {
    val ss = for (k <- 0 until 16; i <- 1 to 64) yield RandomProjection.sign(k, i)
    assert(ss.forall(s => s == 1L || s == -1L))
    // both signs actually occur in every output dim (a constant row
    // would collapse that component to ±Σq — useless for JL)
    for (k <- 0 until 16) {
      val row = (1 to 64).map(RandomProjection.sign(k, _)).toSet
      assert(row == Set(1L, -1L), s"row $k is constant")
    }
  }

  test("deterministic across partition counts and runs") {
    val emb = Tables.embeddings(spark, SfDir).filter(col("vec_id") < 50)
    def run(p: Int) = RandomProjection.project(emb.repartition(p), 64, 16)
      .orderBy("vec_id", "k").as[(Long, Int, Long)].collect().toList
    assert(run(1) == run(7))
  }

  test("JL property: reduced distances track original distances") {
    val emb = Tables.embeddings(spark, SfDir).filter(col("vec_id") < 60)
    val orig = emb.select(col("vec_id"),
      transform(col("embedding").cast("array<double>"),
        v => bround(v * 1024, 0).cast("long")).as("q"))
      .as[(Long, Array[Long])].collect().toMap
    val red = RandomProjection.project(emb, 64, 16)
      .groupBy("vec_id").agg(collect_list(struct(col("k"), col("comp"))).as("cs"))
      .as[(Long, Seq[(Int, Long)])].collect()
      .map { case (id, cs) => id -> cs.sortBy(_._1).map(_._2).toArray }.toMap
    def d2(a: Array[Long], b: Array[Long]): Double =
      a.zip(b).map { case (x, y) => val d = (x - y).toDouble; d * d }.sum
    val ids = orig.keys.toSeq.sorted
    // E[||Rx||²] = outDim·||x||² for ±1 rows — normalize each pair by
    // that and bound the AVERAGE distortion (individual pairs can
    // wander at outDim = 16)
    val ratios = for {
      i <- ids; j <- ids if i < j
      o = d2(orig(i), orig(j)) if o > 0
    } yield d2(red(i), red(j)) / (16.0 * o)
    val mean = ratios.sum / ratios.size
    assert(mean > 0.5 && mean < 1.5, s"mean distortion $mean out of range")
  }
}
