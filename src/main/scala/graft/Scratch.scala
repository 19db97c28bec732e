package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Throwaway profiling harness (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val scored = TextAnalysis.qualityScore(Tables.documents(spark, dir))
        .select("doc_id", "quality_score").filter(!col("doc_id").isin(1L, 2L, 3L))
      val n = scored.count()
      val ps = (1 to 9).map(_ / 10.0)
      val cuts = scored
        .agg(percentile_approx(col("quality_score"),
          typedLit(ps.toArray), lit(1000000)).as("cuts"))
        .head().getSeq[Double](0)
      val sorted = scored.orderBy("quality_score").select("quality_score")
        .collect().map(_.getDouble(0))
      println(s"[scratch] dir=$dir n=$n")
      ps.zip(cuts).foreach { case (p, c) =>
        // 1-based ranks of this cutpoint value in the asc-sorted corpus
        val lo = sorted.indexWhere(_ == c) + 1
        val hi = sorted.lastIndexWhere(_ == c) + 1
        println(f"[scratch] p=$p%.1f cut=$c%.17g rankRange=[$lo,$hi] " +
          f"ceil(p*n)=${math.ceil(p * n).toLong} floor(p*n)=${math.floor(p * n).toLong} " +
          f"ceil(p*(n+1))=${math.ceil(p * (n + 1)).toLong} round(p*n)=${math.round(p * n)}")
      }
    }
    spark.stop()
  }
}
