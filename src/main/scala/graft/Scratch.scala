package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

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
    val dir = "/root/testdata/sf0.1"
    def t(name: String)(f: => Long): Unit = {
      val s = System.nanoTime(); val n = f
      println(f"[scratch] $name%-28s ${(System.nanoTime() - s) / 1e9}%8.2f s  ($n rows)")
    }
    val docs = Tables.documents(spark, dir)
    t("docs.count")(docs.count())
    t("words+shingles3 no distinct") {
      docs.withColumn("ws", graft.functions.TextOps.words(col("text")))
        .withColumn("shingle", explode(graft.functions.TextOps.shingles3("ws")))
        .count()
    }
    t("shingles (distinct)")(Dedup.shingles(docs).count())
    t("shingles again")(Dedup.shingles(docs).count())
    t("sizes")(Dedup.shingles(docs).groupBy("doc_id").count().count())
    t("jaccardTopK full")(Dedup.jaccardTopK(docs, 10L, 5).count())
    t("jaccardTopK again")(Dedup.jaccardTopK(docs, 10L, 5).count())
    t("minhashWide")(Dedup.minhashWide(docs, 16).count())
    t("q32 signatures")(Dedup.minhashSignatures(docs, 16).orderBy("doc_id", "perm").count())
    t("q32 again")(Dedup.minhashSignatures(docs, 16).orderBy("doc_id", "perm").count())
    t("lsh pairs")(Dedup.lshCandidatePairs(Dedup.minhashWide(docs, 16), 2, 16).count())
    t("lsh pairs again")(Dedup.lshCandidatePairs(Dedup.minhashWide(docs, 16), 2, 16).count())
    Dedup.lshCandidatePairs(Dedup.minhashWide(docs, 16), 2, 16).explain("formatted")
    spark.stop()
  }
}
