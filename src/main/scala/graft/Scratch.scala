package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling harness (not part of the library surface).
  * Current contents: bucketed-adjacency round-join plan inspection.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val edges = (1L to 50L).map(i => (i, i % 9)).toDF("src", "dst")
    val sym = edges.union(edges.select(col("dst"), col("src")).toDF("src", "dst")).distinct()
    val deg = sym.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val adjRaw = sym.join(deg, "src").select(col("src"), col("dst"), col("outdeg"))
    val dir = java.nio.file.Files.createTempDirectory("graft-pr-dbg").toFile
    graft.sources.Storage.writeSrcBucketed(adjRaw, "dbg_adj", new java.io.File(dir, "adj").getPath)
    adjRaw.write.parquet(new java.io.File(dir, "plain").getPath)
    def round(adj: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val frontier = adj.select(col("src").as("node")).distinct()
        .withColumn("rank_fp", lit(1000000L))
      adj.join(frontier.hint("shuffle_hash"), col("src") === col("node"))
        .groupBy(col("dst")).agg(sum(expr("rank_fp div outdeg")).as("s"))
    }
    println("===== BUCKETED =====")
    round(spark.table("dbg_adj")).explain("formatted")
    println("===== PLAIN =====")
    round(spark.read.parquet(new java.io.File(dir, "plain").getPath)).explain("formatted")
    spark.stop()
  }
}
