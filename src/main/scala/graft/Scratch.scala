package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling harness (not part of the library surface).
  * Current contents: q138 PageRank phase timing — edge build vs
  * adjacency materialization vs per-round cost.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime(); val out = body
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); out
    }
    val dir = "/root/testdata/sf0.1"
    for (pass <- 1 to 2) {
      println(s"--- pass $pass ---")
      val edges = Tables.orders(spark, dir)
        .join(Tables.lineitem(spark, dir), col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      val sym = t("sym+distinct") {
        val s = edges.toDF("src", "dst")
          .union(edges.toDF("dst", "src").select("src", "dst")).distinct().persist()
        s.count(); s
      }
      val adj = t("deg+adj persist") {
        val deg = sym.groupBy("src").agg(count(lit(1)).as("outdeg"))
        val a = sym.join(deg, "src")
          .select(col("src"), col("dst"), col("outdeg"))
          .repartition(col("src")).persist()
        a.count(); a
      }
      var ranks = t("r0") {
        val r = adj.select(col("src").as("node")).distinct()
          .withColumn("rank_fp", lit(1000000000L)).persist()
        r.count(); r
      }
      for (i <- 1 to 5) {
        ranks = t(s"round $i") {
          val next = adj.join(ranks, col("src") === col("node"))
            .select(col("dst"), expr("rank_fp div outdeg").as("contrib"))
            .groupBy(col("dst").as("node"))
            .agg((lit(150000000L) + expr("(85 * sum(contrib)) div 100")).as("rank_fp"))
            .select(col("node"), col("rank_fp"))
          next.write.format("noop").mode("overwrite").save()
          next
        }
      }
      t("final sort+noop") {
        ranks.orderBy(col("rank_fp").desc, col("node"))
          .write.format("noop").mode("overwrite").save()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
