package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Throwaway profiling harness (not part of the library surface).
  * Current contents: candidate-count comparison for the containment
  * join's positional bounds (ANY-match vs accumulated PPJoin ubound).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tauPct = 70
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    val sh = graft.operators.Dedup.shingles(docs).persist()
    val dfc = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
    val wDoc = Window.partitionBy("doc_id").orderBy(col("df"), col("shingle"))
    val ranked = sh.join(dfc, Seq("shingle"))
      .withColumn("rn", row_number().over(wDoc))
      .withColumn("sz", count(lit(1)).over(Window.partitionBy("doc_id")))
      .persist()
    val pref = ranked
      .filter(col("rn") <= col("sz") - expr(s"($tauPct * sz + 99) div 100") + 1)
      .select(col("doc_id").as("a"), col("rn").as("rn_a"), col("sz").as("sz_a"), col("shingle"))
    val joined = pref
      .join(ranked.select(col("doc_id").as("b"), col("rn").as("rn_b"),
        col("sz").as("sz_b"), col("shingle")), Seq("shingle"))
      .filter(col("a") =!= col("b"))
    println("RAW_MATCHES=" + joined.count())
    val anyPairs = joined
      .filter(least(col("sz_a") - col("rn_a"), col("sz_b") - col("rn_b")) + 1
        >= expr(s"($tauPct * sz_a + 99) div 100"))
      .select("a", "b").distinct()
    println("ANY_PAIRS=" + anyPairs.count())
    val accPairs = joined.groupBy("a", "b")
      .agg(count(lit(1)).as("m"),
        max(col("rn_a")).as("mrn_a"), max(col("rn_b")).as("mrn_b"),
        first(col("sz_a")).as("sz_a"), first(col("sz_b")).as("sz_b"))
      .filter(col("m") + least(col("sz_a") - col("mrn_a"), col("sz_b") - col("mrn_b"))
        >= expr(s"($tauPct * sz_a + 99) div 100"))
      .select("a", "b")
    println("ACC_PAIRS=" + accPairs.count())
    val lenAcc = joined
      .filter(col("sz_b") * 100 >= lit(tauPct.toLong) * col("sz_a"))
      .groupBy("a", "b")
      .agg(count(lit(1)).as("m"),
        max(col("rn_a")).as("mrn_a"), max(col("rn_b")).as("mrn_b"),
        first(col("sz_a")).as("sz_a"), first(col("sz_b")).as("sz_b"))
      .filter(col("m") + least(col("sz_a") - col("mrn_a"), col("sz_b") - col("mrn_b"))
        >= expr(s"($tauPct * sz_a + 99) div 100"))
      .select("a", "b")
    println("LEN_ACC_PAIRS=" + lenAcc.count())
    println("FINAL=" + graft.operators.Dedup.containmentPairs(docs, tauPct).count())
    spark.stop()
  }
}
