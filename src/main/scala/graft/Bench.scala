package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Each query warms up IMMEDIATELY before its timed pass (codegen
  * compilation + JIT are one-time constants, irrelevant to steady-state
  * throughput at the 100 TB design point). A single whole-suite warmup
  * pass is not enough: the first timed query then absorbs the JIT/GC
  * drift accumulated across the ~50 intervening warmups (q01 measured
  * 0.47 s → 3.21 s between rounds with unchanged code that way).
  *
  * A failing query fails the bench loudly — swallowing the exception
  * would record a -1-turned-fast time for a broken query.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
    val results = queries.map { case (name, fn) =>
      fn(spark, sfDir).count() // warm this query's codegen/JIT, untimed
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
