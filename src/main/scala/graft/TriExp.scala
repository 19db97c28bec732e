package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch experiment: q147 wedge-volume + bloom-cost breakdown at a
  * given SF dir. Not part of the driver contract; removed or inert in
  * the shipped tree (kept for the r15 measurement trail).
  */
object TriExp {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/scaling/sf10zipf")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", 375)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[triexp] $what: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val m = Tables.customer(spark, dir).agg(max(col("c_custkey"))).head().getLong(0)
    val edges = Tables.orders(spark, dir)
      .select(col("o_custkey").as("x"), (lit(1L) + col("o_orderkey") % m).as("y"))
    val und = edges.filter(col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("a"), greatest(col("x"), col("y")).as("b"))
      .distinct()
    val deg = und.select(col("a").as("n")).union(und.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    val withDeg = und
      .join(deg.select(col("n").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("n").as("b"), col("d").as("db")), Seq("b"))
    val oriented = withDeg.select(
      when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
        col("a")).otherwise(col("b")).as("u"),
      when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
        col("b")).otherwise(col("a")).as("v"),
      when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
        col("db")).otherwise(col("da")).as("dv"))
      .persist()
    val nE = t("materialize oriented (count)")(oriented.count())
    println(s"[triexp] edges=$nE")
    val adj = oriented.groupBy("u")
      .agg(sort_array(collect_list(struct(col("dv"), col("v")))).as("nb"))
    val wedges0 = adj
      .select(col("u"), col("nb"),
        posexplode(expr("transform(nb, x -> x.v)")).as(Seq("i", "v")))
      .select(col("u"), col("v"),
        explode(expr("transform(slice(nb, i + 2, size(nb)), y -> y.v)")).as("w"))
    val nW = t("wedge count (grouped gen, no probe)")(wedges0.count())
    println(s"[triexp] wedges=$nW")
    val bf = t("bloom build (stat.bloomFilter fpp .01)")(
      oriented.select(xxhash64(col("u"), col("v")).as("ek"))
        .stat.bloomFilter("ek", nE, 0.01))
    val bfB = spark.sparkContext.broadcast(bf)
    val mightClose = udf((k: Long) => bfB.value.mightContainLong(k))
    val nWF = t("wedge gen + bloom probe (count surviving)")(
      wedges0.filter(mightClose(xxhash64(col("v"), col("w")))).count())
    println(s"[triexp] wedges surviving bloom=$nWF")
    // closure join cost with vs without the probe
    def closure(w: org.apache.spark.sql.DataFrame) = w.join(
      oriented.select(col("u").as("v"), col("v").as("w")), Seq("v", "w"))
      .select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
    t("closure WITHOUT bloom (full wedge shuffle)")(
      closure(wedges0).write.format("noop").mode("overwrite").save())
    t("closure WITH bloom probe")(
      closure(wedges0.filter(mightClose(xxhash64(col("v"), col("w")))))
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
