package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType}
import graft.functions.TopKAgg

/** Partial-aggregating top-k ≡ the window form, under any partition
  * layout, including exact-decimal ties resolved by id.
  */
class TopKAggSpec extends AnyFunSuite {

  test("TopK aggregator equals window row_number form on tied and untied data, any partitioning") {
    val spark = SparkSpec.spark
    import spark.implicits._
    // groups of varying size incl. ties on value (resolved by min id)
    val rows = for {
      g <- 0L until 20L
      i <- 0L until (g % 7 + 1)
    } yield (g, g * 100 + i, new java.math.BigDecimal(s"${(i % 3) * 10}.5${i % 2}"))
    for (parts <- Seq(1, 5, 32)) {
      val ds = rows.toDF("g", "id", "v")
        .withColumn("v", col("v").cast("decimal(18,2)"))
        .repartition(parts)
        .as[(Long, Long, java.math.BigDecimal)]
      val got = ds.groupByKey(_._1).agg(TopKAgg.TopK(3).toColumn.name("top"))
        .toDF("g", "top")
        .select(col("g"), posexplode(col("top")))
        .select(col("g"), col("col.id").as("id"),
          col("col.value").cast(DoubleType).as("v"),
          (col("pos") + 1).cast(IntegerType).as("rk"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("g").orderBy(col("v").desc, col("id"))
      val want = rows.toDF("g", "id", "v")
        .withColumn("v", col("v").cast("decimal(18,2)"))
        .withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
        .select(col("g"), col("id"), col("v").cast(DoubleType).as("v"), col("rk"))
      assert(got.except(want).isEmpty && want.except(got).isEmpty,
        s"parts=$parts mismatch vs window form")
    }
  }

  test("k larger than any group returns whole groups, ordered") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val ds = Seq((1L, 10L, new java.math.BigDecimal("1.00")),
      (1L, 11L, new java.math.BigDecimal("2.00"))).toDS()
    val top = ds.groupByKey(_._1).agg(TopKAgg.TopK(5).toColumn.name("top"))
      .collect().head._2
    assert(top.map(_.id) == Seq(11L, 10L))
  }
}
