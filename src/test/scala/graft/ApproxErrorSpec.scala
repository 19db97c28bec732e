package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Quantitative bound on the HLL sketch (q29/q81): at rsd=0.02 the
  * per-group relative error against exact distinct stays within 5% at
  * both driver-visible scales. Measured values this round: 0.0 at sf0.01
  * (150 users/group), 0.004 at sf0.1 (1500 users/group); the default
  * rsd=0.05 measured 0.067 at sf0.1, which is why q81 pins the tighter
  * sketch. Same pattern as AnnRecallSpec: the approximate operator
  * carries a measured, pinned quality floor.
  */
class ApproxErrorSpec extends AnyFunSuite {

  test("approx_count_distinct(rsd=0.02) holds 5% relative error at sf0.01 and sf0.1") {
    val spark = SparkSpec.spark
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val rows = Tables.events(spark, s"/root/testdata/$sf")
        .groupBy("event_type")
        .agg(
          countDistinct(col("user_id")).as("exact"),
          approx_count_distinct(col("user_id"), 0.02).as("approx"))
        .collect()
      assert(rows.length == 5, s"$sf: expected the 5 event types")
      rows.foreach { r =>
        val (exact, approx) = (r.getLong(1), r.getLong(2))
        val rel = math.abs(approx - exact).toDouble / exact
        assert(rel <= 0.05,
          s"$sf/${r.getString(0)}: approx=$approx exact=$exact rel=$rel")
      }
    }
  }
}
