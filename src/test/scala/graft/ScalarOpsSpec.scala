package graft

import org.apache.spark.sql.functions._
import graft.functions.ScalarOps

/** C1/C2/C4/C5 scalar parity (SURVEY.md §2.7). The rounding edge cases pin
  * the C# `Math.Round` half-to-even behavior
  * (`Services/OpcSubscribeService.cs:570-575`) that `bround` must match.
  */
class ScalarOpsSpec extends SparkSpec {
  import spark.implicits._

  private def eval1(c: org.apache.spark.sql.Column): Any =
    Seq(1).toDF("x").select(c.as("r")).head.get(0)

  test("scaleSlopeIntercept: v*slope+offset rounded half-to-even at 3dp") {
    assert(eval1(ScalarOps.scaleSlopeIntercept(lit(2.0), 1.5, 0.25)) == 3.25)
    // half-to-even edges: .0005 at scale 3 rounds toward the even neighbor
    assert(eval1(ScalarOps.scaleSlopeIntercept(lit(0.1235), 1.0, 0.0)) == 0.124)
    assert(eval1(ScalarOps.scaleSlopeIntercept(lit(0.1245), 1.0, 0.0)) == 0.124)
    assert(eval1(ScalarOps.scaleSlopeIntercept(lit(-0.1235), 1.0, 0.0)) == -0.124)
    // defaults slope=1 offset=0 are identity (Models/OpcTemplates.cs:42-45)
    assert(eval1(ScalarOps.scaleSlopeIntercept(lit(7.125), 1.0, 0.0)) == 7.125)
  }

  test("scalePointSlope: range remap (vmin,vmax)->(tmin,tmax)") {
    // v=50 in [0,100] -> [0,10] = 5.0 (Services/OpcSubscribeService.cs:573-575)
    assert(eval1(ScalarOps.scalePointSlope(lit(50.0), 0, 100, 0, 10)) == 5.0)
    assert(eval1(ScalarOps.scalePointSlope(lit(0.0), 0, 100, -1, 1)) == -1.0)
    assert(eval1(ScalarOps.scalePointSlope(lit(100.0), 0, 100, -1, 1)) == 1.0)
  }

  test("scaleByMode: degenerate point_slope range falls back to identity, not NaN") {
    def byMode(v: Double, mode: String, vmin: Double, vmax: Double): Double =
      eval1(ScalarOps.scaleByMode(lit(v), lit(mode), lit(null).cast("double"),
        lit(null).cast("double"), lit(vmin), lit(vmax), lit(0.0), lit(100.0)))
        .asInstanceOf[Double]
    // healthy range scales normally
    assert(byMode(100.0, "point_slope", 0.0, 200.0) == 50.0)
    // vmax == vmin (incl. ConfigFiles' missing-bounds 0.0 coalesce) would
    // divide by zero — malformed config rows write the identity instead
    assert(byMode(7.125, "point_slope", 0.0, 0.0) == 7.125)
    assert(byMode(7.125, "point_slope", 3.0, 3.0) == 7.125)
    assert(!byMode(7.125, "point_slope", 0.0, 0.0).isNaN)
  }

  test("lastUpdatedString: microsecond ISO text, UTC (C4)") {
    val s = eval1(ScalarOps.lastUpdatedString(
      to_timestamp(lit("2024-08-07 01:02:03.123456"))))
    assert(s == "2024-08-07T01:02:03.123456")
  }

  test("absDeltaMicros is symmetric and exact (C5)") {
    val a = to_timestamp(lit("2024-01-01 00:00:00"))
    val b = to_timestamp(lit("2024-01-01 00:00:01.000001"))
    assert(eval1(ScalarOps.absDeltaMicros(a, b)) == 1000001L)
    assert(eval1(ScalarOps.absDeltaMicros(b, a)) == 1000001L)
  }

  test("md5Hash32 matches the documented oracle form") {
    // md5("abc") = 900150983cd24fb0..., first 8 hex = 0x90015098
    assert(eval1(ScalarOps.md5Hash32(lit("abc"))) == 0x90015098L)
  }

  test("exactSum is order-insensitive (decimal, not double)") {
    val xs = Seq.tabulate(1000)(i => 0.1 + i * 1e-7)
    val fwd = xs.toDF("x").select(ScalarOps.exactSum(col("x"), 9)).head.getDouble(0)
    val rev = xs.reverse.toDF("x").repartition(7)
      .select(ScalarOps.exactSum(col("x"), 9)).head.getDouble(0)
    assert(fwd == rev)
  }
}
