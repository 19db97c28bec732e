package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.{CurrentValues, Gates}

/** F1–F3 gate boundaries (SURVEY.md §2.3). The staleness gate is inclusive
  * (`<=`, `Services/OpcSubscribeService.cs:559`): a value exactly
  * timeout-old passes.
  */
class GatesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("qualityGate keeps only status_ok (F1)") {
    val df = Seq(("d1", true), ("d2", false)).toDF("device", "status_ok")
    assert(Gates.qualityGate(df).select("device").as[String].collect().toSeq == Seq("d1"))
  }

  test("excludeOnlineMeasure drops myPV_online rows (F3)") {
    val df = Seq(("d1", CurrentValues.OnlineMeasure), ("d1", "temp"))
      .toDF("device", "measure_name")
    assert(Gates.excludeOnlineMeasure(df).count() == 1)
  }

  test("stalenessGate: exactly-timeout-old passes, one microsecond older fails (F2)") {
    // newest row defines "now"; timeout = 60s
    val df = Seq(
      ("new", ts("2024-01-01 00:01:00")),
      ("edge", ts("2024-01-01 00:00:00")),         // exactly 60s old
      ("stale", ts("2023-12-31 23:59:59.999999"))  // 60s + 1µs old
    ).toDF("device", "source_ts")
    val kept = Gates.stalenessGate(df, 60000000L).select("device").as[String].collect().toSet
    assert(kept == Set("new", "edge"))
  }

  test("onlineDevicePredicate: measure+value+in-list conjunction (F5)") {
    val df = Seq(
      ("d1", CurrentValues.OnlineMeasure, 1.0),
      ("d2", CurrentValues.OnlineMeasure, 0.0),
      ("d3", "temp", 1.0),
      ("d4", CurrentValues.OnlineMeasure, 1.0)
    ).toDF("device", "measure_name", "measure_value")
    val got = df.filter(Gates.onlineDevicePredicate(
        col("measure_name"), col("measure_value"), Seq("d1", "d2", "d3")))
      .select("device").as[String].collect().toSeq
    assert(got == Seq("d1"))
    // empty device list = no IN restriction
    val all = df.filter(Gates.onlineDevicePredicate(
        col("measure_name"), col("measure_value"), Nil))
      .select("device").as[String].collect().toSet
    assert(all == Set("d1", "d4"))
  }
}
