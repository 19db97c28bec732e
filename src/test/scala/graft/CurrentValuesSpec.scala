package graft

import java.sql.Timestamp
import scala.util.Random
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.CurrentValues

/** §1.3 semantic invariants: last-writer-wins (A3), liveness (T2 batch),
  * seed idempotence (K1), heartbeat (K4), offline reset (K3).
  */
class CurrentValuesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def mkMeasures(rows: Seq[(Long, String, String, Double, Timestamp, Boolean)]): DataFrame =
    rows.toDF("event_id", "device", "measure_name", "raw_value", "source_ts", "status_ok")

  private val base = Seq(
    (1L, "d1", "temp", 1.0, ts("2024-01-01 00:00:01"), true),
    (2L, "d1", "temp", 2.0, ts("2024-01-01 00:00:05"), true),
    (3L, "d1", "rpm", 9.0, ts("2024-01-01 00:00:02"), true),
    (4L, "d2", "temp", 7.0, ts("2024-01-01 00:00:03"), true),
    (5L, "d2", "temp", 8.0, ts("2024-01-01 00:00:03"), true) // ts tie → event_id wins
  )

  test("lastValuePerKey: latest by (source_ts, event_id) per key, order-insensitive (A3)") {
    val rnd = new Random(7)
    for (_ <- 1 to 5) {
      val got = CurrentValues.lastValuePerKey(mkMeasures(rnd.shuffle(base)))
        .select("device", "measure_name", "raw_value")
        .as[(String, String, Double)].collect().toSet
      assert(got == Set(("d1", "temp", 2.0), ("d1", "rpm", 9.0), ("d2", "temp", 8.0)))
    }
  }

  test("liveness: good-within-window=1, stale=0, never-good=0 (T2 batch)") {
    val rows = Seq(
      (1L, "fresh", "t", 1.0, ts("2024-01-01 00:10:00"), true),   // defines now
      (2L, "stale", "t", 1.0, ts("2024-01-01 00:08:59"), true),   // 61s old
      (3L, "edge", "t", 1.0, ts("2024-01-01 00:09:00"), true),    // exactly 60s → online (<=)
      (4L, "badonly", "t", 1.0, ts("2024-01-01 00:10:00"), false) // recent but bad status
    )
    val got = CurrentValues.liveness(mkMeasures(rows), 60000000L)
      .select("device", "online").as[(String, Double)].collect().toMap
    assert(got == Map("fresh" -> 1.0, "stale" -> 0.0, "edge" -> 1.0, "badonly" -> 0.0))
  }

  test("seedRows: one zero row per point + one online row per device; idempotent (K1)") {
    val seeded = CurrentValues.seedRows(mkMeasures(base))
    val keys = seeded.select("device", "measure_name").as[(String, String)].collect().toSeq
    assert(keys.size == keys.distinct.size) // no dupes
    assert(keys.toSet == Set(
      ("d1", "temp"), ("d1", "rpm"), ("d2", "temp"),
      ("d1", CurrentValues.OnlineMeasure), ("d2", CurrentValues.OnlineMeasure)))
    assert(seeded.filter(col("tag_value") =!= 0.0 || col("measure_value") =!= 0.0).isEmpty)
    assert(seeded.filter(col("logging") =!= "instant").isEmpty)
    // running seed against an already-seeded sink adds nothing
    assert(CurrentValues.seedMissing(mkMeasures(base), seeded).isEmpty)
  }

  test("heartbeat bumps last_updated only for online devices (K4)") {
    val current = Seq(
      ("d1", "temp", "2024-01-01T00:00:00.000000"),
      ("d1", CurrentValues.OnlineMeasure, "2024-01-01T00:00:00.000000"),
      ("d2", "temp", "2024-01-01T00:00:00.000000")
    ).toDF("device", "measure_name", "last_updated")
    val online = Seq("d1").toDF("device")
    val now = Seq("2024-01-01T00:01:00.000000").toDF("now_s")
    val got = CurrentValues.heartbeat(current, online, now)
      .select("device", "measure_name", "last_updated")
      .as[(String, String, String)].collect().toSet
    assert(got == Set(
      ("d1", "temp", "2024-01-01T00:01:00.000000"),
      ("d1", CurrentValues.OnlineMeasure, "2024-01-01T00:01:00.000000"),
      ("d2", "temp", "2024-01-01T00:00:00.000000")))
  }

  test("offlineReset zeroes exactly the myPV_online rows (K3)") {
    val current = Seq(
      ("d1", "temp", 5.0, 5.0, "2024-01-01T00:00:00.000000"),
      ("d1", CurrentValues.OnlineMeasure, 1.0, 1.0, "2024-01-01T00:00:00.000000")
    ).toDF("device", "measure_name", "tag_value", "measure_value", "last_updated")
    val now = Seq("2024-01-01T00:01:00.000000").toDF("now_s")
    val got = CurrentValues.offlineReset(current, now)
      .select("measure_name", "tag_value", "measure_value", "last_updated")
      .as[(String, Double, Double, String)].collect().toSet
    assert(got == Set(
      ("temp", 5.0, 5.0, "2024-01-01T00:00:00.000000"),
      (CurrentValues.OnlineMeasure, 0.0, 0.0, "2024-01-01T00:01:00.000000")))
  }
}
