package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.CurrentValues
import graft.streaming._
import graft.streaming.CurrentValuesSink.InMemoryTarget

/** The fused single-query pipeline must land the EXACT table the split
  * two-query pipeline lands (r11 verdict #4): same script in, snapshot
  * equality out — values (scaling, last-writer-wins, dedup, F1/F3 gates),
  * liveness transitions (good → 1, bad-status → 0, silence timeout → 0),
  * and the re-admission path after an offline flip.
  */
class FusedParitySpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  /** Deterministic multi-batch script: dups, bad status, the pseudo-
    * measure, same-ts ties (value a pure function of ts), multi-device,
    * and a silence window that drives d3 offline via the event-time
    * timeout while d1 keeps refreshing.
    */
  private def runScript(mode: String): Map[(String, String), CurrentValuesSink.ModRow] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[MeasureEvent]
    val target = new InMemoryTarget
    val start: (org.apache.spark.sql.DataFrame, CurrentValuesSink.UpsertTarget) => IngestPipeline.Handle =
      mode match {
        case "fused" => (df, t) => FusedPipeline.start(df, t, slope = 2.0, offset = 1.0,
          trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("0 seconds"))
        case _ => (df, t) => IngestPipeline.start(df, t, slope = 2.0, offset = 1.0,
          trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("0 seconds"))
      }
    val handle = start(input.toDF(), target)
    try {
      val e1 = MeasureEvent("d1", "temp", 4.0, ts("2024-01-01 00:00:01"), status_ok = true)
      input.addData(e1, e1, // T8 duplicate
        MeasureEvent("d1", "temp", 6.0, ts("2024-01-01 00:00:09"), status_ok = true),
        MeasureEvent("d1", "temp", 6.0, ts("2024-01-01 00:00:09"), status_ok = true), // tie, same value
        MeasureEvent("d2", "rpm", 3.0, ts("2024-01-01 00:00:09"), status_ok = false), // F1 + online 0
        MeasureEvent("d3", "amps", 1.5, ts("2024-01-01 00:00:10"), status_ok = true),
        MeasureEvent("d1", CurrentValues.OnlineMeasure, 9.9,
          ts("2024-01-01 00:00:10"), status_ok = true)) // F3
      handle.processAllAvailable()
      // d3 then goes silent; d1 keeps ticking far enough to push the
      // watermark past d3's 60 s timeout
      input.addData(
        MeasureEvent("d1", "temp", 7.0, ts("2024-01-01 00:02:30"), status_ok = true))
      handle.processAllAvailable()
      input.addData(
        MeasureEvent("d1", "temp", 8.0, ts("2024-01-01 00:05:00"), status_ok = true))
      handle.processAllAvailable()
      // d2 recovers: bad → good re-admission
      input.addData(
        MeasureEvent("d2", "rpm", 4.5, ts("2024-01-01 00:05:01"), status_ok = true))
      handle.processAllAvailable()
      target.snapshot.map(r => (r.device, r.measure_name) -> r).toMap
    } finally { handle.stop(); target.close() }
  }

  test("fused pipeline lands the exact split-pipeline table (values + liveness + timeout)") {
    val split = runScript("split")
    val fused = runScript("fused")
    assert(fused.keySet == split.keySet,
      s"key sets differ: only-split=${split.keySet -- fused.keySet} only-fused=${fused.keySet -- split.keySet}")
    split.keySet.toSeq.sortBy(k => (k._1, k._2)).foreach { k =>
      assert(fused(k) == split(k), s"row differs at $k: split=${split(k)} fused=${fused(k)}")
    }
    // and the script exercised what it claims: a timeout-driven offline
    assert(split(("d3", CurrentValues.OnlineMeasure)).measure_value == 0.0)
    assert(split(("d2", CurrentValues.OnlineMeasure)).measure_value == 1.0)
    assert(split(("d1", "temp")).measure_value == 17.0) // 2*8+1
  }
}
