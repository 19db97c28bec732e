package graft.streaming

import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import graft.operators.CurrentValues

/** K2 — the keyed current-value upsert (reference
  * `Services/OpcSubscribeService.cs:600-654`: per-value
  * SELECT-FOR-UPDATE + UPDATE with retries). In Spark the micro-batch is
  * the transaction: one set-oriented MERGE per trigger, single-writer,
  * idempotent under epoch replay — the locks and retry loops disappear by
  * construction (SURVEY.md §4).
  *
  * The sink is abstracted so tests run against an in-memory table and
  * production targets Delta `MERGE INTO` / JDBC `INSERT .. ON CONFLICT`:
  * the contract is exactly "apply these (key → row) pairs atomically".
  */
object CurrentValuesSink {

  /** One row of the reference's `modvalues` table
    * (DDL `Services/OpcSubscribeService.cs:140-152`).
    */
  final case class ModRow(
      device: String,
      measure_name: String,
      tag_value: Double,
      measure_value: Double,
      last_updated: String)

  /** Where MERGE lands. Implementations must be idempotent per epoch —
    * replaying a batch with the same rows must yield the same table.
    */
  trait UpsertTarget {
    def upsert(rows: Seq[ModRow]): Unit
    def snapshot: Seq[ModRow]
  }

  /** Test/demo target; production would issue Delta MERGE or JDBC upsert
    * with the same key.
    */
  final class InMemoryTarget extends UpsertTarget {
    private val table = new ConcurrentHashMap[(String, String), ModRow]()
    override def upsert(rows: Seq[ModRow]): Unit =
      rows.foreach(r => table.put((r.device, r.measure_name), r))
    override def snapshot: Seq[ModRow] = table.values.asScala.toSeq
  }

  /** Reduce one micro-batch to its final per-key rows (last writer wins
    * WITHIN the batch too — the reference applies values in dequeue order,
    * so only the newest survives) and upsert. The batch is tiny relative to
    * the table; the heavy dedup work is distributed, only the final
    * per-key rows reach the driver-side target adapter.
    */
  def applyBatch(batch: DataFrame, target: UpsertTarget, scaleSlope: Double,
                 scaleOffset: Double): Unit = {
    import batch.sparkSession.implicits._
    if (batch.isEmpty) return
    val latest = CurrentValues.lastValuePerKey(
        batch.withColumn("event_id", monotonically_increasing_id()))
      .withColumn("tag_value", bround(col("raw_value"), 3))
      .withColumn("measure_value",
        graft.functions.ScalarOps.scaleSlopeIntercept(col("raw_value"), scaleSlope, scaleOffset))
      .withColumn("last_updated",
        graft.functions.ScalarOps.lastUpdatedString(col("source_ts")))
      .select("device", "measure_name", "tag_value", "measure_value", "last_updated")
      .as[ModRow]
    target.upsert(latest.collect().toSeq)
  }

  /** Wire a gated measure stream into the sink via foreachBatch, 5 s
    * trigger (reference main-loop tick, `Services/OpcSubscribeService.cs:392`).
    */
  def writer(gated: DataFrame, target: UpsertTarget,
             slope: Double = 1.0, offset: Double = 0.0,
             trigger: Trigger = Trigger.ProcessingTime("5 seconds")): DataStreamWriter[Row] =
    gated.writeStream
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(batch, target, slope, offset)
      }

  /** K1 seed + K3 startup reset against the target, batch-side
    * (`Services/OpcSubscribeService.cs:656-713,717-739`): seed zero rows
    * for unseen keys + one myPV_online row per device, all offline.
    */
  def seedAndReset(devicePoints: Seq[(String, String)], nowS: String,
                   target: UpsertTarget): Unit = {
    val existing = target.snapshot.map(r => (r.device, r.measure_name)).toSet
    val online = devicePoints.map(_._1).distinct
      .map(d => (d, CurrentValues.OnlineMeasure))
    val seeds = (devicePoints ++ online).distinct
      .filterNot(existing)
      .map { case (d, m) => ModRow(d, m, 0.0, 0.0, nowS) }
    target.upsert(seeds)
    // K3: zero every online flag regardless of prior state
    val resets = target.snapshot
      .filter(_.measure_name == CurrentValues.OnlineMeasure)
      .map(_.copy(tag_value = 0.0, measure_value = 0.0, last_updated = nowS))
    target.upsert(resets)
  }

  /** K4 heartbeat (`Services/OpcSubscribeService.cs:332-378`): bump
    * last_updated for all rows of currently-online devices. Driven by a
    * 60 s trigger in production; pure function here.
    */
  def heartbeat(target: UpsertTarget, nowS: String): Unit = {
    val snap = target.snapshot
    val online = snap.filter(r =>
      r.measure_name == CurrentValues.OnlineMeasure && r.measure_value == 1.0)
      .map(_.device).toSet
    target.upsert(snap.filter(r => online(r.device)).map(_.copy(last_updated = nowS)))
  }
}
