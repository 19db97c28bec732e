package graft

import org.apache.spark.sql.connector.read.streaming.Offset
import graft.sources._

/** DataSource V2 micro-batch source (S1/T6, SURVEY.md §2.1): offset math,
  * discard-oldest backlog capping, admission control, partition slicing,
  * replay determinism, and an end-to-end readStream.
  */
class MeasureSourceSpec extends SparkSpec {

  private def seq(o: Offset): Long = o.asInstanceOf[SeqOffset].seq

  test("simulated feed is pure: same index ⇒ same row across instances (replayability)") {
    val a = new SimulatedFeed(3, 2, 0L, 5000000L, 0L)
    val b = new SimulatedFeed(3, 2, 0L, 5000000L, 100L)
    (0L until 50L).foreach { i => assert(a.at(i) == b.at(i)) }
    // every (tick, device, measure) slot is covered exactly once per tick
    val rows = (0L until 6L).map(a.at)
    assert(rows.map(r => (r._1, r._2)).distinct.size == 6)
  }

  test("planInputPartitions: disjoint slices cover exactly [start, end)") {
    val s = new MeasureMicroBatchStream(10, 3, 0L, 5000000L,
      ticksPerBatch = 1L, maxRowsPerTrigger = Long.MaxValue, queueCapacity = 10L,
      numPartitions = 4)
    val parts = s.planInputPartitions(SeqOffset(0L), SeqOffset(30L))
      .map(_.asInstanceOf[MeasureRange])
    assert(parts.map(p => p.hi - p.lo).sum == 30L)
    assert(parts.sortBy(_.lo).sliding(2).forall {
      case Array(x, y) => x.hi == y.lo
      case _           => true
    })
  }

  test("T6 discard-oldest: backlog beyond queueCapacity×items advances the start") {
    val s = new MeasureMicroBatchStream(2, 2, 0L, 5000000L,
      ticksPerBatch = 1L, maxRowsPerTrigger = Long.MaxValue, queueCapacity = 10L,
      numPartitions = 1)
    // capacity = 10 × (2×2) = 40; a 100-row backlog keeps only the newest 40
    val parts = s.planInputPartitions(SeqOffset(0L), SeqOffset(100L))
      .map(_.asInstanceOf[MeasureRange])
    assert(parts.map(_.lo).min == 60L)
    assert(parts.map(_.hi).max == 100L)
  }

  test("admission control: at most maxRowsPerTrigger rows per micro-batch") {
    val s = new MeasureMicroBatchStream(2, 2, 0L, 5000000L,
      ticksPerBatch = 1L, maxRowsPerTrigger = 7L, queueCapacity = 1000L,
      numPartitions = 3)
    val parts = s.planInputPartitions(SeqOffset(0L), SeqOffset(100L))
      .map(_.asInstanceOf[MeasureRange])
    assert(parts.map(p => p.hi - p.lo).sum == 7L)
  }

  test("latestOffset advances by one tick of rows per trigger") {
    val s = new MeasureMicroBatchStream(4, 3, 0L, 5000000L,
      ticksPerBatch = 1L, maxRowsPerTrigger = Long.MaxValue, queueCapacity = 10L,
      numPartitions = 1)
    assert(seq(s.initialOffset()) == 0L)
    assert(seq(s.latestOffset()) == 12L)
    assert(seq(s.latestOffset()) == 24L)
    assert(seq(s.deserializeOffset("7")) == 7L)
  }

  test("end-to-end: readStream over the provider yields schema-conformant rows") {
    val q = spark.readStream
      .format(classOf[MeasureSourceProvider].getName)
      .option("nDevices", 3).option("nMeasures", 2)
      .option("numPartitions", 2)
      .load()
      .writeStream.format("memory").queryName("measure_src_t")
      .outputMode("append").start()
    try {
      // wait until at least one full tick (3×2 rows) has landed
      val deadline = System.currentTimeMillis() + 60000
      while (spark.table("measure_src_t").count() < 6 &&
             System.currentTimeMillis() < deadline) Thread.sleep(200)
      val t = spark.table("measure_src_t")
      assert(t.schema.fieldNames.toSeq ==
        Seq("device", "measure_name", "raw_value", "source_ts", "status_ok", "event_seq"))
      // event_seq is the source's dequeue sequence: distinct per row
      // (snapshot once — the stream keeps appending under the assertions)
      val seqs = t.select("event_seq").collect().map(_.getLong(0)).toSeq
      assert(seqs.distinct.size == seqs.size)
      assert(t.count() >= 6)
      val devices = t.select("device").distinct().collect().map(_.getString(0)).toSet
      assert(devices == Set("dev-0", "dev-1", "dev-2"))
    } finally q.stop()
  }
}
