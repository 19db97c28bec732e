package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import graft.sources.MeasureSourceProvider
import graft.streaming.{CurrentValuesSink, IngestPipeline}

/** Streaming ingest throughput: events/second through the FULL pipeline
  * (source → gates → watermark dedup → value sink + liveness state
  * machine). The reference's ceiling is DB-bound at ~2 Postgres
  * transactions per value on one connection (BASELINE.md "write
  * amplification") — this measures the Spark rebuild's equivalent
  * end-to-end number on the same single node. Prints one JSON line.
  */
object ThroughputBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val seconds = sys.env.getOrElse("SPARK_GRAFT_TPUT_SECONDS", "20").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val inputRows = new java.util.concurrent.atomic.AtomicLong(0L)
    var valueQueryId: java.util.UUID = null
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit =
        if (e.progress.id == valueQueryId) inputRows.addAndGet(e.progress.numInputRows)
    })

    val target = new CurrentValuesSink.InMemoryTarget
    val raw = spark.readStream
      .format(classOf[MeasureSourceProvider].getName)
      .option("nDevices", 1000).option("nMeasures", 10)
      .option("intervalMicros", 1000L)        // 1 ms ticks: heavy offered load
      .option("ticksPerBatch", 20L)           // 200k rows offered per trigger
      .option("queueCapacity", 1000L)
      .option("numPartitions", cpus)
      .load()
    val handle = IngestPipeline.start(raw, target,
      trigger = Trigger.ProcessingTime("0 seconds"))
    valueQueryId = handle.valueQuery.id
    val t0 = System.nanoTime()
    try Thread.sleep(seconds * 1000L) finally {
      val elapsed = (System.nanoTime() - t0) / 1e9
      handle.stop()
      val rows = inputRows.get()
      val eps = rows / elapsed
      println(f"""{"metric":"ingest_throughput","value":$eps%.0f,"unit":"events/sec","rows":$rows,"seconds":$elapsed%.1f,"table_rows":${target.snapshot.size}}""")
    }
    spark.stop()
  }
}
