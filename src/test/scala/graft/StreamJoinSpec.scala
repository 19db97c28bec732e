package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamJoin

object StreamJoinSpec {
  final case class Ev(event_id: Long, user_id: Long, ts: Timestamp, event_type: String)
}

/** Stream-stream interval join parity: a replayed event log pairs
  * purchases with ±30 min same-user views exactly like the batch
  * RangeJoin (q56's operator), and the watermark bound expires state
  * without dropping in-bound pairs.
  */
class StreamJoinSpec extends SparkSpec {
  import spark.implicits._
  import StreamJoinSpec._

  private def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)

  private val events: Seq[Ev] = (1 to 200).map { i =>
    val kind = if (i % 5 == 0) "purchase" else "view"
    Ev(i.toLong, (i % 4).toLong, ts(i * 3 % 97), kind)
  }

  test("replayed stream produces exactly the batch pair set") {
    implicit val sqlCtx = spark.sqlContext
    val df = events.toDF()
    val batch = graft.operators.RangeJoin.within(
      df.filter($"event_type" === "purchase").select("event_id", "user_id", "ts"),
      df.filter($"event_type" === "view").select("user_id", "ts"),
      "user_id", "ts", "ts", 1800000000L)
      .select(col("event_id"), col("r_ts").as("v_ts"))
      .as[(Long, Timestamp)].collect().toSet

    val pIn = MemoryStream[Ev]
    val vIn = MemoryStream[Ev]
    val got = scala.collection.mutable.Set.empty[(Long, Timestamp)]
    // the fixture scrambles arrival across a 97-minute span, so the
    // lateness bound must exceed it — with a too-small delay the
    // watermark advances past still-coming rows and drops them (the
    // exact tuning knob the operator doc calls out)
    val query = StreamJoin.purchasesWithViews(
      pIn.toDF().filter($"event_type" === "purchase"),
      vIn.toDF().filter($"event_type" === "view"),
      toleranceSec = 1800L, delay = "2 hours")
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= b.select("event_id", "v_ts").collect()
          .map(r => (r.getLong(0), r.getTimestamp(1)))
        ()
      }.start()
    try {
      // replay out of order in chunks — watermark lateness (1 h) covers
      // the fixture's scramble, so nothing in-bound may drop
      events.grouped(60).foreach { g =>
        pIn.addData(g: _*); vIn.addData(g: _*)
        query.processAllAvailable()
      }
      assert(got.toSet === batch,
        s"stream pairs ${got.size} vs batch ${batch.size}")
    } finally query.stop()
  }
}
