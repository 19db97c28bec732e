package graft

import org.scalatest.funsuite.AnyFunSuite
import java.sql.{Connection, DriverManager}
import graft.streaming.JdbcUpsert
import graft.streaming.CurrentValuesSink.ModRow
import graft.operators.CurrentValues

/** The K1–K4 target against a LIVE database engine — Apache Derby,
  * embedded and in-memory (it ships with Spark, no dependency added).
  * JdbcUpsertSpec verifies the statements and the partition-write
  * protocol against a capture stub; this spec makes a real engine
  * execute them: the MERGE upsert's insert-then-update semantics, the
  * seed's insert-if-missing, the ANSI UPDATE legs with the heartbeat's
  * in-database subquery, batch chunking, and transaction rollback on
  * mid-partition failure. The AnsiMerge dialect expresses exactly the
  * Postgres `ON CONFLICT` semantics as standard MERGE (the one statement
  * family Derby lacks); the PG literal syntax is engine-verified too —
  * PgLiveSpec runs the Postgres dialect against a real Postgres 15
  * server through the hand-written PgWire client.
  */
class JdbcDerbySpec extends AnyFunSuite {

  private def freshDb(name: String): () => Connection = {
    val db = s"$name-${java.util.UUID.randomUUID()}"
    val conn = DriverManager.getConnection(s"jdbc:derby:memory:$db;create=true")
    val st = conn.createStatement()
    st.execute(
      """CREATE TABLE modvalues (
        |  device VARCHAR(200) NOT NULL,
        |  measure_name VARCHAR(200) NOT NULL,
        |  tag_value REAL,
        |  measure_value REAL,
        |  last_updated VARCHAR(64),
        |  PRIMARY KEY (device, measure_name)
        |)""".stripMargin)
    st.close(); conn.close()
    () => DriverManager.getConnection(s"jdbc:derby:memory:$db")
  }

  private def snapshot(connect: () => Connection): Map[(String, String), (Double, Double, String)] = {
    val conn = connect()
    try {
      val rs = conn.createStatement().executeQuery(
        "SELECT device, measure_name, tag_value, measure_value, last_updated FROM modvalues")
      val b = Map.newBuilder[(String, String), (Double, Double, String)]
      while (rs.next())
        b += (rs.getString(1), rs.getString(2)) ->
          ((rs.getDouble(3), rs.getDouble(4), rs.getString(5)))
      b.result()
    } finally conn.close()
  }

  test("MERGE upsert against live Derby: inserts, then updates the same keys; chunked batches") {
    val connect = freshDb("upsert")
    val target = new JdbcUpsert.Target(connect, batchSize = 7, dialect = JdbcUpsert.AnsiMerge)
    // 20 rows across 3 executeBatch chunks (7/7/6)
    val first = (1 to 20).map(i => ModRow(s"dev-$i", "m0", 1.5, 2.5, "t1"))
    target.upsertPartition(first.iterator)
    val s1 = snapshot(connect)
    assert(s1.size == 20 && s1(("dev-3", "m0")) == ((1.5, 2.5, "t1")))
    // same keys again with new values: MATCHED leg must UPDATE, not dup
    val second = (1 to 20).map(i => ModRow(s"dev-$i", "m0", 4.0, 8.0, "t2"))
    target.upsertPartition(second.iterator)
    val s2 = snapshot(connect)
    assert(s2.size == 20 && s2(("dev-17", "m0")) == ((4.0, 8.0, "t2")))
  }

  test("seed fills only missing keys; reset and heartbeat hit exactly the right live rows") {
    val connect = freshDb("ctl")
    val target = new JdbcUpsert.Target(connect, dialect = JdbcUpsert.AnsiMerge)
    val online = CurrentValues.OnlineMeasure
    target.upsertPartition(Iterator(
      ModRow("dev-a", online, 1.0, 1.0, "t0"),   // online
      ModRow("dev-b", online, 0.0, 0.0, "t0"),   // offline
      ModRow("dev-a", "temp", 9.0, 9.5, "t0")))
    // seed: dev-a/temp exists (stays 9.0), dev-c/temp is new (zeroed)
    target.seed(Seq(("dev-a", "temp"), ("dev-c", "temp")), "seeded")
    val s1 = snapshot(connect)
    assert(s1(("dev-a", "temp")) == ((9.0, 9.5, "t0")), "seed must not touch existing keys")
    assert(s1(("dev-c", "temp")) == ((0.0, 0.0, "seeded")))
    // heartbeat: only devices whose online measure_value = 1 (subquery)
    target.heartbeat("hb")
    val s2 = snapshot(connect)
    assert(s2(("dev-a", online))._3 == "hb" && s2(("dev-a", "temp"))._3 == "hb")
    assert(s2(("dev-b", online))._3 == "t0", "offline device must not heartbeat")
    // offline reset: zero every online-measure row
    target.offlineReset("reset")
    val s3 = snapshot(connect)
    assert(s3(("dev-a", online)) == ((0.0, 0.0, "reset")))
    assert(s3(("dev-b", online)) == ((0.0, 0.0, "reset")))
    assert(s3(("dev-a", "temp"))._1 == 9.0, "reset must not touch non-online measures")
  }

  test("mid-partition failure rolls back the whole transaction on the live engine") {
    val connect = freshDb("rollback")
    val target = new JdbcUpsert.Target(connect, batchSize = 2, dialect = JdbcUpsert.AnsiMerge)
    val rows = Iterator(
      ModRow("ok-1", "m0", 1.0, 1.0, "t"),
      ModRow("ok-2", "m0", 1.0, 1.0, "t"),
      ModRow("x" * 500, "m0", 1.0, 1.0, "t")) // exceeds VARCHAR(200) → batch fails
    intercept[java.sql.SQLException] { target.upsertPartition(rows) }
    // the first chunk's executeBatch succeeded mid-transaction but the
    // partition's transaction rolled back as a unit — nothing committed
    assert(snapshot(connect).isEmpty, "partial partition must not commit")
  }
}
