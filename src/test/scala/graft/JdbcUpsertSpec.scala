package graft

import java.lang.reflect.Proxy
import java.sql.{Connection, PreparedStatement, Statement}
import scala.collection.mutable
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.JdbcUpsert
import graft.streaming.CurrentValuesSink.ModRow

/** K2 production sink: statement generation, batching, and transaction
  * discipline captured through reflective JDBC stubs (no database).
  */
class JdbcUpsertSpec extends AnyFunSuite {

  private class Capture {
    val batches = mutable.Buffer[Seq[Any]]()
    val current = mutable.Buffer[Any]()
    val events = mutable.Buffer[String]()
    var lastSql: String = _

    private def stub[T](clazz: Class[T])(pf: PartialFunction[(String, Array[AnyRef]), AnyRef]): T =
      Proxy.newProxyInstance(clazz.getClassLoader, Array(clazz),
        (_, m, args) => {
          val a = Option(args).getOrElse(Array.empty[AnyRef])
          if (pf.isDefinedAt((m.getName, a))) pf((m.getName, a))
          else m.getReturnType match {
            case java.lang.Boolean.TYPE => java.lang.Boolean.FALSE
            case java.lang.Integer.TYPE => Integer.valueOf(0)
            case _ => null
          }
        }).asInstanceOf[T]

    val prepared: PreparedStatement = stub(classOf[PreparedStatement]) {
      case ("setString", a) => current += a(1); null
      case ("setDouble", a) => current += a(1); null
      case ("addBatch", _) => batches += current.toSeq; current.clear(); null
      case ("executeBatch", _) => events += "executeBatch"; Array.empty[Int]
      case ("close", _) => null
    }
    val statement: Statement = stub(classOf[Statement]) {
      case ("execute", a) => lastSql = a(0).toString; java.lang.Boolean.TRUE
    }
    val connection: Connection = stub(classOf[Connection]) {
      case ("prepareStatement", a) => lastSql = a(0).toString; prepared
      case ("createStatement", _) => statement
      case ("setAutoCommit", _) => null
      case ("commit", _) => events += "commit"; null
      case ("rollback", _) => events += "rollback"; null
      case ("close", _) => events += "close"; null
    }
  }

  test("upsert: one prepared batch, params in row order, commit then close") {
    val cap = new Capture
    val target = new JdbcUpsert.Target(() => cap.connection)
    target.upsert(Seq(
      ModRow("d1", "temp", 1.5, 3.0, "2024-01-01T00:00:00.000000"),
      ModRow("d2", "rpm", 2.5, 5.0, "2024-01-01T00:00:01.000000")))
    assert(cap.lastSql.contains("ON CONFLICT (device, measure_name) DO UPDATE"))
    assert(cap.batches == Seq(
      Seq("d1", "temp", 1.5, 3.0, "2024-01-01T00:00:00.000000"),
      Seq("d2", "rpm", 2.5, 5.0, "2024-01-01T00:00:01.000000")))
    assert(cap.events == Seq("executeBatch", "commit", "close"))
  }

  test("empty upsert opens no connection; bootstrap issues the reference DDL") {
    var opened = 0
    val target = new JdbcUpsert.Target(() => { opened += 1; null })
    target.upsert(Seq.empty)
    assert(opened == 0)
    val cap = new Capture
    JdbcUpsert.bootstrap(() => cap.connection)
    assert(cap.lastSql.contains("CREATE TABLE IF NOT EXISTS modvalues"))
    assert(cap.lastSql.contains("PRIMARY KEY (device, measure_name)"))
  }

  test("target with a URL-capturing factory survives closure serialization (executor-side contract)") {
    val url = "jdbc:postgresql://db:5432/modvalues"
    val target = new JdbcUpsert.Target(
      () => java.sql.DriverManager.getConnection(url))
    val bos = new java.io.ByteArrayOutputStream()
    new java.io.ObjectOutputStream(bos).writeObject(target)
    val back = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray)).readObject()
    assert(back.isInstanceOf[JdbcUpsert.Target])
  }

  test("partition writes chunk the statement batch at batchSize (executor memory bound)") {
    val cap = new Capture
    val target = new JdbcUpsert.Target(() => cap.connection, batchSize = 2)
    target.upsertPartition((1 to 5).iterator.map(i =>
      ModRow(s"d$i", "temp", i.toDouble, i.toDouble, "T0")))
    // 5 rows at chunk size 2 → 3 executeBatch calls, ONE commit, one conn
    assert(cap.events == Seq("executeBatch", "executeBatch", "executeBatch",
      "commit", "close"))
    assert(cap.batches.size == 5)
  }

  test("K1 seed: INSERT .. ON CONFLICT DO NOTHING batch over the key set") {
    val cap = new Capture
    val target = new JdbcUpsert.Target(() => cap.connection)
    target.seed(Seq(("d1", "temp"), ("d1", "myPV_online")), "T0")
    assert(cap.lastSql.contains("ON CONFLICT (device, measure_name) DO NOTHING"))
    assert(cap.batches == Seq(Seq("d1", "temp", "T0"), Seq("d1", "myPV_online", "T0")))
    assert(cap.events == Seq("executeBatch", "commit", "close"))
    // empty key set opens no connection
    var opened = 0
    new JdbcUpsert.Target(() => { opened += 1; null }).seed(Seq.empty, "T0")
    assert(opened == 0)
  }

  test("K3 offline reset and K4 heartbeat are single set-oriented statements") {
    val cap = new Capture
    val target = new JdbcUpsert.Target(() => cap.connection)
    target.offlineReset("T1")
    assert(cap.lastSql.contains("SET tag_value = 0, measure_value = 0"))
    assert(cap.lastSql.contains("WHERE measure_name = 'myPV_online'"))

    target.heartbeat("T2")
    // online set derived in-database (subquery), not shipped from the app
    assert(cap.lastSql.contains("SET last_updated = ?"))
    assert(cap.lastSql.contains("WHERE device IN (SELECT device FROM modvalues"))
    assert(cap.lastSql.contains("measure_value = 1"))
    // no snapshot involved anywhere: the JDBC target doesn't even have one
    assert(cap.events == Seq("commit", "close", "commit", "close"))
  }
}
