package graft.streaming

import java.sql.{Connection, PreparedStatement}
import graft.streaming.CurrentValuesSink.{ModRow, UpsertTarget}

/** Production K2 sink: the reference's per-value SELECT-FOR-UPDATE +
  * UPDATE transaction pair (`Services/OpcSubscribeService.cs:600-713`)
  * collapses to ONE set-oriented statement per micro-batch —
  * `INSERT .. ON CONFLICT (device, measure_name) DO UPDATE` — executed as
  * a single JDBC batch. Single-writer micro-batches + the natural key make
  * the statement idempotent, so epoch replay after failure is exactly-once
  * (no row locks, no retry loop).
  *
  * The connection comes from a factory seam so tests capture the generated
  * statements without a database; production passes
  * `() => DriverManager.getConnection(url, props)`.
  */
object JdbcUpsert {

  val Table = "modvalues"

  /** The reference DDL (`Services/OpcSubscribeService.cs:140-152`) —
    * bootstrap issued once, `CREATE TABLE IF NOT EXISTS` replacing the
    * information-schema existence probe (S6).
    */
  val CreateTableSql: String =
    s"""CREATE TABLE IF NOT EXISTS $Table (
       |  device TEXT NOT NULL,
       |  measure_name TEXT NOT NULL,
       |  tag_value REAL,
       |  measure_value REAL,
       |  last_updated TEXT,
       |  PRIMARY KEY (device, measure_name)
       |)""".stripMargin

  val UpsertSql: String =
    s"""INSERT INTO $Table (device, measure_name, tag_value, measure_value, last_updated)
       |VALUES (?, ?, ?, ?, ?)
       |ON CONFLICT (device, measure_name) DO UPDATE SET
       |  tag_value = EXCLUDED.tag_value,
       |  measure_value = EXCLUDED.measure_value,
       |  last_updated = EXCLUDED.last_updated""".stripMargin

  /** UpsertTarget over a JDBC connection factory: one prepared-statement
    * batch per upsert call, one transaction per micro-batch.
    */
  final class Target(connect: () => Connection) extends UpsertTarget {

    override def upsert(rows: Seq[ModRow]): Unit = {
      if (rows.isEmpty) return
      val conn = connect()
      try {
        conn.setAutoCommit(false)
        val st = conn.prepareStatement(UpsertSql)
        try {
          rows.foreach { r =>
            st.setString(1, r.device)
            st.setString(2, r.measure_name)
            st.setDouble(3, r.tag_value)
            st.setDouble(4, r.measure_value)
            st.setString(5, r.last_updated)
            st.addBatch()
          }
          st.executeBatch()
          conn.commit()
        } finally st.close()
      } catch {
        case e: Throwable => conn.rollback(); throw e
      } finally conn.close()
    }

    /** Snapshot reads go through SQL in production; not needed by the
      * streaming write path (heartbeat/seed use dedicated statements at
      * scale rather than a full-table pull).
      */
    override def snapshot: Seq[ModRow] =
      throw new UnsupportedOperationException(
        "JDBC target is write-side; read modvalues via SQL")
  }

  def bootstrap(connect: () => Connection): Unit = {
    val conn = connect()
    try {
      val st = conn.createStatement()
      try st.execute(CreateTableSql) finally st.close()
    } finally conn.close()
  }
}
