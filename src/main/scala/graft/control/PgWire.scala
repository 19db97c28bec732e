package graft.control

import java.io.{BufferedInputStream, BufferedOutputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8
import java.sql.{Connection, SQLException, SQLFeatureNotSupportedException}

/** Minimal PostgreSQL Frontend/Backend protocol (v3) client with a thin
  * `java.sql` facade — just enough JDBC for [[JdbcConfigStore]] and
  * [[graft.streaming.JdbcUpsert]] to run against a LIVE Postgres server
  * when no JDBC driver jar is resolvable (this sandbox ships the server
  * binary but not the driver, and has no egress). The protocol is the
  * public one documented in the PostgreSQL manual ("Frontend/Backend
  * Protocol", message formats chapter): StartupMessage → Authentication
  * (trust only) → ParameterStatus/BackendKeyData → ReadyForQuery, then
  * the SIMPLE QUERY flow (Q → RowDescription/DataRow/CommandComplete/
  * ErrorResponse → ReadyForQuery). Results arrive in text format;
  * `bytea` columns use the hex output encoding (`\x…`).
  *
  * Deliberate bounds, in line with its test-harness role:
  *   - trust authentication only (the spec-managed server is initdb'd
  *     with `-A trust`); any other Authentication request fails loudly.
  *   - PreparedStatement is CLIENT-SIDE interpolation of `?` with
  *     escaped literals (strings double their quotes; bytes render as
  *     `decode('<hex>','hex')`), not the extended protocol — statements
  *     here are control-plane-sized.
  *   - the JDBC facade is a reflective proxy: methods the stores never
  *     call throw SQLFeatureNotSupportedException rather than lying.
  *
  * Transactions map exactly to the JDBC contract the stores rely on:
  * `setAutoCommit(false)` opens a lazy BEGIN before the next statement,
  * `commit`/`rollback` issue COMMIT/ROLLBACK, and a statement error
  * inside a transaction leaves it aborted until rollback — which is the
  * semantics [[graft.streaming.JdbcUpsert.Target]]'s error path expects.
  */
object PgWire {

  final case class PgResult(cols: Array[String], rows: Vector[Array[Array[Byte]]],
                            updateCount: Int)

  /** One socket, synchronized simple-query exchanges. */
  final class Client(host: String, port: Int, user: String, database: String) {
    private val socket = new Socket(host, port)
    private val in = new DataInputStream(new BufferedInputStream(socket.getInputStream))
    private val out = new DataOutputStream(new BufferedOutputStream(socket.getOutputStream))
    @volatile private var closed = false

    // StartupMessage: no type byte; int32 length, int32 protocol 3.0,
    // then "key\0value\0" pairs and a terminating NUL
    locally {
      val b = new ByteArrayOutputStream()
      val d = new DataOutputStream(b)
      d.writeInt(196608)
      d.write(("user\u0000" + user + "\u0000database\u0000" + database +
        "\u0000\u0000").getBytes(UTF_8))
      out.writeInt(b.size() + 4)
      b.writeTo(out)
      out.flush()
      drain() // consume Authentication/ParameterStatus/BackendKeyData → ReadyForQuery
      // the facade's literal rendering escapes strings by doubling
      // quotes only, which is sound ONLY under conforming strings — pin
      // the setting per session rather than trusting server config (a
      // backslash-escapes server would otherwise let a value ending in
      // '\' break out of its literal)
      query("SET standard_conforming_strings = on")
    }

    private def cstring(b: Array[Byte], off: Int): (String, Int) = {
      var e = off
      while (e < b.length && b(e) != 0) e += 1
      (new String(b, off, e - off, UTF_8), e + 1)
    }

    private def parseError(body: Array[Byte]): SQLException = {
      var off = 0
      var state: String = null
      var msg = "pgwire error"
      while (off < body.length && body(off) != 0) {
        val code = body(off).toChar
        val (v, next) = cstring(body, off + 1)
        if (code == 'C') state = v
        if (code == 'M') msg = v
        off = next
      }
      new SQLException(msg, state)
    }

    /** Read messages until ReadyForQuery; returns the accumulated result
      * or throws the first ErrorResponse (after the server re-syncs).
      */
    private def drain(): PgResult = {
      var cols: Array[String] = Array.empty
      val rows = Vector.newBuilder[Array[Array[Byte]]]
      var update = 0
      var err: SQLException = null
      var ready = false
      while (!ready) {
        val t = in.readByte().toChar
        val len = in.readInt() - 4
        require(len >= 0 && len <= (1 << 26), s"implausible pgwire frame $len")
        val body = new Array[Byte](len)
        in.readFully(body)
        t match {
          case 'R' => // Authentication: only type 0 (Ok) is supported
            val code = ((body(0) & 0xFF) << 24) | ((body(1) & 0xFF) << 16) |
              ((body(2) & 0xFF) << 8) | (body(3) & 0xFF)
            if (code != 0)
              throw new SQLException(s"unsupported auth request $code (trust only)")
          case 'T' =>
            var off = 0
            val n = ((body(0) & 0xFF) << 8) | (body(1) & 0xFF); off = 2
            cols = new Array[String](n)
            var i = 0
            while (i < n) {
              val (name, next) = cstring(body, off)
              cols(i) = name
              off = next + 18 // tableOid(4) attnum(2) typOid(4) typlen(2) typmod(4) fmt(2)
              i += 1
            }
          case 'D' =>
            var off = 0
            val n = ((body(0) & 0xFF) << 8) | (body(1) & 0xFF); off = 2
            val row = new Array[Array[Byte]](n)
            var i = 0
            while (i < n) {
              val l = ((body(off) & 0xFF) << 24) | ((body(off + 1) & 0xFF) << 16) |
                ((body(off + 2) & 0xFF) << 8) | (body(off + 3) & 0xFF)
              off += 4
              if (l == -1) row(i) = null
              else { row(i) = java.util.Arrays.copyOfRange(body, off, off + l); off += l }
              i += 1
            }
            rows += row
          case 'C' =>
            val (tag, _) = cstring(body, 0)
            val last = tag.split(' ').last
            update = last.toIntOption.getOrElse(0)
          case 'E' => if (err == null) err = parseError(body)
          case 'Z' => ready = true
          case 'N' | 'S' | 'K' | 'I' => () // notice / param status / key data / empty
          case other => throw new SQLException(s"unexpected pgwire message '$other'")
        }
      }
      if (err != null) throw err
      PgResult(cols, rows.result(), update)
    }

    def query(sql: String): PgResult = synchronized {
      if (closed) throw new SQLException("connection is closed")
      val payload = sql.getBytes(UTF_8)
      out.writeByte('Q')
      out.writeInt(4 + payload.length + 1)
      out.write(payload)
      out.writeByte(0)
      out.flush()
      drain()
    }

    def isClosed: Boolean = closed

    def close(): Unit = synchronized {
      if (!closed) {
        closed = true
        try { out.writeByte('X'); out.writeInt(4); out.flush() } // Terminate
        catch { case _: java.io.IOException => () }
        socket.close()
      }
    }
  }

  /** A `java.sql.Connection` over one [[Client]]. */
  def connect(host: String, port: Int, user: String, database: String): Connection =
    mkConnection(new Client(host, port, user, database))

  // ---- reflective java.sql facade ----

  private def mkProxy[T](iface: Class[T])(
      impl: (String, Array[AnyRef]) => Option[AnyRef]): T =
    Proxy.newProxyInstance(iface.getClassLoader, Array[Class[_]](iface),
      new InvocationHandler {
        def invoke(p: AnyRef, m: Method, args0: Array[AnyRef]): AnyRef = {
          val args = if (args0 == null) Array.empty[AnyRef] else args0
          impl(m.getName, args).getOrElse {
            m.getName match {
              case "toString" => s"pgwire:${iface.getSimpleName}"
              case "hashCode" => Integer.valueOf(System.identityHashCode(p))
              case "equals" => java.lang.Boolean.valueOf(p eq args(0))
              case _ => throw new SQLFeatureNotSupportedException(
                s"${iface.getSimpleName}.${m.getName} (pgwire facade)")
            }
          }
        }
      }).asInstanceOf[T]

  private def mkConnection(cli: Client): Connection = {
    var autoCommit = true
    var inTxn = false
    def exec(sql: String): PgResult = {
      if (!autoCommit && !inTxn) { cli.query("BEGIN"); inTxn = true }
      cli.query(sql)
    }
    mkProxy(classOf[Connection]) {
      case ("setAutoCommit", args) =>
        val on = args(0).asInstanceOf[java.lang.Boolean].booleanValue()
        if (on && inTxn) { cli.query("COMMIT"); inTxn = false }
        autoCommit = on
        Some(null)
      case ("getAutoCommit", _) => Some(java.lang.Boolean.valueOf(autoCommit))
      case ("commit", _) =>
        if (inTxn) { cli.query("COMMIT"); inTxn = false }
        Some(null)
      case ("rollback", _) =>
        if (inTxn) { cli.query("ROLLBACK"); inTxn = false }
        Some(null)
      case ("close", _) =>
        if (!cli.isClosed) {
          if (inTxn) { try cli.query("ROLLBACK") catch { case _: SQLException => () }; inTxn = false }
          cli.close()
        }
        Some(null)
      case ("isClosed", _) => Some(java.lang.Boolean.valueOf(cli.isClosed))
      case ("isValid", _) => Some(java.lang.Boolean.valueOf(!cli.isClosed))
      case ("createStatement", Array()) => Some(mkStatement(exec))
      case ("prepareStatement", args) if args.length == 1 =>
        Some(mkPrepared(exec, args(0).asInstanceOf[String]))
      case ("getMetaData", _) => Some(mkMetaData(exec))
      case _ => None
    }
  }

  private def mkStatement(exec: String => PgResult): java.sql.Statement =
    mkProxy(classOf[java.sql.Statement]) {
      case ("executeQuery", args) =>
        Some(mkResultSet(exec(args(0).asInstanceOf[String])))
      case ("executeUpdate", args) =>
        Some(Integer.valueOf(exec(args(0).asInstanceOf[String]).updateCount))
      case ("execute", args) =>
        Some(java.lang.Boolean.valueOf(exec(args(0).asInstanceOf[String]).cols.nonEmpty))
      case ("close", _) => Some(null)
      case _ => None
    }

  private def mkPrepared(exec: String => PgResult, template: String): java.sql.PreparedStatement = {
    val parts = template.split("\\?", -1)
    val nParams = parts.length - 1
    val params = new Array[String](nParams)
    val batch = scala.collection.mutable.ArrayBuffer.empty[String]
    def render(): String = {
      val sb = new StringBuilder(parts(0))
      var i = 0
      while (i < nParams) {
        val p = params(i)
        require(p != null, s"parameter ${i + 1} not set")
        sb.append(p).append(parts(i + 1))
        i += 1
      }
      sb.toString
    }
    def set(i: AnyRef, lit: String): Option[AnyRef] = {
      params(i.asInstanceOf[Integer].intValue() - 1) = lit
      Some(null)
    }
    mkProxy(classOf[java.sql.PreparedStatement]) {
      case ("setInt", args) => set(args(0), args(1).toString)
      case ("setLong", args) => set(args(0), args(1).toString)
      case ("setDouble", args) => set(args(0), args(1).toString)
      case ("setString", args) =>
        set(args(0), "'" + args(1).asInstanceOf[String].replace("'", "''") + "'")
      case ("setBytes", args) =>
        val hex = args(1).asInstanceOf[Array[Byte]].map(b => f"${b & 0xFF}%02x").mkString
        set(args(0), s"decode('$hex', 'hex')")
      case ("setNull", args) => set(args(0), "NULL")
      case ("addBatch", Array()) => batch += render(); Some(null)
      case ("executeBatch", _) =>
        val counts = batch.map(sql => exec(sql).updateCount).toArray
        batch.clear()
        Some(counts)
      case ("executeUpdate", Array()) => Some(Integer.valueOf(exec(render()).updateCount))
      case ("executeQuery", Array()) => Some(mkResultSet(exec(render())))
      case ("close", _) => Some(null)
      case _ => None
    }
  }

  private def mkResultSet(res: PgResult): java.sql.ResultSet = {
    var idx = -1
    var lastNull = false
    def cell(col: AnyRef): String = {
      val v = res.rows(idx)(col.asInstanceOf[Integer].intValue() - 1)
      lastNull = v == null
      if (v == null) null else new String(v, UTF_8)
    }
    mkProxy(classOf[java.sql.ResultSet]) {
      case ("next", _) =>
        idx += 1
        Some(java.lang.Boolean.valueOf(idx < res.rows.length))
      case ("getInt", args) =>
        val s = cell(args(0)); Some(Integer.valueOf(if (s == null) 0 else s.toInt))
      case ("getLong", args) =>
        val s = cell(args(0)); Some(java.lang.Long.valueOf(if (s == null) 0L else s.toLong))
      case ("getDouble", args) =>
        val s = cell(args(0)); Some(java.lang.Double.valueOf(if (s == null) 0.0 else s.toDouble))
      case ("getString", args) => Some(cell(args(0)))
      case ("getBytes", args) =>
        val s = cell(args(0))
        Some(if (s == null) null else {
          require(s.startsWith("\\x"), s"expected hex bytea output, got '${s.take(8)}'")
          val hex = s.drop(2)
          Array.tabulate[Byte](hex.length / 2)(i =>
            Integer.parseInt(hex.substring(2 * i, 2 * i + 2), 16).toByte)
        })
      case ("wasNull", _) => Some(java.lang.Boolean.valueOf(lastNull))
      case ("close", _) => Some(null)
      case _ => None
    }
  }

  /** Only the probe [[JdbcConfigStore.tableExists]] uses: getTables over
    * information_schema (public schema, exact name).
    */
  private def mkMetaData(exec: String => PgResult): java.sql.DatabaseMetaData =
    mkProxy(classOf[java.sql.DatabaseMetaData]) {
      case ("getTables", args) =>
        val name = args(2).asInstanceOf[String].replace("'", "''")
        Some(mkResultSet(exec(
          "SELECT table_name FROM information_schema.tables " +
            s"WHERE table_schema = 'public' AND table_name = '$name'")))
      case _ => None
    }
}
