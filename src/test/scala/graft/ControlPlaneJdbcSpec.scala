package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files
import java.sql.{Connection, DriverManager}
import graft.control.{ControlPlane, ControlPlaneHttp, JdbcConfigStore}
import graft.operators.BrowseJobRegistry
import graft.streaming.ConfigReload

/** The control plane against the DB-backed store — the reference's actual
  * persistence shape (EF over Postgres, `Data/ApplicationDbContext.cs:
  * 12-13`), here a LIVE embedded Derby engine: same CRUD + AES round-trip
  * flow as ControlPlaneHttpSpec, plus the two things only a real database
  * can prove — the child-table FK cascade and ciphertext-at-rest in the
  * `encrypted_password` column — and the post-commit marker that keeps a
  * ConfigReload watcher as the reload trigger.
  */
class ControlPlaneJdbcSpec extends SparkSpec {

  private val AesKey = "0123456789abcdef0123456789abcdef"

  private def freshDb(): () => Connection = {
    val db = s"ctrl-${java.util.UUID.randomUUID()}"
    DriverManager.getConnection(s"jdbc:derby:memory:$db;create=true").close()
    () => DriverManager.getConnection(s"jdbc:derby:memory:$db")
  }

  private def dtoJson(id: Int, url: String, password: String,
                      timeoutMs: Int, folders: Seq[String]): String =
    s"""{"id":$id,"url":"$url","username":"svc","password":"$password",
       |"timeoutMs":$timeoutMs,"maxSearch":100,
       |"browseExclusionFolders":[${folders.map("\"" + _ + "\"").mkString(",")}]}"""
      .stripMargin.replace("\n", "")

  test("HTTP CRUD over the JDBC store: AES at rest, FK cascade, watcher marker") {
    val connect = freshDb()
    val markerDir = Files.createTempDirectory("graft-jdbc-marker").toFile
    val store = new JdbcConfigStore(connect,
      reloadMarker = Some(new java.io.File(markerDir, "db_config_version.json")))
    val registry = new BrowseJobRegistry(Files.createTempDirectory("graft-jdbc-mark").toFile)
    val service = new ControlPlane(spark, store, AesKey, registry, _ => ())
    val http = new ControlPlaneHttp(service).start()
    @volatile var launches = 0
    val watcher = ConfigReload.watch(markerDir, pollMs = 100L) { () =>
      launches += 1
      spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .writeStream.format("noop").start()
    }
    val client = HttpClient.newHttpClient()
    val base = s"http://127.0.0.1:${http.boundPort}"
    def send(method: String, path: String, body: String = ""): HttpResponse[String] = {
      val pub = if (body.isEmpty) HttpRequest.BodyPublishers.noBody()
                else HttpRequest.BodyPublishers.ofString(body)
      client.send(HttpRequest.newBuilder(URI.create(base + path)).method(method, pub).build(),
        HttpResponse.BodyHandlers.ofString())
    }
    def scalarInt(sql: String): Int = {
      val conn = connect()
      try {
        val rs = conn.createStatement().executeQuery(sql)
        rs.next(); rs.getInt(1)
      } finally conn.close()
    }
    try {
      // add two connections; duplicate id → 400
      assert(send("POST", "/api/client/config/add",
        dtoJson(1, "opc.tcp://plant-a:4840", "s3cret!", 5000, Seq("Views", "Types"))).statusCode == 200)
      assert(send("POST", "/api/client/config/add",
        dtoJson(1, "opc.tcp://dup:4840", "x", 1, Nil)).statusCode == 400)
      assert(send("POST", "/api/client/config/add",
        dtoJson(2, "opc.tcp://plant-b:4840", "hunter2", 3000, Seq("Hidden"))).statusCode == 200)

      // get: decrypted DTOs, folders flattened
      val got = send("GET", "/api/client/config/get")
      assert(got.statusCode == 200)
      assert(got.body.contains("\"password\":\"s3cret!\""))
      assert(got.body.contains("\"browseExclusionFolders\":[\"Types\",\"Views\"]"))

      // at rest: the DB column holds ciphertext, never the plaintext
      val conn = connect()
      try {
        val rs = conn.createStatement().executeQuery(
          s"SELECT encrypted_password FROM ${JdbcConfigStore.ConnTable} WHERE id = 1")
        rs.next()
        val stored = new String(rs.getBytes(1), java.nio.charset.StandardCharsets.ISO_8859_1)
        assert(!stored.contains("s3cret!"))
      } finally conn.close()

      // rows landed in BOTH tables
      assert(scalarInt(s"SELECT COUNT(*) FROM ${JdbcConfigStore.ConnTable}") == 2)
      assert(scalarInt(s"SELECT COUNT(*) FROM ${JdbcConfigStore.FolderTable}") == 3)

      // FK cascade, straight against the engine: deleting a parent row
      // sweeps its child folders with NO app-level delete — EF's
      // DeleteBehavior.Cascade reproduced by the schema itself
      val c2 = connect()
      try c2.createStatement().executeUpdate(
        s"DELETE FROM ${JdbcConfigStore.ConnTable} WHERE id = 2") finally c2.close()
      assert(scalarInt(s"SELECT COUNT(*) FROM ${JdbcConfigStore.FolderTable}" +
        " WHERE opc_client_connection_id = 2") == 0, "FK cascade must sweep child rows")
      assert(!send("GET", "/api/client/config/get").body.contains("plant-b"))

      // service-level update + delete still work over the store
      assert(send("PATCH", "/api/client/config/update",
        dtoJson(1, "opc.tcp://plant-a:4840", "rotated", 9000, Nil)).statusCode == 200)
      assert(send("GET", "/api/client/config/get").body.contains("\"password\":\"rotated\""))
      assert(send("DELETE", "/api/client/config/delete/1").statusCode == 200)
      assert(scalarInt(s"SELECT COUNT(*) FROM ${JdbcConfigStore.ConnTable}") == 0)
      assert(scalarInt(s"SELECT COUNT(*) FROM ${JdbcConfigStore.FolderTable}") == 0)

      // the post-commit marker tripped the live watcher (reload parity)
      val deadline = System.currentTimeMillis() + 15000
      while (launches < 2 && System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(launches >= 2, s"JDBC mutations never relaunched the pipeline ($launches)")
    } finally {
      watcher.close()
      http.stop()
    }
  }

  test("store survives reconnect: rows persist across store instances on one engine") {
    val connect = freshDb()
    val store1 = new JdbcConfigStore(connect)
    val registry = new BrowseJobRegistry(Files.createTempDirectory("graft-jdbc-re").toFile)
    val svc1 = new ControlPlane(spark, store1, AesKey, registry, _ => ())
    assert(svc1.parseDto(dtoJson(7, "opc.tcp://p:4840", "pw", 100, Seq("F")))
      .exists(svc1.add))
    // a second store over the same engine (bootstrap must tolerate the
    // existing tables) sees the same decrypted DTO
    val svc2 = new ControlPlane(spark, new JdbcConfigStore(connect), AesKey, registry, _ => ())
    val listed = svc2.list()
    assert(listed.map(_.id) == Seq(7) && listed.head.password == "pw"
      && listed.head.browseExclusionFolders == Seq("F"))
  }

  test("dialect switch: Postgres DDL differs only in the binary type + SQLState") {
    import JdbcConfigStore._
    assert(createConnTableSql(Postgres).contains("BYTEA")
      && !createConnTableSql(Postgres).contains("BLOB"))
    assert(createConnTableSql(Derby).contains("BLOB"))
    // everything but the binary column is shared ANSI
    assert(createConnTableSql(Derby).replace("BLOB", "X")
      == createConnTableSql(Postgres).replace("BYTEA", "X"))
    assert(createFolderTableSql(Derby) == createFolderTableSql(Postgres))
    assert(Postgres.tableExistsStates == Set("42P07")
      && Derby.tableExistsStates == Set("X0Y32"))
  }

  test("bootstrap existence probe is metadata-based, not SQLState-swallowing") {
    // a second bootstrap against an existing schema must issue NO DDL at
    // all (the metadata probe sees the tables) — on Postgres the old
    // Derby-only X0Y32 swallow would have thrown 42P07 here
    val connect = freshDb()
    JdbcConfigStore.bootstrap(connect)
    val conn = connect()
    try {
      assert(JdbcConfigStore.tableExists(conn, JdbcConfigStore.ConnTable))
      assert(JdbcConfigStore.tableExists(conn, JdbcConfigStore.FolderTable))
      assert(!JdbcConfigStore.tableExists(conn, "no_such_table"))
    } finally conn.close()
    // re-bootstrap with a dialect whose already-exists SQLState does NOT
    // match Derby's: only the metadata probe can make this a no-op
    JdbcConfigStore.bootstrap(connect, JdbcConfigStore.Postgres)
  }
}
