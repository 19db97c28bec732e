package graft

import java.io.File
import java.sql.{Connection, DriverManager}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong, AtomicReference}
import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.control.{ControlPlane, ControlPlaneHttp}
import graft.operators.BrowseJobRegistry
import graft.operators.DtoMapping.ConnectionDto
import graft.sources.{FeedTransport, MeasureFeed, MeasureSourceProvider}
import graft.streaming.{ConfigReload, CurrentValuesSink, IngestPipeline, JdbcUpsert, ServerWatchdog}

/** End-to-end streaming soak (round-7 verdict stretch item): ONE sustained
  * run composing every individually-spec-green streaming piece —
  *
  *   config CRUD over real HTTP ([[ControlPlaneHttp]])
  *     → [[ConfigReload]] stop-and-relaunch (the reference's
  *       FileSystemWatcher → full resubscribe,
  *       `Services/OpcSubscribeService.cs:79-98,419-424`)
  *     → framed-socket OPC UA ingest ([[FeedTransport.FeedServer]], one
  *       server per configured connection, union of DSv2 socket sources)
  *     → gates → watermark dedup → value path + liveness state machine
  *     → live embedded Derby via the production [[JdbcUpsert.Target]]
  *       (AnsiMerge dialect), plus the heartbeat and server-watchdog
  *       queries —
  *
  * under sustained load for SPARK_GRAFT_SOAK_SECONDS (default 600),
  * publishing SOAK_r{N}.json with event counts in/out, liveness-flag
  * transitions (observed by polling the DATABASE, i.e. the user-visible
  * table, not internals), watchdog silence events, and a final-state
  * exactness check: every (device, measure) row in Derby must equal the
  * last GOOD value the feed ever published for that key, recomputed
  * driver-side from the feed's pure `at(i)` function.
  *
  * Timeline (fractions of the run):
  *   15%  POST  /api/client/config/add     — server B joins → relaunch
  *   30%  devices a-dev-0..9 start emitting bad-status values
  *        → liveness 1→0 (reference `:585`: bad status = offline NOW)
  *   40%  bad window ends → liveness 0→1
  *   50%  server B's clock freezes (silent server; A keeps advancing the
  *        event-time watermark) → watchdog fires after its 180 s
  *        event-time window → every b-device marked offline (T3 fan-out)
  *   70%  B resumes AT A's CLOCK (an OPC UA reconnect backfill: the gap
  *        rows arrive as one burst, everything older than the dedup
  *        watermark is dropped by design — DiscardOldest semantics)
  *   80%  PATCH /api/client/config/update  — innocuous edit → relaunch
  *   83%  B's clock freezes again (drain before unsubscribe)
  *   87%  DELETE /api/client/config/delete/2 → relaunch, A-only; B's
  *        devices then time out via liveness and finish offline
  *
  * Sim time runs 4× wall (16 ticks/s × 250 ms/tick), so the 60 s liveness
  * and 180 s watchdog EVENT-TIME constants elapse in 15/45 wall-seconds
  * and the whole script fits in ten minutes.
  *
  * Relaunches use a fresh implicit checkpoint each time (the source SET
  * changes across reloads, which Structured Streaming checkpoints forbid);
  * each incarnation therefore re-pulls the feed log from seq 0 and the
  * idempotent keyed upsert absorbs the replay — `delivered ≥ offered` with
  * the inflation reported, and exactness is asserted on the FINAL STATE,
  * the same contract the reference's restart path relies on.
  */
object Soak {

  /** [[graft.sources.SimulatedFeed]] plus the soak's two control knobs:
    * a device-name prefix (two servers must not collide on device keys)
    * and `badBelow` — devices below the index emit status_ok=false, the
    * fault the liveness machine exists to surface. Pure in `i` for fixed
    * knobs; the final-state oracle replays `at` after the knobs settle.
    */
  final class SoakFeed(nDevices: Int, nMeasures: Int, prefix: String,
                       startMicros: Long, intervalMicros: Long,
                       @volatile var clockTicks: Long) extends MeasureFeed {
    @volatile var badBelow: Int = 0
    private val perTick = nDevices.toLong * nMeasures
    override def latest(): Long = clockTicks * perTick
    override def at(i: Long): (String, String, Double, Long, Boolean) = {
      val tick = i / perTick
      val slot = i % perTick
      val dev = (slot / nMeasures).toInt
      val m = slot % nMeasures
      val k = (i * 2654435761L) % 1000
      val ok = k % 10 != 0 && dev >= badBelow
      (s"$prefix$dev", s"m$m", (k % 997).toDouble / 10.0,
        startMicros + tick * intervalMicros, ok)
    }
  }

  private final case class TimelineEvent(wallS: Double, event: String)

  /** Embedded Derby's MERGE hits a NullPointerException
    * (`MatchingClauseConstantAction._actionRS`) when prepared MERGE
    * batches execute on concurrent connections — a Derby engine defect,
    * not a Target one (the Postgres dialect runs the same concurrency in
    * PgLiveSpec). The soak serializes DB access through one JVM-wide
    * lock; local mode shares the JVM so the closure reaches the same
    * monitor from every partition. Production (Postgres) needs none of
    * this.
    */
  object DbLock extends Serializable
  final class SerializedTarget(inner: CurrentValuesSink.UpsertTarget)
      extends CurrentValuesSink.UpsertTarget {
    override def upsertPartition(rows: Iterator[CurrentValuesSink.ModRow]): Unit =
      DbLock.synchronized { inner.upsertPartition(rows) }
    override def seed(keys: Seq[(String, String)], nowS: String): Unit =
      DbLock.synchronized { inner.seed(keys, nowS) }
    override def offlineReset(nowS: String): Unit =
      DbLock.synchronized { inner.offlineReset(nowS) }
    override def heartbeat(nowS: String): Unit =
      DbLock.synchronized { inner.heartbeat(nowS) }
  }

  def main(args: Array[String]): Unit = {
    val durationS = sys.env.getOrElse("SPARK_GRAFT_SOAK_SECONDS", "600").toInt
    val outPath = sys.env.getOrElse("SPARK_GRAFT_SOAK_OUT", "SOAK_r8.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val nDevices = 50
    val nMeasures = 4
    val ticksPerFire = 4L // fired every 250 ms wall → 16 ticks/s = sim 4× wall

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // ---- the user-visible modvalues table: live Derby (default) or a
    // live ephemeral Postgres 15 through the hand-written v3 wire client
    // (SPARK_GRAFT_SOAK_DB=pg — the r9 verdict's stretch: the same
    // 600 s final-state-exactness contract against the PRODUCTION
    // dialect, with CONCURRENT upserts: Postgres needs no
    // SerializedTarget, that lock exists only for Derby's MERGE defect).
    val dbKind = sys.env.getOrElse("SPARK_GRAFT_SOAK_DB", "derby")
    val ddl =
      """CREATE TABLE modvalues (
        |  device VARCHAR(200) NOT NULL,
        |  measure_name VARCHAR(200) NOT NULL,
        |  tag_value REAL,
        |  measure_value REAL,
        |  last_updated VARCHAR(64),
        |  PRIMARY KEY (device, measure_name)
        |)""".stripMargin
    val (connect: (() => Connection), target: CurrentValuesSink.UpsertTarget,
         stopDb: (() => Unit)) = dbKind match {
      case "derby" =>
        val db = s"soak-${java.util.UUID.randomUUID()}"
        DriverManager.getConnection(s"jdbc:derby:memory:$db;create=true").close()
        val c: () => Connection =
          () => DriverManager.getConnection(s"jdbc:derby:memory:$db")
        (c, new SerializedTarget(
          new JdbcUpsert.Target(c, dialect = JdbcUpsert.AnsiMerge)), () => ())
      case "pg" =>
        val server = graft.control.PgEphemeral.start() match {
          case Right(s) => s
          case Left(reason) => sys.error(s"SPARK_GRAFT_SOAK_DB=pg but: $reason")
        }
        // the big try/finally below only starts AFTER this tuple is built —
        // a failure here must bring the live postgres down itself
        try server.createDatabase("soak")
        catch { case e: Throwable => server.stop(); throw e }
        // capture ONLY the port (an Int): a closure over `server` drags
        // the non-Serializable lifecycle handle into every executor task
        // and kills the streaming writers at task-serialization time —
        // exactly how the first pg soak run delivered 0 rows
        val pgPort = server.port
        val c: () => Connection =
          () => graft.control.PgWire.connect("127.0.0.1", pgPort, "postgres", "soak")
        (c, new JdbcUpsert.Target(c, dialect = JdbcUpsert.Postgres),
          () => server.stop())
      case other => sys.error(s"unknown SPARK_GRAFT_SOAK_DB '$other' (derby|pg)")
    }
    // DDL runs before the rc=try/finally that owns stopDb(): a CREATE
    // TABLE failure here must not leak the ephemeral server + temp dir
    try {
      val c = connect()
      val st = c.createStatement()
      st.execute(ddl)
      st.close(); c.close()
    } catch { case e: Throwable => stopDb(); throw e }
    // the ephemeral DB must come down on EVERY exit path — a mid-run
    // exception otherwise leaks a live postgres process + data dir
    val rc = try {

    // ---- two framed-socket feed servers ----
    val startMicros = 1704067200000000L
    val feedA = new SoakFeed(nDevices, nMeasures, "a-dev-", startMicros, 250000L, 1L)
    val feedB = new SoakFeed(nDevices, nMeasures, "b-dev-", startMicros, 250000L, 1L)
    val srvA = new FeedTransport.FeedServer(feedA)
    val srvB = new FeedTransport.FeedServer(feedB)
    val urlA = s"opc.tcp://127.0.0.1:${srvA.boundPort}"
    val urlB = s"opc.tcp://127.0.0.1:${srvB.boundPort}"
    @volatile var bTicking = true
    @volatile var ticking = true
    @volatile var tickerPaused = false
    val ticker = new Thread(() => {
      while (ticking) {
        Thread.sleep(250)
        if (!tickerPaused) {
          feedA.clockTicks += ticksPerFire
          if (bTicking) feedB.clockTicks = feedA.clockTicks // resume = jump to now
        }
      }
    }, "soak-ticker")
    ticker.setDaemon(true)

    // ---- control plane over real HTTP ----
    val configDir = java.nio.file.Files.createTempDirectory("soak-config").toFile
    val markerDir = java.nio.file.Files.createTempDirectory("soak-markers").toFile
    val aesKey = "0123456789abcdef0123456789abcdef"
    val plane = new ControlPlane(spark, configDir, aesKey,
      new BrowseJobRegistry(markerDir))
    plane.add(ConnectionDto(1, urlA, "user", "pw", 5000, 100, Seq.empty))
    val http = new ControlPlaneHttp(plane).start()
    val httpBase = s"http://127.0.0.1:${http.boundPort}"
    val client = java.net.http.HttpClient.newHttpClient()
    def httpCall(method: String, path: String, body: Option[String]): Int = {
      val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(s"$httpBase$path"))
      val withBody = body match {
        case Some(j) => b.method(method,
          java.net.http.HttpRequest.BodyPublishers.ofString(j))
        case None => b.method(method, java.net.http.HttpRequest.BodyPublishers.noBody())
      }
      client.send(withBody.build(),
        java.net.http.HttpResponse.BodyHandlers.ofString()).statusCode()
    }

    // ---- accounting ----
    val delivered = new AtomicLong(0L)
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      // a writer that dies mid-soak must say so in the log: the first pg
      // run failed silently (task-serialization) and only the final-state
      // check exposed it — 600 s later
      override def onQueryTerminated(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit =
        e.exception.foreach(msg =>
          println(s"[soak] QUERY DIED: ${e.runId} -> ${msg.take(400)}"))
      override def onQueryProgress(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit =
        if (e.progress.name == "graft-values") delivered.addAndGet(e.progress.numInputRows)
    })
    val relaunches = new AtomicInteger(-1) // first launch is not a RE-launch
    val silenceEvents = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val timeline = new java.util.concurrent.ConcurrentLinkedQueue[TimelineEvent]()
    val t0 = System.nanoTime()
    def wallS: Double = (System.nanoTime() - t0) / 1e9
    def mark(ev: String): Unit = { timeline.add(TimelineEvent(wallS, ev)); println(f"[soak] $wallS%6.1f s  $ev") }

    // device dim for the watchdog fan-out (all devices of both servers)
    import spark.implicits._
    val deviceDim = ((0 until nDevices).map(i => (s"a-dev-$i", urlA)) ++
      (0 until nDevices).map(i => (s"b-dev-$i", urlB))).toDF("device", "server")

    // ---- launch: read config, open one socket source per connection ----
    val handleRef = new AtomicReference[IngestPipeline.Handle]()
    val watchdogRef = new AtomicReference[StreamingQuery]()
    def launch(): StreamingQuery = {
      Option(handleRef.get()).foreach(_.stop())
      Option(watchdogRef.get()).foreach(_.stop())
      relaunches.incrementAndGet()
      // The reference's resubscribe path bulk-resets EVERY myPV_online flag
      // to 0 on a config change and lets live values re-online the devices
      // that are still configured ("also works for devices perhaps not in
      // the new config and still set online from last time but actually no
      // longer online", `Services/OpcSubscribeService.cs:257-259`; per-server
      // MarkRowsAsOffline at `:961,993`). Without it a deleted server's
      // devices stay online forever — the fresh incarnation's liveness state
      // machine never sees their keys, so no timeout can fire.
      target.offlineReset(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
        .withZone(java.time.ZoneOffset.UTC).format(java.time.Instant.now()))
      mark(s"launch: ${plane.list().map(_.url).mkString(", ")}")
      val raws = plane.list().map { conn =>
        val uri = java.net.URI.create(conn.url)
        spark.readStream.format(classOf[MeasureSourceProvider].getName)
          .option("nDevices", nDevices).option("nMeasures", nMeasures)
          .option("numPartitions", 2)
          .option("feedHost", uri.getHost).option("feedPort", uri.getPort)
          .option("chunkRows", 65536L)
          // live cadence is 16 ticks/s against 1 s triggers: the default
          // 10-tick T6 queue would DiscardOldest on every live trigger.
          // 1000 ticks keeps the live path lossless while still capping
          // relaunch replay bursts (the reconnect-backfill semantic).
          .option("queueCapacity", 1000L)
          .load()
      }
      val raw = raws.reduce(_ union _)
      val handle = IngestPipeline.start(raw, target,
        trigger = Trigger.ProcessingTime("1 second"))
      handleRef.set(handle)
      // T3: server-silence watchdog over the same union, silence events
      // fan out to per-device offline rows through the production join
      val withServer = raw.withColumn("server",
        when(col("device").startsWith("a-"), lit(urlA)).otherwise(lit(urlB)))
      val wd = ServerWatchdog.silenceEvents(withServer)
        .writeStream.outputMode("append").trigger(Trigger.ProcessingTime("1 second"))
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[ServerWatchdog.SilenceEvent], _: Long) =>
          val events = batch.collect() // per-SERVER granularity: ≤2 rows
          events.foreach { e =>
            silenceEvents.add(s"${e.server}@${e.silent_since}")
            mark(s"watchdog silence: ${e.server} (since ${e.silent_since})")
          }
          if (events.nonEmpty) {
            val rows = ServerWatchdog.offlineRows(batch.toDF(), deviceDim)
              .select(col("device"), col("measure_name"),
                col("online").as("tag_value"), col("online").as("measure_value"),
                graft.functions.ScalarOps.lastUpdatedString(col("silent_since")).as("last_updated"))
              .as[CurrentValuesSink.ModRow]
            rows.foreachPartition(
              (it: Iterator[CurrentValuesSink.ModRow]) => target.upsertPartition(it))
          }
        }
        .queryName("graft-watchdog").start()
      watchdogRef.set(wd)
      handle.valueQuery
    }

    // K1/K3 bootstrap: seed all keys + online rows, zero the flags
    val allPoints = for {
      p <- Seq("a-dev-", "b-dev-"); i <- 0 until nDevices; m <- 0 until nMeasures
    } yield (s"$p$i", s"m$m")
    CurrentValuesSink.seedAndReset(allPoints, "1970-01-01T00:00:00.000000", target)

    ticker.start()
    val reload = ConfigReload.watch(configDir)(() => launch())
    val heartbeat = IngestPipeline.heartbeatQuery(spark, target,
      Trigger.ProcessingTime("60 seconds"))

    // ---- liveness observer: poll the DATABASE for flag transitions ----
    val offlineTransitions = new AtomicLong(0L)
    val onlineTransitions = new AtomicLong(0L)
    val lastFlags = mutable.Map.empty[String, Double]
    @volatile var polling = true
    def onlineFlags(): Map[String, Double] = {
      val c = connect()
      try {
        val rs = c.createStatement().executeQuery(
          "SELECT device, measure_value FROM modvalues WHERE measure_name = 'myPV_online'")
        val m = mutable.Map.empty[String, Double]
        while (rs.next()) m(rs.getString(1)) = rs.getDouble(2)
        m.toMap
      } finally c.close()
    }
    val poller = new Thread(() => {
      while (polling) {
        Thread.sleep(3000)
        try {
          val now = onlineFlags()
          now.foreach { case (d, f) =>
            lastFlags.get(d) match {
              case Some(prev) if prev != f =>
                if (f == 0.0) offlineTransitions.incrementAndGet()
                else onlineTransitions.incrementAndGet()
                mark(s"liveness $d: $prev -> $f")
              case _ => ()
            }
            lastFlags(d) = f
          }
        } catch { case _: Exception => () } // poll races a relaunch: retry next tick
      }
    }, "soak-poller")
    poller.setDaemon(true)
    poller.start()

    // ---- the script ----
    def at(frac: Double)(body: => Unit): Unit = {
      val targetS = durationS * frac
      val sleepMs = ((targetS - wallS) * 1000).toLong
      if (sleepMs > 0) Thread.sleep(sleepMs)
      body
    }
    val mutations = mutable.Map.empty[String, Int]
    at(0.15) {
      val dto = s"""{"id":2,"url":"$urlB","username":"user","password":"pw","timeoutMs":5000,"maxSearch":100,"browseExclusionFolders":[]}"""
      mutations("add") = httpCall("POST", "/api/client/config/add", Some(dto))
      mark(s"HTTP add server B -> ${mutations("add")}")
    }
    at(0.30) { feedA.badBelow = 10; mark("a-dev-0..9 now bad-status") }
    at(0.40) { feedA.badBelow = 0; mark("a-dev bad window over") }
    at(0.50) { bTicking = false; mark("server B clock frozen (silence)") }
    at(0.70) { bTicking = true; mark("server B resumed at live clock") }
    at(0.80) {
      val dto = s"""{"id":1,"url":"$urlA","username":"user","password":"pw","timeoutMs":9000,"maxSearch":100,"browseExclusionFolders":[]}"""
      mutations("update") = httpCall("PATCH", "/api/client/config/update", Some(dto))
      mark(s"HTTP update server A -> ${mutations("update")}")
    }
    at(0.83) { bTicking = false; mark("server B clock frozen (drain before delete)") }
    // processAllAvailable never returns while the ticker keeps minting new
    // offsets (the 120 s smoke run hung exactly there), so every drain
    // freezes the clock first AND runs on a bounded side thread — a drain
    // that can't finish must surface as final-state mismatches in the
    // artifact, not as a run that never writes one.
    def drainBounded(maxMs: Long): Boolean = {
      val t = new Thread(() => {
        try Option(handleRef.get()).foreach(_.processAllAvailable())
        catch { case _: Exception => () }
      }, "soak-drain")
      t.setDaemon(true); t.start(); t.join(maxMs)
      !t.isAlive
    }
    at(0.87) {
      // quiesce before unsubscribing B: drain the current incarnation to
      // the feeds' latest so B's tail is committed (the operator's
      // unsubscribe discipline; without it the delete races B's last rows)
      tickerPaused = true
      Thread.sleep(300) // let the in-flight tick land before draining
      val drained = drainBounded(60000)
      mutations("delete") = httpCall("DELETE", "/api/client/config/delete/2", None)
      mark(s"HTTP delete server B -> ${mutations("delete")} (pre-delete drain ${if (drained) "complete" else "TIMED OUT"})")
      tickerPaused = false
    }
    at(1.0) { mark("script complete; draining") }

    // ---- drain + final state ----
    ticking = false
    Thread.sleep(1500)
    val offeredA = feedA.latest()
    val offeredB = feedB.latest()
    if (!drainBounded(120000)) mark("final drain TIMED OUT at 120 s")
    Thread.sleep(2000) // let the last foreachBatch upserts commit
    polling = false
    locally { val f = onlineFlags(); f.foreach { case (d, v) => lastFlags(d) = v } }
    reload.close()
    Option(watchdogRef.get()).foreach(_.stop())
    Option(handleRef.get()).foreach(_.stop())
    heartbeat.stop()
    http.stop()

    // final-state oracle: last GOOD value per key, replayed from at(i)
    def expectedFinal(feed: SoakFeed, prefix: String): Map[(String, String), Double] = {
      val perTick = nDevices.toLong * nMeasures
      val pairs = for (d <- 0 until nDevices; m <- 0 until nMeasures) yield (d, m)
      pairs.flatMap { case (d, m) =>
        val lastTick = feed.clockTicks - 1
        val found = (lastTick to math.max(0L, lastTick - 200L) by -1L).iterator
          .map(t => feed.at(t * perTick + d.toLong * nMeasures + m))
          .collectFirst { case (dev, mm, v, _, true) => ((dev, mm), v) }
        found
      }.toMap
    }
    val expected = expectedFinal(feedA, "a-dev-") ++ expectedFinal(feedB, "b-dev-")
    val actual: Map[(String, String), Double] = {
      val c = connect()
      try {
        val rs = c.createStatement().executeQuery(
          "SELECT device, measure_name, tag_value FROM modvalues WHERE measure_name <> 'myPV_online'")
        val m = mutable.Map.empty[(String, String), Double]
        while (rs.next()) m((rs.getString(1), rs.getString(2))) = rs.getDouble(3)
        m.toMap
      } finally c.close()
    }
    val mismatches = expected.toSeq.flatMap { case (k, exp) =>
      actual.get(k) match {
        case Some(act) if math.abs(act - exp) < 1e-3 => None // REAL column: float32
        case other => Some(s"${k._1}/${k._2}: expected $exp got $other")
      }
    }
    val aOnline = lastFlags.count { case (d, f) => d.startsWith("a-") && f == 1.0 }
    val bOffline = lastFlags.count { case (d, f) => d.startsWith("b-") && f == 0.0 }
    srvA.close(); srvB.close()

    val offered = offeredA + offeredB
    val del = delivered.get()
    def esc(s: String) = s.replaceAll("[\\x00-\\x1f\"\\\\]", " ")
    val timelineJson = {
      import scala.jdk.CollectionConverters._
      timeline.asScala.map(e => f"""{"t":${e.wallS}%.1f,"event":"${esc(e.event)}"}""").mkString("[", ",", "]")
    }
    // "zero loss" at the USER-VISIBLE level: the final table is exactly
    // what the feeds' last good values dictate, and every liveness flag
    // ended where the script's physics demand (A live → online, B
    // unsubscribed+silent → offline). `delivered` can legitimately trail
    // `offered`: relaunch replays go through the T6 bounded queue, which
    // DiscardOldest-truncates backfill to the newest N ticks per item —
    // the reference's QueueSize semantic, applied to reconnects. The
    // mutation/watchdog expectations only bind on runs long enough for
    // the event-time windows to elapse (≥420 s).
    val pass = mismatches.isEmpty && aOnline == nDevices &&
      (durationS < 420 || (bOffline == nDevices && silenceEvents.size() >= 1 &&
        mutations.values.forall(_ == 200)))
    val json =
      f"""{"metric":"soak","db":"$dbKind","duration_sec":$durationS,"offered":$offered,"offered_a":$offeredA,"offered_b":$offeredB,"delivered":$del,"delivered_vs_offered":${del.toDouble / offered}%.2f,"relaunches":${relaunches.get()},"config_mutations":{"add":${mutations.getOrElse("add", -1)},"update":${mutations.getOrElse("update", -1)},"delete":${mutations.getOrElse("delete", -1)}},"liveness_offline_transitions":${offlineTransitions.get()},"liveness_online_transitions":${onlineTransitions.get()},"watchdog_silence_events":${silenceEvents.size()},"final_a_online":$aOnline,"final_b_offline":$bOffline,"final_state_keys":${expected.size},"final_state_mismatches":${mismatches.size},"zero_loss_final_state":${mismatches.isEmpty},"pass":$pass,"timeline":$timelineJson}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(json)
    if (mismatches.nonEmpty) {
      println(s"[soak] ${mismatches.size} final-state mismatches, first 10:")
      mismatches.take(10).foreach(m => println(s"[soak]   $m"))
    }
    spark.stop()
    if (pass) 0 else 1
    } finally stopDb()
    if (rc != 0) sys.exit(rc)
  }
}
