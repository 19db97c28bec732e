package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{FeedTransport, SimulatedFeed}
import graft.sources.FeedTransport.{FeedServer, SocketMeasureFeed}

/** The networked feed transport, end-to-end over real sockets speaking
  * OPC UA Part 6 binary frames: HEL/ACK negotiation, chunked MSG
  * request/response pulls, ERR frames, and — the part that matters —
  * connection drops mid-stream answered by backoff reconnect and an
  * idempotent retry that resumes at the same sequence with no loss and no
  * duplicates (S2/T4/T5). The Basic256Sha256 secured modes are covered by
  * OpcuaSecureSpec; frame-level byte pins live in OpcuaFramingSpec.
  */
class FeedTransportSpec extends AnyFunSuite {
  import graft.sources.OpcuaFraming
  import graft.sources.OpcuaFraming._

  private def withServer(f: (FeedServer, SimulatedFeed) => Unit): Unit = {
    val feed = new SimulatedFeed(nDevices = 3, nMeasures = 2,
      startMicros = 1704067200000000L, intervalMicros = 5000000L, clockTicks = 10L)
    val server = new FeedServer(feed)
    try f(server, feed) finally server.close()
  }

  test("socket pull equals the direct feed: latest, point reads, range reads") {
    withServer { (server, feed) =>
      val client = new SocketMeasureFeed("127.0.0.1", server.boundPort)
      try {
        assert(client.latest() == feed.latest())
        (0L until feed.latest()).foreach(i => assert(client.at(i) == feed.at(i)))
        val direct = (12L until 41L).map(feed.at)
        assert(client.fetchRange(12L, 41L) == direct)
        // the log grows (new ticks) and the client sees it without reconnect
        feed.clockTicks += 5
        assert(client.latest() == feed.latest())
      } finally client.close()
    }
  }

  test("a MSG before the HEL handshake draws an ERR frame and a closed connection") {
    withServer { (server, feed) =>
      val raw = new java.net.Socket("127.0.0.1", server.boundPort)
      try {
        val out = raw.getOutputStream
        // send a LATEST request without ever saying hello
        val mw = new MessageWriter(out, new SeqState, 1L, 65536, 0L)
        mw.u32(1L); mw.finish()
        val (tpe, _, body) = OpcuaFraming.readFrame(raw.getInputStream, 65536)
        assert(tpe == "ERR")
        val err = OpcuaFraming.decodeError(body)
        assert(err.code == BadTcpMessageTypeInvalid) // Part 6: ERR is fatal
        assert(raw.getInputStream.read() == -1)      // server closed on us
      } finally raw.close()
      // a fresh, well-behaved connection still handshakes and works
      val client = new SocketMeasureFeed("127.0.0.1", server.boundPort)
      try assert(client.latest() == feed.latest()) finally client.close()
    }
  }

  test("negotiated 8k buffers force multi-chunk RANGE responses, reassembled losslessly") {
    val feed = new SimulatedFeed(nDevices = 5, nMeasures = 4,
      startMicros = 1704067200000000L, intervalMicros = 5000000L, clockTicks = 200L)
    // server only grants the Part 6 minimum buffers → every response chunk ≤ 8192
    val server = new FeedServer(feed, limits = Limits(8192, 8192, 0L, 0L))
    val client = new SocketMeasureFeed("127.0.0.1", server.boundPort)
    try {
      val before = client.chunksRead
      val rows = client.fetchRange(0L, 4000L) // ~40 B/record ≫ one 8 KiB chunk
      assert(rows == (0L until 4000L).map(feed.at))
      assert(client.chunksRead - before > 10,
        s"expected a chunked body, got ${client.chunksRead - before} chunk(s)")
    } finally { client.close(); server.close() }
  }

  test("connection drop: backoff reconnect, idempotent retry, exact resume (T4/T5)") {
    withServer { (server, feed) =>
      val client = new SocketMeasureFeed("127.0.0.1", server.boundPort,
        sleeper = _ => ()) // recorded, not slept
      try {
        val before = client.fetchRange(0L, 10L)
        server.killConnections() // the "server restart"
        // next pull hits the dead socket, reconnects, retries — same rows
        val after = client.fetchRange(10L, 20L)
        assert(after == (10L until 20L).map(feed.at))
        assert(client.delays.size() >= 1) // at least one backoff delay taken
        assert(client.delays.get(0) == graft.sources.RetryPolicy.BaseDelaySeconds)
        // and the union is the contiguous gapless, duplicate-free log
        val all = before ++ after
        assert(all == (0L until 20L).map(feed.at))
      } finally client.close()
    }
  }

  test("DSv2 socket mode: partitions RANGE-pull their slices over TCP, rows match the pure feed") {
    val spark = SparkSpec.spark
    val feed = new SimulatedFeed(nDevices = 3, nMeasures = 2,
      startMicros = 1704067200000000L, intervalMicros = 5000000L, clockTicks = 4L)
    val server = new FeedServer(feed)
    val q = spark.readStream
      .format(classOf[graft.sources.MeasureSourceProvider].getName)
      .option("nDevices", 3).option("nMeasures", 2)
      .option("startMicros", 1704067200000000L).option("intervalMicros", 5000000L)
      .option("numPartitions", 2)
      .option("feedHost", "127.0.0.1").option("feedPort", server.boundPort)
      .load()
      .writeStream.format("memory").queryName("measure_socket_t")
      .outputMode("append").start()
    try {
      q.processAllAvailable() // drains the server's 4 ticks = 24 rows
      feed.clockTicks += 2    // server produces more; next trigger sees it
      q.processAllAvailable()
      val got = spark.table("measure_socket_t")
        .selectExpr("device", "measure_name", "raw_value",
          "unix_micros(source_ts) AS micros", "status_ok", "event_seq")
        .collect()
        .map(r => (r.getLong(5), (r.getString(0), r.getString(1), r.getDouble(2), r.getLong(3), r.getBoolean(4))))
        .sortBy(_._1)
      assert(got.length == 36) // 6 ticks × 6 items, no loss, no duplicates
      got.foreach { case (i, row) => assert(row == feed.at(i)) }
    } finally {
      q.stop()
      server.close()
      spark.sql("DROP TABLE IF EXISTS measure_socket_t")
    }
  }

  test("overflowing RANGE bounds draw an ERR, not a runaway server loop (regression)") {
    withServer { (server, _) =>
      val client = new SocketMeasureFeed("127.0.0.1", server.boundPort, sleeper = _ => ())
      try {
        // hi - lo wraps negative for lo = Long.MinValue — the old guard
        // passed it through and the serve thread span ~2^63 iterations
        val e = intercept[FeedTransport.FeedProtocolException](
          client.fetchRange(Long.MinValue, 1L))
        assert(e.getMessage.contains("too large"))
      } finally client.close()
    }
  }

  test("protocol ERR fails fast — no teardown/backoff retry of a doomed request") {
    // a fake server that ACKs the handshake and issues the channel, then
    // ERRs every service call
    val srv = new java.net.ServerSocket(0)
    val t = new Thread(() => {
      val s = srv.accept()
      val in = s.getInputStream; val out = s.getOutputStream
      val (tpe, _, _) = OpcuaFraming.readFrame(in, 65536)
      assert(tpe == "HEL")
      OpcuaFraming.writeFrame(out, "ACK", 'F', encodeAck(DefaultLimits)); out.flush()
      val clientSeq = new SeqState; val srvSeq = new SeqState
      val (orid, _) = OpcuaFraming.readOpenRequest(in, clientSeq, 65536)
      // token createdAt must be NOW: an epoch-0 token is past 75% of any
      // lifetime and the client would (correctly) renew before requesting
      OpcuaFraming.writeOpenResponse(out, srvSeq, orid, 0L,
        ChannelToken(1L, 1L, System.currentTimeMillis(), 60000L))
      OpcuaFraming.readMessage(in, clientSeq, DefaultLimits, 1L, 1L) // the doomed request
      OpcuaFraming.writeFrame(out, "ERR", 'F',
        encodeError(BadServiceUnsupported, "nope")); out.flush()
      s.close()
    })
    t.setDaemon(true); t.start()
    val client = new SocketMeasureFeed("127.0.0.1", srv.getLocalPort, sleeper = _ => ())
    try {
      val e = intercept[FeedTransport.FeedProtocolException](client.latest())
      assert(e.getMessage == "ERR 0x800B0000: nope")
      assert(client.delays.isEmpty) // deterministic failure took zero backoff
    } finally { client.close(); srv.close() }
  }

  test("a hung (open but silent) server trips the read timeout into the reconnect path") {
    val srv = new java.net.ServerSocket(0) // accepts, never speaks
    val client = new SocketMeasureFeed("127.0.0.1", srv.getLocalPort,
      maxAttempts = 2, timeoutMs = 150, sleeper = _ => ())
    try {
      val e = intercept[java.io.IOException](client.latest())
      assert(e.getMessage.contains("after 2 attempts"))
      assert(client.delays.size() == 1) // timeout → teardown → backoff, not a wedge
    } finally { client.close(); srv.close() }
  }

  test("unreachable server fails loudly after bounded attempts") {
    val dead = new java.net.ServerSocket(0)
    val port = dead.getLocalPort
    dead.close() // nothing listens here any more
    val client = new SocketMeasureFeed("127.0.0.1", port,
      maxAttempts = 3, sleeper = _ => ())
    val e = intercept[java.io.IOException](client.latest())
    assert(e.getMessage.contains("after 3 attempts"))
    assert(client.delays.size() == 2) // attempts − 1 sleeps before giving up
  }
}
