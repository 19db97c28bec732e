package graft.sources

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets
import java.util.concurrent.CopyOnWriteArrayList
import scala.jdk.CollectionConverters._

/** A real networked transport for the [[MeasureFeed]] protocol boundary —
  * as much of the reference's OPC UA client (S2/T4/T5,
  * `Helpers/OpcuaHelperFunctions.cs:72-136`,
  * `Services/OpcSubscribeService.cs:848-957`) as this environment can
  * honestly exercise: the OPC UA *wire format* still needs a client
  * library that does not ship here, but the connection LIFECYCLE — TCP
  * connect, hello/ack session handshake, request/response pulls, broken
  * connections, backoff reconnect, and resume-at-same-sequence — is real
  * socket I/O, driven end-to-end by FeedTransportSpec.
  *
  * Line protocol (newline-delimited UTF-8, request → response):
  *   HEL <client>   → ACK                 session handshake
  *   LATEST         → SEQ <n>             newest sequence (exclusive)
  *   GET <i>        → VAL <i> <dev> <m> <value> <micros> <ok>
  *   RANGE <lo> <hi>→ VAL … × (hi−lo), then END    executor-side batch pull
  *
  * The feed is an append-only log fully determined by the sequence
  * number, so every request is idempotent — which is what makes the
  * client's retry-after-reconnect (and Spark's offset replay above it)
  * safe with no loss and no duplicates.
  */
object FeedTransport {

  /** In-process server bridging any [[MeasureFeed]] onto the line
    * protocol. `killConnections()` hard-drops every live connection — the
    * test lever for the reconnect path (a "server restart" from the
    * client's point of view).
    */
  final class FeedServer(feed: MeasureFeed, port: Int = 0) extends AutoCloseable {
    private val server = new ServerSocket(port, 50, java.net.InetAddress.getByName("127.0.0.1"))
    private val live = new CopyOnWriteArrayList[Socket]()
    @volatile private var running = true

    def boundPort: Int = server.getLocalPort

    private def serve(sock: Socket): Unit = {
      val in = new BufferedReader(new InputStreamReader(sock.getInputStream, StandardCharsets.UTF_8))
      // NO autoflush: a RANGE must not flush per row (one syscall per value
      // caps throughput); each response flushes once, a range at its END.
      // PrintWriter swallows IOException, so checkError() is the only
      // dead-client signal — poll it inside long ranges to stop serving
      // millions of rows to a closed socket.
      val out = new PrintWriter(
        new java.io.BufferedWriter(
          new java.io.OutputStreamWriter(sock.getOutputStream, StandardCharsets.UTF_8), 1 << 16))
      var helloed = false
      try {
        var line = in.readLine()
        while (line != null && !out.checkError()) {
          val parts = line.trim.split("\\s+")
          parts(0) match {
            case "HEL" => helloed = true; out.println("ACK")
            case _ if !helloed => out.println("ERR handshake required")
            case "LATEST" => out.println(s"SEQ ${feed.latest()}")
            case "GET" => out.println(renderVal(parts(1).toLong))
            case "RANGE" =>
              val (lo, hi) = (parts(1).toLong, parts(2).toLong)
              var i = lo
              var dead = false
              while (i < hi && !dead) {
                out.println(renderVal(i))
                i += 1
                if ((i & 0xFFFF) == 0) dead = out.checkError() // flushes too
              }
              if (!dead) out.println("END")
            case _ => out.println("ERR unknown command")
          }
          out.flush()
          line = in.readLine()
        }
      } catch { case _: java.io.IOException => () } // dropped client
      finally { live.remove(sock); try sock.close() catch { case _: Exception => () } }
    }

    private def renderVal(i: Long): String = {
      val (dev, m, v, micros, ok) = feed.at(i)
      s"VAL $i $dev $m $v $micros $ok"
    }

    private val acceptor = new Thread(() => {
      while (running) {
        try {
          val sock = server.accept()
          live.add(sock)
          if (!running) { // raced close(): its killConnections snapshot
            live.remove(sock) // may predate our add — close here instead
            try sock.close() catch { case _: Exception => () }
          } else {
            val t = new Thread(() => serve(sock), s"feed-conn-${sock.getPort}")
            t.setDaemon(true)
            t.start()
          }
        } catch {
          // a transient accept failure (EMFILE under fd pressure — which
          // some JDKs surface as SocketException, so no separate quiet
          // arm) must not kill the acceptor and must not busy-spin; the
          // loop condition ends it once close() flips `running`
          case _: java.io.IOException => if (running) Thread.sleep(50)
        }
      }
    }, "feed-server-accept")
    acceptor.setDaemon(true)
    acceptor.start()

    /** Drop every live connection (clients see a broken pipe / EOF). */
    def killConnections(): Unit =
      live.asScala.foreach(s => try s.close() catch { case _: Exception => () })

    override def close(): Unit = {
      running = false
      killConnections()
      server.close()
    }
  }

  /** The server answered but rejected the request (ERR …): a DETERMINISTIC
    * failure — retrying it through reconnect/backoff would burn minutes
    * resending a doomed request, so it deliberately does NOT extend
    * IOException and fails the caller immediately with the server's text.
    */
  final class FeedProtocolException(msg: String) extends RuntimeException(msg)

  /** [[MeasureFeed]] over the wire, with the reference's reconnect
    * discipline: on any I/O failure the connection is torn down, the
    * two-leg TCP backoff ([[RetryPolicy.Backoff]]) delays the re-connect +
    * re-handshake, and the in-flight request is RETRIED — idempotent by
    * the append-only-log contract, so a retried pull returns exactly the
    * rows the failed one would have. Connect AND read carry `timeoutMs`
    * (reference DTO timeout): a hung-but-open server surfaces as a
    * SocketTimeoutException and enters the same reconnect path — without
    * it the retry machinery would be unreachable and the stream would
    * wedge forever. `sleeper` is injected so tests drive the backoff
    * without wall-clock sleeps; production passes Thread.sleep.
    */
  final class SocketMeasureFeed(host: String, port: Int,
                                maxAttempts: Int = 8,
                                timeoutMs: Int = 30000,
                                sleeper: Double => Unit = s => Thread.sleep((s * 1000).toLong))
      extends MeasureFeed with AutoCloseable {

    private val backoff = new RetryPolicy.Backoff
    @transient private var sock: Socket = _
    @transient private var in: BufferedReader = _
    @transient private var out: PrintWriter = _

    /** Delays observed by `sleeper` (exposed for the spec's assertions). */
    val delays = new CopyOnWriteArrayList[Double]()

    private def teardown(): Unit = {
      if (sock != null) { try sock.close() catch { case _: Exception => () }; sock = null }
    }

    private def connect(): Unit = {
      sock = new Socket()
      sock.connect(new java.net.InetSocketAddress(host, port), timeoutMs)
      sock.setSoTimeout(timeoutMs)
      in = new BufferedReader(new InputStreamReader(sock.getInputStream, StandardCharsets.UTF_8))
      out = new PrintWriter(sock.getOutputStream, true)
      out.println("HEL graft")
      val resp = in.readLine()
      if (resp != "ACK") throw new java.io.IOException(s"handshake rejected: $resp")
      backoff.tcpDropped() // connected: reset the backoff legs
    }

    /** Run one request against a live connection, reconnecting (with
      * backoff) and retrying on failure up to maxAttempts.
      */
    private def withSession[T](body: => T): T = {
      var attempt = 0
      while (true) {
        try {
          if (sock == null) connect()
          return body
        } catch {
          case e: java.io.IOException =>
            teardown()
            attempt += 1
            if (attempt >= maxAttempts)
              throw new java.io.IOException(s"feed unreachable after $attempt attempts", e)
            val d = backoff.tcpFailed()
            delays.add(d)
            sleeper(d)
        }
      }
      throw new IllegalStateException("unreachable")
    }

    private def request(line: String): String = withSession {
      out.println(line)
      val resp = in.readLine()
      if (resp == null) throw new java.io.IOException("connection closed by server")
      if (resp.startsWith("ERR")) throw new FeedProtocolException(resp)
      resp
    }

    override def latest(): Long = request("LATEST").split("\\s+")(1).toLong

    override def at(i: Long): (String, String, Double, Long, Boolean) =
      parseVal(request(s"GET $i"))

    /** Executor-side batch pull: one round-trip for a partition's whole
      * [lo, hi) slice. Retried as a unit on connection loss (idempotent).
      */
    def fetchRange(lo: Long, hi: Long): Seq[(String, String, Double, Long, Boolean)] =
      withSession {
        out.println(s"RANGE $lo $hi")
        val rows = Vector.newBuilder[(String, String, Double, Long, Boolean)]
        var line = in.readLine()
        while (line != null && line != "END") {
          if (line.startsWith("ERR")) throw new FeedProtocolException(line)
          rows += parseVal(line)
          line = in.readLine()
        }
        if (line == null) throw new java.io.IOException("connection closed mid-range")
        rows.result()
      }

    private def parseVal(line: String): (String, String, Double, Long, Boolean) = {
      val p = line.split("\\s+")
      (p(2), p(3), p(4).toDouble, p(5).toLong, p(6).toBoolean)
    }

    override def close(): Unit = teardown()
  }
}
