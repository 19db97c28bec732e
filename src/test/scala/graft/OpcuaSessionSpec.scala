package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{FeedTransport, OpcuaSession, SimulatedFeed}
import graft.sources.OpcuaSession.{SessionClient, WireValue}

/** The Part 4 session + subscription services end-to-end over a real
  * socket: HEL/ACK → OPN → CreateSession → ActivateSession →
  * CreateSubscription → CreateMonitoredItems → Publish rounds delivering
  * DataChangeNotifications, plus Read, service faults that leave the
  * channel open, and the reference's QueueSize/DiscardOldest semantics
  * on the wire — the protocol flow of
  * `Services/OpcSubscribeService.cs:218-244,522-598` spoken in spec
  * binary with no library.
  */
class OpcuaSessionSpec extends AnyFunSuite {

  private def withServer(clockTicks: Long)(f: (FeedTransport.FeedServer, SimulatedFeed) => Unit): Unit = {
    val feed = new SimulatedFeed(nDevices = 3, nMeasures = 2,
      startMicros = 1704067200000000L, intervalMicros = 5000000L, clockTicks = clockTicks)
    val server = new FeedTransport.FeedServer(feed)
    try f(server, feed) finally server.close()
  }

  test("session lifecycle: create, activate, read current values, close") {
    withServer(clockTicks = 4L) { (server, feed) =>
      val c = new SessionClient("127.0.0.1", server.boundPort)
      try {
        c.createSession("graft-spec")
        c.activateSession()
        // latest value per point from the feed log, as the server must serve
        def latestOf(d: String, m: String): WireValue = {
          val i = (0L until feed.latest()).filter { i =>
            val r = feed.at(i); r._1 == d && r._2 == m
          }.max
          val r = feed.at(i)
          WireValue(r._3, r._5, r._4)
        }
        val got = c.read(Seq(("dev-0", "m0"), ("dev-2", "m1"), ("dev-9", "nope")))
        assert(got(0).contains(latestOf("dev-0", "m0")))
        assert(got(1).contains(latestOf("dev-2", "m1")))
        assert(got(2).isEmpty, "unknown node must answer a Bad status, not a value")
        c.closeSession()
      } finally c.close()
    }
  }

  test("services before ActivateSession fault without killing the channel") {
    withServer(clockTicks = 2L) { (server, _) =>
      val c = new SessionClient("127.0.0.1", server.boundPort)
      try {
        c.createSession("early")
        // not activated yet: Read must fault with Bad_SessionIdInvalid...
        val e = intercept[graft.sources.OpcuaFraming.OpcuaError](c.read(Seq(("dev-0", "m0"))))
        assert(e.code == OpcuaSession.BadSessionIdInvalid)
        // ...and the SAME connection then activates and serves fine
        c.activateSession()
        assert(c.read(Seq(("dev-0", "m0"))).head.nonEmpty)
      } finally c.close()
    }
  }

  test("subscription flow: monitored items deliver the feed's appended values via Publish") {
    withServer(clockTicks = 1L) { (server, feed) =>
      val c = new SessionClient("127.0.0.1", server.boundPort)
      try {
        c.createSession("sub")
        c.activateSession()
        val subId = c.createSubscription(publishingIntervalMs = 1000.0)
        val results = c.createMonitoredItems(subId, Seq(
          (101L, "dev-0", "m0", 10L),
          (102L, "dev-1", "m1", 10L),
          (999L, "dev-0", "not-a-node", 10L)))
        assert(results(0)._1 == 0L && results(1)._1 == 0L)
        assert(results(2)._1 == OpcuaSession.BadNodeIdUnknown)
        assert(results(0)._2 != results(1)._2, "distinct monitored item ids")
        // nothing appended since the subscription: an empty publish
        assert(c.publish().isEmpty)
        // the server's clock advances two ticks → 2 values per item
        feed.clockTicks += 2
        val notifs = c.publish()
        val expected = (feed.latest() - 12L until feed.latest()).map(feed.at)
          .filter(r => (r._1 == "dev-0" && r._2 == "m0") || (r._1 == "dev-1" && r._2 == "m1"))
        assert(notifs.size == expected.size && notifs.size == 4)
        // values arrive under the right client handles with exact payloads
        notifs.foreach { case (handle, v) =>
          val (d, m) = if (handle == 101L) ("dev-0", "m0") else ("dev-1", "m1")
          assert(expected.exists(r => r._1 == d && r._2 == m &&
            r._3 == v.value && r._4 == v.sourceMicros && r._5 == v.statusGood))
        }
        // and a publish with no new data is empty again (delivered state)
        assert(c.publish().isEmpty)
      } finally c.close()
    }
  }

  test("QueueSize bounds a burst, keeping the NEWEST values (DiscardOldest / T6)") {
    withServer(clockTicks = 1L) { (server, feed) =>
      val c = new SessionClient("127.0.0.1", server.boundPort)
      try {
        c.createSession("t6")
        c.activateSession()
        val subId = c.createSubscription(1000.0)
        c.createMonitoredItems(subId, Seq((7L, "dev-0", "m0", 3L))) // queue of 3
        feed.clockTicks += 10 // 10 new values for dev-0/m0 — burst > queue
        val notifs = c.publish()
        assert(notifs.size == 3, s"queue of 3 must cap the burst, got ${notifs.size}")
        // the survivors are the NEWEST three, in order
        val newest = (0L until feed.latest()).map(feed.at)
          .filter(r => r._1 == "dev-0" && r._2 == "m0").takeRight(3)
        assert(notifs.map(_._2.value) == newest.map(_._3))
        assert(notifs.map(_._2.sourceMicros) == newest.map(_._4))
      } finally c.close()
    }
  }

  test("Publish rotates among BUSY subscriptions — a continuously-fed low id cannot starve the rest") {
    withServer(clockTicks = 1L) { (server, feed) =>
      val c = new SessionClient("127.0.0.1", server.boundPort)
      try {
        c.createSession("rr"); c.activateSession()
        val sub1 = c.createSubscription(1000.0)
        c.createMonitoredItems(sub1, Seq((1L, "dev-0", "m0", 100L)))
        val sub2 = c.createSubscription(1000.0)
        c.createMonitoredItems(sub2, Seq((2L, "dev-1", "m1", 100L)))
        feed.clockTicks += 1                // both subscriptions now pending
        val (s1, n1) = c.publishWithSub()
        assert(s1 == sub1 && n1.nonEmpty)
        feed.clockTicks += 1                // sub1 pending AGAIN — and must wait its turn
        val (s2, n2) = c.publishWithSub()
        assert(s2 == sub2,
          s"second publish must serve the other busy subscription, served $s2")
        assert(n2.nonEmpty && n2.forall(_._1 == 2L))
        val (s3, _) = c.publishWithSub()    // wrap-around back to sub1
        assert(s3 == sub1)
      } finally c.close()
    }
  }

  test("DeleteMonitoredItems / DeleteSubscriptions tear down with per-id statuses") {
    withServer(clockTicks = 1L) { (server, feed) =>
      val c = new SessionClient("127.0.0.1", server.boundPort)
      try {
        c.createSession("teardown"); c.activateSession()
        val sub = c.createSubscription(1000.0)
        val results = c.createMonitoredItems(sub, Seq(
          (1L, "dev-0", "m0", 10L), (2L, "dev-1", "m1", 10L)))
        val Seq(id1, id2) = results.map(_._2)
        // delete one real item and one bogus id
        assert(c.deleteMonitoredItems(sub, Seq(id1, 999L)) ==
          Seq(0L, OpcuaSession.BadMonitoredItemIdInvalid))
        feed.clockTicks += 1
        // only the surviving item still notifies
        val notifs = c.publish()
        assert(notifs.nonEmpty && notifs.forall(_._1 == 2L),
          s"only the surviving item's handle may notify, got ${notifs.map(_._1)}")
        assert(c.deleteSubscriptions(Seq(sub, sub)) ==
          Seq(0L, OpcuaSession.BadSubscriptionIdInvalid),
          "second delete of the same id must report, not double-free")
        // no subscriptions left: Publish faults
        val e = intercept[graft.sources.OpcuaFraming.OpcuaError](c.publish())
        assert(e.code == OpcuaSession.BadSubscriptionIdInvalid)
      } finally c.close()
    }
  }

  test("an idle session expires at its revised timeout; the next call answers BadSessionClosed") {
    // a controllable server clock drives the idle window — no sleeps
    val feed = new SimulatedFeed(nDevices = 1, nMeasures = 1,
      startMicros = 1704067200000000L, intervalMicros = 5000000L, clockTicks = 1L)
    @volatile var now = 1704067200000L
    val server = new FeedTransport.FeedServer(feed, clock = () => now)
    try {
      val c = new SessionClient("127.0.0.1", server.boundPort)
      try {
        c.createSession("idle", requestedTimeoutMs = 1.0) // revised to the 10 s floor
        c.activateSession()
        assert(c.read(Seq(("dev-0", "m0"))).head.nonEmpty)
        now += 9000 // inside the 10 s floor: still alive
        assert(c.read(Seq(("dev-0", "m0"))).head.nonEmpty)
        now += 11000 // idle past the revised timeout
        val e = intercept[graft.sources.OpcuaFraming.OpcuaError](
          c.read(Seq(("dev-0", "m0"))))
        assert(e.code == OpcuaSession.BadSessionClosed)
        // the channel survives; a NEW session on it serves again
        c.createSession("idle-2"); c.activateSession()
        assert(c.read(Seq(("dev-0", "m0"))).head.nonEmpty)
      } finally c.close()
    } finally server.close()
  }

  /** Fixed rows with a controllable visible horizon — for address-space
    * shapes SimulatedFeed can't produce (slashed device names).
    */
  private final class VecFeed(rows: Vector[(String, String, Double, Long, Boolean)])
      extends graft.sources.MeasureFeed {
    @volatile var visible: Int = rows.length
    override def latest(): Long = visible.toLong
    override def at(i: Long): (String, String, Double, Long, Boolean) = rows(i.toInt)
  }

  test("a UInt32-max QueueSize is revised down and still delivers (no negative-cap blackout)") {
    withServer(clockTicks = 1L) { (server, feed) =>
      val c = new SessionClient("127.0.0.1", server.boundPort)
      try {
        c.createSession("maxq"); c.activateSession()
        val subId = c.createSubscription(1000.0)
        // the common client convention for "unbounded queue"
        val Seq((st, _, revisedQs)) =
          c.createMonitoredItems(subId, Seq((1L, "dev-0", "m0", 0xFFFFFFFFL)))
        assert(st == 0L)
        assert(revisedQs == OpcuaSession.MaxQueueSize,
          s"server must revise the queue into its bound, got $revisedQs")
        feed.clockTicks += 2
        val notifs = c.publish()
        assert(notifs.size == 2, s"values must still flow after revision, got ${notifs.size}")
      } finally c.close()
    }
  }

  test("Publish serves a subscription with pending notifications, not an arbitrary one") {
    withServer(clockTicks = 1L) { (server, feed) =>
      val c = new SessionClient("127.0.0.1", server.boundPort)
      try {
        c.createSession("multi"); c.activateSession()
        val idleSub = c.createSubscription(1000.0) // created first, never monitors
        val busySub = c.createSubscription(1000.0)
        assert(idleSub != busySub)
        c.createMonitoredItems(busySub, Seq((42L, "dev-0", "m0", 10L)))
        feed.clockTicks += 2
        val notifs = c.publish()
        assert(notifs.nonEmpty && notifs.forall(_._1 == 42L),
          "the subscription holding the pending data must answer — the idle one would starve it")
        assert(c.publish().isEmpty)
      } finally c.close()
    }
  }

  test("duplicate client handles keep separate per-item queues (keyed by monitoredItemId)") {
    withServer(clockTicks = 1L) { (server, feed) =>
      val c = new SessionClient("127.0.0.1", server.boundPort)
      try {
        c.createSession("duphandle"); c.activateSession()
        val subId = c.createSubscription(1000.0)
        // client handles are CLIENT-chosen and may legally collide; the
        // server must still hold one queue per monitored item
        val rs = c.createMonitoredItems(subId, Seq(
          (5L, "dev-0", "m0", 3L),
          (5L, "dev-1", "m0", 3L)))
        assert(rs.forall(_._1 == 0L) && rs(0)._2 != rs(1)._2)
        feed.clockTicks += 10 // burst of 10 per point, both queues cap at 3
        val notifs = c.publish()
        assert(notifs.size == 6,
          s"two capped queues of 3 must deliver 6, got ${notifs.size} (merged queues lose data)")
        assert(notifs.forall(_._1 == 5L))
        def newest3(d: String) = (0L until feed.latest()).map(feed.at)
          .filter(r => r._1 == d && r._2 == "m0").takeRight(3).map(_._3)
        assert(notifs.take(3).map(_._2.value) == newest3("dev-0"))
        assert(notifs.drop(3).map(_._2.value) == newest3("dev-1"))
      } finally c.close()
    }
  }

  test("non-Value attribute answers BadAttributeIdInvalid, unknown node BadNodeIdUnknown") {
    withServer(clockTicks = 2L) { (server, _) =>
      val c = new SessionClient("127.0.0.1", server.boundPort)
      try {
        c.createSession("attrs"); c.activateSession()
        // attr 1 (NodeId attribute) of an EXISTING node: the node is not
        // unknown — the attribute is
        assert(c.readAttributeStatus(Seq(("dev-0", "m0")), attributeId = 1L) ==
          Seq(OpcuaSession.BadAttributeIdInvalid))
        assert(c.readAttributeStatus(Seq(("dev-9", "nope")), attributeId = OpcuaSession.AttributeValue) ==
          Seq(OpcuaSession.BadNodeIdUnknown))
        assert(c.readAttributeStatus(Seq(("dev-0", "m0")), attributeId = OpcuaSession.AttributeValue) ==
          Seq(graft.sources.OpcuaFraming.GoodStatus))
      } finally c.close()
    }
  }

  test("points under a device name containing '/' resolve for Read and monitoring") {
    val rows = Vector(
      ("plant/line1", "temp", 1.5, 1000L, true),
      ("plant/line1", "temp", 2.5, 2000L, true),
      ("dev-0", "m0", 9.0, 1500L, true))
    val feed = new VecFeed(rows)
    val server = new FeedTransport.FeedServer(feed)
    try {
      val c = new SessionClient("127.0.0.1", server.boundPort)
      try {
        c.createSession("slashes"); c.activateSession()
        val got = c.read(Seq(("plant/line1", "temp")))
        assert(got.head.contains(WireValue(2.5, statusGood = true, 2000L)),
          "a device name containing '/' must still resolve (every split is tried)")
        feed.visible = 1 // rewind, then monitor and replay the growth
        val subId = c.createSubscription(1000.0)
        val Seq((st, _, _)) = c.createMonitoredItems(subId,
          Seq((8L, "plant/line1", "temp", 10L)))
        assert(st == 0L)
        feed.visible = 3
        val notifs = c.publish()
        assert(notifs.map(_._2.value).contains(2.5))
      } finally c.close()
    } finally server.close()
  }

  test("an undecodable service body answers ERR + close, never a silent drop") {
    import graft.sources.OpcuaFraming._
    withServer(clockTicks = 1L) { (server, _) =>
      val sock = new java.net.Socket()
      try {
        sock.connect(new java.net.InetSocketAddress("127.0.0.1", server.boundPort), 5000)
        sock.setSoTimeout(5000)
        val in = new java.io.BufferedInputStream(sock.getInputStream)
        val out = new java.io.BufferedOutputStream(sock.getOutputStream)
        val ch = openClientChannel(in, out, DefaultLimits,
          "opc.tcp://127.0.0.1/graft", System.currentTimeMillis())
        // u32 image 4: not a bulk opcode, and 0x04 is no NodeId encoding
        val mw = new MessageWriter(out, ch.sendSeq, 2L,
          ch.negotiated.receiveBufferSize, ch.negotiated.maxChunkCount,
          ch.token.channelId, ch.token.tokenId)
        mw.u32(4L); mw.finish()
        val (tpe, _, body) = readFrame(in, DefaultLimits.receiveBufferSize)
        assert(tpe == "ERR", s"malformed body must be answered with a diagnostic, got $tpe")
        assert(decodeError(body).code == BadDecodingError)
        assert(in.read() == -1, "the server must close after a transport-level ERR")
      } finally sock.close()
    }
  }

  test("bulk RANGE pulls and session services share one secure channel") {
    withServer(clockTicks = 3L) { (server, feed) =>
      // session client on one connection, bulk feed client on another —
      // both through the same server, same HEL/OPN machinery
      val session = new SessionClient("127.0.0.1", server.boundPort)
      val bulk = new FeedTransport.SocketMeasureFeed("127.0.0.1", server.boundPort)
      try {
        session.createSession("mixed"); session.activateSession()
        assert(bulk.fetchRange(0L, feed.latest()) ==
          (0L until feed.latest()).map(feed.at))
        assert(session.read(Seq(("dev-1", "m0"))).head.nonEmpty)
      } finally { session.close(); bulk.close() }
    }
  }
}
