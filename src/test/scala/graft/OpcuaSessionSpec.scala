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
