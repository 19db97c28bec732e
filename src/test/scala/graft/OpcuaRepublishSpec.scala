package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{FeedTransport, OpcuaFraming, SimulatedFeed}
import graft.sources.OpcuaSession._

/** Part 4 §5.13.5 reliable notification delivery over real sockets:
  * Publish retains unacknowledged notification messages, acknowledgements
  * release them (with per-ack statuses), Republish recovers any retained
  * sequence number byte-for-byte, and the retention cap drops the oldest
  * so a never-acking client cannot grow server memory without bound.
  */
class OpcuaRepublishSpec extends AnyFunSuite {

  private def withClient(f: (SessionClient, SimulatedFeed) => Unit): Unit = {
    // one initial tick: the feed log IS the address space, so the
    // monitored point must have produced a value before item creation
    val feed = new SimulatedFeed(nDevices = 2, nMeasures = 1,
      startMicros = 1704067200000000L, intervalMicros = 5000000L, clockTicks = 1L)
    val server = new FeedTransport.FeedServer(feed)
    try {
      val c = new SessionClient("127.0.0.1", server.boundPort)
      try {
        c.createSession("republish"); c.activateSession()
        f(c, feed)
      } finally c.close()
    } finally server.close()
  }

  test("unacked messages stay available and Republish returns them byte-for-byte") {
    withClient { (c, feed) =>
      val sub = c.createSubscription(1000.0)
      c.createMonitoredItems(sub, Seq((1L, "dev-0", "m0", 100L)))
      feed.clockTicks += 2
      val p1 = c.publishFull()
      assert(p1.notifs.nonEmpty)
      assert(p1.available.contains(p1.sequenceNumber),
        "the just-published message must itself be listed as recoverable")
      feed.clockTicks += 1
      val p2 = c.publishFull()
      assert(p2.available.toSet == Set(p1.sequenceNumber, p2.sequenceNumber),
        "nothing acked yet: both sequence numbers recoverable")
      // Republish recovers the FIRST message exactly, notification for
      // notification, after later publishes happened
      assert(c.republish(sub, p1.sequenceNumber) == p1.notifs)
      assert(c.republish(sub, p2.sequenceNumber) == p2.notifs)
    }
  }

  test("acknowledgement releases retention: Good status, then BadMessageNotAvailable") {
    withClient { (c, feed) =>
      val sub = c.createSubscription(1000.0)
      c.createMonitoredItems(sub, Seq((1L, "dev-0", "m0", 100L)))
      feed.clockTicks += 1
      val p1 = c.publishFull()
      feed.clockTicks += 1
      val p2 = c.publishFull(acks = Seq((sub, p1.sequenceNumber), (sub, 9999L)))
      assert(p2.ackResults == Vector(OpcuaFraming.GoodStatus, BadSequenceNumberUnknown),
        "per-ack statuses: the real seq releases, the unknown one reports")
      assert(!p2.available.contains(p1.sequenceNumber), "acked message no longer recoverable")
      val e = intercept[OpcuaFraming.OpcuaError](c.republish(sub, p1.sequenceNumber))
      assert(e.code == BadMessageNotAvailable)
      val e2 = intercept[OpcuaFraming.OpcuaError](c.republish(sub + 99, p2.sequenceNumber))
      assert(e2.code == BadSubscriptionIdInvalid)
    }
  }

  test("retention caps at MaxRetainedNotifications, dropping the oldest") {
    withClient { (c, feed) =>
      val sub = c.createSubscription(1000.0)
      c.createMonitoredItems(sub, Seq((1L, "dev-0", "m0", 100L)))
      feed.clockTicks += 1
      val first = c.publishFull()
      (1 to MaxRetainedNotifications).foreach { _ =>
        feed.clockTicks += 1
        c.publishFull()
      }
      val last = c.publishFull(acks = Nil)
      assert(last.available.length <= MaxRetainedNotifications)
      assert(!last.available.contains(first.sequenceNumber),
        "oldest message must have been dropped at the cap")
      val e = intercept[OpcuaFraming.OpcuaError](c.republish(sub, first.sequenceNumber))
      assert(e.code == BadMessageNotAvailable)
    }
  }

  test("keep-alive (empty) publishes are not retained — nothing to recover") {
    withClient { (c, feed) =>
      val sub = c.createSubscription(1000.0)
      c.createMonitoredItems(sub, Seq((1L, "dev-0", "m0", 100L)))
      // no feed advance: the publish is a keep-alive
      val p = c.publishFull()
      assert(p.notifs.isEmpty)
      assert(!p.available.contains(p.sequenceNumber))
      val e = intercept[OpcuaFraming.OpcuaError](c.republish(sub, p.sequenceNumber))
      assert(e.code == BadMessageNotAvailable)
    }
  }
}
