package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{FeedTransport, SimulatedFeed}
import graft.sources.OpcuaFraming.{SecurityModeNone, SecurityPolicyNoneUri}
import graft.sources.OpcuaSession._

/** GetEndpoints discovery + the reference's session bootstrap
  * (`Helpers/OpcuaHelperFunctions.cs:72-136`): discover on a throwaway
  * connection, select the SecurityMode-None endpoint, open + activate
  * the real session — all over real sockets in Part 6 binary.
  */
class OpcuaDiscoverySpec extends AnyFunSuite {

  private def withServer(f: FeedTransport.FeedServer => Unit): Unit = {
    val feed = new SimulatedFeed(nDevices = 2, nMeasures = 2,
      startMicros = 1704067200000000L, intervalMicros = 5000000L, clockTicks = 2L)
    val server = new FeedTransport.FeedServer(feed)
    try f(server) finally server.close()
  }

  test("GetEndpoints answers before any session exists, with a None endpoint to select") {
    withServer { server =>
      val c = new SessionClient("127.0.0.1", server.boundPort)
      try {
        // no createSession — discovery must not require one
        val eps = c.getEndpoints()
        assert(eps.size == 2)
        assert(eps.head.securityMode == SecurityModeSignAndEncrypt,
          "secure endpoint listed first: selection must search, not take the head")
        val none = selectEndpoint(eps)
        assert(none.isDefined)
        assert(none.get.securityPolicyUri == SecurityPolicyNoneUri)
        assert(none.get.transportProfileUri == TransportProfileBinaryUri)
        assert(none.get.userTokenTypes.contains(UserTokenTypeAnonymous))
        assert(none.get.endpointUrl.contains(server.boundPort.toString))
      } finally c.close()
    }
  }

  test("selectEndpoint mirrors FirstOrDefault(SecurityMode == None)") {
    val secure = EndpointDesc("opc.tcp://a", SecurityModeSignAndEncrypt,
      SecurityPolicyBasic256Sha256Uri, TransportProfileBinaryUri, 3, Vector(0L))
    val open1 = EndpointDesc("opc.tcp://b", SecurityModeNone,
      SecurityPolicyNoneUri, TransportProfileBinaryUri, 0, Vector(0L))
    val open2 = open1.copy(endpointUrl = "opc.tcp://c")
    assert(selectEndpoint(Seq(secure, open1, open2)).contains(open1), "FIRST None wins")
    assert(selectEndpoint(Seq(secure)).isEmpty, "no insecure endpoint -> no session")
    assert(selectEndpoint(Nil).isEmpty)
  }

  test("discoverAndConnect returns an activated session that serves Reads") {
    withServer { server =>
      val c = discoverAndConnect("127.0.0.1", server.boundPort, "disco", pauseMs = 0L)
      try {
        val got = c.read(Seq(("dev-0", "m0")))
        assert(got.head.nonEmpty, "the bootstrapped session must be activated and serving")
      } finally c.close()
    }
  }

  test("bootstrap retries are bounded: a dead port fails after maxAttempts, loudly") {
    // bind-then-close to get a port with nothing listening
    val s = new java.net.ServerSocket(0)
    val deadPort = s.getLocalPort
    s.close()
    val t0 = System.nanoTime()
    val e = intercept[java.io.IOException] {
      discoverAndConnect("127.0.0.1", deadPort, "dead", maxAttempts = 3, pauseMs = 0L,
        timeoutMs = 500)
    }
    assert(e.getMessage.contains("3 attempts"))
    assert((System.nanoTime() - t0) / 1e9 < 30, "bounded, not hanging")
  }
}
