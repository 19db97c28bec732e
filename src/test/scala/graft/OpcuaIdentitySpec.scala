package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{FeedTransport, OpcuaCrypto, OpcuaSession, SimulatedFeed}
import graft.sources.OpcuaFraming.OpcuaError
import graft.sources.OpcuaSession._

/** UserNameIdentityToken on ActivateSession — the reference's
  * `GetUserIdentity` path (`Services/OpcuaHelperService.cs:280-292`)
  * spoken on the wire: the password travels RSA-OAEP-encrypted with the
  * server certificate and bound to the session's server nonce (Part 4
  * §7.36.4 legacy token secret). Over real sockets in every test.
  */
class OpcuaIdentitySpec extends AnyFunSuite {

  private lazy val serverIdent = OpcuaCrypto.generateSelfSigned("graft-ident-server")

  private def withServer(users: Map[String, String], allowAnonymous: Boolean,
                         identity: Option[OpcuaCrypto.Identity] = Some(serverIdent))
                        (f: FeedTransport.FeedServer => Unit): Unit = {
    val feed = new SimulatedFeed(nDevices = 2, nMeasures = 2,
      startMicros = 1704067200000000L, intervalMicros = 5000000L, clockTicks = 3L)
    val server = new FeedTransport.FeedServer(feed, identity = identity,
      users = users, allowAnonymous = allowAnonymous)
    try f(server) finally server.close()
  }

  test("username/password activates over RSA-OAEP and serves reads; anonymous still works") {
    withServer(Map("operator" -> "s3cret"), allowAnonymous = true) { server =>
      val c = new SessionClient("127.0.0.1", server.boundPort)
      try {
        c.createSession("ident-good")
        c.activateSession(UserPasswordIdentity("operator", "s3cret"))
        assert(c.read(Seq(("dev-0", "m0"))).head.nonEmpty)
        c.closeSession()
      } finally c.close()
      val a = new SessionClient("127.0.0.1", server.boundPort)
      try {
        a.createSession("ident-anon")
        a.activateSession()
        assert(a.read(Seq(("dev-0", "m0"))).head.nonEmpty)
      } finally a.close()
    }
  }

  test("wrong password faults Bad_UserAccessDenied; channel survives and correct retry succeeds") {
    withServer(Map("operator" -> "s3cret"), allowAnonymous = false) { server =>
      val c = new SessionClient("127.0.0.1", server.boundPort)
      try {
        c.createSession("ident-retry")
        val e = intercept[OpcuaError](
          c.activateSession(UserPasswordIdentity("operator", "wrong")))
        assert(e.code == BadUserAccessDenied)
        // same connection, correct credentials: session activates
        c.activateSession(UserPasswordIdentity("operator", "s3cret"))
        assert(c.read(Seq(("dev-0", "m0"))).head.nonEmpty)
      } finally c.close()
    }
  }

  test("anonymous is rejected when the server requires credentials") {
    withServer(Map("operator" -> "s3cret"), allowAnonymous = false) { server =>
      val c = new SessionClient("127.0.0.1", server.boundPort)
      try {
        c.createSession("ident-noanon")
        val e = intercept[OpcuaError](c.activateSession())
        assert(e.code == BadIdentityTokenRejected)
      } finally c.close()
    }
  }

  test("identityFor mirrors the reference fallback: both fields required for username identity") {
    assert(identityFor("op", "pw ") == UserPasswordIdentity("op", "pw"))
    assert(identityFor("", "pw") == AnonymousIdentity)
    assert(identityFor("op", "") == AnonymousIdentity)
    assert(identityFor(null, null) == AnonymousIdentity)
  }

  test("discoverAndConnect authenticates with the supplied identity") {
    withServer(Map("ingest" -> "pipeline-pw"), allowAnonymous = false) { server =>
      val c = OpcuaSession.discoverAndConnect("127.0.0.1", server.boundPort, "ident-disco",
        maxAttempts = 1, pauseMs = 0L,
        identity = UserPasswordIdentity("ingest", "pipeline-pw"))
      try assert(c.read(Seq(("dev-1", "m1"))).head.nonEmpty)
      finally c.close()
    }
  }

  test("replayed encrypted token from another session is rejected (nonce binding)") {
    // craft the request manually: encrypt against the FIRST session's
    // nonce, then present it on a SECOND session whose nonce differs
    withServer(Map("operator" -> "s3cret"), allowAnonymous = false) { server =>
      val c1 = new SessionClient("127.0.0.1", server.boundPort)
      val nonce1 =
        try { c1.createSession("ident-victim"); c1.capturedServerNonce }
        finally c1.close()
      val c2 = new SessionClient("127.0.0.1", server.boundPort)
      try {
        c2.createSession("ident-replay")
        val e = intercept[OpcuaError](
          c2.activateSessionWithNonce(UserPasswordIdentity("operator", "s3cret"), nonce1))
        assert(e.code == BadIdentityTokenInvalid)
        // the honest nonce then works on the same channel
        c2.activateSession(UserPasswordIdentity("operator", "s3cret"))
        assert(c2.read(Seq(("dev-0", "m0"))).head.nonEmpty)
      } finally c2.close()
    }
  }

  test("plaintext password is rejected when the server can offer encryption") {
    withServer(Map("operator" -> "s3cret"), allowAnonymous = false) { server =>
      val c = new SessionClient("127.0.0.1", server.boundPort)
      try {
        c.createSession("ident-plain")
        val e = intercept[OpcuaError](c.activateSessionPlaintext("operator", "s3cret"))
        assert(e.code == BadIdentityTokenRejected)
      } finally c.close()
    }
  }
}
