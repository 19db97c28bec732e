package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.RetryPolicy

/** C12/T4 backoff parity with the reference's two-leg linear + exponential
  * scheme (`Services/OpcSubscribeService.cs:873-957`).
  */
class RetryPolicySpec extends AnyFunSuite {

  test("TCP leg: flat 30s through iteration 99, then +5.7s/iter, clamped at 600s") {
    val b = new RetryPolicy.Backoff
    val delays = (1 to 230).map(_ => b.tcpFailed())
    assert(delays(0) == 30.0)
    assert(delays(98) == 30.0)                       // iteration 99 still flat
    assert(math.abs(delays(100) - 35.7) < 1e-6)      // leg-2 slope kicks in
    assert(math.abs(delays(150) - (30.0 + 51 * 5.7)) < 1e-6)
    assert(delays(205) == 600.0)                     // clamped
    assert(delays(229) == 600.0)
  }

  test("OPC leg: exponential 1,2,4,8; reset on TCP drop resets both legs") {
    val b = new RetryPolicy.Backoff
    assert((1 to 4).map(_ => b.opcFailed()) == Seq(1, 2, 4, 8))
    (1 to 150).foreach(_ => b.tcpFailed())
    b.tcpDropped()
    assert(b.opcFailed() == 1)
    assert(b.tcpFailed() == 30.0)
  }
}
