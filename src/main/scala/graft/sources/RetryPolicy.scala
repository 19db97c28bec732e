package graft.sources

/** C12/T4 — connector-internal reconnect backoff (SURVEY.md §2.7, §2.8;
  * reference `Services/OpcSubscribeService.cs:848-957`). Two coupled legs:
  *
  *  - TCP probe delay: starts at 30 s and stays flat through iteration 99
  *    (the first leg's slope is (30−30)/(100−1) = 0), then climbs
  *    (600−30)/(200−100) = 5.7 s per iteration, clamping at 600 s from
  *    iteration 200 on.
  *  - OPC UA connect delay: exponential 1, 2, 4, … s, reset to 1 s whenever
  *    TCP connectivity drops (which also resets the TCP leg).
  *
  * Pure driver-side state — not a DataFrame op. The streaming source uses
  * it between `planInputPartitions` failures; Structured Streaming's own
  * restart handles query-level failures above it.
  */
object RetryPolicy {
  val BaseDelaySeconds = 30.0
  val Leg1Iterations = 100
  val Leg1Seconds = 30.0
  val Leg2Iterations = 200
  val Leg2Seconds = 600.0

  private val leg1Slope = (Leg1Seconds - BaseDelaySeconds) / (Leg1Iterations - 1)
  private val leg2Slope = (Leg2Seconds - Leg1Seconds) / (Leg2Iterations - Leg1Iterations)

  /** The delay AFTER probe `iteration` (1-based), mirroring the reference's
    * iterative accumulation: clamp at leg-2 end, add the active leg's slope
    * otherwise.
    */
  def nextTcpDelaySeconds(current: Double, iteration: Int): Double =
    if (iteration >= Leg2Iterations) Leg2Seconds
    else if (iteration >= Leg1Iterations) current + leg2Slope
    else current + leg1Slope

  /** OPC UA connect retry: double each attempt. */
  def nextOpcDelaySeconds(current: Int): Int = current * 2

  /** Mutable backoff state machine for one server connection. */
  final class Backoff {
    private var tcpDelay = BaseDelaySeconds
    private var tcpIteration = 1
    private var opcDelay = 1

    /** Delay to sleep before the next TCP probe; advances the leg state. */
    def tcpFailed(): Double = {
      val d = tcpDelay
      tcpDelay = nextTcpDelaySeconds(tcpDelay, tcpIteration)
      tcpIteration += 1
      d
    }

    /** Delay to sleep before the next OPC UA attempt; doubles for next time. */
    def opcFailed(): Int = {
      val d = opcDelay
      opcDelay = nextOpcDelaySeconds(opcDelay)
      d
    }

    /** TCP connectivity dropped: both legs restart (reference `:925-929`). */
    def tcpDropped(): Unit = {
      opcDelay = 1
      tcpDelay = BaseDelaySeconds
      tcpIteration = 1
    }
  }
}
