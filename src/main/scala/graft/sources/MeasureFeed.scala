package graft.sources

/** The protocol boundary of the connector: what an OPC UA client session
  * delivers (reference `Services/OpcSubscribeService.cs:522-598` — each
  * monitored item dequeues (value, status, SourceTimestamp) tuples).
  *
  * The real implementation would wrap an OPC UA client (endpoint
  * discovery, session create with retry, monitored items with
  * SamplingInterval=5000/QueueSize=10/DiscardOldest — reference
  * `Services/OpcSubscribeService.cs:218-244` and
  * `Helpers/OpcuaHelperFunctions.cs:72-136`). No OPC UA library ships in
  * this environment, so [[SimulatedFeed]] is the deterministic stand-in;
  * the Spark-side plumbing (offsets, partitions, admission) is real and is
  * what the DataSource V2 contract exercises. The connection LIFECYCLE —
  * sockets, handshake, drops, backoff reconnect, idempotent resume — is
  * real too: see [[FeedTransport.SocketMeasureFeed]].
  */
trait MeasureFeed extends Serializable {

  /** Newest available sequence number (exclusive upper bound). The feed is
    * an append-only log: element `i` is fully determined by `i`, which is
    * what makes offsets replayable (same range ⇒ same rows after restart).
    */
  def latest(): Long

  /** Value at sequence `i` as (device, measure, value, epochMicros, ok). */
  def at(i: Long): (String, String, Double, Long, Boolean)
}

/** Deterministic simulated feed: `nDevices` devices × `nMeasures`
  * measures, one value per (tick, device, measure), `intervalMicros`
  * between ticks starting at `startMicros`. Every 10th k is a bad-status
  * value (same convention as Tables.measures). `available` grows as the
  * caller advances `clockTicks` — tests control time explicitly.
  */
final class SimulatedFeed(
    nDevices: Int,
    nMeasures: Int,
    startMicros: Long,
    intervalMicros: Long,
    @volatile var clockTicks: Long) extends MeasureFeed {

  private val perTick = nDevices.toLong * nMeasures

  override def latest(): Long = clockTicks * perTick

  override def at(i: Long): (String, String, Double, Long, Boolean) = {
    val tick = i / perTick
    val slot = i % perTick
    val dev = slot / nMeasures
    val m = slot % nMeasures
    val k = (i * 2654435761L) % 1000 // Knuth hash → pseudo-random but pure
    (s"dev-$dev", s"m$m", (k % 997).toDouble / 10.0,
      startMicros + tick * intervalMicros, k % 10 != 0)
  }
}
