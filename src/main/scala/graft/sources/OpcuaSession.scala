package graft.sources

import java.io.{InputStream, OutputStream}
import OpcuaFraming._

/** OPC UA Part 4 session + subscription services in Part 6 binary over
  * the [[OpcuaFraming]] secure channel — the service layer the
  * reference's client drives (`Helpers/OpcuaHelperFunctions.cs:72-136`
  * session create, `Services/OpcSubscribeService.cs:218-244` monitored
  * items, `:522-598` notification handling), implemented from the
  * published spec with no library:
  *
  *  - CreateSession / ActivateSession (anonymous identity token as an
  *    ExtensionObject) / CloseSession,
  *  - Read (ReadValueId → DataValue),
  *  - CreateSubscription / CreateMonitoredItems (ReadValueId +
  *    MonitoringParameters incl. the reference's QueueSize/DiscardOldest)
  *    / Publish (NotificationMessage → DataChangeNotification →
  *    MonitoredItemNotification per item),
  *  - the composite encodings they need: generic NodeIds (two-byte /
  *    four-byte / numeric / string forms), LocalizedText, QualifiedName,
  *    ExtensionObject, Variant (scalar Double), DataValue with
  *    value/status/sourceTimestamp mask.
  *
  * Monitored items address feed points as string NodeIds
  * `ns=2;s=<device>/<measure>`; Publish delivers every value the feed
  * appended since the last publish for the subscribed items, per-item
  * bounded by QueueSize with DiscardOldest — the reference's T6 queue
  * semantics expressed on the wire. Simplifications, stated: the server
  * returns a null ServerEndpoints array from CreateSession (no
  * GetEndpoints discovery — the client already holds the endpoint, as
  * the reference does after its own discovery), signatures/certificates
  * are null ByteStrings (SecurityPolicy None), and sessions live with
  * their connection.
  */
object OpcuaSession {

  // ns-0 numeric ids of the binary-encoded service structs (NodeIds CSV)
  val CreateSessionRequestId = 461
  val CreateSessionResponseId = 464
  val ActivateSessionRequestId = 467
  val ActivateSessionResponseId = 470
  val CloseSessionRequestId = 473
  val CloseSessionResponseId = 476
  val ReadRequestId = 631
  val ReadResponseId = 634
  val CreateSubscriptionRequestId = 787
  val CreateSubscriptionResponseId = 790
  val CreateMonitoredItemsRequestId = 751
  val CreateMonitoredItemsResponseId = 754
  val PublishRequestId = 826
  val PublishResponseId = 829
  val ServiceFaultId = 397
  val AnonymousIdentityTokenId = 321
  val DataChangeNotificationId = 811

  val AttributeValue = 13L // AttributeId of the Value attribute
  val VariantDouble = 0x0B // built-in type id of Double

  /** Server-revised ceiling on a monitored item's queue. The wire carries
    * QueueSize as UInt32 and clients conventionally send 0xFFFFFFFF for
    * "max" — the server revises it down (Part 4 allows this, and the
    * revised size goes back in the CreateMonitoredItems result) so the
    * per-item queue stays a sane in-memory bound and the Int arithmetic
    * below can never wrap negative.
    */
  val MaxQueueSize = 65536L
  val BadSessionIdInvalid = 0x80250000L
  val BadSubscriptionIdInvalid = 0x80280000L
  val BadNodeIdUnknown = 0x80340000L
  val BadAttributeIdInvalid = 0x80350000L

  /** Generic NodeId (Part 6 §5.2.2.9): numeric or string identifier. */
  final case class NodeIdT(ns: Int, numeric: Long = -1L, string: String = null) {
    def isString: Boolean = string != null
  }
  object NodeIdT {
    val Null: NodeIdT = NodeIdT(0, 0L)
    def point(device: String, measure: String): NodeIdT = NodeIdT(2, string = s"$device/$measure")
  }

  def writeNodeId(w: BufWriter, n: NodeIdT): BufWriter =
    if (n.isString) { w.u8(0x03).u8(n.ns & 0xFF).u8(n.ns >> 8).str(n.string) }
    else if (n.ns == 0 && n.numeric <= 255) w.u8(0x00).u8(n.numeric.toInt)
    else if (n.ns <= 255 && n.numeric <= 65535) {
      w.u8(0x01).u8(n.ns).u8((n.numeric & 0xFF).toInt).u8(((n.numeric >> 8) & 0xFF).toInt)
    } else { w.u8(0x02).u8(n.ns & 0xFF).u8(n.ns >> 8).u32(n.numeric) }

  def readNodeIdT(r: BufReader): NodeIdT = r.u8() match {
    case 0x00 => NodeIdT(0, r.u8())
    case 0x01 => val ns = r.u8(); NodeIdT(ns, r.u8() | (r.u8() << 8))
    case 0x02 => val ns = r.u8() | (r.u8() << 8); NodeIdT(ns, r.u32())
    case 0x03 => val ns = r.u8() | (r.u8() << 8); NodeIdT(ns, string = r.str())
    case m => throw new FramingViolation(f"unsupported NodeId encoding 0x$m%02x")
  }

  /** LocalizedText: mask bit0 = locale present, bit1 = text present. */
  def writeLocalizedText(w: BufWriter, text: String): BufWriter =
    if (text == null) w.u8(0x00) else { w.u8(0x02); w.str(text) }
  def readLocalizedText(r: BufReader): String = {
    val mask = r.u8()
    if ((mask & 0x01) != 0) r.str()
    if ((mask & 0x02) != 0) r.str() else null
  }

  def writeQualifiedName(w: BufWriter, ns: Int, name: String): BufWriter = {
    w.u8(ns & 0xFF).u8(ns >> 8).str(name)
  }
  def readQualifiedName(r: BufReader): (Int, String) = {
    val ns = r.u8() | (r.u8() << 8); (ns, r.str())
  }

  /** ExtensionObject: TypeId + encoding byte (0x00 none / 0x01 body). */
  def writeExtensionObject(w: BufWriter, typeId: Int, body: Array[Byte]): BufWriter = {
    writeNodeId(w, NodeIdT(0, typeId))
    if (body == null) w.u8(0x00)
    else { w.u8(0x01); w.i32(body.length); w.raw(body) }
  }
  def writeNullExtensionObject(w: BufWriter): BufWriter = { w.u8(0x00).u8(0x00).u8(0x00); w }
  def readExtensionObject(r: BufReader): (NodeIdT, Array[Byte]) = {
    val id = readNodeIdT(r)
    r.u8() match {
      case 0x00 => (id, null)
      case 0x01 =>
        val len = r.i32()
        val b = new Array[Byte](math.max(0, len))
        var i = 0; while (i < len) { b(i) = r.u8().toByte; i += 1 }
        (id, b)
      case m => throw new FramingViolation(f"ExtensionObject encoding 0x$m%02x unsupported")
    }
  }

  /** One measured value as the wire carries it. */
  final case class WireValue(value: Double, statusGood: Boolean, sourceMicros: Long)

  /** DataValue: mask 0x01 value | 0x02 status (only when not Good) |
    * 0x04 sourceTimestamp; value is a scalar-Double Variant.
    */
  def writeDataValue(w: BufWriter, v: WireValue): BufWriter = {
    val mask = 0x01 | (if (v.statusGood) 0 else 0x02) | 0x04
    w.u8(mask)
    w.u8(VariantDouble).f64(v.value)
    if (!v.statusGood) w.u32(0x80000000L) // Bad
    w.i64(toFiletime(v.sourceMicros / 1000) + (v.sourceMicros % 1000) * 10)
  }
  def readDataValue(r: BufReader): WireValue = {
    val mask = r.u8()
    var value = Double.NaN
    if ((mask & 0x01) != 0) {
      val vt = r.u8()
      if (vt != VariantDouble) throw new FramingViolation(s"unexpected variant type $vt")
      value = r.f64()
    }
    val good = if ((mask & 0x02) != 0) { r.u32(); false } else true
    val micros = if ((mask & 0x04) != 0) {
      val ft = r.i64(); (ft / 10000L - 11644473600000L) * 1000 + (ft % 10000) / 10
    } else 0L
    if ((mask & 0x08) != 0) r.i64() // serverTimestamp, unused
    (WireValue(value, good, micros))
  }

  private def writeResponseHeader(w: BufWriter, epochMillis: Long, handle: Long,
                                  status: Long): BufWriter = {
    w.i64(toFiletime(epochMillis)).u32(handle).u32(status)
    w.u8(0x00)      // ServiceDiagnostics
    w.i32(-1)       // StringTable
    w.u8(0x00).u8(0x00).u8(0x00) // AdditionalHeader
  }
  private def readResponseHeader(r: BufReader): (Long, Long) = {
    r.i64()
    val handle = r.u32(); val status = r.u32()
    r.u8(); r.i32(); readNodeIdT(r); r.u8()
    (handle, status)
  }

  /** RequestHeader with a REAL auth token (Part 4 §7.33). */
  private def writeRequestHeader(w: BufWriter, authToken: NodeIdT,
                                 epochMillis: Long, handle: Long): BufWriter = {
    writeNodeId(w, authToken)
    w.i64(toFiletime(epochMillis)).u32(handle).u32(0L).str(null).u32(0L)
    w.u8(0x00).u8(0x00).u8(0x00)
  }
  private def readRequestHeader(r: BufReader): (NodeIdT, Long) = {
    val tok = readNodeIdT(r)
    r.i64()
    val handle = r.u32()
    r.u32(); r.str(); r.u32(); readNodeIdT(r); r.u8()
    (tok, handle)
  }

  // --------------------------------------------------------------- server

  private final case class Item(monitoredItemId: Long, clientHandle: Long,
                                device: String, measure: String, queueSize: Long)
  private final case class Subscription(id: Long, publishingIntervalMs: Double,
                                        var items: Vector[Item],
                                        var delivered: Long, // feed position already published
                                        var notifSeq: Long)

  /** Per-connection service handler bridging the session/subscription
    * services onto a [[MeasureFeed]]. Returns the response BODY writer
    * for each TypeId-addressed request.
    */
  final class SessionServices(feed: MeasureFeed, clock: () => Long) {
    private var sessionToken: NodeIdT = _
    private var activated = false
    private var nextTokenId = 1000L
    private var nextSubId = 1L
    private var nextItemId = 1L
    private val subs = scala.collection.mutable.Map.empty[Long, Subscription]

    private def requireSession(tok: NodeIdT): Unit =
      if (sessionToken == null || tok != sessionToken || !activated)
        throw new OpcuaError(BadSessionIdInvalid, "no activated session for this token")

    /** The feed log IS the address space: the set of points that ever
      * produced a value, each with its latest value. Maintained as an
      * incremental index — one forward scan catches up from the last
      * indexed position, so existence checks and Reads are O(1) after the
      * first touch and O(new rows) thereafter, with memory bounded by the
      * number of DISTINCT points (not log length). Built lazily: the bulk
      * LATEST/GET/RANGE path never pays for it.
      */
    private val latestIdx = scala.collection.mutable.Map.empty[(String, String), WireValue]
    private var indexedTo = 0L
    private def refreshIndex(): Unit = {
      val hi = feed.latest()
      while (indexedTo < hi) {
        val (d, m, v, micros, ok) = feed.at(indexedTo)
        latestIdx((d, m)) = WireValue(v, ok, micros)
        indexedTo += 1
      }
    }

    private def latestOf(device: String, measure: String): Option[WireValue] = {
      refreshIndex()
      latestIdx.get((device, measure))
    }

    /** Resolve a point NodeId string `<device>/<measure>` against the
      * address space. Device names may themselves contain '/', so every
      * split position is tried left-to-right and the first one naming an
      * EXISTING point wins — a pure prefix split would make any point
      * under a slashed device name unresolvable.
      */
    private def resolvePoint(s: String): Option[(String, String)] = {
      refreshIndex()
      var i = s.indexOf('/')
      while (i >= 0) {
        val d = s.substring(0, i)
        val m = s.substring(i + 1)
        if (latestIdx.contains((d, m))) return Some((d, m))
        i = s.indexOf('/', i + 1)
      }
      None
    }

    /** Dispatch one TypeId-addressed service body; writes the response
      * body (TypeId + struct) into `w`.
      */
    def handle(typeId: Int, r: BufReader, w: BufWriter): Unit = typeId match {
      case CreateSessionRequestId =>
        val (_, handle) = readRequestHeader(r)
        // ClientDescription(ApplicationDescription), serverUri, endpointUrl,
        // sessionName, clientNonce, clientCertificate, timeout, maxRespSize
        r.str(); r.str(); readLocalizedText(r); r.u32(); r.str(); r.str()
        val nUrls = r.i32(); (0 until math.max(0, nUrls)).foreach(_ => r.str())
        r.str(); r.str(); r.str(); r.i32() match { case n if n > 0 => (0 until n).foreach(_ => r.u8()); case _ => }
        r.i32() match { case n if n > 0 => (0 until n).foreach(_ => r.u8()); case _ => }
        val requestedTimeout = r.f64(); r.u32()
        sessionToken = NodeIdT(0, nextTokenId)
        nextTokenId += 1
        activated = false
        writeNodeId(w, NodeIdT(0, CreateSessionResponseId))
        writeResponseHeader(w, clock(), handle, GoodStatus)
        writeNodeId(w, NodeIdT(1, 10000L))  // SessionId
        writeNodeId(w, sessionToken)        // AuthenticationToken
        w.f64(math.max(10000.0, requestedTimeout))
        w.i32(-1).i32(-1)                   // ServerNonce, ServerCertificate
        w.i32(-1)                           // ServerEndpoints: null (no discovery here)
        w.i32(-1)                           // ServerSoftwareCertificates
        w.str(null).i32(-1)                 // ServerSignature{algorithm, signature}
        w.u32(0L)                           // MaxRequestMessageSize (no limit)

      case ActivateSessionRequestId =>
        val (tok, handle) = readRequestHeader(r)
        if (sessionToken == null || tok != sessionToken)
          throw new OpcuaError(BadSessionIdInvalid, "unknown session token")
        r.str(); r.i32()                    // ClientSignature
        r.i32()                             // ClientSoftwareCertificates (null)
        val nLoc = r.i32(); (0 until math.max(0, nLoc)).foreach(_ => r.str())
        val (identId, _) = readExtensionObject(r)
        if (identId.numeric != AnonymousIdentityTokenId)
          throw new OpcuaError(BadSecurityChecksFailed, s"only anonymous identity (got $identId)")
        r.str(); r.i32()                    // UserTokenSignature
        activated = true
        writeNodeId(w, NodeIdT(0, ActivateSessionResponseId))
        writeResponseHeader(w, clock(), handle, GoodStatus)
        w.i32(-1).i32(-1).i32(-1)           // ServerNonce, Results, DiagnosticInfos

      case CloseSessionRequestId =>
        val (tok, handle) = readRequestHeader(r)
        requireSession(tok)
        r.bool()                            // DeleteSubscriptions
        subs.clear(); activated = false; sessionToken = null
        writeNodeId(w, NodeIdT(0, CloseSessionResponseId))
        writeResponseHeader(w, clock(), handle, GoodStatus)

      case ReadRequestId =>
        val (tok, handle) = readRequestHeader(r)
        requireSession(tok)
        r.f64(); r.u32()                    // MaxAge, TimestampsToReturn
        val n = r.i32()
        val nodes = (0 until math.max(0, n)).map { _ =>
          val nid = readNodeIdT(r)
          val attr = r.u32()
          r.str()                           // IndexRange
          readQualifiedName(r)              // DataEncoding
          (nid, attr)
        }
        writeNodeId(w, NodeIdT(0, ReadResponseId))
        writeResponseHeader(w, clock(), handle, GoodStatus)
        w.i32(nodes.length)
        nodes.foreach { case (nid, attr) =>
          // only the Value attribute is served — any other attribute id
          // answers BadAttributeIdInvalid (the node may well exist);
          // BadNodeIdUnknown is reserved for nodes the address space
          // genuinely lacks, so a conforming client can tell the cases
          // apart and retry with the right attribute
          if (attr != AttributeValue) {
            w.u8(0x02).u32(BadAttributeIdInvalid) // status-only DataValue
          } else {
            val v =
              if (!nid.isString) None
              else resolvePoint(nid.string).flatMap { case (d, m) => latestOf(d, m) }
            v match {
              case Some(wv) => writeDataValue(w, wv)
              case None => w.u8(0x02).u32(BadNodeIdUnknown)
            }
          }
        }
        w.i32(-1)                           // DiagnosticInfos

      case CreateSubscriptionRequestId =>
        val (tok, handle) = readRequestHeader(r)
        requireSession(tok)
        val interval = r.f64()
        r.u32(); r.u32(); r.u32(); r.bool(); r.u8()
        val sub = Subscription(nextSubId, math.max(100.0, interval), Vector.empty,
          delivered = feed.latest(), notifSeq = 1L)
        subs(sub.id) = sub
        nextSubId += 1
        writeNodeId(w, NodeIdT(0, CreateSubscriptionResponseId))
        writeResponseHeader(w, clock(), handle, GoodStatus)
        w.u32(sub.id).f64(sub.publishingIntervalMs).u32(10000L).u32(10L)

      case CreateMonitoredItemsRequestId =>
        val (tok, handle) = readRequestHeader(r)
        requireSession(tok)
        val subId = r.u32()
        val sub = subs.getOrElse(subId,
          throw new OpcuaError(BadSubscriptionIdInvalid, s"subscription $subId"))
        r.u32()                             // TimestampsToReturn
        val n = r.i32()
        val results = (0 until math.max(0, n)).map { _ =>
          val nid = readNodeIdT(r)
          val attr = r.u32()
          r.str(); readQualifiedName(r)
          r.u32()                           // MonitoringMode
          val clientHandle = r.u32()
          val sampling = r.f64()
          readExtensionObject(r)            // Filter
          val queueSize = r.u32()
          r.bool()                          // DiscardOldest (only mode served)
          // a well-formed point NodeId must also EXIST in the address
          // space — the feed log is the namespace, so a point that never
          // produced a value is unknown (reference parity: monitored
          // items are created against browsed nodes). QueueSize is
          // revised into [1, MaxQueueSize]: 0 means "default of 1" per
          // Part 4, and the UInt32 "max" convention (0xFFFFFFFF) must not
          // wrap the Int arithmetic the queue cap uses.
          val point =
            if (attr == AttributeValue && nid.isString) resolvePoint(nid.string) else None
          point match {
            case Some((d, m)) =>
              val revisedQueue = math.max(1L, math.min(queueSize, MaxQueueSize))
              val item = Item(nextItemId, clientHandle, d, m, revisedQueue)
              nextItemId += 1
              sub.items :+= item
              (GoodStatus, item.monitoredItemId, sampling, item.queueSize)
            case None => (BadNodeIdUnknown, 0L, sampling, queueSize)
          }
        }
        writeNodeId(w, NodeIdT(0, CreateMonitoredItemsResponseId))
        writeResponseHeader(w, clock(), handle, GoodStatus)
        w.i32(results.length)
        results.foreach { case (st, id, sampling, qs) =>
          w.u32(st).u32(id).f64(sampling).u32(qs)
          writeNullExtensionObject(w)       // FilterResult
        }
        w.i32(-1)

      case PublishRequestId =>
        val (tok, handle) = readRequestHeader(r)
        requireSession(tok)
        val nAcks = r.i32()
        (0 until math.max(0, nAcks)).foreach { _ => r.u32(); r.u32() }
        if (subs.isEmpty)
          throw new OpcuaError(BadSubscriptionIdInvalid, "no subscription")
        val hi = feed.latest()
        // Part 4: a Publish answers for a subscription that HAS pending
        // notifications; serving an arbitrary one would starve the rest.
        // Among ready subscriptions the lowest id wins (deterministic);
        // when none is ready, the lowest id answers a keep-alive-shaped
        // empty notification.
        val ordered = subs.values.toSeq.sortBy(_.id)
        val sub = ordered.find(s => s.items.nonEmpty && s.delivered < hi)
          .getOrElse(ordered.head)
        // every appended value since the last publish, per-item bounded
        // by QueueSize keeping the NEWEST (DiscardOldest=true — T6).
        // Queues key on monitoredItemId — the SERVER-assigned identity —
        // never on clientHandle, which the client chooses and may
        // duplicate across items (two items sharing a handle must still
        // hold separate queues with separate caps).
        val perItem = scala.collection.mutable.Map.empty[Long, Vector[WireValue]]
        var i = sub.delivered
        while (i < hi) {
          val (d, m, v, micros, ok) = feed.at(i)
          sub.items.foreach { it =>
            if (it.device == d && it.measure == m) {
              val q = perItem.getOrElse(it.monitoredItemId, Vector.empty) :+ WireValue(v, ok, micros)
              perItem(it.monitoredItemId) = q.takeRight(it.queueSize.toInt)
            }
          }
          i += 1
        }
        sub.delivered = hi
        // emit in item-creation order; the wire carries the clientHandle
        val notifs: Seq[(Long, WireValue)] = sub.items.flatMap { it =>
          perItem.getOrElse(it.monitoredItemId, Vector.empty).map(v => (it.clientHandle, v))
        }
        // DataChangeNotification body (rides in an ExtensionObject)
        val dcn = new BufWriter(64 + 32 * notifs.length)
        dcn.i32(notifs.length)
        notifs.foreach { case (h, v) => dcn.u32(h); writeDataValue(dcn, v) }
        dcn.i32(-1)
        writeNodeId(w, NodeIdT(0, PublishResponseId))
        writeResponseHeader(w, clock(), handle, GoodStatus)
        w.u32(sub.id)
        w.i32(-1)                           // AvailableSequenceNumbers
        w.bool(false)                       // MoreNotifications
        w.u32(sub.notifSeq)                 // NotificationMessage.SequenceNumber
        sub.notifSeq += 1
        w.i64(toFiletime(clock()))
        w.i32(1)                            // one notification: the DCN
        writeExtensionObject(w, DataChangeNotificationId, dcn.result())
        w.i32(-1).i32(-1)                   // Results, DiagnosticInfos

      case other =>
        throw new OpcuaError(BadServiceUnsupported, s"service typeId $other")
    }
  }

  /** ServiceFault response body: just a ResponseHeader with the bad
    * ServiceResult — a request-level failure that leaves the channel
    * open, unlike a Part 6 ERR frame. Correlation stays at the MSG
    * RequestId layer (the fault can't know the request handle when the
    * header itself failed to validate).
    */
  def serviceFaultBody(epochMillis: Long, status: Long): Array[Byte] = {
    val w = new BufWriter(64)
    writeNodeId(w, NodeIdT(0, ServiceFaultId))
    writeResponseHeader(w, epochMillis, 0L, status)
    w.result()
  }

  // --------------------------------------------------------------- client

  /** Minimal session client over an established HEL/ACK/OPN connection's
    * streams ([[FeedTransport.SocketMeasureFeed]] owns connection
    * lifecycle for the bulk path; this client owns its own socket for
    * the session/subscription path — see OpcuaSessionSpec).
    */
  final class SessionClient(host: String, port: Int, timeoutMs: Int = 30000) extends AutoCloseable {
    private val sock = new java.net.Socket()
    private val limits = DefaultLimits
    private var requestId = 1L // the OPN consumed RequestId 1
    private var authToken: NodeIdT = NodeIdT.Null

    // connect + HEL → ACK → OPN (shared client half). A constructor that
    // throws leaves no object for callers to close, so the socket must be
    // released HERE on any handshake failure — otherwise each failed
    // construction leaks a connected socket.
    private val (in, out, channel) =
      try {
        sock.connect(new java.net.InetSocketAddress(host, port), timeoutMs)
        sock.setSoTimeout(timeoutMs)
        val i = new java.io.BufferedInputStream(sock.getInputStream, 1 << 16)
        val o = new java.io.BufferedOutputStream(sock.getOutputStream, 1 << 16)
        val ch = openClientChannel(i, o, limits, s"opc.tcp://$host:$port/graft",
          System.currentTimeMillis())
        (i, o, ch)
      } catch {
        case e: Throwable =>
          try sock.close() catch { case _: Exception => () }
          throw e
      }

    private def call(encodeBody: BufWriter => Unit): BufReader = {
      requestId += 1
      val mw = new MessageWriter(out, channel.sendSeq, requestId,
        channel.negotiated.receiveBufferSize, channel.negotiated.maxChunkCount,
        channel.token.channelId, channel.token.tokenId)
      val w = new BufWriter(256)
      encodeBody(w)
      mw.raw(w.result()); mw.finish()
      val (rid, body) = readMessage(in, channel.recvSeq, channel.readLimits,
        channel.token.channelId, channel.token.tokenId)
      if (rid != requestId) // a desynced stream must fail loudly, never
        throw new FramingViolation( // decode another request's response
          s"response for request $rid, expected $requestId")
      val r = new BufReader(body)
      val typeId = readNodeIdT(r).numeric.toInt
      val (_, status) = readResponseHeader(r)
      if (typeId == ServiceFaultId || status != GoodStatus)
        throw new OpcuaError(status, "service fault")
      r
    }

    def createSession(sessionName: String): Unit = {
      val r = call { w =>
        writeNodeId(w, NodeIdT(0, CreateSessionRequestId))
        writeRequestHeader(w, NodeIdT.Null, System.currentTimeMillis(), requestId)
        // ApplicationDescription
        w.str("urn:graft:client").str("urn:graft")
        writeLocalizedText(w, "graft")
        w.u32(1L)                           // ApplicationType Client
        w.str(null).str(null).i32(-1)
        w.str(null)                         // ServerUri
        w.str(s"opc.tcp://$host:$port/graft")
        w.str(sessionName)
        w.i32(-1).i32(-1)                   // ClientNonce, ClientCertificate
        w.f64(3600000.0).u32(0L)
      }
      readNodeIdT(r)                        // SessionId
      authToken = readNodeIdT(r)            // AuthenticationToken
      r.f64()                               // RevisedSessionTimeout
    }

    def activateSession(): Unit = {
      call { w =>
        writeNodeId(w, NodeIdT(0, ActivateSessionRequestId))
        writeRequestHeader(w, authToken, System.currentTimeMillis(), requestId)
        w.str(null).i32(-1)                 // ClientSignature
        w.i32(-1)                           // ClientSoftwareCertificates
        w.i32(-1)                           // LocaleIds
        val anon = new BufWriter(16).str("anonymous")
        writeExtensionObject(w, AnonymousIdentityTokenId, anon.result())
        w.str(null).i32(-1)                 // UserTokenSignature
      }
      ()
    }

    def read(points: Seq[(String, String)]): Seq[Option[WireValue]] = {
      val r = call { w =>
        writeNodeId(w, NodeIdT(0, ReadRequestId))
        writeRequestHeader(w, authToken, System.currentTimeMillis(), requestId)
        w.f64(0.0).u32(0L)
        w.i32(points.length)
        points.foreach { case (d, m) =>
          writeNodeId(w, NodeIdT.point(d, m))
          w.u32(AttributeValue)
          w.str(null)
          writeQualifiedName(w, 0, null)
        }
      }
      val n = r.i32()
      (0 until n).map { _ =>
        val v = readDataValue(r)
        if (v.value.isNaN && !v.statusGood) None else Some(v)
      }
    }

    /** Read ONE attribute of each node, returning the raw per-node status
      * code (GoodStatus when a value came back) — the diagnostic surface
      * [[read]] folds into Option: BadAttributeIdInvalid and
      * BadNodeIdUnknown are distinct answers a conforming client reacts
      * to differently.
      */
    def readAttributeStatus(points: Seq[(String, String)], attributeId: Long): Seq[Long] = {
      val r = call { w =>
        writeNodeId(w, NodeIdT(0, ReadRequestId))
        writeRequestHeader(w, authToken, System.currentTimeMillis(), requestId)
        w.f64(0.0).u32(0L)
        w.i32(points.length)
        points.foreach { case (d, m) =>
          writeNodeId(w, NodeIdT.point(d, m))
          w.u32(attributeId)
          w.str(null)
          writeQualifiedName(w, 0, null)
        }
      }
      val n = r.i32()
      (0 until n).map { _ =>
        val mask = r.u8()
        if ((mask & 0x01) != 0) { val vt = r.u8(); if (vt == VariantDouble) r.f64() }
        val status = if ((mask & 0x02) != 0) r.u32() else GoodStatus
        if ((mask & 0x04) != 0) r.i64()
        if ((mask & 0x08) != 0) r.i64()
        status
      }
    }

    def createSubscription(publishingIntervalMs: Double): Long = {
      val r = call { w =>
        writeNodeId(w, NodeIdT(0, CreateSubscriptionRequestId))
        writeRequestHeader(w, authToken, System.currentTimeMillis(), requestId)
        w.f64(publishingIntervalMs).u32(10000L).u32(10L).u32(0L).bool(true).u8(0)
      }
      r.u32()
    }

    /** Returns (statusCode, monitoredItemId, revisedQueueSize) per item. */
    def createMonitoredItems(subscriptionId: Long,
                             items: Seq[(Long, String, String, Long)]): Seq[(Long, Long, Long)] = {
      val r = call { w =>
        writeNodeId(w, NodeIdT(0, CreateMonitoredItemsRequestId))
        writeRequestHeader(w, authToken, System.currentTimeMillis(), requestId)
        w.u32(subscriptionId).u32(0L)
        w.i32(items.length)
        items.foreach { case (clientHandle, d, m, queueSize) =>
          writeNodeId(w, NodeIdT.point(d, m))
          w.u32(AttributeValue).str(null)
          writeQualifiedName(w, 0, null)
          w.u32(2L)                         // MonitoringMode Reporting
          w.u32(clientHandle).f64(5000.0)
          writeNullExtensionObject(w)       // Filter
          w.u32(queueSize).bool(true)       // DiscardOldest — reference T6
        }
      }
      val n = r.i32()
      val out = (0 until n).map { _ =>
        val st = r.u32(); val id = r.u32(); r.f64(); val qs = r.u32()
        readExtensionObject(r)
        (st, id, qs)
      }
      r.i32()
      out
    }

    /** One Publish round-trip: (clientHandle, value) notifications. */
    def publish(): Seq[(Long, WireValue)] = {
      val r = call { w =>
        writeNodeId(w, NodeIdT(0, PublishRequestId))
        writeRequestHeader(w, authToken, System.currentTimeMillis(), requestId)
        w.i32(-1)                           // SubscriptionAcknowledgements
      }
      r.u32()                               // SubscriptionId
      val nAvail = r.i32(); (0 until math.max(0, nAvail)).foreach(_ => r.u32())
      r.bool()                              // MoreNotifications
      r.u32(); r.i64()                      // NotificationMessage seq, publishTime
      val nData = r.i32()
      val notifs = Vector.newBuilder[(Long, WireValue)]
      (0 until math.max(0, nData)).foreach { _ =>
        val (tid, body) = readExtensionObject(r)
        if (tid.numeric == DataChangeNotificationId && body != null) {
          val br = new BufReader(body)
          val n = br.i32()
          (0 until n).foreach(_ => notifs += ((br.u32(), readDataValue(br))))
          br.i32()
        }
      }
      r.i32(); r.i32()                      // Results, DiagnosticInfos
      notifs.result()
    }

    def closeSession(): Unit = {
      call { w =>
        writeNodeId(w, NodeIdT(0, CloseSessionRequestId))
        writeRequestHeader(w, authToken, System.currentTimeMillis(), requestId)
        w.bool(true)
      }
      ()
    }

    override def close(): Unit = {
      try {
        requestId += 1
        writeCloseRequest(out, channel.token, channel.sendSeq, requestId,
          System.currentTimeMillis())
      } catch { case _: Exception => () }
      try sock.close() catch { case _: Exception => () }
    }
  }
}
