package graft.sources

import java.io.{EOFException, InputStream, OutputStream}
import java.nio.charset.StandardCharsets

/** OPC UA Part 6 (Mappings) TCP transport framing — the public wire
  * specification the reference's client library speaks underneath
  * (`Helpers/OpcuaHelperFunctions.cs:72-136` opens the session whose bytes
  * this layer produces/consumes). Everything here is from the published
  * spec, no library required:
  *
  *  - §7.1.2.2 message header: 3-byte ASCII type (`HEL`/`ACK`/`ERR`/`MSG`)
  *    + 1-byte IsFinal (`F` final, `C` intermediate chunk, `A` abort) +
  *    UInt32 little-endian MessageSize counting the 8-byte header itself.
  *  - §7.1.2.3–7.1.2.5 HEL/ACK/ERR bodies (five UInt32 transport limits +
  *    length-prefixed EndpointUrl; UInt32 status code + Reason string).
  *  - §6.7.2 secure-conversation chunks: each MSG chunk carries
  *    SecureChannelId, a symmetric security header (TokenId) and a
  *    sequence header (SequenceNumber, RequestId); large bodies split at
  *    arbitrary byte boundaries into `C`…`C`,`F` chunks, sequence numbers
  *    strictly consecutive per direction, all chunks of one message under
  *    one RequestId.
  *  - §5.2 built-in type encodings: all integers little-endian, IEEE-754
  *    Double, String = Int32 byte length (−1 = null) + UTF-8 bytes,
  *    Boolean = single byte.
  *
  *  - §6.7 OPN/CLO secure-channel lifecycle with SecurityPolicy None:
  *    OpenSecureChannel(Issue) request/response — asymmetric security
  *    header (policy URI, null certificate/thumbprint), the Part 4
  *    Request/ResponseHeader structs, four-byte ns-0 NodeIds of the
  *    binary-encoded service types (i=446/449/452), FILETIME DateTimes —
  *    issuing the (SecureChannelId, TokenId) every subsequent MSG chunk
  *    carries; CLO for orderly shutdown.
  *
  * The Part 4 service layer above this channel — sessions, Read,
  * subscriptions with monitored items and Publish — lives in
  * [[OpcuaSession]]. This object covers SecurityPolicy None (plaintext
  * chunks); the Sign / SignAndEncrypt modes of Basic256Sha256 —
  * certificates, nonce exchange, P_SHA256 key derivation, chunk
  * signing/encryption — live in [[OpcuaCrypto]] + [[OpcuaSecure]] and
  * plug into the same frame/sequence discipline defined here.
  */
object OpcuaFraming {

  val ProtocolVersion = 0
  /** Part 6 §7.1.2.3: buffer sizes below 8192 shall be rejected. */
  val MinBufferSize = 8192
  /** Per-chunk overhead: 8B message header + 4B SecureChannelId + 4B
    * TokenId + 4B SequenceNumber + 4B RequestId.
    */
  val ChunkOverhead = 24

  // OPC UA status codes (public StatusCode CSV, Part 6 Table 55 error cases)
  val GoodStatus = 0x00000000L
  val BadTcpMessageTypeInvalid = 0x807E0000L
  val BadTcpMessageTooLarge = 0x80800000L
  val BadTcpInternalError = 0x80820000L
  val BadTcpEndpointUrlInvalid = 0x80830000L
  val BadProtocolVersionUnsupported = 0x80BE0000L
  val BadSequenceNumberInvalid = 0x80880000L
  val BadServiceUnsupported = 0x800B0000L
  val BadSecurityChecksFailed = 0x80130000L
  val BadSecureChannelIdInvalid = 0x80220000L
  val BadDecodingError = 0x80070000L

  /** The four transport limits negotiated by HEL/ACK (Part 6 §7.1.2.3):
    * `receiveBufferSize`/`sendBufferSize` bound single chunks (a sender
    * may not send a chunk larger than the RECEIVER's receive buffer),
    * `maxMessageSize` bounds a reassembled message body, `maxChunkCount`
    * bounds chunks per message; 0 = no limit for the latter two.
    */
  final case class Limits(receiveBufferSize: Int, sendBufferSize: Int,
                          maxMessageSize: Long, maxChunkCount: Long) {
    require(receiveBufferSize >= MinBufferSize && sendBufferSize >= MinBufferSize,
      s"Part 6 buffer sizes must be >= $MinBufferSize")
  }
  val DefaultLimits: Limits = Limits(65536, 65536, 64L * 1024 * 1024, 0L)

  final case class Hello(protocolVersion: Long, limits: Limits, endpointUrl: String)

  /** Server answered with an ERR message (Part 6 §7.1.2.5) — a
    * deterministic rejection; the connection is dead afterwards (the spec
    * makes ERR fatal) but the REQUEST must not be blindly retried.
    */
  final class OpcuaError(val code: Long, val reason: String)
    extends RuntimeException(f"ERR 0x$code%08X: $reason")

  /** The peer violated the framing contract (bad type, size, sequence…) —
    * indistinguishable from stream corruption, so callers treat it like
    * any I/O failure (teardown + reconnect).
    */
  final class FramingViolation(msg: String) extends java.io.IOException(msg)

  // ---------------------------------------------------------------- bytes

  /** Growable little-endian scratch buffer for §5.2 built-in encodings. */
  final class BufWriter(initial: Int = 256) {
    private var buf = new Array[Byte](math.max(16, initial))
    private var n = 0
    private def ensure(k: Int): Unit =
      if (n + k > buf.length) {
        val grown = new Array[Byte](math.max(buf.length * 2, n + k))
        System.arraycopy(buf, 0, grown, 0, n)
        buf = grown
      }
    def u8(v: Int): this.type = { ensure(1); buf(n) = v.toByte; n += 1; this }
    def u32(v: Long): this.type = {
      ensure(4)
      buf(n) = v.toByte; buf(n + 1) = (v >>> 8).toByte
      buf(n + 2) = (v >>> 16).toByte; buf(n + 3) = (v >>> 24).toByte
      n += 4; this
    }
    def i32(v: Int): this.type = u32(v.toLong & 0xFFFFFFFFL)
    def i64(v: Long): this.type = { u32(v & 0xFFFFFFFFL); u32(v >>> 32) }
    def f64(v: Double): this.type = i64(java.lang.Double.doubleToLongBits(v))
    def bool(v: Boolean): this.type = u8(if (v) 1 else 0)
    def str(s: String): this.type =
      if (s == null) i32(-1)
      else { val b = s.getBytes(StandardCharsets.UTF_8); i32(b.length); raw(b) }
    def raw(b: Array[Byte]): this.type = { ensure(b.length); System.arraycopy(b, 0, buf, n, b.length); n += b.length; this }
    def length: Int = n
    def result(): Array[Byte] = java.util.Arrays.copyOf(buf, n)
  }

  /** Little-endian reader over one reassembled body. */
  final class BufReader(b: Array[Byte]) {
    private var p = 0
    // `k > b.length - p`, NOT `p + k > b.length`: an attacker-controlled
    // length near Int.MaxValue would overflow the sum and slip past the
    // check (then crash outside the FramingViolation taxonomy)
    private def need(k: Int): Unit =
      if (k < 0 || k > b.length - p) throw new FramingViolation(
        s"truncated body: need $k bytes at offset $p of ${b.length}")
    def u8(): Int = { need(1); val v = b(p) & 0xFF; p += 1; v }
    def u32(): Long = {
      need(4)
      val v = (b(p) & 0xFFL) | ((b(p + 1) & 0xFFL) << 8) |
        ((b(p + 2) & 0xFFL) << 16) | ((b(p + 3) & 0xFFL) << 24)
      p += 4; v
    }
    def i32(): Int = u32().toInt
    def i64(): Long = { val lo = u32(); val hi = u32(); (hi << 32) | lo }
    def f64(): Double = java.lang.Double.longBitsToDouble(i64())
    def bool(): Boolean = u8() != 0
    /** Cursor position — the secured-OPN parser needs the byte offset
      * where the encrypted region starts.
      */
    def pos: Int = p
    def bytes(k: Int): Array[Byte] = {
      need(k)
      val out = java.util.Arrays.copyOfRange(b, p, p + k)
      p += k
      out
    }
    def str(): String = {
      val len = i32()
      if (len < 0) null
      else { need(len); val s = new String(b, p, len, StandardCharsets.UTF_8); p += len; s }
    }
    def remaining: Int = b.length - p
  }

  // --------------------------------------------------------------- frames

  private def readFully(in: InputStream, dst: Array[Byte], off: Int, len: Int): Unit = {
    var got = 0
    while (got < len) {
      val k = in.read(dst, off + got, len - got)
      if (k < 0) throw new EOFException("connection closed by peer")
      got += k
    }
  }

  /** One raw frame: (3-char type, IsFinal byte, body after the header). */
  def readFrame(in: InputStream, maxFrameSize: Int): (String, Char, Array[Byte]) = {
    val hdr = new Array[Byte](8)
    readFully(in, hdr, 0, 8)
    val tpe = new String(hdr, 0, 3, StandardCharsets.US_ASCII)
    val fin = (hdr(3) & 0xFF).toChar
    val size = (hdr(4) & 0xFFL) | ((hdr(5) & 0xFFL) << 8) |
      ((hdr(6) & 0xFFL) << 16) | ((hdr(7) & 0xFFL) << 24)
    if (size < 8 || size > maxFrameSize)
      throw new FramingViolation(s"frame size $size outside [8, $maxFrameSize]")
    val body = new Array[Byte](size.toInt - 8)
    readFully(in, body, 0, body.length)
    (tpe, fin, body)
  }

  def writeFrame(out: OutputStream, tpe: String, fin: Char, body: Array[Byte]): Unit = {
    require(tpe.length == 3)
    val w = new BufWriter(8 + body.length)
    w.raw(tpe.getBytes(StandardCharsets.US_ASCII)).u8(fin).u32(8L + body.length).raw(body)
    out.write(w.result())
  }

  // ------------------------------------------------- connection messages

  def encodeHello(h: Hello): Array[Byte] =
    new BufWriter(64)
      .u32(h.protocolVersion)
      .u32(h.limits.receiveBufferSize).u32(h.limits.sendBufferSize)
      .u32(h.limits.maxMessageSize).u32(h.limits.maxChunkCount)
      .str(h.endpointUrl)
      .result()

  def decodeHello(body: Array[Byte]): Hello = {
    val r = new BufReader(body)
    val ver = r.u32()
    val recv = r.u32(); val send = r.u32(); val maxMsg = r.u32(); val maxChunks = r.u32()
    val url = r.str()
    if (recv < MinBufferSize || send < MinBufferSize)
      throw new FramingViolation(s"HEL buffer sizes ($recv/$send) below Part 6 minimum")
    // UInt32 sizes ≥ 2³¹ would wrap negative in .toInt and detonate
    // Limits' require OUTSIDE the framing taxonomy (no ERR diagnostic)
    if (recv > Int.MaxValue || send > Int.MaxValue)
      throw new FramingViolation(s"HEL buffer sizes ($recv/$send) exceed supported range")
    // the Part 6 limit is 4096 BYTES — measure UTF-8 bytes, not UTF-16
    // chars (3000 CJK chars ≈ 9000 bytes would pass a char-count check)
    if (url != null && url.getBytes(StandardCharsets.UTF_8).length > 4096)
      throw new OpcuaError(BadTcpEndpointUrlInvalid, "EndpointUrl exceeds 4096 bytes")
    Hello(ver, Limits(recv.toInt, send.toInt, maxMsg, maxChunks), url)
  }

  def encodeAck(l: Limits): Array[Byte] =
    new BufWriter(20)
      .u32(ProtocolVersion)
      .u32(l.receiveBufferSize).u32(l.sendBufferSize)
      .u32(l.maxMessageSize).u32(l.maxChunkCount)
      .result()

  def decodeAck(body: Array[Byte]): Limits = {
    val r = new BufReader(body)
    r.u32() // server protocol version
    val recv = r.u32(); val send = r.u32(); val maxMsg = r.u32(); val maxChunks = r.u32()
    if (recv < MinBufferSize || send < MinBufferSize)
      throw new FramingViolation(s"ACK buffer sizes ($recv/$send) below Part 6 minimum")
    if (recv > Int.MaxValue || send > Int.MaxValue)
      throw new FramingViolation(s"ACK buffer sizes ($recv/$send) exceed supported range")
    Limits(recv.toInt, send.toInt, maxMsg, maxChunks)
  }

  def encodeError(code: Long, reason: String): Array[Byte] =
    new BufWriter(32).u32(code).str(reason).result()

  def decodeError(body: Array[Byte]): OpcuaError = {
    val r = new BufReader(body)
    new OpcuaError(r.u32(), Option(r.str()).getOrElse(""))
  }

  /** Part 6 §7.1.2.4 negotiation: the ACK revises each limit down to what
    * the server supports; a side's send ceiling is the OTHER side's
    * receive buffer, so the revised receive pairs with the hello's send
    * and vice versa. 0 stays "no limit" only if both sides say so.
    */
  def negotiate(server: Limits, hello: Limits): Limits = {
    def minLimit(a: Long, b: Long): Long =
      if (a == 0) b else if (b == 0) a else math.min(a, b)
    Limits(
      receiveBufferSize = math.min(server.receiveBufferSize, hello.sendBufferSize),
      sendBufferSize = math.min(server.sendBufferSize, hello.receiveBufferSize),
      maxMessageSize = minLimit(server.maxMessageSize, hello.maxMessageSize),
      maxChunkCount = minLimit(server.maxChunkCount, hello.maxChunkCount))
  }

  // ------------------------------------- OPN / CLO (SecurityPolicy None)

  val SecurityPolicyNoneUri = "http://opcfoundation.org/UA/SecurityPolicy#None"
  /** MessageSecurityMode enumeration (Part 4): None = 1. */
  val SecurityModeNone = 1L
  /** SecurityTokenRequestType: Issue = 0, Renew = 1. */
  val RequestTypeIssue = 0L
  val RequestTypeRenew = 1L
  // ns-0 numeric NodeIds of the binary-encoded service structs (Part 6 Annex A)
  val OpenSecureChannelRequestId = 446
  val OpenSecureChannelResponseId = 449
  val CloseSecureChannelRequestId = 452

  /** DateTime (Part 6 §5.2.2.5): 100 ns ticks since 1601-01-01 UTC. */
  def toFiletime(epochMillis: Long): Long = (epochMillis + 11644473600000L) * 10000L

  /** Four-byte ns-0 numeric NodeId (encoding mask 0x01, u8 ns, u16 id). */
  private[sources] def nodeId(w: BufWriter, id: Int): BufWriter =
    w.u8(0x01).u8(0).u8(id & 0xFF).u8((id >> 8) & 0xFF)
  private[sources] def readNodeId(r: BufReader): Int = r.u8() match {
    case 0x00 => r.u8() // two-byte form
    case 0x01 => r.u8(); r.u8() | (r.u8() << 8) // four-byte form
    case m => throw new FramingViolation(f"unsupported NodeId encoding 0x$m%02x")
  }

  /** Common RequestHeader (Part 4 §7.33): null auth token, timestamp,
    * handle, no diagnostics, null audit id, timeout, null extension.
    */
  private[sources] def requestHeader(w: BufWriter, epochMillis: Long, handle: Long): BufWriter = {
    w.u8(0x00).u8(0x00)       // AuthenticationToken: null two-byte NodeId
    w.i64(toFiletime(epochMillis))
    w.u32(handle)             // RequestHandle
    w.u32(0L)                 // ReturnDiagnostics
    w.str(null)               // AuditEntryId
    w.u32(0L)                 // TimeoutHint
    w.u8(0x00).u8(0x00).u8(0x00) // AdditionalHeader: null NodeId + encoding 0
  }
  private[sources] def skipRequestHeader(r: BufReader): Long = {
    readNodeId(r); r.i64()
    val handle = r.u32()
    r.u32(); r.str(); r.u32(); readNodeId(r); r.u8()
    handle
  }

  final case class OpenSecureChannelRequest(requestHandle: Long, clientProtocolVersion: Long,
                                            requestType: Long, securityMode: Long,
                                            requestedLifetimeMs: Long,
                                            channelId: Long = 0L)
  final case class ChannelToken(channelId: Long, tokenId: Long,
                                createdAtMillis: Long, lifetimeMs: Long)

  /** The asymmetric security header an unencrypted OPN carries (Part 6
    * §6.7.2.3): policy URI string, null sender certificate, null receiver
    * thumbprint. With SecurityPolicy None the chunk body is plaintext and
    * there is no signature — which is exactly why this layer is
    * implementable without a crypto stack; Sign/SignAndEncrypt modes are
    * the remaining out-of-scope surface.
    */
  private def asymHeader(w: BufWriter): BufWriter =
    w.str(SecurityPolicyNoneUri).i32(-1).i32(-1)
  private def readAsymHeader(r: BufReader): String = {
    val uri = r.str()
    val certLen = r.i32(); if (certLen > 0) throw new FramingViolation("unexpected certificate on a None-policy channel")
    val thumbLen = r.i32(); if (thumbLen > 0) throw new FramingViolation("unexpected thumbprint on a None-policy channel")
    uri
  }

  /** OPN request frame — single chunk. Issue rides SecureChannelId 0 (no
    * channel yet); a Renew rides the ESTABLISHED channel id and continues
    * the same send sequence (Part 6 §6.7.4: token renewal re-opens the
    * security token without interrupting the conversation).
    */
  def writeOpenRequest(out: OutputStream, seq: SeqState, requestId: Long,
                       epochMillis: Long, requestedLifetimeMs: Long,
                       channelId: Long = 0L,
                       requestType: Long = RequestTypeIssue): Unit = {
    val w = new BufWriter(160)
    w.u32(channelId) // 0 until issued; the live channel id on Renew
    asymHeader(w)
    w.u32(seq.next); seq.next += 1
    w.u32(requestId)
    nodeId(w, OpenSecureChannelRequestId)
    requestHeader(w, epochMillis, requestId)
    w.u32(ProtocolVersion) // ClientProtocolVersion
    w.u32(requestType)
    w.u32(SecurityModeNone)
    w.i32(-1)              // ClientNonce: null ByteString
    w.u32(requestedLifetimeMs)
    writeFrame(out, "OPN", 'F', w.result())
    out.flush()
  }

  def readOpenRequest(in: InputStream, seq: SeqState, maxFrame: Int): (Long, OpenSecureChannelRequest) = {
    val (tpe, fin, body) = readFrame(in, maxFrame)
    if (tpe == "ERR") throw decodeError(body)
    if (tpe != "OPN" || fin != 'F') throw new FramingViolation(s"expected final OPN, got $tpe/$fin")
    parseOpenRequest(body, seq)
  }

  /** Parse one already-read OPN frame body (shared by the handshake path
    * and the mid-conversation Renew path, where the frame arrives through
    * the MSG read loop). Issue must carry SecureChannelId 0; the caller
    * validates a Renew's id against the live channel.
    */
  def parseOpenRequest(body: Array[Byte], seq: SeqState): (Long, OpenSecureChannelRequest) = {
    val r = new BufReader(body)
    val frameChannelId = r.u32()
    val uri = readAsymHeader(r)
    if (uri != SecurityPolicyNoneUri)
      throw new OpcuaError(BadSecurityChecksFailed, s"unsupported policy $uri")
    val sn = r.u32()
    if (sn != seq.next) throw new FramingViolation(s"sequence number $sn, expected ${seq.next}")
    seq.next += 1
    val requestId = r.u32()
    if (readNodeId(r) != OpenSecureChannelRequestId)
      throw new FramingViolation("OPN body is not an OpenSecureChannelRequest")
    val handle = skipRequestHeader(r)
    val ver = r.u32(); val reqType = r.u32(); val mode = r.u32()
    val nonceLen = r.i32(); if (nonceLen > 0) throw new FramingViolation("unexpected nonce on a None-policy channel")
    val lifetime = r.u32()
    if (reqType == RequestTypeIssue && frameChannelId != 0L)
      throw new FramingViolation("OPN Issue must carry SecureChannelId 0")
    (requestId, OpenSecureChannelRequest(handle, ver, reqType, mode, lifetime, frameChannelId))
  }

  /** OPN response frame: the issued channel security token. */
  def writeOpenResponse(out: OutputStream, seq: SeqState, requestId: Long,
                        epochMillis: Long, token: ChannelToken): Unit = {
    val w = new BufWriter(160)
    w.u32(token.channelId)
    asymHeader(w)
    w.u32(seq.next); seq.next += 1
    w.u32(requestId)
    nodeId(w, OpenSecureChannelResponseId)
    // ResponseHeader (Part 4 §7.34): timestamp, handle, Good, no
    // diagnostics, empty string table, null extension
    w.i64(toFiletime(epochMillis))
    w.u32(requestId)
    w.u32(GoodStatus)
    w.u8(0x00)               // ServiceDiagnostics: null DiagnosticInfo
    w.i32(-1)                // StringTable: null array
    w.u8(0x00).u8(0x00).u8(0x00) // AdditionalHeader
    w.u32(ProtocolVersion)   // ServerProtocolVersion
    w.u32(token.channelId)
    w.u32(token.tokenId)
    w.i64(toFiletime(token.createdAtMillis))
    w.u32(token.lifetimeMs)
    w.i32(-1)                // ServerNonce: null ByteString
    writeFrame(out, "OPN", 'F', w.result())
    out.flush()
  }

  def readOpenResponse(in: InputStream, seq: SeqState, maxFrame: Int): ChannelToken = {
    val (tpe, fin, body) = readFrame(in, maxFrame)
    if (tpe == "ERR") throw decodeError(body)
    if (tpe != "OPN" || fin != 'F') throw new FramingViolation(s"expected final OPN, got $tpe/$fin")
    val r = new BufReader(body)
    val frameChannel = r.u32()
    readAsymHeader(r)
    val sn = r.u32()
    if (sn != seq.next) throw new FramingViolation(s"sequence number $sn, expected ${seq.next}")
    seq.next += 1
    r.u32() // requestId (client correlates by being the only in-flight request)
    if (readNodeId(r) != OpenSecureChannelResponseId)
      throw new FramingViolation("OPN body is not an OpenSecureChannelResponse")
    r.i64() // response timestamp
    r.u32() // request handle
    val status = r.u32()
    if (status != GoodStatus) throw new OpcuaError(status, "OpenSecureChannel failed")
    r.u8(); r.i32(); readNodeId(r); r.u8() // diagnostics, string table, additional header
    r.u32() // server protocol version
    val channelId = r.u32(); val tokenId = r.u32()
    val createdAt = r.i64(); val lifetime = r.u32()
    r.i32() // server nonce
    if (channelId != frameChannel)
      throw new FramingViolation(s"token channel $channelId != frame channel $frameChannel")
    ChannelToken(channelId, tokenId, createdAt / 10000L - 11644473600000L, lifetime)
  }

  /** CLO frame: CloseSecureChannelRequest on the symmetric header. */
  def writeCloseRequest(out: OutputStream, channel: ChannelToken, seq: SeqState,
                        requestId: Long, epochMillis: Long): Unit = {
    val w = new BufWriter(64)
    w.u32(channel.channelId)
    w.u32(channel.tokenId)
    w.u32(seq.next); seq.next += 1
    w.u32(requestId)
    nodeId(w, CloseSecureChannelRequestId)
    requestHeader(w, epochMillis, requestId)
    writeFrame(out, "CLO", 'F', w.result())
    out.flush()
  }

  /** A client-side channel after the full HEL → ACK → OPN handshake: the
    * revised limits, the issued token, and the per-direction sequence
    * states the symmetric conversation continues from. The OPN consumed
    * RequestId 1 — callers continue their request counter from there.
    */
  final case class ClientChannel(negotiated: Limits, token: ChannelToken,
                                 sendSeq: SeqState, recvSeq: SeqState) {
    /** Limits for READING responses: the peer's chunks are bounded by the
      * revised `sendBufferSize` (OUR receive buffer from its side of the
      * negotiation), so the reader must accept up to that — not our own
      * pre-revision receive buffer.
      */
    def readLimits: Limits = negotiated.copy(receiveBufferSize = negotiated.sendBufferSize)
  }

  /** The client half of the connection handshake over established streams:
    * HEL, ACK (limits revision), OpenSecureChannel(Issue, None). Shared by
    * the bulk-pull feed client and the Part 4 session client so the
    * subtle parts — the read-limit swap, ERR handling, sequence-state
    * birth — exist once. Throws [[OpcuaError]] when the server answers
    * ERR and [[FramingViolation]] on a contract break; callers own the
    * socket and must close it on failure.
    */
  def openClientChannel(in: InputStream, out: OutputStream, limits: Limits,
                        endpointUrl: String, epochMillis: Long,
                        requestedLifetimeMs: Long = 3600000L): ClientChannel = {
    writeFrame(out, "HEL", 'F', encodeHello(Hello(ProtocolVersion, limits, endpointUrl)))
    out.flush()
    val negotiated = readFrame(in, limits.receiveBufferSize) match {
      case ("ACK", _, body) => decodeAck(body)
      case ("ERR", _, body) => throw decodeError(body)
      case (t, _, _) => throw new FramingViolation(s"expected ACK, got $t")
    }
    val sendSeq = new SeqState
    val recvSeq = new SeqState
    writeOpenRequest(out, sendSeq, requestId = 1L, epochMillis, requestedLifetimeMs)
    val token = readOpenResponse(in, recvSeq, limits.receiveBufferSize)
    // stamp the token with LOCAL receipt time: the renewal deadline is
    // computed against the client's clock, and trusting the server's
    // CreatedAt would shift the 75% point by whatever the two clocks
    // diverge (a server clock in the past forces a renew round-trip
    // before EVERY request; one far ahead renews after expiry)
    ClientChannel(negotiated, token.copy(createdAtMillis = epochMillis), sendSeq, recvSeq)
  }

  /** Renew the channel's security token in place (Part 6 §6.7.4): one
    * OPN(Renew) round-trip on the live channel, continuing both sequence
    * states. Returns the channel with the NEW token — the caller swaps it
    * before its next request; the server keeps honouring the old token
    * until its original lifetime expires, so in-flight overlap is safe.
    * Call between requests (the single-in-flight discipline both clients
    * already keep).
    */
  def renewChannel(in: InputStream, out: OutputStream, channel: ClientChannel,
                   requestId: Long, epochMillis: Long,
                   requestedLifetimeMs: Long = 3600000L): ClientChannel = {
    writeOpenRequest(out, channel.sendSeq, requestId, epochMillis, requestedLifetimeMs,
      channelId = channel.token.channelId, requestType = RequestTypeRenew)
    val renewed = readOpenResponse(in, channel.recvSeq, channel.readLimits.receiveBufferSize)
    if (renewed.channelId != channel.token.channelId)
      throw new FramingViolation(
        s"renew answered on channel ${renewed.channelId}, expected ${channel.token.channelId}")
    // local receipt stamp, same reason as openClientChannel
    channel.copy(token = renewed.copy(createdAtMillis = epochMillis))
  }

  /** True when `token` has consumed ≥ 75 % of its lifetime — the renewal
    * point Part 6 recommends (clients renew early so the old token's
    * remaining validity covers in-flight traffic).
    */
  def shouldRenew(token: ChannelToken, nowMillis: Long): Boolean =
    nowMillis - token.createdAtMillis >= token.lifetimeMs * 3 / 4

  // ------------------------------------------------------ chunked MSG I/O

  /** Per-direction sequence-number state (Part 6 §6.7.2: strictly
    * consecutive across all chunks a side sends on one connection).
    */
  final class SeqState { var next: Long = 1L }

  /** The incremental writer interface MSG response producers encode
    * through — one implementation per security mode (plaintext
    * [[MessageWriter]], secured [[OpcuaSecure.SecureMessageWriter]]) so
    * service dispatch is mode-blind.
    */
  trait ChunkSink {
    def u8(v: Int): this.type
    def u32(v: Long): this.type
    def i32(v: Int): this.type
    def i64(v: Long): this.type
    def f64(v: Double): this.type
    def bool(v: Boolean): this.type
    def str(s: String): this.type
    def raw(b: Array[Byte]): this.type
    def finish(): Unit
  }

  /** Streaming chunk writer for one MSG message: primitives encode
    * directly into the chunk buffer; when a write would overflow the
    * negotiated chunk size the buffer flushes as an intermediate `C`
    * chunk and the write continues into the next one. `finish()` emits
    * the final `F` chunk (always, even when empty — the receiver needs
    * the final marker). Enforces the peer's receive-buffer chunk bound
    * and the negotiated per-message chunk count.
    */
  final class MessageWriter(out: OutputStream, seq: SeqState, requestId: Long,
                            peerReceiveBufferSize: Int, maxChunkCount: Long,
                            channelId: Long = 0L, tokenId: Long = 0L) extends ChunkSink {
    private val cap = peerReceiveBufferSize - ChunkOverhead
    require(cap > 0)
    private val chunk = new Array[Byte](peerReceiveBufferSize)
    private var n = 0 // payload bytes in the current chunk
    private var chunks = 0L

    private def flush(fin: Char): Unit = {
      chunks += 1
      if (maxChunkCount != 0 && chunks > maxChunkCount)
        throw new FramingViolation(s"message exceeds negotiated MaxChunkCount=$maxChunkCount")
      val w = new BufWriter(ChunkOverhead + n)
      w.raw("MSG".getBytes(StandardCharsets.US_ASCII)).u8(fin).u32(ChunkOverhead.toLong + n)
      w.u32(channelId) // the OPN-issued secure channel (0 before open)
      w.u32(tokenId)
      w.u32(seq.next); seq.next += 1
      w.u32(requestId)
      out.write(w.result())
      out.write(chunk, 0, n)
      n = 0
    }
    private def room(k: Int): Unit = if (n + k > cap) flush('C')
    def u8(v: Int): this.type = { room(1); chunk(n) = v.toByte; n += 1; this }
    def u32(v: Long): this.type = {
      room(4)
      chunk(n) = v.toByte; chunk(n + 1) = (v >>> 8).toByte
      chunk(n + 2) = (v >>> 16).toByte; chunk(n + 3) = (v >>> 24).toByte
      n += 4; this
    }
    def i32(v: Int): this.type = u32(v.toLong & 0xFFFFFFFFL)
    def i64(v: Long): this.type = { u32(v & 0xFFFFFFFFL); u32(v >>> 32) }
    def f64(v: Double): this.type = i64(java.lang.Double.doubleToLongBits(v))
    def bool(v: Boolean): this.type = u8(if (v) 1 else 0)
    def str(s: String): this.type =
      if (s == null) i32(-1)
      else { val b = s.getBytes(StandardCharsets.UTF_8); i32(b.length); raw(b) }
    /** Opaque bytes; may straddle chunk boundaries (§6.7.2 splits the byte
      * stream, not the value stream).
      */
    def raw(b: Array[Byte]): this.type = {
      var off = 0
      while (off < b.length) {
        if (n == cap) flush('C')
        val k = math.min(cap - n, b.length - off)
        System.arraycopy(b, off, chunk, n, k)
        n += k; off += k
      }
      this
    }
    def finish(): Unit = { flush('F'); out.flush() }
  }

  /** Read and reassemble one chunked MSG into (requestId, body bytes).
    * Verifies the §6.7.2 discipline: MSG type, per-chunk size within our
    * receive buffer, channel/token = 0, sequence numbers consecutive,
    * one RequestId per message, chunk count and reassembled size within
    * the negotiated limits. An `A` chunk aborts the message (its body is
    * an ERR payload); an ERR frame raises [[OpcuaError]].
    */
  def readMessage(in: InputStream, seq: SeqState, limits: Limits,
                  channelId: Long = 0L, tokenId: Long = 0L): (Long, Array[Byte]) =
    readConversation(in, seq, limits, channelId, _ == tokenId, allowOpn = false)

  /** As [[readMessage]], but with a token-acceptance predicate (a server
    * honours the PREVIOUS token until its lifetime expires after a renew
    * — Part 6 §6.7.4) and, when `allowOpn`, surfacing a mid-conversation
    * OPN frame (a Renew request) as `(-1L, rawFrameBody)` instead of a
    * violation. An OPN is only legal BETWEEN messages — once MSG chunks
    * have started it is a framing violation like any other type.
    */
  def readConversation(in: InputStream, seq: SeqState, limits: Limits,
                       channelId: Long, tokenOk: Long => Boolean,
                       allowOpn: Boolean): (Long, Array[Byte]) = {
    val body = new java.io.ByteArrayOutputStream(1024)
    var requestId = -1L
    var chunks = 0L
    while (true) {
      val (tpe, fin, frame) = readFrame(in, limits.receiveBufferSize)
      tpe match {
        case "ERR" => throw decodeError(frame)
        case "CLO" => throw new EOFException("secure channel closed by peer")
        case "OPN" if allowOpn && chunks == 0 && fin == 'F' =>
          return (-1L, frame)
        case "MSG" =>
          val r = new BufReader(frame)
          val channel = r.u32(); val token = r.u32()
          if (channel != channelId || !tokenOk(token))
            throw new OpcuaError(BadSecureChannelIdInvalid,
              s"chunk on channel $channel/$token, expected $channelId with a live token")
          val sn = r.u32()
          if (sn != seq.next)
            throw new FramingViolation(s"sequence number $sn, expected ${seq.next}")
          seq.next += 1
          val rid = r.u32()
          if (requestId == -1L) requestId = rid
          else if (rid != requestId)
            throw new FramingViolation(s"request id $rid mid-message, expected $requestId")
          chunks += 1
          if (limits.maxChunkCount != 0 && chunks > limits.maxChunkCount)
            throw new FramingViolation(s"message exceeds MaxChunkCount=${limits.maxChunkCount}")
          fin match {
            case 'A' => throw decodeError(frame.drop(16)) // abort carries ERR payload
            case 'C' | 'F' =>
              body.write(frame, 16, frame.length - 16)
              if (limits.maxMessageSize != 0 && body.size() > limits.maxMessageSize)
                throw new FramingViolation(s"message exceeds MaxMessageSize=${limits.maxMessageSize}")
              if (fin == 'F') return (requestId, body.toByteArray)
            case other => throw new FramingViolation(s"IsFinal byte '$other'")
          }
        case other => throw new FramingViolation(s"unexpected message type '$other'")
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
