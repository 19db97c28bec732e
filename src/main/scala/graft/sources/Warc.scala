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
}
