package graft

import java.nio.charset.StandardCharsets.UTF_8

import graft.sources.Warc

/** WARC/1.0 build+parse on hand fixtures: Content-Length framing (not
  * marker scanning), gzip multi-member streams, non-response records,
  * multibyte bodies, and loud failure on truncation.
  */
class WarcSpec extends SparkSpec {

  private def rec(url: String, body: String): Array[Byte] =
    Warc.buildResponse(url, "2026-01-01T00:00:00Z", "text/plain; charset=utf-8",
      body.getBytes(UTF_8))

  test("round-trips a body that CONTAINS a WARC header (framing is length-driven)") {
    // A marker-based splitter would cut this record in half.
    val trap = "prefix\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n\r\nsuffix"
    val out = Warc.parseAll(rec("https://a.example.com/1", trap) ++ rec("https://a.example.com/2", "plain"))
    assert(out.map(_.targetUri) === Seq("https://a.example.com/1", "https://a.example.com/2"))
    assert(new String(out.head.body, UTF_8) === trap)
    assert(out.forall(_.httpStatus === 200))
  }

  test("concatenated gzip members parse as one stream") {
    val bytes = Warc.gzipMember(rec("https://a.example.com/1", "one")) ++
      Warc.gzipMember(rec("https://a.example.com/2", "two")) ++
      Warc.gzipMember(rec("https://a.example.com/3", "three"))
    val out = Warc.parseAll(bytes)
    assert(out.map(r => new String(r.body, UTF_8)) === Seq("one", "two", "three"))
  }

  test("non-response records pass through with their raw block") {
    val info = ("WARC/1.0\r\nWARC-Type: warcinfo\r\n" +
      "Content-Type: application/warc-fields\r\nContent-Length: 12\r\n\r\n" +
      "format: WARC\r\n\r\n").getBytes(UTF_8)
    val out = Warc.parseAll(info ++ rec("https://a.example.com/1", "x"))
    assert(out.map(_.warcType) === Seq("warcinfo", "response"))
    assert(new String(out.head.body, UTF_8) === "format: WARC")
    assert(out.head.httpStatus === 0)
  }

  test("multibyte bodies keep UTF-8 byte framing") {
    val body = "héllo wörld — 你好"
    val out = Warc.parseAll(rec("https://a.example.com/1", body) ++ rec("https://a.example.com/2", "y"))
    assert(new String(out.head.body, UTF_8) === body)
    assert(out.head.body.length === body.getBytes(UTF_8).length)
    assert(out(1).targetUri === "https://a.example.com/2")
  }

  test("truncated record fails loudly instead of emitting garbage") {
    val full = rec("https://a.example.com/1", "0123456789")
    val cut = java.util.Arrays.copyOfRange(full, 0, full.length - 12)
    intercept[IllegalArgumentException](Warc.parseAll(cut))
  }

  test("every malformed-framing class fails under IllegalArgumentException") {
    // contract: batch callers match on IllegalArgumentException; none of
    // these may escape as ArrayIndexOutOfBounds/NumberFormat/StringIndex
    def mk(statusLine: String): Array[Byte] = {
      val http = s"$statusLine\r\nContent-Type: text/plain\r\n\r\nbody"
      (s"WARC/1.0\r\nWARC-Type: response\r\n" +
        s"WARC-Target-URI: https://a.example.com/x\r\n" +
        s"Content-Type: application/http; msgtype=response\r\n" +
        s"Content-Length: ${http.getBytes(UTF_8).length}\r\n\r\n" + http).getBytes(UTF_8)
    }
    // status line with no code / non-numeric code / overlong code
    for (sl <- Seq("HTTP/1.1", "HTTP/1.1 OK", "HTTP/1.1 2O0 OK",
        "HTTP/1.1 9999999999 OK"))
      intercept[IllegalArgumentException](Warc.parseAll(mk(sl)))
    // header block shorter than the 8-byte magic, but blank-terminated
    intercept[IllegalArgumentException](
      Warc.parseAll("WARC\r\n\r\n".getBytes(UTF_8)))
    // non-numeric / negative / overlong Content-Length — including the
    // 10-digit Int-overflow window (2147483648..9999999999) that used
    // to slip past the length<=10 guard into toInt's NumberFormatException
    for (cl <- Seq("abc", "-5", "9999999999", "2147483648", "99999999999999")) {
      val e = intercept[IllegalArgumentException](Warc.parseAll(
        (s"WARC/1.0\r\nWARC-Type: resource\r\nContent-Length: $cl\r\n\r\nx")
          .getBytes(UTF_8)))
      assert(!e.isInstanceOf[NumberFormatException],
        s"Content-Length '$cl' must fail via the framing require, not toInt: $e")
    }
    // r9 ADVICE: a 10-digit value WITHIN Int range (1e9..2147483647) is a
    // VALID length — it must reach the overrun check (and would parse on
    // a big-enough buffer), not be rejected as non-numeric by digit count
    val e = intercept[IllegalArgumentException](Warc.parseAll(
      ("WARC/1.0\r\nWARC-Type: resource\r\nContent-Length: 1000000000\r\n\r\nx")
        .getBytes(UTF_8)))
    assert(e.getMessage.contains("overruns"),
      s"in-range 10-digit Content-Length must fail as overrun, not framing: $e")
  }

  test("streaming shard ingest: new shards picked up incrementally, corrupt shard quarantined") {
    val dir = java.nio.file.Files.createTempDirectory("graft-warc-stream")
    def writeShard(name: String, bytes: Array[Byte]): Unit =
      java.nio.file.Files.write(dir.resolve(name), bytes)
    writeShard("shard-0.warc.gz",
      Warc.gzipMember(rec("https://a.example.com/1", "one")) ++
        Warc.gzipMember(rec("https://a.example.com/2", "two")))
    val out = new scala.collection.mutable.ArrayBuffer[(String, String, Int, Long)]
    val query = Warc.streamIngest(spark, dir.toString)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        out ++= batch.collect().map(r => (new java.io.File(r.getString(0)).getName,
          r.getString(1), r.getInt(2), r.getLong(3)))
        ()
      }.start()
    try {
      query.processAllAvailable()
      assert(out.map(_._2).toSet === Set("https://a.example.com/1", "https://a.example.com/2"))
      // a later micro-batch sees ONLY the new shards: one good, one
      // truncated (the corrupt one yields its marker row, not a crash)
      val full = Warc.gzipMember(rec("https://b.example.com/3", "three"))
      writeShard("shard-1.warc.gz", full)
      writeShard("shard-2.warc.gz", java.util.Arrays.copyOfRange(full, 0, 20))
      out.clear()
      query.processAllAvailable()
      val byShard = out.groupBy(_._1)
      assert(byShard("shard-1.warc.gz").map(_._2).toSeq === Seq("https://b.example.com/3"))
      val q = byShard("shard-2.warc.gz").head
      assert(q._2 == null && q._3 === -1 && q._4 === 20L)
    } finally query.stop()
  }

  test("distributed round trip recovers every document") {
    import spark.implicits._
    val docs = Seq(
      (7L, "srcA", "alpha beta"),
      (8L, "srcB", "γδ multibyte"),
      (9L, "srcA", "")
    ).toDF("doc_id", "source", "text").repartition(2)
    val out = Warc.roundTrip(docs).orderBy("doc_id")
      .as[(Long, String, Int, Long)].collect().toSeq
    assert(out === Seq(
      (7L, "https://srcA.example.com/docs/7", 200, 10L),
      (8L, "https://srcB.example.com/docs/8", 200, "γδ multibyte".getBytes(UTF_8).length.toLong),
      (9L, "https://srcA.example.com/docs/9", 200, 0L)))
  }

  // ---- .warc.zst (concatenated zstd frames + skippable-frame dict) ----

  test("concatenated zstd members parse as one stream (no dictionary)") {
    val bytes = Warc.zstdMember(rec("https://a.example.com/1", "one")) ++
      Warc.zstdMember(rec("https://a.example.com/2", "two")) ++
      Warc.zstdMember(rec("https://a.example.com/3", "three"))
    val out = Warc.parseAll(bytes)
    assert(out.map(r => new String(r.body, UTF_8)) === Seq("one", "two", "three"))
    assert(out.forall(_.httpStatus === 200))
  }

  test("leading skippable frame carries the dictionary; members decode only with it") {
    val dict = Warc.ResponseDict
    val bytes = Warc.dictionaryFrame(dict) ++
      Warc.zstdMember(rec("https://a.example.com/1", "alpha"), Some(dict)) ++
      Warc.zstdMember(rec("https://a.example.com/2", "beta"), Some(dict))
    val out = Warc.parseAll(bytes)
    assert(out.map(_.targetUri) ===
      Seq("https://a.example.com/1", "https://a.example.com/2"))
    assert(out.map(r => new String(r.body, UTF_8)) === Seq("alpha", "beta"))
    // the dictionary genuinely participates: stripping the skippable
    // frame must break the dict-compressed members loudly, not decode
    // them to garbage
    val headless = bytes.drop(Warc.dictionaryFrame(dict).length)
    intercept[Exception] { Warc.parseAll(headless) }
  }

  test("TRAINED dictionary (ZDICT): train -> skippable-frame write -> read round-trip, ratio beats no-dict") {
    // a corpus of small records sharing WARC/HTTP boilerplate + recurring
    // vocabulary — the regime where per-member zstd cannot rediscover the
    // shared structure and a trained dictionary pays
    val words = Vector("solar", "panel", "inverter", "telemetry", "voltage",
      "current", "string", "combiner", "tracker", "irradiance")
    val bodies = (0 until 600).map { i =>
      (0 until 12).map(j => words((i * 7 + j * 3) % words.length))
        .mkString(" ") + s" record-$i"
    }
    val records = (0 until 600).map(i => rec(s"https://w$i.example.com/docs/$i", bodies(i)))
    val dict = Warc.trainDictionary(records, dictBytes = 4096)
    assert(dict.length > 0 && dict.length <= 4096)
    // round trip through the same skippable-frame + continuous-decode path
    val blob = Warc.dictionaryFrame(dict) ++
      records.take(50).flatMap(r => Warc.zstdMember(r, Some(dict)))
    val out = Warc.parseAll(blob)
    assert(out.length == 50)
    assert(out.map(_.targetUri) == (0 until 50).map(i => s"https://w$i.example.com/docs/$i"))
    (out zip bodies.take(50)).foreach { case (parsed, body) =>
      assert(new String(parsed.body, UTF_8) == body)
    }
    // the trained dict must genuinely compress: member bytes (excluding
    // the amortized dict frame) strictly smaller than dict-less members
    val withDict = records.map(r => Warc.zstdMember(r, Some(dict)).length.toLong).sum
    val noDict = records.map(r => Warc.zstdMember(r).length.toLong).sum
    info(f"trained-dict members: $withDict B vs no-dict $noDict B " +
      f"(${100.0 * withDict / noDict}%.1f%%), dict ${dict.length} B over 600 records")
    assert(withDict < noDict,
      s"trained dictionary did not pay: $withDict >= $noDict")
  }

  test("raw (uncompressed) dictionary payload is accepted too") {
    val dict = "shared prefix material for tiny members ".getBytes(UTF_8)
    // hand-build the skippable frame with a RAW payload: magic+len+dict
    val bos = new java.io.ByteArrayOutputStream()
    def w32(v: Int): Unit = (0 until 4).foreach(i => bos.write((v >>> (8 * i)) & 0xff))
    w32(0x184D2A53); w32(dict.length); bos.write(dict) // any 0x...50-5F magic
    val bytes = bos.toByteArray ++
      Warc.zstdMember(rec("https://a.example.com/9", "via raw dict"), Some(dict))
    val out = Warc.parseAll(bytes)
    assert(out.map(r => new String(r.body, UTF_8)) === Seq("via raw dict"))
  }

  test("corrupt skippable-frame length fails loudly") {
    val bos = new java.io.ByteArrayOutputStream()
    def w32(v: Int): Unit = (0 until 4).foreach(i => bos.write((v >>> (8 * i)) & 0xff))
    w32(0x184D2A50); w32(1 << 30) // length overruns the input
    bos.write(Warc.zstdMember(rec("https://a.example.com/1", "x")))
    intercept[IllegalArgumentException] { Warc.parseAll(bos.toByteArray) }
  }

  test("distributed zstd round trip (dict frame per shard) recovers every document") {
    import spark.implicits._
    val docs = Seq(
      (7L, "srcA", "alpha beta"),
      (8L, "srcB", "γδ multibyte"),
      (9L, "srcA", "")
    ).toDF("doc_id", "source", "text").repartition(2)
    val out = Warc.roundTripZstd(docs).orderBy("doc_id")
      .as[(Long, String, Int, Long)].collect().toSeq
    assert(out === Seq(
      (7L, "https://srcA.example.com/docs/7", 200, 10L),
      (8L, "https://srcB.example.com/docs/8", 200, "γδ multibyte".getBytes(UTF_8).length.toLong),
      (9L, "https://srcA.example.com/docs/9", 200, 0L)))
  }
}
