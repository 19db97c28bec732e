package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal
import graft.operators.Multimodal.{ImageCodecs, TestPattern}

/** The real image decode path: golden-byte pins for the hand-written BMP
  * and PPM codecs (layouts written out field-by-field, independent of the
  * encoder), a cross-check of both codecs against the JDK's own ImageIO
  * BMP reader/writer, orientation sensitivity, and the distributed
  * decode over synthesized bytes (q80's operator) against a driver-side
  * recomputation.
  */
class MultimodalSpec extends AnyFunSuite {

  // 2×2 test image: TL red, TR green, BL blue, BR white
  private val px2x2: (Int, Int) => Int = {
    case (0, 0) => 0xFF0000
    case (1, 0) => 0x00FF00
    case (0, 1) => 0x0000FF
    case _      => 0xFFFFFF
  }

  test("golden BMP bytes: header fields, bottom-up rows, BGR order, row padding") {
    val got = ImageCodecs.encodeBmp(2, 2, px2x2)
    // stride = 8 (2×3 rounded to 4), pixel data = 16, file = 54+16 = 70
    val bb = java.nio.ByteBuffer.allocate(70).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(70).putShort(0).putShort(0).putInt(54)
    bb.putInt(40).putInt(2).putInt(2).putShort(1).putShort(24)
    bb.putInt(0).putInt(16).putInt(2835).putInt(2835).putInt(0).putInt(0)
    // stored first = BOTTOM row, BGR per pixel, 2 pad bytes per row:
    // bottom row: blue=0000FF → BGR FF 00 00; white → FF FF FF; pad 00 00
    bb.put(Array[Byte](-1, 0, 0, -1, -1, -1, 0, 0))
    // top row:    red=FF0000 → BGR 00 00 FF; green → 00 FF 00; pad 00 00
    bb.put(Array[Byte](0, 0, -1, 0, -1, 0, 0, 0))
    assert(got.sameElements(bb.array()))
  }

  test("golden PPM bytes: ASCII header then RGB top-down") {
    val got = ImageCodecs.encodePpm(2, 2, px2x2)
    val want = "P6\n2 2\n255\n".getBytes("US-ASCII") ++
      Array[Byte](-1, 0, 0, 0, -1, 0, 0, 0, -1, -1, -1, -1)
    assert(got.sameElements(want))
  }

  test("decoders are orientation-correct: row 0 is the logical TOP row") {
    for (codec <- Seq[(String, Array[Byte])](
        "bmp" -> ImageCodecs.encodeBmp(2, 2, px2x2),
        "ppm" -> ImageCodecs.encodePpm(2, 2, px2x2),
        "png" -> ImageCodecs.encodePng(2, 2, px2x2))) {
      val (name, bytes) = codec
      val d = name match {
        case "bmp" => ImageCodecs.decodeBmp(bytes)
        case "ppm" => ImageCodecs.decodePpm(bytes)
        case _     => ImageCodecs.decodePng(bytes)
      }
      assert(d.width == 2 && d.height == 2, name)
      assert(d.rgb(0, 0) == 0xFF0000, s"$name top-left")     // red on TOP
      assert(d.rgb(1, 0) == 0x00FF00, s"$name top-right")
      assert(d.rgb(0, 1) == 0x0000FF, s"$name bottom-left")  // blue on BOTTOM
      assert(d.rgb(1, 1) == 0xFFFFFF, s"$name bottom-right")
    }
  }

  test("hand codec agrees with the JDK's independent ImageIO BMP implementation") {
    val (w, h) = (13, 7) // odd width → 1-byte row padding exercised
    val px = TestPattern.rgb(42L) _
    // our encoder → ImageIO reader
    val viaImageIo = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(ImageCodecs.encodeBmp(w, h, (x, y) =>
        px(x, y))))
    assert(viaImageIo != null, "ImageIO rejected our BMP")
    // ImageIO writer → our decoder
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, px(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "bmp", bos))
    val viaOurs = ImageCodecs.decodeBmp(bos.toByteArray)
    for (y <- 0 until h; x <- 0 until w) {
      assert((viaImageIo.getRGB(x, y) & 0xFFFFFF) == px(x, y), s"ImageIO read ($x,$y)")
      assert(viaOurs.rgb(x, y) == px(x, y), s"our decode of ImageIO bytes ($x,$y)")
    }
  }

  test("PPM comment and whitespace handling") {
    val body = Array[Byte](-1, 0, 0, 0, -1, 0, 0, 0, -1, -1, -1, -1)
    val wire = "P6\n# a comment\n2 # trailing\n2\n255\n".getBytes("US-ASCII") ++ body
    val d = ImageCodecs.decodePpm(wire)
    assert(d.width == 2 && d.height == 2 && d.rgb(0, 0) == 0xFF0000)
  }

  test("malformed images fail loudly, not with garbage features") {
    intercept[IllegalArgumentException] { // truncated pixel data
      ImageCodecs.decodeBmp(ImageCodecs.encodeBmp(4, 4, (_, _) => 0).dropRight(10))
    }
    intercept[IllegalArgumentException] { // 8-bit palette BMP unsupported
      val b = ImageCodecs.encodeBmp(2, 2, (_, _) => 0)
      b(28) = 8; ImageCodecs.decodeBmp(b)
    }
    intercept[IllegalArgumentException] { // PPM maxval 65535 unsupported
      ImageCodecs.decodePpm("P6\n2 2\n65535\n".getBytes("US-ASCII") ++ new Array[Byte](24))
    }
    // crafted header whose stride*h overflows Int: the Long bounds math
    // must reject it cleanly, not index out of bounds (regression)
    intercept[IllegalArgumentException] {
      val b = ImageCodecs.encodeBmp(2, 2, (_, _) => 0)
      val bb = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(18, 0x2000000); bb.putInt(22, 0x200)
      ImageCodecs.decodeBmp(b)
    }
  }

  test("CRLF-separated PPM raster decodes unshifted (regression)") {
    // a Windows-style writer emits '255\r\n' before the raster; skipping
    // only the '\r' shifted every sample one byte and rotated channels
    val body = Array[Byte](-1, 0, 0, 0, -1, 0, 0, 0, -1, -1, -1, -1)
    val wire = "P6\n2 2\n255\r\n".getBytes("US-ASCII") ++ body
    val d = ImageCodecs.decodePpm(wire)
    assert(d.width == 2 && d.rgb(0, 0) == 0xFF0000 && d.rgb(1, 1) == 0xFFFFFF)
  }

  test("corrupt-but-magic-matching media yields a 'corrupt' row, not a failed job") {
    val spark = SparkSpec.spark
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    val good = ImageCodecs.encodeBmp(3, 3, TestPattern.rgb(1L))
    val truncated = good.dropRight(8) // magic matches, pixel data short
    val schema = StructType(Seq(StructField("media_id", LongType),
      StructField("bytes", BinaryType)))
    val media = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(1L, good),
        org.apache.spark.sql.Row(2L, truncated)), schema)
    val out = Multimodal.decodeMedia(media).orderBy("media_id").collect()
    assert(out(0).getString(1) == "bmp" && out(0).getInt(2) == 3)
    assert(out(1).getString(1) == "corrupt" && out(1).isNullAt(2))
  }

  test("distributed decode of synthesized media matches driver recomputation (all 3 formats)") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val docs = (0L until 60L).toDF("doc_id")
    val out = Multimodal.decodeMedia(Multimodal.syntheticMedia(docs))
      .orderBy("media_id").collect()
    assert(out.length == 60)
    assert(out.map(_.getString(1)).toSet == Set("bmp", "ppm", "png"))
    out.foreach { row =>
      val id = row.getLong(0)
      val (w, h, px) = (TestPattern.width(id), TestPattern.height(id), TestPattern.rgb(id) _)
      assert(row.getString(1) == Seq("bmp", "ppm", "png")((id % 3).toInt))
      assert(row.getInt(2) == w && row.getInt(3) == h, s"id=$id dims")
      var (sr, r0r) = (0L, 0L)
      for (y <- 0 until h; x <- 0 until w) {
        sr += (px(x, y) >> 16) & 0xFF
        if (y == 0) r0r += (px(x, y) >> 16) & 0xFF
      }
      assert(row.getLong(4) == sr, s"id=$id sum_r")
      assert(row.getLong(7) == r0r, s"id=$id row0_sum_r")
      assert(row.getDouble(10) == sr.toDouble / (w.toLong * h), s"id=$id mean_r")
    }
  }

  // ---- audio: the WAV/RIFF codec (q103) ----

  import graft.operators.Multimodal.{AudioCodecs, AudioTestPattern}

  test("golden WAV bytes: canonical RIFF/fmt/data layout, interleaved s16 LE") {
    // 2 frames, stereo, 8 kHz: ch0 = [1000, -2], ch1 = [-1000, 3]
    val samples: (Int, Int) => Int =
      (ch, i) => Seq(Seq(1000, -2), Seq(-1000, 3))(ch)(i)
    val got = AudioCodecs.encodeWav(8000, 2, 2, samples)
    val bb = java.nio.ByteBuffer.allocate(52).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(44).put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(2).putInt(8000).putInt(32000).putShort(4).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(8)
      .putShort(1000).putShort(-1000).putShort(-2).putShort(3) // frame-interleaved
    assert(got.sameElements(bb.array()))
  }

  test("WAV round-trip incl. the unknown-chunk walk and RIFF odd-size padding") {
    for (pad <- Seq(false, true)) {
      val enc = AudioCodecs.encodeWav(44100, 2, 7, AudioTestPattern.sample(3L), padChunk = pad)
      val d = AudioCodecs.decodeWav(enc)
      assert(d.sampleRate == 44100 && d.channels == 2 && d.frames == 7, s"pad=$pad")
      for (c <- 0 until 2; i <- 0 until 7)
        assert(d.sample(c, i) == AudioTestPattern.sample(3L)(c, i), s"pad=$pad ch=$c i=$i")
    }
  }

  test("hand codec agrees with the JDK's independent javax.sound WAV reader") {
    val enc = AudioCodecs.encodeWav(16000, 1, 5, (_, i) => Seq(0, 300, -300, 32767, -32768)(i))
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(enc))
    val fmt = ais.getFormat
    assert(fmt.getSampleRate == 16000f && fmt.getChannels == 1 &&
      fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian)
    assert(ais.getFrameLength == 5)
    val raw = ais.readAllBytes()
    val mine = AudioCodecs.decodeWav(enc)
    for (i <- 0 until 5) {
      val jdk = ((raw(2 * i + 1) << 8) | (raw(2 * i) & 0xFF))
      assert(mine.sample(0, i) == jdk, s"frame $i")
    }
  }

  test("malformed WAV fails loudly, not with garbage features") {
    val good = AudioCodecs.encodeWav(8000, 1, 4, (_, _) => 7)
    intercept[IllegalArgumentException] { // truncated data chunk
      AudioCodecs.decodeWav(good.dropRight(3))
    }
    intercept[IllegalArgumentException] { // non-PCM format code
      val b = good.clone(); b(20) = 3; AudioCodecs.decodeWav(b)
    }
    intercept[IllegalArgumentException] { // blockAlign inconsistent with channels
      val b = good.clone(); b(32) = 5; AudioCodecs.decodeWav(b)
    }
    intercept[IllegalArgumentException] { // chunk size overruns the buffer
      val b = good.clone()
      val bb = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(40, Int.MaxValue) // data size
      AudioCodecs.decodeWav(b)
    }
    intercept[IllegalArgumentException] { // 8-bit samples unsupported
      val b = good.clone(); b(34) = 8; b(32) = 1; AudioCodecs.decodeWav(b)
    }
  }

  // ---- video: the AVI container metadata codec (q107) ----

  import graft.operators.Multimodal.{VideoCodecs, VideoTestPattern}

  test("AVI round-trip incl. the JUNK padding chunk real muxers emit") {
    for (junk <- Seq(false, true)) {
      val m = VideoCodecs.AviMeta(640, 480, 250, 33333, 2)
      val d = VideoCodecs.decodeAviMeta(VideoCodecs.encodeAvi(m, junk))
      assert(d == m, s"junk=$junk")
    }
  }

  test("AVI golden header fields: avih offsets per the public layout") {
    val b = VideoCodecs.encodeAvi(VideoCodecs.AviMeta(320, 240, 100, 40000, 1))
    val bb = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(new String(b, 0, 4, "US-ASCII") == "RIFF")
    assert(new String(b, 8, 4, "US-ASCII") == "AVI ")
    assert(new String(b, 12, 4, "US-ASCII") == "LIST")
    assert(new String(b, 20, 4, "US-ASCII") == "hdrl")
    assert(new String(b, 24, 4, "US-ASCII") == "avih")
    assert(bb.getInt(28) == 56)      // avih payload size
    assert(bb.getInt(32) == 40000)   // dwMicroSecPerFrame
    assert(bb.getInt(48) == 100)     // dwTotalFrames
    assert(bb.getInt(56) == 1)       // dwStreams
    assert(bb.getInt(64) == 320 && bb.getInt(68) == 240)
  }

  test("malformed AVI fails loudly") {
    val good = VideoCodecs.encodeAvi(VideoTestPattern.meta(1L))
    intercept[IllegalArgumentException] { // truncated mid-header
      VideoCodecs.decodeAviMeta(good.take(30))
    }
    intercept[IllegalArgumentException] { // chunk size overruns buffer
      val b = good.clone()
      val bb = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(16, Int.MaxValue) // hdrl LIST size
      VideoCodecs.decodeAviMeta(b)
    }
    intercept[IllegalArgumentException] { // implausible dimensions rejected
      val b = good.clone()
      val bb = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(64, 0) // width 0
      VideoCodecs.decodeAviMeta(b)
    }
  }

  test("distributed audio decode matches driver recomputation; corrupt rows survive") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val docs = (0L until 40L).toDF("doc_id")
    val out = Multimodal.decodeAudio(Multimodal.syntheticAudio(docs))
      .orderBy("media_id").collect()
    assert(out.length == 40)
    out.foreach { row =>
      val id = row.getLong(0)
      val (sr, ch, nf) =
        (AudioTestPattern.sampleRate(id), AudioTestPattern.channels(id), AudioTestPattern.frames(id))
      assert(row.getString(1) == "wav" && row.getInt(2) == sr &&
        row.getInt(3) == ch && row.getInt(4) == nf, s"id=$id header")
      var (sum0, sumsq0, peak) = (0L, 0L, 0)
      for (i <- 0 until nf; c <- 0 until ch) {
        val v = AudioTestPattern.sample(id)(c, i)
        if (c == 0) { sum0 += v; sumsq0 += v.toLong * v }
        peak = math.max(peak, math.abs(v))
      }
      assert(row.getLong(5) == nf.toLong * 1000000L / sr, s"id=$id duration")
      assert(row.getLong(6) == sum0 && row.getLong(7) == sumsq0 &&
        row.getInt(8) == peak, s"id=$id moments")
      assert(row.getDouble(9) == sum0.toDouble / nf, s"id=$id mean")
      assert(row.getDouble(10) == math.sqrt(sumsq0.toDouble / nf), s"id=$id rms")
    }
    // corrupt + opaque rows survive the batch
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("media_id", LongType), StructField("bytes", BinaryType)))
    val bad = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(1L, AudioCodecs.encodeWav(8000, 1, 3, (_, _) => 1).dropRight(2)),
        org.apache.spark.sql.Row(2L, Array[Byte](1, 2, 3))), schema)
    val rows = Multimodal.decodeAudio(bad).orderBy("media_id").collect()
    assert(rows(0).getString(1) == "corrupt" && rows(0).isNullAt(2))
    assert(rows(1).getString(1) == "opaque" && rows(1).isNullAt(2))
  }

  test("AVI essence: frame round-trip, stride sampling, bottom-up orientation, corrupt drop") {
    import graft.operators.Multimodal.{VideoCodecs, VideoEssencePattern}
    val id = 7L
    val m = VideoEssencePattern.meta(id)
    val bytes = VideoCodecs.encodeAviEssence(m, VideoEssencePattern.rgb(id), junk = true)
    // stride 1: every frame, sums equal the driver recompute
    val (meta, all) = VideoCodecs.decodeAviFrames(bytes, 1)
    assert(meta == m && all.length == m.frames)
    all.foreach { fs =>
      var (sr, r0) = (0L, 0L)
      for (y <- 0 until m.height; x <- 0 until m.width) {
        val r = (VideoEssencePattern.rgb(id)(fs.idx, x, y) >> 16) & 0xFF
        sr += r; if (y == 0) r0 += r
      }
      assert(fs.sumR == sr && fs.row0SumR == r0, s"frame ${fs.idx}")
    }
    // the orientation witness is load-bearing: top row != bottom row
    val f0 = all.head
    var bottom = 0L
    for (x <- 0 until m.width)
      bottom += (VideoEssencePattern.rgb(id)(0, x, m.height - 1) >> 16) & 0xFF
    assert(f0.row0SumR != bottom, "fixture must distinguish orientation")
    // stride 3 samples frames 0, 3, 6, ...
    val (_, sampled) = VideoCodecs.decodeAviFrames(bytes, 3)
    assert(sampled.map(_.idx) == (0 until m.frames by 3).toVector)
    // a truncated essence chunk fails loudly (and the pipeline drops the row)
    intercept[IllegalArgumentException] {
      VideoCodecs.decodeAviFrames(bytes.dropRight(4), 1)
    }
    val spark = SparkSpec.spark
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("media_id", LongType), StructField("bytes", BinaryType)))
    val bad = spark.createDataFrame(java.util.Arrays.asList(
      org.apache.spark.sql.Row(1L, bytes),
      org.apache.spark.sql.Row(2L, bytes.dropRight(4))), schema)
    val rows = graft.operators.Multimodal.decodeVideoFrames(bad, 2).collect()
    assert(rows.forall(_.getLong(0) == 1L), "corrupt blob contributes no frames")
    assert(rows.length == (0 until m.frames by 2).length)
  }

  test("frameAHash: cross-multiply bits match driver recompute; constant frame is all-ones") {
    import graft.operators.Multimodal.{VideoCodecs, VideoEssencePattern}
    val id = 11L
    val m = VideoEssencePattern.meta(id)
    val bytes = VideoCodecs.encodeAviEssence(m, VideoEssencePattern.rgb(id))
    val (_, sigs) = VideoCodecs.frameAHash(bytes, 1)
    assert(sigs.length == m.frames)
    // driver recompute of frame 0
    val cs = new Array[Long](16); val cc = new Array[Long](16); var total = 0L
    for (y <- 0 until m.height; x <- 0 until m.width) {
      val r = (VideoEssencePattern.rgb(id)(0, x, y) >> 16) & 0xFF
      val c = (y * 4 / m.height) * 4 + (x * 4 / m.width)
      cs(c) += r; cc(c) += 1; total += r
    }
    val n = m.width.toLong * m.height
    val want = (0 until 16).filter(c => cs(c) * n >= total * cc(c))
      .map(1 << _).sum
    assert(sigs.head._2 == want)
    // a constant frame: every cell mean equals the frame mean -> 0xFFFF
    val flat = VideoCodecs.encodeAviEssence(m, (_, _, _) => 0x7F7F7F)
    assert(VideoCodecs.frameAHash(flat, 1)._2.forall(_._2 == 0xFFFF))
  }

  test("audioSpectral: pure tones land in their DFT bin; centroid tracks; short/corrupt drop") {
    val spark = SparkSpec.spark
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("media_id", LongType), StructField("bytes", BinaryType)))
    def tone(bin: Int, amp: Double): Array[Byte] =
      AudioCodecs.encodeWav(8000, 1, 64,
        (_, i) => math.round(amp * math.cos(2 * math.Pi * bin * i / 64)).toInt)
    val rows = java.util.Arrays.asList(
      org.apache.spark.sql.Row(1L, tone(5, 1000)),
      org.apache.spark.sql.Row(2L, tone(12, 1000)),
      org.apache.spark.sql.Row(3L, tone(5, 250)), // amplitude-invariant bin
      org.apache.spark.sql.Row(4L, AudioCodecs.encodeWav(8000, 1, 10, (_, _) => 7)), // < 64 frames
      org.apache.spark.sql.Row(5L, Array[Byte](1, 2, 3))) // not WAV
    val out = Multimodal.audioSpectral(spark.createDataFrame(rows, schema))
      .orderBy("media_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L), "short + corrupt rows drop")
    assert(out(0).getInt(1) == 5 && out(1).getInt(1) == 12 && out(2).getInt(1) == 5)
    // a pure tone's power concentrates: dominant bin carries > 90% of AC
    out.foreach(r => assert(r.getLong(2) * 10L > r.getLong(3) * 9L, s"row $r"))
    // centroid sits within half a bin of the tone for the clean tones
    assert(math.abs(out(0).getDouble(4) - 5.0) < 0.5)
    assert(math.abs(out(1).getDouble(4) - 12.0) < 0.5)
    // exact driver recomputation of row 1 with the shared trig table
    val x = Array.tabulate(64)(i => math.round(1000.0 * math.cos(2 * math.Pi * 5 * i / 64)))
    var total = 0L; var num = 0L
    for (k <- 1 to 32) {
      var re = 0L; var im = 0L
      for (i <- 0 until 64) {
        val j = (k * i) % 64
        re += x(i) * Multimodal.SpectralTrig.cos(j)
        im += x(i) * Multimodal.SpectralTrig.sin(j)
      }
      val pw = re * re + im * im
      total += pw; num += k.toLong * pw
    }
    assert(out(0).getLong(3) == total && out(0).getDouble(4) == num.toDouble / total.toDouble)
  }

  // ------------------------------------------------------------- GIF/LZW

  test("GIF round-trip: every GrayPattern image survives LZW compress+decompress") {
    for (id <- 0L until 60L) {
      val (w, h) = (TestPattern.width(id), TestPattern.height(id))
      val g = Multimodal.GrayPattern.gray(id) _
      val img = ImageCodecs.decodeGif(ImageCodecs.encodeGif(w, h, g))
      assert(img.width == w && img.height == h, s"id=$id dims")
      for (y <- 0 until h; x <- 0 until w) {
        val v = g(x, y)
        assert(img.rgb(x, y) == ((v << 16) | (v << 8) | v), s"id=$id ($x,$y)")
      }
    }
  }

  test("GIF encoder is accepted by the JDK's independent ImageIO GIF reader") {
    for (id <- Seq(0L, 7L, 23L, 51L)) {
      val (w, h) = (TestPattern.width(id), TestPattern.height(id))
      val g = Multimodal.GrayPattern.gray(id) _
      val bytes = ImageCodecs.encodeGif(w, h, g)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"id=$id: ImageIO rejected the stream")
      assert(img.getWidth == w && img.getHeight == h)
      for (y <- 0 until h; x <- 0 until w) {
        val v = g(x, y)
        assert((img.getRGB(x, y) & 0xFFFFFF) == ((v << 16) | (v << 8) | v),
          s"id=$id ($x,$y): JDK decodes different pixels than we encoded")
      }
    }
  }

  test("GIF decoder accepts the JDK writer's streams (incl. its extensions)") {
    val (w, h) = (23, 17)
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 31 + y * 7) % 256
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "gif", bos))
    val dec = ImageCodecs.decodeGif(bos.toByteArray)
    assert(dec.width == w && dec.height == h)
    for (y <- 0 until h; x <- 0 until w)
      assert(dec.rgb(x, y) == (img.getRGB(x, y) & 0xFFFFFF), s"($x,$y)")
  }

  test("LZW survives dictionary overflow: CLEAR/reset on high-entropy data") {
    // ~12k pseudo-random bytes force the dictionary past 4096 entries
    val rng = new scala.util.Random(7)
    val data = Array.fill(12000)(rng.nextInt(256).toByte)
    val out = ImageCodecs.lzwDecode(8, ImageCodecs.lzwEncode(8, data), data.length)
    assert(java.util.Arrays.equals(out, data))
    // and a worst-case repetitive stream (exercises KwKwK + long chains)
    val rep = Array.fill(9000)(((7: Int)).toByte)
    val out2 = ImageCodecs.lzwDecode(8, ImageCodecs.lzwEncode(8, rep), rep.length)
    assert(java.util.Arrays.equals(out2, rep))
  }

  test("malformed GIF fails loudly, not with garbage features") {
    val good = ImageCodecs.encodeGif(8, 8, (x, y) => (x + y) % 256)
    intercept[IllegalArgumentException](ImageCodecs.decodeGif(good.dropRight(6))) // truncated data
    intercept[IllegalArgumentException](ImageCodecs.decodeGif(good.take(12)))     // header only
    // logical/frame size mismatch fails at the descriptor check
    val tall = good.clone()
    tall(8) = 9 // logical height 8 -> 9, frame stays 8
    intercept[IllegalArgumentException](ImageCodecs.decodeGif(tall))
    // both sizes inflated: the LZW stream then holds too few pixels
    val tall2 = good.clone()
    tall2(8) = 9; tall2(13 + 768 + 7) = 9
    intercept[IllegalArgumentException](ImageCodecs.decodeGif(tall2))
  }

  test("distributed GIF decode matches the GrayPattern formula (q130 operator)") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val docs = (0L until 40L).toDF("doc_id")
    val out = Multimodal.decodeMedia(Multimodal.syntheticGifMedia(docs))
      .orderBy("media_id").collect()
    assert(out.length == 40)
    out.foreach { row =>
      val id = row.getLong(0)
      val (w, h) = (TestPattern.width(id), TestPattern.height(id))
      assert(row.getString(1) == "gif" && row.getInt(2) == w && row.getInt(3) == h)
      var (s, r0) = (0L, 0L)
      for (y <- 0 until h; x <- 0 until w) {
        val v = Multimodal.GrayPattern.gray(id)(x, y)
        s += v; if (y == 0) r0 += v
      }
      assert(row.getLong(4) == s && row.getLong(5) == s && row.getLong(6) == s, s"id=$id sums")
      assert(row.getLong(7) == r0, s"id=$id row0")
      assert(row.getDouble(10) == s.toDouble / (w * h), s"id=$id mean")
    }
  }
}
