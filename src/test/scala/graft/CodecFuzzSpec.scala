package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.{AudioCodecs, ImageCodecs, VideoCodecs}

/** Systematic adversarial-bytes fuzz over every hand-written codec:
  * N random byte-mutations (and truncations) of a valid fixture per
  * family, each fed through the decoder. The contract under fuzz is the
  * corrupt-row policy every decode operator relies on
  * (`decodeMedia`/`imageHashes`/`decodeVideoFrames` catch
  * IllegalArgumentException | IOException and mark/drop the row): a
  * mutated input may still decode, or may fail under exactly those
  * types — NEVER an ArrayIndexOutOfBounds/NegativeArraySize/OOM-class
  * escape, and never a hang (per-call wall bound asserted). Review has
  * twice found adversarial-byte escapes in these codecs (JPEG Td/Th,
  * zero segment length); this spec makes that class of bug a permanent
  * regression test instead of a per-round discovery.
  *
  * Determinism: one LCG per family with a fixed seed — a failure
  * message carries the iteration, so any escape is replayable.
  */
class CodecFuzzSpec extends SparkSpec {

  private val N = 1200
  private val MaxCallMillis = 2000L

  private final class Lcg(var s: Long) {
    def next(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s >>> 11 }
    def int(bound: Int): Int = ((next() >>> 1) % bound).toInt
  }

  /** One fuzz campaign: mutate `valid`, decode, assert the contract. */
  private def fuzz(name: String, valid: Array[Byte])(decode: Array[Byte] => Any): Unit = {
    val rng = new Lcg(name.hashCode.toLong * 2654435761L + 42)
    var decoded = 0; var rejected = 0
    // untimed warmup on the valid fixture: first-call JIT/classloading
    // must not count against the hang bound (a flake class on loaded
    // machines, not a correctness signal)
    decode(valid)
    for (i <- 1 to N) {
      val bytes =
        if (i % 10 == 0) { // truncation (at least the first byte survives)
          java.util.Arrays.copyOfRange(valid, 0, 1 + rng.int(valid.length))
        } else {
          val b = java.util.Arrays.copyOf(valid, valid.length)
          val k = 1 + rng.int(4)
          for (_ <- 0 until k) b(rng.int(b.length)) = rng.int(256).toByte
          b
        }
      val t0 = System.nanoTime()
      try { decode(bytes); decoded += 1 }
      catch {
        case _: IllegalArgumentException | _: java.io.IOException => rejected += 1
        case e: Throwable =>
          fail(s"$name iteration $i escaped the corrupt-row contract: " +
            s"${e.getClass.getName}: ${e.getMessage}")
      }
      val ms = (System.nanoTime() - t0) / 1000000L
      assert(ms < MaxCallMillis, s"$name iteration $i took ${ms}ms — hang class")
    }
    // the campaign must exercise BOTH outcomes, or it isn't testing the
    // reject path (e.g. a decoder that ignores the mutated region)
    assert(rejected > 0, s"$name: no mutation was ever rejected")
    info(s"$name: $decoded decoded, $rejected rejected")
  }

  test("BMP survives 1200 byte-mutations") {
    val valid = ImageCodecs.encodeBmp(13, 9, (x, y) => (x * 17 + y * 31) & 0xFFFFFF)
    fuzz("bmp", valid) { b =>
      val d = ImageCodecs.decodeBmp(b); d.rgb(d.width - 1, d.height - 1)
    }
  }

  test("PPM survives 1200 byte-mutations") {
    val valid = ImageCodecs.encodePpm(11, 7, (x, y) => (x * 29 + y * 13) & 0xFFFFFF)
    fuzz("ppm", valid) { b =>
      val d = ImageCodecs.decodePpm(b); d.rgb(d.width - 1, d.height - 1)
    }
  }

  test("GIF (LZW, interlace) survives 1200 byte-mutations") {
    val valid = ImageCodecs.encodeGif(16, 12, (x, y) => (x * 5 + y * 9) % 256)
    fuzz("gif", valid) { b =>
      val d = ImageCodecs.decodeGif(b); d.rgb(d.width - 1, d.height - 1)
    }
  }

  test("baseline JPEG survives 1200 byte-mutations") {
    val valid = ImageCodecs.encodeJpeg(32, 24, (x, y) => ((x * 7) << 16) | ((y * 11) << 8) | ((x + y) & 0xFF))
    fuzz("jpeg-baseline", valid) { b =>
      val d = ImageCodecs.decodeJpeg(b); d.rgb(d.width - 1, d.height - 1)
    }
  }

  test("progressive JPEG survives 1200 byte-mutations") {
    val img = new java.awt.image.BufferedImage(32, 24, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 24; x <- 0 until 32) img.setRGB(x, y, (x * 31 + y * 57) & 0xFFFFFF)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val params = writer.getDefaultWriteParam
    params.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
    writer.dispose(); ios.close()
    val valid = bos.toByteArray
    assert(valid.sliding(2).exists(p => (p(0) & 0xFF) == 0xFF && (p(1) & 0xFF) == 0xC2),
      "fixture is not progressive (no SOF2)")
    fuzz("jpeg-progressive", valid) { b =>
      val d = ImageCodecs.decodeJpeg(b); d.rgb(d.width - 1, d.height - 1)
    }
  }

  test("DC-only gray JPEG (the MJPEG frame form) survives 1200 byte-mutations") {
    val valid = ImageCodecs.encodeJpegDcGray(24, 16, (bx, by) => (37 * (by * 3 + bx) + 5) % 256)
    fuzz("jpeg-dcgray", valid) { b =>
      val d = ImageCodecs.decodeJpeg(b); d.rgb(d.width - 1, d.height - 1)
    }
  }

  test("WAV survives 1200 byte-mutations") {
    val valid = AudioCodecs.encodeWav(8000, 2, 120, (ch, i) => (i * 13 + ch * 7) % 4001 - 2000)
    fuzz("wav", valid) { b =>
      val d = AudioCodecs.decodeWav(b)
      if (d.frames > 0) d.sample(d.channels - 1, d.frames - 1)
    }
  }

  test("AVI with DIB essence survives 1200 byte-mutations") {
    val m = VideoCodecs.AviMeta(10, 8, 3, 40000, 1)
    val valid = VideoCodecs.encodeAviEssence(m, (f, x, y) => (f * 19 + x * 3 + y * 7) & 0xFFFFFF, junk = true)
    fuzz("avi-dib", valid)(b => VideoCodecs.decodeAviFrames(b, 1))
  }

  test("AVI with MJPEG essence survives 1200 byte-mutations") {
    val m = VideoCodecs.AviMeta(16, 8, 3, 33333, 1)
    val valid = VideoCodecs.encodeAviMjpeg(m, (f, bx, by) => (f * 41 + bx * 17 + by * 29) % 256)
    fuzz("avi-mjpeg", valid)(b => VideoCodecs.decodeAviFrames(b, 1))
  }

  test("every operator-level media path drops fuzzed rows instead of failing the task") {
    // the row-level contract end-to-end: a corrupt blob inside a media
    // DataFrame must yield a dropped/corrupt row, not a task failure
    val rng = new Lcg(99)
    val m = VideoCodecs.AviMeta(16, 8, 2, 33333, 1)
    val good = VideoCodecs.encodeAviMjpeg(m, (f, bx, by) => (f + bx + by * 3) % 256)
    val bad = java.util.Arrays.copyOf(good, good.length)
    for (_ <- 0 until 8) bad(rng.int(bad.length)) = rng.int(256).toByte
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("media_id", LongType),
      StructField("modality", StringType), StructField("bytes", BinaryType)))
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](java.util.Arrays.asList(
        Row(1L, "video", good), Row(2L, "video", bad))), schema)
    val out = Multimodal.decodeVideoFrames(df, 1).collect()
    // row 1 always decodes; row 2 either decodes (mutation in slack
    // bytes) or is dropped — both are fine, a task failure is not
    assert(out.map(_.getLong(0)).contains(1L))
  }
}
