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
}
