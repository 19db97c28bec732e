package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal.ImageCodecs

/** The hand-written baseline JPEG decoder cross-checked against the
  * JDK's own JPEG decoder on JDK-encoded images. T.81 permits small
  * IDCT variation between conforming decoders, so the pin is a tight
  * per-pixel tolerance plus a near-zero mean deviation — NOT bit
  * equality (the other hand codecs are bit-pinned; lossy JPEG is the
  * one format whose spec says decoders may legitimately differ).
  */
class JpegCodecSpec extends AnyFunSuite {

  private def jdkDecode(bytes: Array[Byte]): java.awt.image.BufferedImage = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, "JDK could not decode the fixture JPEG")
    img
  }

  /** max and mean abs channel difference between our decode and JDK's. */
  private def diffStats(bytes: Array[Byte]): (Int, Double) = {
    val ours = ImageCodecs.decodeJpeg(bytes)
    val ref = jdkDecode(bytes)
    assert(ours.width == ref.getWidth && ours.height == ref.getHeight)
    var maxD = 0; var sumD = 0L; var n = 0L
    for (y <- 0 until ours.height; x <- 0 until ours.width) {
      val a = ours.rgb(x, y); val b = ref.getRGB(x, y) & 0xFFFFFF
      for (shift <- Seq(16, 8, 0)) {
        val d = math.abs(((a >> shift) & 0xFF) - ((b >> shift) & 0xFF))
        maxD = math.max(maxD, d); sumD += d; n += 1
      }
    }
    (maxD, sumD.toDouble / n)
  }

  private def lcg(seed: Long): Iterator[Int] =
    Iterator.iterate(seed)(s => s * 6364136223846793005L + 1442695040888963407L)
      .map(s => ((s >>> 33) & 0xFF).toInt)

  test("gradient image: per-pixel agreement with the JDK decoder") {
    val bytes = ImageCodecs.encodeJpeg(64, 48,
      (x, y) => ((x * 4) << 16) | ((y * 5) << 8) | ((x + y) * 2 & 0xFF))
    val (maxD, meanD) = diffStats(bytes)
    assert(maxD <= 4, s"max channel diff $maxD")
    assert(meanD < 0.6, s"mean channel diff $meanD")
  }

  test("checkerboard (high frequency content, 4:2:0 chroma)") {
    val bytes = ImageCodecs.encodeJpeg(40, 40,
      (x, y) => if (((x / 4) + (y / 4)) % 2 == 0) 0xFF4040 else 0x4040FF)
    val (maxD, meanD) = diffStats(bytes)
    assert(maxD <= 4, s"max channel diff $maxD")
    assert(meanD < 0.6, s"mean channel diff $meanD")
  }

  test("deterministic noise: worst case for the entropy decoder") {
    val px = lcg(42L).take(32 * 32 * 3).toArray
    val bytes = ImageCodecs.encodeJpeg(32, 32, (x, y) => {
      val o = 3 * (y * 32 + x); (px(o) << 16) | (px(o + 1) << 8) | px(o + 2)
    })
    val (maxD, meanD) = diffStats(bytes)
    assert(maxD <= 4, s"max channel diff $maxD")
    assert(meanD < 0.7, s"mean channel diff $meanD")
  }

  test("non-multiple-of-MCU dimensions (edge blocks)") {
    val bytes = ImageCodecs.encodeJpeg(37, 23, (x, y) => (x * 7 + y * 3) & 0xFF)
    val (maxD, _) = diffStats(bytes)
    assert(maxD <= 4, s"max channel diff $maxD")
  }

  test("grayscale JPEG (single component, no chroma)") {
    val img = new java.awt.image.BufferedImage(33, 21,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 21; x <- 0 until 33) {
      val g = (x * 8 + y) & 0xFF
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpeg", bos)
    val bytes = bos.toByteArray
    // compare RASTER samples: getRGB on TYPE_BYTE_GRAY gamma-converts
    // (treats the JFIF luma sample as linear gray); the decoded sample
    // itself is the comparison target, and libjpeg-convention decoders
    // (ours) present it directly
    val ours = ImageCodecs.decodeJpeg(bytes)
    val ref = jdkDecode(bytes)
    var maxD = 0
    for (y <- 0 until ours.height; x <- 0 until ours.width) {
      val d = math.abs((ours.rgb(x, y) & 0xFF) - ref.getRaster.getSample(x, y, 0))
      maxD = math.max(maxD, d)
    }
    assert(maxD <= 4, s"max gray sample diff $maxD")
  }

  test("solid color compresses to near-pure DC and still agrees") {
    val bytes = ImageCodecs.encodeJpeg(16, 16, (_, _) => 0x6A9C3D)
    val (maxD, _) = diffStats(bytes)
    assert(maxD <= 2, s"max channel diff $maxD")
  }

  test("quality sweep: decoder tracks the JDK across quantization levels") {
    for (q <- Seq(0.3f, 0.5f, 0.75f, 0.95f)) {
      val bytes = ImageCodecs.encodeJpeg(48, 32,
        (x, y) => ((x * y) & 0xFF) << 16 | ((x * 3) & 0xFF) << 8 | ((y * 5) & 0xFF),
        quality = q)
      val (maxD, _) = diffStats(bytes)
      assert(maxD <= 4, s"quality $q: max channel diff $maxD")
    }
  }

  test("restart markers (DRI): decode resynchronizes at every RST boundary") {
    // the JDK writer emits RSTn when the image metadata carries a dri
    // node — the one way to produce a real restart-interval stream
    // without writing a JPEG encoder
    val w = 64; val h = 48
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 4) << 16) | ((y * 5) << 8) | ((x * y) & 0xFF))
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val params = writer.getDefaultWriteParam
    val meta = writer.getDefaultImageMetadata(
      new javax.imageio.ImageTypeSpecifier(img), params)
    val fmt = "javax_imageio_jpeg_image_1.0"
    val tree = meta.getAsTree(fmt).asInstanceOf[org.w3c.dom.Element]
    val seq = tree.getElementsByTagName("markerSequence").item(0)
      .asInstanceOf[org.w3c.dom.Element]
    val dri = new javax.imageio.metadata.IIOMetadataNode("dri")
    dri.setAttribute("interval", "2") // RST every 2 MCUs
    seq.insertBefore(dri, seq.getFirstChild)
    meta.setFromTree(fmt, tree)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, meta), params)
    writer.dispose(); ios.close()
    val bytes = bos.toByteArray
    // the fixture must genuinely contain restart markers, else this test
    // silently stops covering the DRI path
    val nRst = bytes.sliding(2).count(p =>
      (p(0) & 0xFF) == 0xFF && (p(1) & 0xF8) == 0xD0 && (p(1) & 0xFF) != 0xD8)
    assert(nRst > 0, "fixture contains no RST markers — DRI metadata ignored")
    val (maxD, _) = diffStats(bytes)
    assert(maxD <= 4, s"max channel diff $maxD across $nRst restart markers")
  }

  test("malformed input fails loudly, never out-of-bounds") {
    val good = ImageCodecs.encodeJpeg(16, 16, (x, y) => x * y)
    intercept[IllegalArgumentException] {
      ImageCodecs.decodeJpeg(good.take(good.length / 2)) // truncated scan
    }
    intercept[IllegalArgumentException] {
      ImageCodecs.decodeJpeg(Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte))
    }
    // SOF0 flipped to SOF2: the file then claims progressive but carries
    // a sequential scan header (Ss=0, Se=63 — illegal for a progressive
    // DC scan), which the scan validation must reject
    val idx = good.indexOfSlice(Seq(0xFF.toByte, 0xC0.toByte))
    if (idx >= 0) {
      val prog = good.clone(); prog(idx + 1) = 0xC2.toByte
      intercept[IllegalArgumentException] { ImageCodecs.decodeJpeg(prog) }
    }
  }

  /** A real progressive JPEG via the JDK writer's progressive mode
    * (the IJG standard scan script: interleaved DC first, then per-
    * component AC spectral-selection and successive-approximation
    * passes).
    */
  private def encodeProgressive(img: java.awt.image.BufferedImage,
                                quality: Float = 0.9f): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    params.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
    writer.dispose(); ios.close()
    val bytes = bos.toByteArray
    assert(bytes.indexOfSlice(Seq(0xFF.toByte, 0xC2.toByte)) >= 0,
      "fixture is not progressive (no SOF2) — writer ignored progressive mode")
    bytes
  }

  private def rgbImage(w: Int, h: Int, rgb: (Int, Int) => Int) = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
    img
  }

  test("progressive: gradient agrees with the JDK decoder") {
    val bytes = encodeProgressive(rgbImage(64, 48,
      (x, y) => ((x * 4) << 16) | ((y * 5) << 8) | ((x + y) * 2 & 0xFF)))
    val (maxD, meanD) = diffStats(bytes)
    assert(maxD <= 4, s"max channel diff $maxD")
    assert(meanD < 0.6, s"mean channel diff $meanD")
  }

  test("progressive: deterministic noise (worst case for EOB runs + refinement)") {
    val px = lcg(7L).take(40 * 24 * 3).toArray
    val bytes = encodeProgressive(rgbImage(40, 24, (x, y) => {
      val o = 3 * (y * 40 + x); (px(o) << 16) | (px(o + 1) << 8) | px(o + 2)
    }))
    val (maxD, meanD) = diffStats(bytes)
    assert(maxD <= 4, s"max channel diff $maxD")
    assert(meanD < 0.7, s"mean channel diff $meanD")
  }

  test("progressive: non-multiple-of-MCU dimensions (padded-block bookkeeping)") {
    val bytes = encodeProgressive(rgbImage(37, 23, (x, y) => (x * 7 + y * 3) & 0xFF))
    val (maxD, _) = diffStats(bytes)
    assert(maxD <= 4, s"max channel diff $maxD")
  }

  test("progressive: quality sweep tracks the JDK across quantization levels") {
    for (q <- Seq(0.3f, 0.75f, 0.95f)) {
      val bytes = encodeProgressive(rgbImage(48, 32,
        (x, y) => ((x * y) & 0xFF) << 16 | ((x * 3) & 0xFF) << 8 | ((y * 5) & 0xFF)), q)
      val (maxD, _) = diffStats(bytes)
      assert(maxD <= 4, s"quality $q: max channel diff $maxD")
    }
  }

  test("progressive: grayscale single-component scan script") {
    val img = new java.awt.image.BufferedImage(33, 21,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 21; x <- 0 until 33) {
      val g = (x * 8 + y) & 0xFF
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bytes = encodeProgressive(img)
    val ours = ImageCodecs.decodeJpeg(bytes)
    val ref = jdkDecode(bytes)
    var maxD = 0
    for (y <- 0 until ours.height; x <- 0 until ours.width) {
      val d = math.abs((ours.rgb(x, y) & 0xFF) - ref.getRaster.getSample(x, y, 0))
      maxD = math.max(maxD, d)
    }
    assert(maxD <= 4, s"max gray sample diff $maxD")
  }

  test("SOS with out-of-range Huffman table ids fails as IllegalArgument") {
    // huff slots are (2)(4); an unchecked Td/Th up to 15 used to escape
    // as ArrayIndexOutOfBounds, past the scan pipeline's corrupt-row catch
    val good = ImageCodecs.encodeJpeg(16, 16, (x, y) => x * y)
    val sos = good.indexOfSlice(Seq(0xFF.toByte, 0xDA.toByte))
    assert(sos >= 0, "fixture has no SOS marker")
    val bad = good.clone()
    bad(sos + 6) = 0xFF.toByte // first component's Td/Th byte → 15/15
    intercept[IllegalArgumentException] { ImageCodecs.decodeJpeg(bad) }
  }

  test("zero-length marker segment fails instead of looping forever") {
    // FF D8 (SOI), FF E5 (APPn) with length 0x0000 — the old walk did
    // `p += u16(p)` and spun on the same offset
    val bytes = Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte,
      0xE5.toByte, 0x00, 0x00, 0x41, 0x42)
    intercept[IllegalArgumentException] { ImageCodecs.decodeJpeg(bytes) }
  }
}
