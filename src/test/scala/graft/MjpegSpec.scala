package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal
import graft.operators.Multimodal.{ImageCodecs, VideoCodecs, MjpegPattern}

/** MJPEG frame essence: the hand-written DC-only grayscale JPEG encoder
  * (the exactly-round-trippable T.81 subset), the AVI MJPEG mux, and
  * the container walk decoding `00dc` JPEG chunks through the repo's
  * own T.81 decoder. DC-only constant blocks are the one JPEG input
  * where conforming decoders cannot differ, so these pins are EXACT —
  * both against our decoder and against the JDK's.
  */
class MjpegSpec extends AnyFunSuite {

  private def gray(bx: Int, by: Int): Int = (37 * (by * 4 + bx) + 11) % 256

  test("DC-only gray JPEG round-trips bit-exactly through our decoder") {
    val bytes = ImageCodecs.encodeJpegDcGray(32, 16, gray)
    val d = ImageCodecs.decodeJpeg(bytes)
    assert(d.width == 32 && d.height == 16)
    for (y <- 0 until 16; x <- 0 until 32) {
      val v = gray(x / 8, y / 8)
      val expected = (v << 16) | (v << 8) | v
      assert(d.rgb(x, y) == expected,
        s"pixel ($x,$y): got ${d.rgb(x, y).toHexString}, want ${expected.toHexString}")
    }
  }

  test("DC-only gray JPEG decodes bit-exactly in the JDK decoder too") {
    val bytes = ImageCodecs.encodeJpegDcGray(24, 24, gray)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "JDK could not decode the hand-encoded JPEG")
    assert(img.getWidth == 24 && img.getHeight == 24)
    // raw raster samples, NOT getRGB: getRGB routes the gray channel
    // through color management (linear-gray → sRGB gamma), which is a
    // display transform, not a decode difference
    for (y <- 0 until 24; x <- 0 until 24) {
      val v = gray(x / 8, y / 8)
      assert(img.getRaster.getSample(x, y, 0) == v, s"JDK pixel ($x,$y)")
    }
  }

  test("boundary gray levels (0, 255) and large DC jumps survive") {
    // adjacent blocks at the extremes exercise the max DC diff (±2040,
    // category 11 — the deepest code in the Annex K DC table)
    val g = (bx: Int, _: Int) => if (bx % 2 == 0) 0 else 255
    val bytes = ImageCodecs.encodeJpegDcGray(64, 8, g)
    val d = ImageCodecs.decodeJpeg(bytes)
    for (x <- 0 until 64) {
      val v = if ((x / 8) % 2 == 0) 0 else 255
      assert(d.rgb(x, 0) == ((v << 16) | (v << 8) | v), s"pixel ($x,0)")
    }
  }

  test("AVI MJPEG mux: frame walk decodes every frame to the formula's sums") {
    val id = 7L
    val m = MjpegPattern.meta(id)
    val bytes = VideoCodecs.encodeAviMjpeg(m, MjpegPattern.gray(id), junk = true)
    val (meta, frames) = VideoCodecs.decodeAviFrames(bytes, stride = 1)
    assert(meta == m)
    assert(frames.map(_.idx) == (0 until m.frames))
    val bw = m.width / 8; val bh = m.height / 8
    frames.foreach { fs =>
      val blockVals = for (by <- 0 until bh; bx <- 0 until bw)
        yield MjpegPattern.gray(id)(fs.idx, bx, by).toLong
      val expSum = 64L * blockVals.sum
      val expRow0 = 8L * (0 until bw).map(bx =>
        MjpegPattern.gray(id)(fs.idx, bx, 0).toLong).sum
      assert(fs.sumR == expSum && fs.sumG == expSum && fs.sumB == expSum,
        s"frame ${fs.idx} sums")
      assert(fs.row0SumR == expRow0, s"frame ${fs.idx} row0")
    }
  }

  test("stride sampling and frameAHash work on MJPEG essence") {
    val id = 3L
    val m = MjpegPattern.meta(id)
    val bytes = VideoCodecs.encodeAviMjpeg(m, MjpegPattern.gray(id))
    val (_, sampled) = VideoCodecs.decodeAviFrames(bytes, stride = 2)
    assert(sampled.map(_.idx) == (0 until m.frames by 2))
    val (_, sigs) = VideoCodecs.frameAHash(bytes, stride = 1)
    assert(sigs.length == m.frames)
    // aHash derived from the SAME decoded raster: recompute from formula
    sigs.foreach { case (f, sig) =>
      val cs = new Array[Long](16); val cc = new Array[Long](16); var tot = 0L
      for (y <- 0 until m.height; x <- 0 until m.width) {
        val v = MjpegPattern.gray(id)(f, x / 8, y / 8).toLong
        val c = (y * 4 / m.height) * 4 + (x * 4 / m.width)
        cs(c) += v; cc(c) += 1; tot += v
      }
      val n = m.width.toLong * m.height
      var exp = 0
      for (c <- 0 until 16)
        if (cc(c) > 0 && cs(c) * n >= tot * cc(c)) exp |= 1 << c
      assert(sig == exp, s"frame $f aHash")
    }
  }

  test("a corrupt JPEG chunk fails as IllegalArgumentException, not an escape") {
    val m = VideoCodecs.AviMeta(16, 8, 2, 33333, 1)
    val good = VideoCodecs.encodeAviMjpeg(m, (_, bx, by) => gray(bx, by))
    // find the second frame's SOI and truncate the scan mid-stream
    val bad = java.util.Arrays.copyOfRange(good, 0, good.length)
    // corrupt a byte inside the last frame's entropy data (before EOI)
    bad(bad.length - 6) = 0x00
    // either decodes differently or fails loudly — never an unchecked
    // exception class
    try { VideoCodecs.decodeAviFrames(bad, 1); () }
    catch { case _: IllegalArgumentException => () }
  }

  test("DIB and MJPEG essence coexist: dispatch is by exact DIB size first") {
    // a DIB-essence file still decodes through the original path
    val id = 4L
    val em = Multimodal.VideoEssencePattern.meta(id)
    val dib = VideoCodecs.encodeAviEssence(em, Multimodal.VideoEssencePattern.rgb(id))
    val (meta, frames) = VideoCodecs.decodeAviFrames(dib, 1)
    assert(meta == em && frames.length == em.frames)
  }
}
