package graft

import graft.operators.H264

/** H.264 Annex-B keyframe indexing: exp-Golomb/EPB round trips, SPS
  * parse, NAL classification, closed-form essence agreement, and loud
  * failure (row-drop) on corrupt streams.
  */
class H264Spec extends SparkSpec {
  import spark.implicits._

  test("exp-Golomb ue round-trips through the bit writer/reader") {
    for (v <- Seq(0, 1, 2, 3, 7, 8, 100, 255, 4095)) {
      val bytes = new H264.BitWriter().ue(v).rbspTrailing()
      assert(new H264.BitReader(bytes).ue() == v, s"ue($v)")
    }
    // several values in one RBSP, interleaved with fixed-width fields
    val w = new H264.BitWriter().u(5, 3).ue(17).u(1, 1).ue(0).ue(300)
    val r = new H264.BitReader(w.rbspTrailing())
    assert((r.u(3), r.ue(), r.u(1), r.ue(), r.ue()) == ((5, 17, 1, 0, 300)))
  }

  test("emulation prevention: escape makes 00 00 0x unrepresentable, strip inverts") {
    val patterns = Seq(
      Array[Byte](0, 0, 0), Array[Byte](0, 0, 1), Array[Byte](0, 0, 2),
      Array[Byte](0, 0, 3), Array[Byte](0, 0, 0, 0, 1), Array[Byte](1, 0, 0),
      Array[Byte](0, 0, 4), Array.fill[Byte](8)(0))
    patterns.foreach { p =>
      val esc = H264.epbEscape(p)
      // no start-code prefix (00 00 00/01/02) survives escaping — 00 00 03
      // is the escape marker itself and is legal in the escaped stream
      assert(!esc.sliding(3).exists(w =>
        w.length == 3 && w(0) == 0 && w(1) == 0 && (w(2) & 0xFF) <= 2),
        s"escape left 00 00 0x in ${esc.mkString(",")}")
      assert(H264.epbStrip(esc).toSeq == p.toSeq, s"strip(escape) != id for ${p.mkString(",")}")
    }
  }

  test("SPS encode/parse round-trip across the dimension grid") {
    for (wMbs <- 1 to 8; hMbs <- 1 to 6) {
      val sps = H264.parseSps(H264.encodeSps(wMbs, hMbs))
      assert(sps == H264.SpsInfo(66, 30, 16 * wMbs, 16 * hMbs))
    }
  }

  test("idrIndex matches the closed-form pattern exactly (incl. SEI-carrying ids)") {
    val docs = (1L to 200L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val got = H264.idrIndex(H264.syntheticStreams(docs))
      .as[(Long, Int, Int, Int, Int, Int, Long, Long)].collect()
      .map(t => (t._1, t._2) -> t).toMap
    val expected = for {
      id <- 1L to 200L
      f <- 0 until H264.Pattern.nFrames(id)
      if H264.Pattern.isIdr(f)
    } yield (id, f)
    assert(got.keySet == expected.toSet)
    expected.foreach { case (id, f) =>
      val (_, _, w, h, p, l, len, sum) = got((id, f))
      assert(w == 16 * H264.Pattern.wMbs(id) && h == 16 * H264.Pattern.hMbs(id))
      assert(p == 66 && l == 30)
      val pl = H264.Pattern.payloadLen(id, f)
      assert(len == pl.toLong)
      assert(sum == (0 until pl).map(H264.Pattern.payloadByte(id, f, _).toLong).sum)
    }
  }

  test("corrupt SPS dimension fields drop the row, never emit nonsense dims") {
    // an SPS whose width field is a huge ue value (25 leading zeros) and
    // one that would wrap Int at 31 zeros: both must fail parseSps with
    // IllegalArgumentException (-> row drop), not decode to garbage
    def spsWithRawWidthBits(widthBits: H264.BitWriter => Unit): Array[Byte] = {
      val w = new H264.BitWriter
      w.u(66, 8).u(0, 8).u(30, 8)
      w.ue(0); w.ue(0); w.ue(0); w.ue(0); w.ue(1); w.u(0, 1)
      widthBits(w)
      w.ue(0) // height
      w.u(1, 1); w.u(0, 1); w.u(0, 1); w.u(0, 1)
      H264.epbEscape(w.rbspTrailing())
    }
    // width ue with 25 leading zeros -> value ~2^25: implausible-dims require
    val huge = spsWithRawWidthBits(w => { w.u(0, 25); w.u(1, 1); w.u(0, 25) })
    intercept[IllegalArgumentException](H264.parseSps(huge))
    // 31 leading zeros -> the exp-Golomb length guard, before any wrap
    val wrap = spsWithRawWidthBits(w => { w.u(0, 31); w.u(1, 1); w.u(0, 31) })
    intercept[IllegalArgumentException](H264.parseSps(wrap))
  }

  test("corrupt streams drop the row; valid neighbors survive") {
    val good = H264.buildAnnexB(7L)
    val truncatedSps = good.take(6) // cuts inside the SPS payload
    val noStart = Array.tabulate[Byte](32)(i => ((i % 5) + 10).toByte)
    val forbidden = good.clone(); forbidden(4) = (forbidden(4) | 0x80).toByte
    val rows = Seq(
      (1L, "video", good),
      (2L, "video", truncatedSps),
      (3L, "video", noStart),
      (4L, "video", forbidden))
      .toDF("media_id", "modality", "bytes")
    val surviving = H264.idrIndex(rows).select("media_id").distinct()
      .as[Long].collect().toSet
    assert(surviving == Set(1L), s"only the intact stream may emit rows: $surviving")
  }

  test("mutation fuzz: indexer never throws uncaught — every corruption drops or parses") {
    val base = H264.buildAnnexB(12L)
    val mutated = (0 until 300).map { m =>
      val b = base.clone()
      val pos = (m * 7919) % b.length
      b(pos) = (b(pos) ^ (1 << (m % 8))).toByte
      (m.toLong, "video", b)
    }
    // must complete without exception; any subset of rows may survive
    val n = H264.idrIndex(mutated.toDF("media_id", "modality", "bytes")).count()
    assert(n >= 0)
    info(s"300 single-bit mutations -> $n surviving IDR rows")
  }
}
