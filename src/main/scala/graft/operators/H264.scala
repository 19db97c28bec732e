package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** H.264/AVC Annex-B stream plumbing — the keyframe-index pass a
  * training-data pipeline runs over compressed video BEFORE any pixel
  * decode: split the byte stream into NAL units, classify them, decode
  * the SPS (exp-Golomb, emulation-prevention-aware) for profile/level/
  * dimensions, and emit one row per IDR (I-frame) access point with its
  * essence features. Implemented against the PUBLIC bitstream layout
  * (ITU-T H.264 §7.3–7.4, Annex B byte-stream format): start-code
  * scanning, RBSP emulation-prevention (00 00 03) escape/strip, ue(v)
  * exp-Golomb coding. Entropy decode of slice DATA (CAVLC/CABAC,
  * intra prediction, IDCT) is the documented decodeStub boundary —
  * keyframe INDEXING is the part a distributed curation pipeline owns;
  * pixel decode belongs to a GPU decode stage downstream.
  *
  * Scale shape: executor-side mapPartitions, one forward pass per blob,
  * no driver involvement; corrupt streams drop the row (filter
  * semantics, the decodeVideoFrames contract).
  */
object H264 {

  // ---- bit-level RBSP plumbing -------------------------------------

  /** MSB-first bit writer with exp-Golomb ue(v) and RBSP trailing. */
  final class BitWriter {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
    private var cur = 0
    private var nBits = 0
    def u(v: Int, bits: Int): this.type = {
      require(bits >= 0 && bits <= 31 && v >= 0 && (bits == 31 || v < (1 << bits)),
        s"u($v, $bits) out of range")
      var i = bits - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >> i) & 1)
        nBits += 1
        if (nBits == 8) { buf += cur.toByte; cur = 0; nBits = 0 }
        i -= 1
      }
      this
    }
    /** Exp-Golomb unsigned: v+1 in ⌊log2(v+1)⌋ leading zeros + itself. */
    def ue(v: Int): this.type = {
      require(v >= 0, s"ue($v)")
      val k = v + 1
      val n = 31 - Integer.numberOfLeadingZeros(k)
      u(0, n); u(k, n + 1)
    }
    /** rbsp_trailing_bits: stop bit then zero-pad to a byte boundary. */
    def rbspTrailing(): Array[Byte] = {
      u(1, 1)
      if (nBits > 0) u(0, 8 - nBits)
      buf.toArray
    }
  }

  /** MSB-first bit reader over an (already EPB-stripped) RBSP. */
  final class BitReader(b: Array[Byte]) {
    private var pos = 0
    def u(bits: Int): Int = {
      var v = 0
      var i = 0
      while (i < bits) {
        require(pos < b.length * 8, "bit read past end of RBSP")
        v = (v << 1) | ((b(pos >> 3) >> (7 - (pos & 7))) & 1)
        pos += 1; i += 1
      }
      v
    }
    def ue(): Int = {
      var zeros = 0
      while (u(1) == 0) {
        zeros += 1
        // ≤ 30: at 31 the reconstruction (1<<31)-1 + u(31) wraps Int and
        // a corrupt field would decode to garbage instead of failing
        require(zeros <= 30, "exp-Golomb code longer than 30 leading zeros")
      }
      (1 << zeros) - 1 + (if (zeros == 0) 0 else u(zeros))
    }
  }

  /** Insert emulation-prevention bytes: any 00 00 followed by a byte
    * ≤ 03 gets 03 inserted (§7.4.1.1), making 00 00 00/01/02/03
    * unrepresentable inside a NAL payload.
    */
  def epbEscape(rbsp: Array[Byte]): Array[Byte] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    var zeros = 0
    rbsp.foreach { b =>
      if (zeros >= 2 && (b & 0xFF) <= 3) { out += 3; zeros = 0 }
      out += b
      zeros = if (b == 0) zeros + 1 else 0
    }
    out.toArray
  }

  /** Strip emulation-prevention: drop every 03 that follows 00 00. */
  def epbStrip(payload: Array[Byte]): Array[Byte] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    var zeros = 0
    payload.foreach { b =>
      if (zeros >= 2 && b == 3) zeros = 0 // the EPB itself: skip
      else {
        out += b
        zeros = if (b == 0) zeros + 1 else 0
      }
    }
    out.toArray
  }

  // ---- NAL layer ----------------------------------------------------

  /** One NAL unit: type (lowest 5 header bits) + payload AFTER the
    * header byte (still EPB-escaped — strip before bit-reading).
    */
  final case class Nal(nalType: Int, refIdc: Int, payload: Array[Byte])

  val NalSlice = 1
  val NalIdr = 5
  val NalSei = 6
  val NalSps = 7
  val NalPps = 8

  /** Split an Annex-B byte stream on 00 00 01 / 00 00 00 01 start
    * codes. A stream with no leading start code is malformed (loud
    * IllegalArgumentException — callers map it to row-drop).
    */
  def parseNals(b: Array[Byte]): Seq[Nal] = {
    // collect start-code positions: i = offset of the 01 byte
    val starts = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 2
    while (i < b.length) {
      if (b(i) == 1 && b(i - 1) == 0 && b(i - 2) == 0) { starts += i; i += 3 }
      else i += 1
    }
    require(starts.nonEmpty, "no Annex-B start code in stream")
    // everything before the first start code must be 00s (the optional
    // 4-byte form's extra zero, or leading_zero_8bits)
    val lead = starts.head - 2
    require((0 until lead).forall(b(_) == 0),
      s"garbage before first start code (offset 0..${lead - 1})")
    starts.toSeq.zipWithIndex.map { case (s, idx) =>
      val from = s + 1
      // NAL extends to the next start code (minus its 2-3 zero prefix)
      val toRaw = if (idx + 1 < starts.length) starts(idx + 1) - 2 else b.length
      // trailing zeros before the next start code belong to ITS prefix
      var to = toRaw
      while (to > from && idx + 1 < starts.length && b(to - 1) == 0) to -= 1
      require(to > from, s"empty NAL at offset $s")
      val header = b(from) & 0xFF
      require((header & 0x80) == 0, f"forbidden_zero_bit set in NAL header 0x$header%02x")
      Nal(header & 0x1F, (header >> 5) & 3,
        java.util.Arrays.copyOfRange(b, from + 1, to))
    }
  }

  /** Decoded SPS surface — the fields a keyframe indexer needs. */
  final case class SpsInfo(profileIdc: Int, levelIdc: Int, width: Int, height: Int)

  /** Parse a (EPB-escaped) SPS payload: §7.3.2.1.1 through the frame
    * dimensions, baseline-profile field order (poc_type 0). Dimensions
    * assume frame_mbs_only and no cropping — the synthesizer's shape;
    * cropped streams would subtract the crop window here.
    */
  def parseSps(payload: Array[Byte]): SpsInfo = {
    val r = new BitReader(epbStrip(payload))
    val profile = r.u(8)
    r.u(8) // constraint_set flags + reserved
    val level = r.u(8)
    r.ue() // seq_parameter_set_id
    require(profile != 100 && profile != 110 && profile != 122 && profile != 244,
      s"high-profile SPS (profile_idc=$profile) chroma fields not supported")
    r.ue() // log2_max_frame_num_minus4
    val pocType = r.ue()
    if (pocType == 0) r.ue() // log2_max_pic_order_cnt_lsb_minus4
    else require(pocType == 2, s"poc_type $pocType not supported")
    r.ue() // max_num_ref_frames
    r.u(1) // gaps_in_frame_num_value_allowed_flag
    val wMbs = r.ue() + 1
    val hMap = r.ue() + 1
    // sanity bound so a corrupt SPS DROPS (the indexer's contract)
    // instead of emitting nonsense dimensions: the spec's level table
    // tops out far below 1024 MBs a side (16384 px)
    require(wMbs <= 1024 && hMap <= 1024,
      s"implausible SPS dimensions ${16 * wMbs}x${16 * hMap}")
    val frameMbsOnly = r.u(1)
    require(frameMbsOnly == 1, "interlaced (field-coded) SPS not supported")
    r.u(1) // direct_8x8_inference_flag
    val cropping = r.u(1)
    require(cropping == 0, "frame cropping not supported by this indexer")
    SpsInfo(profile, level, 16 * wMbs, 16 * hMap)
  }

  /** Encode a baseline SPS RBSP (EPB-escaped) for the given macroblock
    * dimensions — the synthesizer's twin of [[parseSps]].
    */
  def encodeSps(wMbs: Int, hMbs: Int, profileIdc: Int = 66, levelIdc: Int = 30): Array[Byte] = {
    require(wMbs >= 1 && hMbs >= 1)
    val w = new BitWriter
    w.u(profileIdc, 8).u(0, 8).u(levelIdc, 8)
    w.ue(0)      // seq_parameter_set_id
    w.ue(0)      // log2_max_frame_num_minus4
    w.ue(0)      // pic_order_cnt_type
    w.ue(0)      // log2_max_pic_order_cnt_lsb_minus4
    w.ue(1)      // max_num_ref_frames
    w.u(0, 1)    // gaps_in_frame_num_value_allowed_flag
    w.ue(wMbs - 1)
    w.ue(hMbs - 1)
    w.u(1, 1)    // frame_mbs_only_flag
    w.u(0, 1)    // direct_8x8_inference_flag
    w.u(0, 1)    // frame_cropping_flag
    w.u(0, 1)    // vui_parameters_present_flag
    epbEscape(w.rbspTrailing())
  }

  /** Minimal PPS RBSP (entropy_coding_mode = CAVLC) — present so the
    * stream is structurally complete; the indexer classifies and skips it.
    */
  def encodePps(): Array[Byte] = {
    val w = new BitWriter
    w.ue(0); w.ue(0) // pps id, sps id
    w.u(0, 1)        // entropy_coding_mode_flag (CAVLC)
    w.u(0, 1)        // bottom_field_pic_order_in_frame_present_flag
    w.ue(0)          // num_slice_groups_minus1
    w.ue(0); w.ue(0) // num_ref_idx_l{0,1}_default_active_minus1
    w.u(0, 1)        // weighted_pred_flag
    w.u(0, 2)        // weighted_bipred_idc
    w.ue(0); w.ue(0) // pic_init_qp/qs_minus26 (se(0) == ue(0) bit pattern)
    w.ue(0)          // chroma_qp_index_offset
    w.u(0, 3)        // deblocking/constrained_intra/redundant_pic flags
    epbEscape(w.rbspTrailing())
  }

  // ---- closed-form synthetic stream (the q180/q219 fixture idiom) ---

  /** Per-doc closed-form parameters: every byte of the stream is a pure
    * function of (doc_id, frame, position), so a SQL oracle recomputes
    * the essence features without parsing anything.
    */
  object Pattern {
    def seed(id: Long): Int = (id % 9973).toInt
    def wMbs(id: Long): Int = 1 + (id % 4).toInt   // width 16..64
    def hMbs(id: Long): Int = 1 + (id % 3).toInt   // height 16..48
    def nFrames(id: Long): Int = 4 + (id % 5).toInt
    def isIdr(f: Int): Boolean = f % 3 == 0
    def payloadLen(id: Long, f: Int): Int = (20 + (7 * id + 11 * f) % 40).toInt
    /** byte k of frame f's slice payload — 1..251, NEVER zero, so slice
      * payloads cannot contain start codes or EPB patterns and the SQL
      * oracle needs no escape arithmetic
      */
    def payloadByte(id: Long, f: Int, k: Int): Int =
      ((seed(id) + 3 * k + 17 * f) % 251) + 1
  }

  /** Synthesize a REAL Annex-B stream: 4-byte-start-code SPS, PPS, then
    * one slice NAL per frame (IDR every 3rd, 3-byte start codes), plus a
    * SEI the indexer must skip on every 4th id.
    */
  def buildAnnexB(id: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def nal(startLen: Int, header: Int, payload: Array[Byte]): Unit = {
      (0 until startLen - 1).foreach(_ => out.write(0))
      out.write(1); out.write(header); out.write(payload, 0, payload.length)
    }
    nal(4, 0x67, encodeSps(Pattern.wMbs(id), Pattern.hMbs(id)))
    nal(3, 0x68, encodePps())
    if (id % 4 == 0) nal(3, 0x06, Array[Byte](5, 1, 0x42, (0x80).toByte))
    (0 until Pattern.nFrames(id)).foreach { f =>
      val p = Array.tabulate(Pattern.payloadLen(id, f))(k =>
        Pattern.payloadByte(id, f, k).toByte)
      nal(3, if (Pattern.isIdr(f)) 0x65 else 0x41, p)
    }
    out.toByteArray
  }

  /** Media table of synthetic Annex-B blobs (one per document). */
  def syntheticStreams(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("modality", StringType),
      StructField("bytes", BinaryType)))
    val rdd = docs.select("doc_id").rdd.mapPartitions { it =>
      it.map { r => Row(r.getLong(0), "video", buildAnnexB(r.getLong(0))) }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** The keyframe index: one row per IDR NAL with the stream's SPS
    * surface and the IDR payload's essence features (length and byte
    * sum — exact integers). frame_idx counts VCL NALs (slice + IDR) in
    * stream order; non-VCL NALs (SPS/PPS/SEI) are classified and
    * skipped. Corrupt streams (no start code, bad SPS, forbidden bit)
    * drop the row.
    */
  def idrIndex(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("profile_idc", IntegerType),
      StructField("level_idc", IntegerType),
      StructField("payload_len", LongType),
      StructField("payload_sum", LongType)))
    val rdd = media.select("media_id", "bytes").rdd.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        // NULL essence is filter semantics like corruption (drop the row),
        // not a task failure — parseNals would NPE on it otherwise
        if (bytes == null) Seq.empty[Row]
        else try {
          val nals = parseNals(bytes)
          val sps = nals.find(_.nalType == NalSps)
            .map(n => parseSps(n.payload))
            .getOrElse(throw new IllegalArgumentException("stream has no SPS"))
          var vcl = 0
          nals.flatMap { n =>
            if (n.nalType == NalSlice || n.nalType == NalIdr) {
              val f = vcl; vcl += 1
              if (n.nalType == NalIdr)
                Some(Row(id, f, sps.width, sps.height, sps.profileIdc,
                  sps.levelIdc, n.payload.length.toLong,
                  n.payload.foldLeft(0L)((a, b) => a + (b & 0xFF))))
              else None
            } else None
          }
        } catch { case _: IllegalArgumentException => Seq.empty[Row] }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
