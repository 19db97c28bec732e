package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.ScalarOps

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns plus typed metadata, with decode/feature-extraction staged as
  * per-partition batch operators.
  *
  * Three image formats decode FOR REAL, pure JVM: 24-bit uncompressed BMP
  * and binary PPM (P6) via [[ImageCodecs]] (hand-written against the
  * public format layouts, golden-byte-pinned and cross-checked against
  * `javax.imageio` in MultimodalSpec), and PNG via the JDK's built-in
  * ImageIO reader. Audio decodes FOR REAL via [[AudioCodecs]] (WAV/RIFF
  * 16-bit PCM, cross-checked against `javax.sound`), and video-container
  * metadata via [[VideoCodecs]] (AVI/RIFF `avih` header). Formats with
  * no JVM decoder (JPEG-XL, video essence/pixels) fall through to
  * `decodeStub`'s deterministic byte features — the honest boundary,
  * now an edge case rather than the whole modality.
  *
  * Scale: binaries ride in parquet as BYTE_ARRAY; select only metadata
  * columns when features suffice (column pruning skips the blobs);
  * repartition by size-class before decode so one executor doesn't get all
  * the 4K videos.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("modality", StringType),      // image | audio | video
    StructField("bytes", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("byte_len", LongType),
      StructField("content_hash", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("frame_count", IntegerType))))))

  /** Wrap a documents-shaped DF into the media schema (text bytes stand in
    * for media payloads; deterministic fake dimensions from the content
    * hash).
    */
  def attachBinary(docs: DataFrame): DataFrame = {
    val h = ScalarOps.md5Hash32(col("text"))
    docs.select(
      col("doc_id").as("media_id"),
      lit("image").as("modality"),
      encode(col("text"), "UTF-8").as("bytes"),
      struct(
        length(encode(col("text"), "UTF-8")).cast(LongType).as("byte_len"),
        h.as("content_hash"),
        (lit(64) + (h % 512)).cast(IntegerType).as("width"),
        (lit(64) + (h % 256)).cast(IntegerType).as("height"),
        (col("n_chars") % 30).cast(IntegerType).as("frame_count")).as("meta"))
  }

  /** STUB decode: real implementation would decode `bytes` with an image
    * library per partition. Here: deterministic per-row features computed
    * from the raw bytes in a mapPartitions batch (mirrors the real decode's
    * execution shape — iterator-in/iterator-out, one JVM call per batch).
    */
  def decodeStub(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("modality", StringType),
      StructField("byte_len", LongType),
      StructField("first_byte", IntegerType),
      StructField("byte_sum_64", LongType)))
    val rdd = media.select("media_id", "modality", "bytes").rdd.mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]]("bytes")
        // ??? real decode goes here (PIL/ffmpeg equivalent); fake features:
        val head = bytes.take(64)
        Row(r.getAs[Long]("media_id"), r.getAs[String]("modality"),
          bytes.length.toLong,
          if (bytes.nonEmpty) bytes(0).toInt & 0xff else -1,
          head.foldLeft(0L)((a, b) => a + (b & 0xff)))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Frame sampling for video-modality rows: emit every `stride`-th frame
    * index as its own row — the explode pattern a real frame extractor
    * would follow.
    */
  def frameSample(media: DataFrame, stride: Int): DataFrame =
    media
      .filter(col("meta.frame_count") > 0)
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("meta.frame_count") - 1, lit(stride))))
      .select("media_id", "modality", "frame_idx")

  /** Hand-written codecs for the two bounded image formats a JVM can
    * decode with no dependency: 24-bit uncompressed BMP (BITMAPFILEHEADER
    * + BITMAPINFOHEADER, little-endian, BGR byte order, 4-byte-padded
    * rows stored bottom-up — or top-down when height is negative) and
    * binary PPM `P6` (ASCII header, RGB bytes top-down). Layouts are
    * public format documentation; MultimodalSpec pins golden bytes and
    * cross-checks both directions against `javax.imageio`.
    */
  object ImageCodecs {

    // ImageIO's stream caches default to DISK-backed: every
    // ImageIO.read/write/createImageOutputStream creates (and deletes) a
    // temp FILE under java.io.tmpdir. Per-row decode at corpus scale
    // turns that into ~10^6 serialized file ops on one directory — the
    // r11 sf10 audit measured q80 super-linear (1.3 s at 50k rows,
    // 49-68 s at 500k, spread widening as tmp churns) with the codec
    // itself unchanged. Our images are bounded (tens of px), so
    // memory-backed caches are strictly better. Object-init runs once
    // per JVM, executors included (the flag is a JVM-wide static).
    javax.imageio.ImageIO.setUseCache(false)

    /** Decoded image presented as a row-major accessor: `rgb(x, y)` is
      * 0xRRGGBB at logical position (x, y), y = 0 the TOP row regardless
      * of the storage order — orientation bugs show up in the row-0
      * features, which is why [[decodeMedia]] emits them.
      */
    final case class Decoded(width: Int, height: Int, rgb: (Int, Int) => Int)

    private def u16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
    private def u32(b: Array[Byte], o: Int): Long =
      (b(o) & 0xFFL) | ((b(o + 1) & 0xFFL) << 8) |
        ((b(o + 2) & 0xFFL) << 16) | ((b(o + 3) & 0xFFL) << 24)

    def isBmp(b: Array[Byte]): Boolean =
      b.length >= 2 && b(0) == 'B'.toByte && b(1) == 'M'.toByte
    def isPpm(b: Array[Byte]): Boolean =
      b.length >= 2 && b(0) == 'P'.toByte && b(1) == '6'.toByte
    def isPng(b: Array[Byte]): Boolean =
      b.length >= 8 && (b(0) & 0xFF) == 0x89 && b(1) == 'P'.toByte &&
        b(2) == 'N'.toByte && b(3) == 'G'.toByte

    /** 24-bit BI_RGB BMP encoder; `rgb(x, y)` gives 0xRRGGBB, y=0 = top. */
    def encodeBmp(w: Int, h: Int, rgb: (Int, Int) => Int): Array[Byte] = {
      val stride = ((w * 3 + 3) / 4) * 4
      val size = 54 + stride * h
      val out = new Array[Byte](size)
      def pu16(o: Int, v: Int): Unit = { out(o) = v.toByte; out(o + 1) = (v >> 8).toByte }
      def pu32(o: Int, v: Long): Unit = {
        out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
        out(o + 2) = (v >> 16).toByte; out(o + 3) = (v >> 24).toByte
      }
      out(0) = 'B'; out(1) = 'M'
      pu32(2, size); pu32(10, 54)              // file size, pixel-data offset
      pu32(14, 40); pu32(18, w); pu32(22, h)   // BITMAPINFOHEADER, +h = bottom-up
      pu16(26, 1); pu16(28, 24)                // planes, bpp
      pu32(30, 0); pu32(34, stride.toLong * h) // BI_RGB, image size
      pu32(38, 2835); pu32(42, 2835)           // 72 dpi
      var yStored = 0
      while (yStored < h) {
        val y = h - 1 - yStored // bottom-up storage
        val rowOff = 54 + yStored * stride
        var x = 0
        while (x < w) {
          val p = rgb(x, y)
          out(rowOff + 3 * x) = p.toByte              // B
          out(rowOff + 3 * x + 1) = (p >> 8).toByte   // G
          out(rowOff + 3 * x + 2) = (p >> 16).toByte  // R
          x += 1
        }
        yStored += 1
      }
      out
    }

    def decodeBmp(b: Array[Byte]): Decoded = {
      require(isBmp(b) && b.length >= 54, "not a BMP")
      val dataOffset = u32(b, 10).toInt
      require(u32(b, 14) >= 40, s"unsupported header size ${u32(b, 14)}")
      val w = u32(b, 18).toInt
      val hRaw = u32(b, 22).toInt // negative = top-down storage
      val h = math.abs(hRaw)
      // dimension sanity BEFORE any size arithmetic: a crafted header
      // (w=2^25, h=2^9) would overflow stride*h in Int and sneak past the
      // truncation require into an out-of-bounds pixel read — all bounds
      // math is Long and fails as the promised IllegalArgumentException
      require(w > 0 && h > 0 && w <= (1 << 20) && h <= (1 << 20), s"implausible dimensions ${w}x$hRaw")
      require(dataOffset >= 54 && dataOffset <= b.length, s"bad pixel-data offset $dataOffset")
      require(u16(b, 26) == 1, "planes != 1")
      require(u16(b, 28) == 24, s"unsupported bpp ${u16(b, 28)} (24-bit only)")
      require(u32(b, 30) == 0, "compressed BMP unsupported (BI_RGB only)")
      val stride = ((w * 3 + 3) / 4) * 4
      require(b.length.toLong >= dataOffset.toLong + stride.toLong * h, "truncated pixel data")
      Decoded(w, h, (x, y) => {
        val yStored = if (hRaw > 0) h - 1 - y else y
        val o = dataOffset + yStored * stride + 3 * x
        ((b(o + 2) & 0xFF) << 16) | ((b(o + 1) & 0xFF) << 8) | (b(o) & 0xFF)
      })
    }

    /** Binary PPM (`P6`) encoder: minimal header, maxval 255, RGB top-down. */
    def encodePpm(w: Int, h: Int, rgb: (Int, Int) => Int): Array[Byte] = {
      val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
      val out = new Array[Byte](header.length + 3 * w * h)
      System.arraycopy(header, 0, out, 0, header.length)
      var i = header.length
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = rgb(x, y)
          out(i) = (p >> 16).toByte; out(i + 1) = (p >> 8).toByte; out(i + 2) = p.toByte
          i += 3; x += 1
        }
        y += 1
      }
      out
    }

    def decodePpm(b: Array[Byte]): Decoded = {
      require(isPpm(b), "not a P6 PPM")
      // header = 4 whitespace-separated ASCII tokens ('#' comments allowed),
      // then exactly ONE whitespace byte before the raw RGB samples
      var pos = 2
      def token(): Int = {
        while (pos < b.length &&
          (Character.isWhitespace(b(pos)) || b(pos) == '#'.toByte)) {
          if (b(pos) == '#'.toByte) while (pos < b.length && b(pos) != '\n'.toByte) pos += 1
          else pos += 1
        }
        var v = 0
        while (pos < b.length && !Character.isWhitespace(b(pos))) {
          require(b(pos) >= '0'.toByte && b(pos) <= '9'.toByte, "bad PPM header")
          v = v * 10 + (b(pos) - '0'.toByte); pos += 1
        }
        v
      }
      val w = token(); val h = token(); val maxval = token()
      require(maxval == 255, s"unsupported maxval $maxval")
      require(w > 0 && h > 0 && w <= (1 << 20) && h <= (1 << 20), s"implausible dimensions ${w}x$h")
      // exactly one whitespace byte separates maxval from the raster —
      // validated, with the common CRLF-writer deviation handled
      // explicitly (skipping only the '\r' would shift every sample one
      // byte and rotate the channels silently)
      require(pos < b.length && Character.isWhitespace(b(pos)), "missing raster separator")
      if (b(pos) == '\r'.toByte && pos + 1 < b.length && b(pos + 1) == '\n'.toByte) pos += 2
      else pos += 1
      require(b.length.toLong >= pos.toLong + 3L * w * h, "truncated pixel data")
      val base = pos
      Decoded(w, h, (x, y) => {
        val o = base + 3 * (y * w + x)
        ((b(o) & 0xFF) << 16) | ((b(o + 1) & 0xFF) << 8) | (b(o + 2) & 0xFF)
      })
    }

    def isGif(b: Array[Byte]): Boolean =
      b.length >= 6 && b(0) == 'G'.toByte && b(1) == 'I'.toByte &&
        b(2) == 'F'.toByte && b(3) == '8'.toByte &&
        (b(4) == '7'.toByte || b(4) == '9'.toByte) && b(5) == 'a'.toByte

    /** GIF89a encoder with a hand-written LZW compressor — the first
      * COMPRESSED hand codec (BMP/PPM are raw; PNG delegates to
      * ImageIO). 256-entry grayscale global color table, so the pixel
      * index IS the gray value and decoded features stay closed-form
      * (the q80 oracle contract). Variable-width LZW codes pack
      * LSB-first into <=255-byte sub-blocks; the width bump and the
      * 4096-entry CLEAR/reset both mirror [[lzwDecode]], and both
      * directions are pinned against the JDK's own GIF codec in
      * MultimodalSpec.
      */
    def encodeGif(w: Int, h: Int, gray: (Int, Int) => Int): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      def pu16(v: Int): Unit = { bos.write(v & 0xFF); bos.write((v >> 8) & 0xFF) }
      bos.write("GIF89a".getBytes("US-ASCII"))
      pu16(w); pu16(h)
      bos.write(0xF7) // GCT present, 8-bit color resolution, 256 entries
      bos.write(0); bos.write(0)
      var i = 0
      while (i < 256) { bos.write(i); bos.write(i); bos.write(i); i += 1 }
      bos.write(0x2C) // image descriptor: full frame, no LCT, no interlace
      pu16(0); pu16(0); pu16(w); pu16(h); bos.write(0)
      val px = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { px(y * w + x) = (gray(x, y) & 0xFF).toByte; x += 1 }
        y += 1
      }
      bos.write(8) // LZW min code size
      val comp = lzwEncode(8, px)
      var o = 0
      while (o < comp.length) {
        val n = math.min(255, comp.length - o)
        bos.write(n); bos.write(comp, o, n); o += n
      }
      bos.write(0)    // block terminator
      bos.write(0x3B) // trailer
      bos.toByteArray
    }

    /** GIF LZW compress (variable 3..12-bit codes, LSB-first packing,
      * leading CLEAR, CLEAR+reset when the dictionary hits 4096, EOI
      * terminator). The width rule matches the decoder one add behind:
      * widen when the NEXT code to assign no longer fits the current
      * width.
      */
    private[graft] def lzwEncode(minCodeSize: Int, data: Array[Byte]): Array[Byte] = {
      val clear = 1 << minCodeSize
      val eoi = clear + 1
      val bos = new java.io.ByteArrayOutputStream()
      var bitBuf = 0L; var bitCnt = 0
      var codeWidth = minCodeSize + 1
      def emit(code: Int): Unit = {
        bitBuf |= code.toLong << bitCnt; bitCnt += codeWidth
        while (bitCnt >= 8) { bos.write((bitBuf & 0xFF).toInt); bitBuf >>>= 8; bitCnt -= 8 }
      }
      // (prefixCode << 8 | byte) -> code
      val dict = new java.util.HashMap[Integer, Integer]()
      var nextFree = eoi + 1
      def reset(): Unit = { dict.clear(); nextFree = eoi + 1; codeWidth = minCodeSize + 1 }
      emit(clear)
      var prefix = -1
      var i = 0
      while (i < data.length) {
        val b = data(i) & 0xFF
        if (prefix < 0) prefix = b
        else {
          val key = Integer.valueOf((prefix << 8) | b)
          val hit = dict.get(key)
          if (hit != null) prefix = hit.intValue()
          else {
            emit(prefix)
            dict.put(key, Integer.valueOf(nextFree)); nextFree += 1
            // decoder adds its mirror entry only after the NEXT code
            // arrives, so the encoder widens as soon as its own next
            // code would overflow — one add ahead of the decoder
            if (nextFree > (1 << codeWidth) && codeWidth < 12) codeWidth += 1
            else if (nextFree > 4096) { emit(clear); reset() }
            prefix = b
          }
        }
        i += 1
      }
      if (prefix >= 0) emit(prefix)
      emit(eoi)
      if (bitCnt > 0) bos.write((bitBuf & 0xFF).toInt)
      bos.toByteArray
    }

    /** GIF LZW decompress — inverse of [[lzwEncode]], also accepting any
      * spec-conformant stream (the JDK writer's output is a spec test in
      * MultimodalSpec). Returns exactly `expected` bytes or fails.
      */
    private[graft] def lzwDecode(minCodeSize: Int, data: Array[Byte],
        expected: Int): Array[Byte] = {
      val clear = 1 << minCodeSize
      val eoi = clear + 1
      val out = new Array[Byte](expected)
      var outPos = 0
      // dictionary as (prefix-entry index, suffix byte) chains
      val prefixOf = new Array[Int](4096)
      val suffixOf = new Array[Byte](4096)
      val lenOf = new Array[Int](4096)
      var nextFree = eoi + 1
      var codeWidth = minCodeSize + 1
      var i = 0
      while (i < clear) { prefixOf(i) = -1; suffixOf(i) = i.toByte; lenOf(i) = 1; i += 1 }
      def writeEntry(code: Int): Unit = {
        val n = lenOf(code)
        require(outPos + n <= expected, "LZW output overruns pixel count")
        var c = code; var p = outPos + n - 1
        while (c >= 0) { out(p) = suffixOf(c); p -= 1; c = prefixOf(c) }
        outPos += n
      }
      def firstByte(code: Int): Byte = {
        var c = code
        while (prefixOf(c) >= 0) c = prefixOf(c)
        suffixOf(c)
      }
      var bitBuf = 0L; var bitCnt = 0; var pos = 0
      var prev = -1
      var done = false
      while (!done) {
        while (bitCnt < codeWidth) {
          require(pos < data.length, "LZW stream truncated (no EOI)")
          bitBuf |= (data(pos) & 0xFFL) << bitCnt; bitCnt += 8; pos += 1
        }
        val code = (bitBuf & ((1L << codeWidth) - 1)).toInt
        bitBuf >>>= codeWidth; bitCnt -= codeWidth
        if (code == clear) {
          nextFree = eoi + 1; codeWidth = minCodeSize + 1; prev = -1
        } else if (code == eoi) {
          require(outPos == expected, s"LZW ended at $outPos of $expected pixels")
          done = true
        } else if (prev < 0) {
          require(code < clear, s"first LZW code $code not a literal")
          writeEntry(code); prev = code
        } else {
          require(code <= nextFree && code < 4096, s"LZW code $code out of range")
          val known = code < nextFree
          if (known) writeEntry(code)
          else { // the KwKwK case: entry = prev + firstByte(prev)
            val n = lenOf(prev)
            require(outPos + n + 1 <= expected, "LZW output overruns pixel count")
            writeEntry(prev); out(outPos) = firstByte(prev); outPos += 1
          }
          if (nextFree < 4096) {
            prefixOf(nextFree) = prev
            suffixOf(nextFree) = if (known) firstByte(code) else firstByte(prev)
            lenOf(nextFree) = lenOf(prev) + 1
            nextFree += 1
            if (nextFree >= (1 << codeWidth) && codeWidth < 12) codeWidth += 1
          }
          prev = code
        }
      }
      out
    }

    /** GIF decoder: logical screen + global color table, extension-block
      * skipping (the JDK writer emits Graphic Control Extensions), a
      * single non-interlaced image frame with optional local color
      * table, and the [[lzwDecode]] pixel stream. Same adversarial-bytes
      * posture as decodeBmp: bounds-checked walks, malformed input fails
      * as IllegalArgumentException before any out-of-bounds read.
      */
    def decodeGif(b: Array[Byte]): Decoded = {
      require(isGif(b) && b.length >= 13, "not a GIF")
      val w = u16(b, 6); val h = u16(b, 8)
      require(w > 0 && h > 0 && w.toLong * h <= (1L << 26), s"implausible dimensions ${w}x$h")
      var pos = 13
      val packed = b(10) & 0xFF
      var palette: Array[Int] = null
      if ((packed & 0x80) != 0) {
        val n = 2 << (packed & 7)
        require(pos + 3 * n <= b.length, "truncated global color table")
        palette = Array.tabulate(n)(j => ((b(pos + 3 * j) & 0xFF) << 16) |
          ((b(pos + 3 * j + 1) & 0xFF) << 8) | (b(pos + 3 * j + 2) & 0xFF))
        pos += 3 * n
      }
      // walk blocks to the first image descriptor, skipping extensions
      while (pos < b.length && (b(pos) & 0xFF) == 0x21) {
        pos += 2 // introducer + label
        while ({ require(pos < b.length, "truncated extension"); (b(pos) & 0xFF) != 0 }) {
          pos += 1 + (b(pos) & 0xFF)
        }
        pos += 1
      }
      require(pos < b.length && (b(pos) & 0xFF) == 0x2C, "no image descriptor")
      require(pos + 10 <= b.length, "truncated image descriptor")
      val fw = u16(b, pos + 5); val fh = u16(b, pos + 7)
      val fpacked = b(pos + 9) & 0xFF
      require(fw == w && fh == h && u16(b, pos + 1) == 0 && u16(b, pos + 3) == 0,
        "sub-frame GIFs unsupported")
      // the JDK's own writer interlaces by default, so the 4-pass row
      // order (8k, 8k+4, 4k+2, 2k+1) is required input, not an exotic
      val interlaced = (fpacked & 0x40) != 0
      pos += 10
      if ((fpacked & 0x80) != 0) { // local color table overrides global
        val n = 2 << (fpacked & 7)
        require(pos + 3 * n <= b.length, "truncated local color table")
        palette = Array.tabulate(n)(j => ((b(pos + 3 * j) & 0xFF) << 16) |
          ((b(pos + 3 * j + 1) & 0xFF) << 8) | (b(pos + 3 * j + 2) & 0xFF))
        pos += 3 * n
      }
      require(palette != null, "no color table")
      require(pos < b.length, "missing LZW min code size")
      val minCode = b(pos) & 0xFF
      require(minCode >= 2 && minCode <= 8, s"bad LZW min code size $minCode")
      pos += 1
      val comp = new java.io.ByteArrayOutputStream()
      while ({ require(pos < b.length, "truncated image data"); (b(pos) & 0xFF) != 0 }) {
        val n = b(pos) & 0xFF
        require(pos + 1 + n <= b.length, "truncated image sub-block")
        comp.write(b, pos + 1, n)
        pos += 1 + n
      }
      val px = lzwDecode(minCode, comp.toByteArray, w * h)
      // storage-row -> logical-row map (identity when not interlaced)
      val rowOf = new Array[Int](h)
      if (interlaced) {
        var sr = 0
        for (start <- Seq(0, 4, 2, 1); step = if (start == 0) 8 else start * 2;
             y <- start until h by step) { rowOf(sr) = y; sr += 1 }
      } else {
        var y = 0; while (y < h) { rowOf(y) = y; y += 1 }
      }
      val logicalToStored = new Array[Int](h)
      var sr = 0
      while (sr < h) { logicalToStored(rowOf(sr)) = sr; sr += 1 }
      val pal = palette
      Decoded(w, h, (x, y) => {
        val idx = px(logicalToStored(y) * w + x) & 0xFF
        require(idx < pal.length, s"pixel index $idx outside palette")
        pal(idx)
      })
    }

    /** PNG via the JDK's own ImageIO reader (no external dependency). */
    def decodePng(b: Array[Byte]): Decoded = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
      require(img != null, "ImageIO could not decode PNG bytes")
      Decoded(img.getWidth, img.getHeight, (x, y) => img.getRGB(x, y) & 0xFFFFFF)
    }

    def encodePng(w: Int, h: Int, rgb: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb(x, y)); x += 1 }; y += 1 }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    def isJpeg(b: Array[Byte]): Boolean =
      b.length >= 3 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8 &&
        (b(2) & 0xFF) == 0xFF

    /** Hand-written JPEG decoder (ITU-T T.81, 8-bit Huffman): BASELINE
      * sequential DCT (SOF0/SOF1) and — round 7 — PROGRESSIVE DCT
      * (SOF2, Annex G: spectral selection + successive approximation;
      * real crawl data is heavily progressive). Full pipeline: marker
      * walk (DQT/DHT/SOF/DRI/SOS, APPn/COM skipped), canonical Huffman
      * decode (mincode/maxcode/valptr exactly as T.81 F.2.2.3), byte-
      * stuffing and restart markers in the bit reader, DC prediction +
      * EXTEND, AC run-length with ZRL/EOB (plus EOBn runs and
      * correction-bit refinement for progressive scans, G.1.2.2-G.1.2.3),
      * dequantize, de-zigzag, separable double-precision IDCT, triangle
      * chroma upsampling, BT.601 YCbCr→RGB. Grayscale (1-component) and
      * YCbCr (3-component) frames; hierarchical/lossless/arithmetic
      * frames are rejected loudly. Progressive scans accumulate into
      * per-component coefficient buffers (one Int per coefficient — the
      * same memory class as the output planes) and a single IDCT pass
      * runs at EOI. Cross-checked pixel-by-pixel against the JDK's own
      * JPEG decoder in JpegCodecSpec — T.81 permits small IDCT variation
      * between conforming decoders, so the pin is a tight tolerance,
      * not bit equality (the other hand codecs ARE bit-pinned; lossy
      * JPEG is the one place the spec itself says decoders may differ).
      *
      * Same adversarial-bytes posture as decodeBmp: bounds checked
      * before every read, malformed input fails as
      * IllegalArgumentException, never an out-of-bounds read.
      */
    def decodeJpeg(b: Array[Byte]): Decoded = {
      require(isJpeg(b), "not a JPEG (SOI missing)")
      def u8(p: Int): Int = { require(p < b.length, "truncated JPEG"); b(p) & 0xFF }
      def u16(p: Int): Int = (u8(p) << 8) | u8(p + 1)
      // every marker segment length includes its own 2 bytes; a forged
      // length < 2 would make the `p += len` walk loop forever
      def segLen(p: Int): Int = {
        val len = u16(p); require(len >= 2, s"bad segment length $len"); len
      }

      val qt = Array.ofDim[Int](4, 64)
      // Huffman tables: [class 0=DC,1=AC][id] -> (mincode, maxcode, valptr, values)
      final case class Huff(minCode: Array[Int], maxCode: Array[Int],
                            valPtr: Array[Int], values: Array[Int])
      val huff = Array.ofDim[Huff](2, 4)
      val Zigzag = Array(
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

      final case class Comp(id: Int, h: Int, v: Int, tq: Int,
                            var dcTab: Int = 0, var acTab: Int = 0,
                            var pred: Int = 0, var plane: Array[Int] = null,
                            var planeW: Int = 0, var planeH: Int = 0,
                            var coefs: Array[Int] = null)
      var width = 0; var height = 0
      var comps: Array[Comp] = null
      var restartInterval = 0
      var scanStart = -1
      var progressive = false
      var maxH = 1; var maxV = 1; var mcusX = 0; var mcusY = 0

      // --- entropy-coded bit reader with stuffing + restart handling ---
      var bp = 0
      var bitBuf = 0; var bitCnt = 0
      var eobrun = 0
      def fillBit(): Int = {
        if (bitCnt == 0) {
          require(bp < b.length, "truncated scan data")
          var byte = u8(bp); bp += 1
          if (byte == 0xFF) {
            val nxt = u8(bp)
            if (nxt == 0x00) bp += 1 // stuffed data byte
            else {
              // a real marker ends the entropy segment: pad with zeros
              // (trailing partial MCU / scan over-read, T.81 F.1.2.3)
              // and leave bp ON the FF so the marker walk resumes here
              require(nxt == 0xD9 || progressive, f"unexpected marker $nxt%02x in scan")
              bp -= 1
              byte = 0
            }
          }
          bitBuf = byte; bitCnt = 8
        }
        bitCnt -= 1
        (bitBuf >> bitCnt) & 1
      }
      def receive(n: Int): Int = { var v = 0; var i = 0; while (i < n) { v = (v << 1) | fillBit(); i += 1 }; v }
      def extend(v: Int, n: Int): Int = if (n == 0) 0 else if (v < (1 << (n - 1))) v - (1 << n) + 1 else v
      def decodeHuff(hf: Huff): Int = {
        require(hf != null, "scan uses undefined Huffman table")
        var code = fillBit(); var l = 1
        while (l <= 16 && (hf.maxCode(l) < 0 || code > hf.maxCode(l))) {
          code = (code << 1) | fillBit(); l += 1
        }
        require(l <= 16, "invalid Huffman code")
        hf.values(hf.valPtr(l) + code - hf.minCode(l))
      }
      def restart(): Unit = {
        bitCnt = 0
        require(bp + 1 < b.length && u8(bp) == 0xFF && (u8(bp + 1) & 0xF8) == 0xD0,
          "RST marker expected")
        bp += 2
        comps.foreach(_.pred = 0)
        eobrun = 0
      }

      // COS(a)(u) = C(u)·cos((2a+1)uπ/16) — the constant halves of the
      // separable IDCT, hoisted out of the per-block loops
      val COS = Array.tabulate(8, 8) { (a, u) =>
        (if (u == 0) 0.70710678118654752 else 1.0) *
          math.cos((2 * a + 1) * u * math.Pi / 16)
      }
      // qt is stored in zigzag order (DQT streams it that way); coef
      // buffers are natural order after de-zigzag — map natural index
      // back to its zigzag position for the dequantize multiply
      lazy val zigInv: Array[Int] = { val a = new Array[Int](64); var i = 0; while (i < 64) { a(Zigzag(i)) = i; i += 1 }; a }
      def zigOf(natural: Int): Int = zigInv(natural)
      val blk = new Array[Double](64)
      val tmp = new Array[Double](64)
      def idct8x8(m: Array[Double], t: Array[Double]): Unit = {
        var u = 0
        while (u < 8) { // rows: sum over v for each output x
          var x = 0
          while (x < 8) {
            var acc = 0.0
            var v = 0
            while (v < 8) { acc += COS(x)(v) * m(u * 8 + v); v += 1 }
            t(u * 8 + x) = acc / 2
            x += 1
          }
          u += 1
        }
        var x = 0
        while (x < 8) { // columns: sum over u for each output y
          var y = 0
          while (y < 8) {
            var acc = 0.0
            var u2 = 0
            while (u2 < 8) { acc += COS(y)(u2) * t(u2 * 8 + x); u2 += 1 }
            m(y * 8 + x) = acc / 2
            y += 1
          }
          x += 1
        }
      }
      /** Dequantize (natural-order coefficients at `off`) + IDCT +
        * level-shift into the component plane at block (bx, by) — shared
        * by the sequential per-block path and the progressive final pass.
        */
      def outputBlock(c: Comp, coefArr: Array[Int], off: Int, bx: Int, by: Int): Unit = {
        val q = qt(c.tq)
        var i = 0
        while (i < 64) { blk(i) = coefArr(off + i).toDouble * q(zigOf(i)); i += 1 }
        idct8x8(blk, tmp)
        val x0 = bx * 8; val y0 = by * 8
        var yy = 0
        while (yy < 8) {
          var xx = 0
          while (xx < 8) {
            val v = math.round(blk(yy * 8 + xx) + 128.0).toInt
            c.plane((y0 + yy) * c.planeW + (x0 + xx)) =
              if (v < 0) 0 else if (v > 255) 255 else v
            xx += 1
          }
          yy += 1
        }
      }

      /** One progressive scan (T.81 Annex G): a DC scan (interleaved
        * over MCUs when it carries several components) or a single-
        * component AC scan in block-raster order over the component's
        * TRUE (unpadded) block grid (A.2.2). `ah == 0` scans establish
        * coefficients at approximation `al`; `ah > 0` scans append one
        * correction bit per coefficient (G.1.2.3). Coefficients
        * accumulate in each component's natural-order `coefs` buffer;
        * the IDCT runs once at EOI. Returns the byte position of the
        * next marker's 0xFF.
        */
      def progressiveScan(scanComps: Array[Comp], ss: Int, se: Int,
                          ah: Int, al: Int, dataStart: Int): Int = {
        require(ss >= 0 && se <= 63 && ss <= se, s"bad spectral range $ss..$se")
        require(ah <= 13 && al <= 13, "bad approximation bits")
        if (ss == 0) require(se == 0, "progressive DC scan must have Se = 0")
        else require(scanComps.length == 1, "progressive AC scan must be single-component")
        bp = dataStart; bitBuf = 0; bitCnt = 0
        eobrun = 0
        comps.foreach(_.pred = 0)
        var mcu = 0
        def maybeRestart(): Unit =
          if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) restart()

        def dcScan(c: Comp, bi: Int): Unit =
          if (ah == 0) {
            val t = decodeHuff(huff(0)(c.dcTab))
            require(t <= 11, "bad DC category")
            c.pred += extend(receive(t), t)
            c.coefs(bi * 64) = c.pred << al
          } else if (fillBit() == 1) c.coefs(bi * 64) |= (1 << al)

        def acFirst(c: Comp, bi: Int): Unit =
          if (eobrun > 0) eobrun -= 1
          else {
            var k = ss
            var stop = false
            while (!stop && k <= se) {
              val rs = decodeHuff(huff(1)(c.acTab))
              val r = rs >> 4; val s = rs & 15
              if (s == 0) {
                // EOBn: this block ends; (2^r − 1 + bits) MORE blocks end
                if (r < 15) {
                  eobrun = (1 << r) - 1 + (if (r > 0) receive(r) else 0)
                  stop = true
                } else k += 16 // ZRL
              } else {
                k += r
                require(k <= se, "AC run past spectral end")
                c.coefs(bi * 64 + Zigzag(k)) = extend(receive(s), s) << al
                k += 1
              }
            }
          }

        // G.1.2.3: correction bits ride along with newly significant
        // coefficients, and EOB-covered blocks still carry correction
        // bits for their already-nonzero coefficients
        def acRefine(c: Comp, bi: Int): Unit = {
          val p1 = 1 << al; val m1 = -1 << al
          val base = bi * 64
          def correct(idx: Int): Unit = {
            val v = c.coefs(idx)
            if (fillBit() == 1 && (v & p1) == 0)
              c.coefs(idx) = if (v > 0) v + p1 else v + m1
          }
          if (eobrun > 0) {
            var k = ss
            while (k <= se) {
              val idx = base + Zigzag(k)
              if (c.coefs(idx) != 0) correct(idx)
              k += 1
            }
            eobrun -= 1
          } else {
            var k = ss
            while (k <= se) {
              val rs = decodeHuff(huff(1)(c.acTab))
              var r = rs >> 4; val s = rs & 15
              var newVal = 0
              if (s == 0) {
                if (r < 15) {
                  eobrun = (1 << r) - 1 + (if (r > 0) receive(r) else 0)
                  r = 64 // no new coefficient this block: refine through Se
                }
              } else {
                require(s == 1, "bad AC refinement magnitude")
                newVal = if (fillBit() == 1) p1 else m1
              }
              var placed = false
              while (!placed && k <= se) {
                val idx = base + Zigzag(k)
                if (c.coefs(idx) != 0) correct(idx)
                else if (r == 0) { if (newVal != 0) c.coefs(idx) = newVal; placed = true }
                else r -= 1
                k += 1
              }
            }
          }
        }

        if (ss == 0 && scanComps.length > 1) {
          // interleaved DC scan: MCU order, exactly like sequential
          var my = 0
          while (my < mcusY) {
            var mx = 0
            while (mx < mcusX) {
              maybeRestart()
              scanComps.foreach { c =>
                val bw = c.planeW / 8
                var vv = 0
                while (vv < c.v) {
                  var hh = 0
                  while (hh < c.h) {
                    dcScan(c, (my * c.v + vv) * bw + (mx * c.h + hh))
                    hh += 1
                  }
                  vv += 1
                }
              }
              mcu += 1
              mx += 1
            }
            my += 1
          }
        } else {
          val c = scanComps(0)
          val bw = c.planeW / 8
          val cw = (width * c.h + maxH - 1) / maxH
          val ch = (height * c.v + maxV - 1) / maxV
          val nbx = (cw + 7) / 8; val nby = (ch + 7) / 8
          var by = 0
          while (by < nby) {
            var bx = 0
            while (bx < nbx) {
              maybeRestart()
              val bi = by * bw + bx
              if (ss == 0) dcScan(c, bi)
              else if (ah == 0) acFirst(c, bi) else acRefine(c, bi)
              mcu += 1
              bx += 1
            }
            by += 1
          }
        }
        // resume the marker walk at the next true marker: skip stuffed
        // FF00, restarts FFD0-FFD7, and FF fill bytes
        var q = math.max(dataStart, bp - 1)
        var found = -1
        while (found < 0) {
          require(q + 1 < b.length, "scan data ran past end of stream")
          if (u8(q) != 0xFF) q += 1
          else {
            val nxt = u8(q + 1)
            if (nxt == 0x00 || (nxt & 0xF8) == 0xD0) q += 2
            else if (nxt == 0xFF) q += 1
            else found = q
          }
        }
        found
      }

      var p = 2
      var sawSof = false
      var done = false
      while (!done) {
        require(u8(p) == 0xFF, f"marker expected at $p, got ${u8(p)}%02x")
        val m = u8(p + 1)
        p += 2
        m match {
          case 0xD8 => // stray SOI — ignore
          case 0xC0 | 0xC1 | 0xC2 => // sequential (baseline/extended) or progressive
            require(!sawSof, "duplicate SOF")
            progressive = m == 0xC2
            val len = segLen(p)
            require(u8(p + 2) == 8, "only 8-bit precision supported")
            height = u16(p + 3); width = u16(p + 5)
            require(width > 0 && height > 0 && width <= (1 << 16) && height <= (1 << 16),
              s"implausible dimensions ${width}x$height")
            val nc = u8(p + 7)
            require(nc == 1 || nc == 3, s"unsupported component count $nc")
            comps = Array.tabulate(nc) { i =>
              val o = p + 8 + 3 * i
              val hv = u8(o + 1)
              val c = Comp(u8(o), hv >> 4, hv & 15, u8(o + 2))
              require(c.h >= 1 && c.h <= 4 && c.v >= 1 && c.v <= 4, "bad sampling factors")
              require(c.tq < 4, "bad quant table id")
              c
            }
            maxH = comps.map(_.h).max; maxV = comps.map(_.v).max
            mcusX = (width + 8 * maxH - 1) / (8 * maxH)
            mcusY = (height + 8 * maxV - 1) / (8 * maxV)
            comps.foreach { c =>
              c.planeW = mcusX * c.h * 8; c.planeH = mcusY * c.v * 8
              require(c.planeW.toLong * c.planeH <= (1L << 26), "implausible plane size")
              c.plane = new Array[Int](c.planeW * c.planeH)
              // progressive scans accumulate coefficients across scans;
              // the IDCT runs once at EOI
              if (progressive) c.coefs = new Array[Int](c.planeW * c.planeH)
            }
            sawSof = true
            p += len
          case 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xC9 | 0xCA | 0xCB | 0xCD | 0xCE | 0xCF =>
            throw new IllegalArgumentException(f"unsupported SOF marker $m%02x")
          case 0xDB => // DQT
            val len = segLen(p); var q = p + 2
            while (q < p + len) {
              val pq = u8(q) >> 4; val tq = u8(q) & 15
              require(tq < 4, "bad DQT id")
              require(pq == 0 || pq == 1, "bad DQT precision")
              var k = 0
              q += 1
              while (k < 64) {
                qt(tq)(k) = if (pq == 0) u8(q) else u16(q)
                q += (if (pq == 0) 1 else 2); k += 1
              }
            }
            p += len
          case 0xC4 => // DHT
            val len = segLen(p); var q = p + 2
            while (q < p + len) {
              val tc = u8(q) >> 4; val th = u8(q) & 15
              require(tc <= 1 && th < 4, "bad DHT id")
              val counts = Array.tabulate(16)(i => u8(q + 1 + i))
              val total = counts.sum
              require(total <= 256, "bad DHT counts")
              val values = Array.tabulate(total)(i => u8(q + 17 + i))
              // canonical code assignment (T.81 C.2) → F.2.2.3 tables
              val minC = new Array[Int](17); val maxC = new Array[Int](17)
              val vp = new Array[Int](17)
              var code = 0; var k = 0
              var l = 1
              while (l <= 16) {
                vp(l) = k; minC(l) = code
                code += counts(l - 1); k += counts(l - 1)
                maxC(l) = if (counts(l - 1) == 0) -1 else code - 1
                code <<= 1
                l += 1
              }
              huff(tc)(th) = Huff(minC, maxC, vp, values)
              q += 17 + total
            }
            p += len
          case 0xDD => // DRI
            restartInterval = u16(p + 2); p += segLen(p)
          case 0xDA => // SOS
            require(sawSof, "SOS before SOF")
            val len = segLen(p)
            val ns = u8(p + 2)
            require(ns >= 1 && ns <= comps.length, s"bad scan component count $ns")
            val scanComps = Array.tabulate(ns) { i =>
              val cs = u8(p + 3 + 2 * i); val tt = u8(p + 4 + 2 * i)
              val c = comps.find(_.id == cs).getOrElse(
                throw new IllegalArgumentException(s"scan references unknown component $cs"))
              // table slots are huff(2)(4) — an unchecked id up to 15
              // would escape as ArrayIndexOutOfBounds past the corrupt-row
              // catch (IllegalArgumentException | IOException)
              require((tt >> 4) <= 3 && (tt & 15) <= 3, s"bad scan table ids $tt")
              c.dcTab = tt >> 4; c.acTab = tt & 15
              c
            }
            if (!progressive) {
              require(ns == comps.length, "scan/frame component mismatch")
              scanStart = p + len
              done = true
            } else {
              val ss = u8(p + 3 + 2 * ns); val se = u8(p + 4 + 2 * ns)
              val aa = u8(p + 5 + 2 * ns)
              p = progressiveScan(scanComps, ss, se, aa >> 4, aa & 15, p + len)
            }
          case 0xD9 => // EOI: ends a progressive stream; early otherwise
            require(progressive && sawSof, "EOI before scan data")
            done = true
          case _ => // APPn, COM, anything else with a length field
            p += segLen(p)
        }
      }

      // --- decode passes ---
      val coef = new Array[Int](64)
      def decodeBlock(c: Comp, bx: Int, by: Int): Unit = {
        java.util.Arrays.fill(coef, 0)
        val t = decodeHuff(huff(0)(c.dcTab))
        require(t <= 11, "bad DC category")
        c.pred += extend(receive(t), t)
        coef(0) = c.pred
        var k = 1
        var eob = false
        while (k < 64 && !eob) {
          val rs = decodeHuff(huff(1)(c.acTab))
          val r = rs >> 4; val s = rs & 15
          if (s == 0) { if (r == 15) k += 16 else eob = true }
          else {
            k += r
            require(k < 64, "AC run past block end")
            coef(Zigzag(k)) = extend(receive(s), s)
            k += 1
          }
        }
        outputBlock(c, coef, 0, bx, by)
      }

      if (!progressive) {
        // --- sequential: single interleaved scan, MCU loop with restarts ---
        bp = scanStart; bitBuf = 0; bitCnt = 0
        var mcu = 0
        var my = 0
        while (my < mcusY) {
          var mx = 0
          while (mx < mcusX) {
            if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) restart()
            comps.foreach { c =>
              var v = 0
              while (v < c.v) {
                var h = 0
                while (h < c.h) {
                  decodeBlock(c, mx * c.h + h, my * c.v + v)
                  h += 1
                }
                v += 1
              }
            }
            mcu += 1
            mx += 1
          }
          my += 1
        }
      } else {
        // --- progressive: every scan already accumulated into coefs;
        // dequantize + IDCT exactly once per block ---
        comps.foreach { c =>
          val bw = c.planeW / 8; val bh = c.planeH / 8
          var by = 0
          while (by < bh) {
            var bx = 0
            while (bx < bw) {
              outputBlock(c, c.coefs, (by * bw + bx) * 64, bx, by)
              bx += 1
            }
            by += 1
          }
        }
      }

      // --- upsample each component to full resolution ---
      // Factor-2 dims use TRIANGLE (centered bilinear, the libjpeg
      // "fancy upsampling" kernel: 3/4·near + 1/4·far per axis → 9/3/3/1
      // for 2×2) rather than sample replication — T.81 does not define
      // upsampling, and the de-facto standard every mainstream decoder
      // implements is the triangle filter; replication measured up to
      // ±50 against the JDK on noisy chroma, triangle lands within the
      // conformance tolerance. Other ratios fall back to replication.
      def upsampled(c: Comp): Array[Int] = {
        val rh = maxH / c.h; val rv = maxV / c.v
        val cw = (width * c.h + maxH - 1) / maxH
        val ch = (height * c.v + maxV - 1) / maxV
        def s(ix: Int, iy: Int): Int = {
          val cx = if (ix < 0) 0 else if (ix >= cw) cw - 1 else ix
          val cyy = if (iy < 0) 0 else if (iy >= ch) ch - 1 else iy
          c.plane(cyy * c.planeW + cx)
        }
        val o = new Array[Int](width * height)
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) {
            val v =
              if (rh == 1 && rv == 1) s(x, y)
              else if (rh == 2 && rv == 2) {
                val i = x >> 1; val j = y >> 1
                val in = if ((x & 1) == 0) i - 1 else i + 1
                val jn = if ((y & 1) == 0) j - 1 else j + 1
                (9 * s(i, j) + 3 * s(in, j) + 3 * s(i, jn) + s(in, jn) + 8) >> 4
              } else if (rh == 2 && rv == 1) {
                val i = x >> 1
                val in = if ((x & 1) == 0) i - 1 else i + 1
                (3 * s(i, y) + s(in, y) + 2) >> 2
              } else if (rh == 1 && rv == 2) {
                val j = y >> 1
                val jn = if ((y & 1) == 0) j - 1 else j + 1
                (3 * s(x, j) + s(x, jn) + 2) >> 2
              } else s(x / rh, y / rv) // uncommon ratios: replication
            o(y * width + x) = v
            x += 1
          }
          y += 1
        }
        o
      }

      // --- color reconstruction ---
      val out = new Array[Int](width * height)
      if (comps.length == 1) {
        // grayscale: the JFIF sample IS the (gamma-encoded) luma — it is
        // presented directly as R=G=B, the libjpeg convention. (The
        // JDK's TYPE_BYTE_GRAY getRGB instead treats samples as LINEAR
        // gray and gamma-converts — compare raster samples, not getRGB.)
        val g0 = upsampled(comps(0))
        var i = 0
        while (i < out.length) { val g = g0(i); out(i) = (g << 16) | (g << 8) | g; i += 1 }
      } else {
        val yP = upsampled(comps(0))
        val cbP = upsampled(comps(1))
        val crP = upsampled(comps(2))
        var i = 0
        while (i < out.length) {
          val yv = yP(i).toDouble
          val cbv = cbP(i) - 128.0
          val crv = crP(i) - 128.0
          def cl(d: Double): Int = { val v = math.round(d).toInt; if (v < 0) 0 else if (v > 255) 255 else v }
          out(i) = (cl(yv + 1.402 * crv) << 16) |
            (cl(yv - 0.344136 * cbv - 0.714136 * crv) << 8) |
            cl(yv + 1.772 * cbv)
          i += 1
        }
      }
      Decoded(width, height, (x, y) => out(y * width + x))
    }

    /** JPEG bytes via the JDK encoder (test fixture + cross-check input). */
    def encodeJpeg(w: Int, h: Int, rgb: (Int, Int) => Int,
                   quality: Float = 0.9f): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb(x, y)); x += 1 }; y += 1 }
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
      val params = writer.getDefaultWriteParam
      params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      params.setCompressionQuality(quality)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
      writer.dispose(); ios.close()
      bos.toByteArray
    }

    /** Hand-written BASELINE grayscale JPEG encoder, DC-only — the
      * fixture-side counterpart of [[decodeJpeg]] for EXACT round-trip
      * testing of lossy-format plumbing (MJPEG frame essence): every
      * 8×8 block is a constant gray level, so its DCT has a single DC
      * coefficient `8·(v−128)`; with an all-ones quantization table
      * nothing is quantized away, and any conforming IDCT reproduces
      * the constant block bit-exactly (DC-only blocks are the one
      * JPEG input where T.81's permitted inter-decoder IDCT variation
      * vanishes). Stream layout is the full public T.81 grammar the
      * decoder walks: SOI, DQT (all-ones), SOF0 (8-bit, 1 component,
      * no subsampling), DHT (Annex K luminance DC table; minimal
      * one-code AC table carrying only EOB), SOS, entropy-coded DC
      * diffs with byte stuffing, EOI. `blockGray(bx, by)` ∈ [0, 255];
      * `w`/`h` must be multiples of 8 so blocks tile exactly.
      */
    def encodeJpegDcGray(w: Int, h: Int, blockGray: (Int, Int) => Int): Array[Byte] = {
      require(w >= 8 && h >= 8 && w % 8 == 0 && h % 8 == 0 && w <= 4096 && h <= 4096,
        s"encodeJpegDcGray needs 8-multiple dimensions, got ${w}x$h")
      val bos = new java.io.ByteArrayOutputStream()
      def p8(v: Int): Unit = bos.write(v & 0xFF)
      def p16(v: Int): Unit = { p8(v >> 8); p8(v) }
      def marker(m: Int): Unit = { p8(0xFF); p8(m) }
      marker(0xD8)                         // SOI
      marker(0xDB); p16(67); p8(0x00)      // DQT: table 0, all ones
      var i = 0
      while (i < 64) { p8(1); i += 1 }
      marker(0xC0); p16(11)                // SOF0: 8-bit, 1 component
      p8(8); p16(h); p16(w); p8(1)
      p8(1); p8(0x11); p8(0)               // comp 1, no subsampling, Tq 0
      // DC table: Annex K Table K.3 (luminance DC) — categories 0..11
      val dcBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
      marker(0xC4); p16(2 + 1 + 16 + 12); p8(0x00)
      dcBits.foreach(p8); (0 to 11).foreach(p8)
      // AC table: ONE code — '0' (length 1) = EOB; DC-only blocks never
      // emit an AC coefficient
      marker(0xC4); p16(2 + 1 + 16 + 1); p8(0x10)
      p8(1); (1 to 15).foreach(_ => p8(0)); p8(0x00)
      marker(0xDA); p16(8)                 // SOS
      p8(1); p8(1); p8(0x00); p8(0); p8(63); p8(0)
      // canonical codes for the DC table (T.81 C.2)
      val dcCode = new Array[Int](12); val dcLen = new Array[Int](12)
      var code = 0; var k = 0; var len = 1
      while (len <= 16) {
        var c = 0
        while (c < dcBits(len - 1)) {
          dcCode(k) = code; dcLen(k) = len; code += 1; k += 1; c += 1
        }
        code <<= 1; len += 1
      }
      // entropy-coded segment: bit writer with FF byte stuffing
      var acc = 0; var nb = 0
      def putBits(v: Int, n: Int): Unit = {
        var j = n - 1
        while (j >= 0) {
          acc = (acc << 1) | ((v >> j) & 1); nb += 1
          if (nb == 8) {
            bos.write(acc); if (acc == 0xFF) bos.write(0x00)
            acc = 0; nb = 0
          }
          j -= 1
        }
      }
      var pred = 0
      var by = 0
      while (by < h / 8) {
        var bx = 0
        while (bx < w / 8) {
          val v = blockGray(bx, by)
          require(v >= 0 && v <= 255, s"gray $v out of range at block ($bx,$by)")
          val dc = 8 * (v - 128)
          val diff = dc - pred; pred = dc
          val cat = if (diff == 0) 0
            else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
          putBits(dcCode(cat), dcLen(cat))
          if (cat > 0)
            putBits(if (diff >= 0) diff else diff + (1 << cat) - 1, cat)
          putBits(0, 1)                    // EOB
          bx += 1
        }
        by += 1
      }
      while (nb != 0) putBits(1, 1)        // pad final byte with 1s
      marker(0xD9)                         // EOI
      bos.toByteArray
    }
  }

  /** Hand-written WAV (RIFF) codec for 16-bit PCM — the audio analogue of
    * [[ImageCodecs]]: layout is the public RIFF/WAVE format (RIFF header,
    * `fmt ` chunk with PCM fields, `data` chunk of interleaved
    * little-endian s16 frames). The decoder WALKS the chunk list (skipping
    * unknown chunks with the RIFF word-alignment pad rule) rather than
    * assuming the canonical 44-byte layout, because real WAV writers
    * insert LIST/INFO chunks before `data`. Same adversarial-bytes
    * posture as decodeBmp: all bounds math in Long, malformed input fails
    * as IllegalArgumentException before any out-of-bounds read.
    */
  object AudioCodecs {

    /** Decoded PCM presented as an accessor: `sample(ch, i)` is the s16
      * sample of channel `ch` at frame `i`.
      */
    final case class DecodedAudio(sampleRate: Int, channels: Int, frames: Int,
                                  sample: (Int, Int) => Int)

    private def u16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
    private def u32(b: Array[Byte], o: Int): Long =
      (b(o) & 0xFFL) | ((b(o + 1) & 0xFFL) << 8) |
        ((b(o + 2) & 0xFFL) << 16) | ((b(o + 3) & 0xFFL) << 24)
    private def tag(b: Array[Byte], o: Int): String =
      new String(b, o, 4, "US-ASCII")

    def isWav(b: Array[Byte]): Boolean =
      b.length >= 12 && tag(b, 0) == "RIFF" && tag(b, 8) == "WAVE"

    /** 16-bit PCM WAV encoder; `sample(ch, i)` gives the s16 value of
      * channel `ch` at frame `i`. `padChunk` optionally inserts an unknown
      * (odd-sized, so the pad rule is exercised) chunk before `data` —
      * fixtures use it so the decoder's chunk walk is load-bearing.
      */
    def encodeWav(sampleRate: Int, channels: Int, frames: Int,
                  sample: (Int, Int) => Int, padChunk: Boolean = false): Array[Byte] = {
      val blockAlign = channels * 2
      val dataSize = frames * blockAlign
      val pad = if (padChunk) 8 + 5 + 1 else 0 // header + 5 bytes + align pad
      val out = new Array[Byte](44 + pad + dataSize)
      def ptag(o: Int, s: String): Unit = { var i = 0; while (i < 4) { out(o + i) = s.charAt(i).toByte; i += 1 } }
      def pu16(o: Int, v: Int): Unit = { out(o) = v.toByte; out(o + 1) = (v >> 8).toByte }
      def pu32(o: Int, v: Long): Unit = {
        out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
        out(o + 2) = (v >> 16).toByte; out(o + 3) = (v >> 24).toByte
      }
      ptag(0, "RIFF"); pu32(4, 36L + pad + dataSize); ptag(8, "WAVE")
      ptag(12, "fmt "); pu32(16, 16)
      pu16(20, 1)                                 // PCM
      pu16(22, channels); pu32(24, sampleRate)
      pu32(28, sampleRate.toLong * blockAlign)    // byte rate
      pu16(32, blockAlign); pu16(34, 16)          // block align, bits/sample
      var off = 36
      if (padChunk) {                             // odd-size chunk + pad byte
        ptag(off, "note"); pu32(off + 4, 5)
        var i = 0; while (i < 5) { out(off + 8 + i) = ('a' + i).toByte; i += 1 }
        off += 8 + 5 + 1
      }
      ptag(off, "data"); pu32(off + 4, dataSize)
      var p = off + 8
      var f = 0
      while (f < frames) {
        var c = 0
        while (c < channels) {
          val v = sample(c, f)
          out(p) = v.toByte; out(p + 1) = (v >> 8).toByte
          p += 2; c += 1
        }
        f += 1
      }
      out
    }

    def decodeWav(b: Array[Byte]): DecodedAudio = {
      require(isWav(b), "not a RIFF/WAVE")
      require(b.length >= 44, "truncated WAV header")
      // chunk walk: [tag u32size payload pad?]* — find fmt then data
      var pos = 12L
      var fmtOff = -1L; var dataOff = -1L; var dataSize = -1L
      while (pos + 8 <= b.length && (fmtOff < 0 || dataOff < 0)) {
        val t = tag(b, pos.toInt)
        val size = u32(b, pos.toInt + 4)
        require(size >= 0 && pos + 8 + size <= b.length, s"chunk '$t' overruns buffer")
        if (t == "fmt ") { require(size >= 16, "fmt chunk too small"); fmtOff = pos + 8 }
        else if (t == "data") { dataOff = pos + 8; dataSize = size }
        pos += 8 + size + (size & 1) // RIFF chunks are word-aligned
      }
      require(fmtOff >= 0, "missing fmt chunk")
      require(dataOff >= 0, "missing data chunk")
      val fo = fmtOff.toInt
      require(u16(b, fo) == 1, s"unsupported audio format ${u16(b, fo)} (PCM only)")
      val channels = u16(b, fo + 2)
      val sampleRate = u32(b, fo + 4).toInt
      val blockAlign = u16(b, fo + 12)
      val bits = u16(b, fo + 14)
      require(bits == 16, s"unsupported bits/sample $bits (16 only)")
      require(channels >= 1 && channels <= 8, s"implausible channel count $channels")
      require(sampleRate >= 1 && sampleRate <= 1000000, s"implausible sample rate $sampleRate")
      require(blockAlign == channels * 2, s"blockAlign $blockAlign != channels*2")
      require(dataSize % blockAlign == 0, "data size not a whole number of frames")
      val frames = (dataSize / blockAlign).toInt
      val base = dataOff.toInt
      DecodedAudio(sampleRate, channels, frames, (ch, i) => {
        val o = base + i * blockAlign + ch * 2
        ((b(o + 1) << 8) | (b(o) & 0xFF)) // sign-extends through the high byte
      })
    }
  }

  /** The deterministic test-pattern pixel function: channel values are
    * closed-form in (doc_id, pixel index), so the DuckDB oracle can
    * recompute every decoded feature without decoding anything — the
    * cross-engine check that makes the REAL decode path oracle-verifiable
    * (q80). Kept int-small: seed < 9973, i < w·h ≤ 432.
    */
  object TestPattern {
    def width(id: Long): Int = (8 + id % 17).toInt
    def height(id: Long): Int = (8 + id % 11).toInt
    def rgb(id: Long)(x: Int, y: Int): Int = {
      val seed = (id % 9973).toInt
      val i = y * width(id) + x
      val r = (seed + 3 * i) % 256
      val g = (seed + 5 * i + 7) % 256
      val b = (seed + 11 * i + 13) % 256
      (r << 16) | (g << 8) | b
    }
  }

  /** The grayscale test pattern for the palette-indexed GIF path: the
    * pixel INDEX is the gray value, so the decoded r=g=b channels stay
    * closed-form in (doc_id, pixel index) — the q130 oracle recomputes
    * them without touching LZW. Same seed/dims as [[TestPattern]].
    */
  object GrayPattern {
    def gray(id: Long)(x: Int, y: Int): Int = {
      val seed = (id % 9973).toInt
      val i = y * TestPattern.width(id) + x
      (seed + 3 * i) % 256
    }
  }

  /** Synthesize REAL GIF bytes with [[GrayPattern]] pixels — the LZW
    * fixture generator (q130). Executor-side, like [[syntheticMedia]].
    */
  def syntheticGifMedia(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("modality", StringType),
      StructField("bytes", BinaryType)))
    val rdd = docs.select("doc_id").rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = ImageCodecs.encodeGif(
          TestPattern.width(id), TestPattern.height(id), GrayPattern.gray(id) _)
        Row(id, "image", bytes)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Synthesize REAL image bytes (BMP / PPM / PNG round-robin by id) with
    * [[TestPattern]] pixels — the fixture generator for the real decode
    * path. Executor-side mapPartitions, same batch shape as the decoder.
    */
  def syntheticMedia(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("modality", StringType),
      StructField("bytes", BinaryType)))
    val rdd = docs.select("doc_id").rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val (w, h, px) = (TestPattern.width(id), TestPattern.height(id), TestPattern.rgb(id) _)
        val bytes = (id % 3) match {
          case 0 => ImageCodecs.encodeBmp(w, h, px)
          case 1 => ImageCodecs.encodePpm(w, h, px)
          case _ => ImageCodecs.encodePng(w, h, px)
        }
        Row(id, "image", bytes)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** AVI container metadata codec — video's honest real-bytes path: the
    * container is RIFF (same chunk discipline as WAV), and the `avih`
    * main header inside `LIST hdrl` carries dimensions, frame count, and
    * frame duration as plain little-endian fields — no codec required to
    * extract them, which is exactly the metadata a corpus pipeline
    * filters and samples on (frameSample consumes `n_frames`). Pixel
    * decode stays out of scope (needs a real codec); the boundary moves
    * from "video is a fake byte blob" to "real container, opaque
    * essence".
    */
  object VideoCodecs {

    final case class AviMeta(width: Int, height: Int, frames: Int,
                             usecPerFrame: Int, streams: Int)

    private def u32(b: Array[Byte], o: Int): Long =
      (b(o) & 0xFFL) | ((b(o + 1) & 0xFFL) << 8) |
        ((b(o + 2) & 0xFFL) << 16) | ((b(o + 3) & 0xFFL) << 24)
    private def tag(b: Array[Byte], o: Int): String =
      new String(b, o, 4, "US-ASCII")

    def isAvi(b: Array[Byte]): Boolean =
      b.length >= 12 && tag(b, 0) == "RIFF" && tag(b, 8) == "AVI "

    /** Minimal structurally-valid AVI: RIFF(AVI ) { [JUNK] LIST(hdrl){
      * avih } LIST(movi){} }. `junk` inserts the JUNK padding chunk real
      * muxers emit, so the decoder's walk is exercised by fixtures.
      */
    def encodeAvi(m: AviMeta, junk: Boolean = false): Array[Byte] = {
      val junkSize = if (junk) 8 + 12 else 0
      val hdrlSize = 4 + 8 + 56          // 'hdrl' + avih header + payload
      val moviSize = 4
      val total = 12 + junkSize + 8 + hdrlSize + 8 + moviSize
      val out = new Array[Byte](total)
      def ptag(o: Int, s: String): Unit = { var i = 0; while (i < 4) { out(o + i) = s.charAt(i).toByte; i += 1 } }
      def pu32(o: Int, v: Long): Unit = {
        out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
        out(o + 2) = (v >> 16).toByte; out(o + 3) = (v >> 24).toByte
      }
      ptag(0, "RIFF"); pu32(4, total - 8L); ptag(8, "AVI ")
      var off = 12
      if (junk) { ptag(off, "JUNK"); pu32(off + 4, 12); off += 8 + 12 }
      ptag(off, "LIST"); pu32(off + 4, hdrlSize); ptag(off + 8, "hdrl")
      val ah = off + 12
      ptag(ah, "avih"); pu32(ah + 4, 56)
      pu32(ah + 8, m.usecPerFrame)       // dwMicroSecPerFrame
      pu32(ah + 12, 0); pu32(ah + 16, 0) // dwMaxBytesPerSec, dwPaddingGranularity
      pu32(ah + 20, 0)                   // dwFlags
      pu32(ah + 24, m.frames)            // dwTotalFrames
      pu32(ah + 28, 0)                   // dwInitialFrames
      pu32(ah + 32, m.streams)           // dwStreams
      pu32(ah + 36, 0)                   // dwSuggestedBufferSize
      pu32(ah + 40, m.width); pu32(ah + 44, m.height)
      // 16 reserved bytes already zero
      off += 8 + hdrlSize
      ptag(off, "LIST"); pu32(off + 4, moviSize); ptag(off + 8, "movi")
      out
    }

    /** AVI with REAL uncompressed essence: the movi LIST carries one
      * `00db` (uncompressed DIB) chunk per frame — bottom-up BGR rows
      * padded to 4 bytes, the BMP raster convention — so frame pixels
      * are extractable with no codec beyond the container walk itself.
      * This moves the video boundary from "real container, opaque
      * essence" to "real container, real (uncompressed) essence"; only
      * COMPRESSED essence (H.264 etc.) remains honestly out of scope.
      */
    def encodeAviEssence(m: AviMeta, pixel: (Int, Int, Int) => Int,
        junk: Boolean = false): Array[Byte] = {
      val rowBytes = (m.width * 3 + 3) & ~3
      val frameBytes = rowBytes * m.height
      val junkSize = if (junk) 8 + 12 else 0
      val hdrlSize = 4 + 8 + 56
      val moviSize = 4 + m.frames * (8 + frameBytes)
      val total = 12 + junkSize + 8 + hdrlSize + 8 + moviSize
      val out = new Array[Byte](total)
      def ptag(o: Int, s: String): Unit = { var i = 0; while (i < 4) { out(o + i) = s.charAt(i).toByte; i += 1 } }
      def pu32(o: Int, v: Long): Unit = {
        out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
        out(o + 2) = (v >> 16).toByte; out(o + 3) = (v >> 24).toByte
      }
      ptag(0, "RIFF"); pu32(4, total - 8L); ptag(8, "AVI ")
      var off = 12
      if (junk) { ptag(off, "JUNK"); pu32(off + 4, 12); off += 8 + 12 }
      ptag(off, "LIST"); pu32(off + 4, hdrlSize); ptag(off + 8, "hdrl")
      val ah = off + 12
      ptag(ah, "avih"); pu32(ah + 4, 56)
      pu32(ah + 8, m.usecPerFrame)
      pu32(ah + 12, 0); pu32(ah + 16, 0)
      pu32(ah + 20, 0)
      pu32(ah + 24, m.frames)
      pu32(ah + 28, 0)
      pu32(ah + 32, m.streams)
      pu32(ah + 36, 0)
      pu32(ah + 40, m.width); pu32(ah + 44, m.height)
      off += 8 + hdrlSize
      ptag(off, "LIST"); pu32(off + 4, moviSize); ptag(off + 8, "movi")
      var p = off + 12
      var f = 0
      while (f < m.frames) {
        ptag(p, "00db"); pu32(p + 4, frameBytes)
        var y = 0
        while (y < m.height) {
          val rowOff = p + 8 + (m.height - 1 - y) * rowBytes // bottom-up
          var x = 0
          while (x < m.width) {
            val rgb = pixel(f, x, y)
            out(rowOff + x * 3) = (rgb & 0xFF).toByte
            out(rowOff + x * 3 + 1) = ((rgb >> 8) & 0xFF).toByte
            out(rowOff + x * 3 + 2) = ((rgb >> 16) & 0xFF).toByte
            x += 1
          }
          y += 1
        }
        p += 8 + frameBytes
        f += 1
      }
      out
    }

    /** AVI with MJPEG essence: the movi LIST carries one `00dc` chunk
      * per frame, each a COMPLETE baseline JPEG
      * ([[ImageCodecs.encodeJpegDcGray]] — DC-only gray blocks, the
      * exactly-round-trippable subset), the layout real MJPEG muxers
      * emit (frame = standalone JPEG, no inter-frame state). This
      * closes the container↔codec gap the round-7 board flagged: the
      * repo owned a full T.81 decoder and an AVI walker but never fed
      * one from the other. `blockGray(f, bx, by)` gives frame f's 8×8
      * block gray level. RIFF odd-size chunks get the pad byte.
      */
    def encodeAviMjpeg(m: AviMeta, blockGray: (Int, Int, Int) => Int,
        junk: Boolean = false): Array[Byte] = {
      val dibSize = ((m.width * 3 + 3) & ~3).toLong * m.height
      val frames = (0 until m.frames).map { f =>
        val jpeg = ImageCodecs.encodeJpegDcGray(m.width, m.height,
          (bx, by) => blockGray(f, bx, by))
        // the frame walk dispatches DIB-vs-JPEG by exact chunk size
        // first, so a JPEG whose length collides with the DIB raster
        // size would be misread as an uncompressed raster. Splice an
        // empty COM segment (FF FE 00 02 — skipped by every T.81
        // decoder incl. ours) after SOI so repo-generated fixtures can
        // never hit the ambiguity.
        if (jpeg.length.toLong != dibSize) jpeg
        else {
          val padded = new Array[Byte](jpeg.length + 4)
          padded(0) = jpeg(0); padded(1) = jpeg(1)
          padded(2) = 0xFF.toByte; padded(3) = 0xFE.toByte
          padded(4) = 0x00; padded(5) = 0x02
          System.arraycopy(jpeg, 2, padded, 6, jpeg.length - 2)
          padded
        }
      }
      val junkSize = if (junk) 8 + 12 else 0
      val hdrlSize = 4 + 8 + 56
      val moviSize = 4 + frames.map(fr => 8 + fr.length + (fr.length & 1)).sum
      val total = 12 + junkSize + 8 + hdrlSize + 8 + moviSize
      val out = new Array[Byte](total)
      def ptag(o: Int, s: String): Unit = { var i = 0; while (i < 4) { out(o + i) = s.charAt(i).toByte; i += 1 } }
      def pu32(o: Int, v: Long): Unit = {
        out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
        out(o + 2) = (v >> 16).toByte; out(o + 3) = (v >> 24).toByte
      }
      ptag(0, "RIFF"); pu32(4, total - 8L); ptag(8, "AVI ")
      var off = 12
      if (junk) { ptag(off, "JUNK"); pu32(off + 4, 12); off += 8 + 12 }
      ptag(off, "LIST"); pu32(off + 4, hdrlSize); ptag(off + 8, "hdrl")
      val ah = off + 12
      ptag(ah, "avih"); pu32(ah + 4, 56)
      pu32(ah + 8, m.usecPerFrame)
      pu32(ah + 12, 0); pu32(ah + 16, 0)
      pu32(ah + 20, 0)
      pu32(ah + 24, m.frames)
      pu32(ah + 28, 0)
      pu32(ah + 32, m.streams)
      pu32(ah + 36, 0)
      pu32(ah + 40, m.width); pu32(ah + 44, m.height)
      off += 8 + hdrlSize
      ptag(off, "LIST"); pu32(off + 4, moviSize); ptag(off + 8, "movi")
      var p = off + 12
      frames.foreach { fr =>
        ptag(p, "00dc"); pu32(p + 4, fr.length)
        System.arraycopy(fr, 0, out, p + 8, fr.length)
        p += 8 + fr.length + (fr.length & 1)
      }
      out
    }

    final case class FrameStats(idx: Int, sumR: Long, sumG: Long, sumB: Long,
                                row0SumR: Long)

    /** Walk movi and decode every `stride`-th `00db` DIB frame into
      * exact channel sums — the frame-sampling feature-extraction pass.
      * Orientation matters: row 0 of the LOGICAL image is the LAST
      * stored row (bottom-up), same as the BMP decoder.
      */
    def decodeAviFrames(b: Array[Byte], stride: Int): (AviMeta, Seq[FrameStats]) = {
      require(stride >= 1, "stride must be >= 1")
      val meta = decodeAviMeta(b)
      val rowBytes = (meta.width * 3 + 3) & ~3
      val out = Vector.newBuilder[FrameStats]
      var pos = 12L
      while (pos + 8 <= b.length) {
        val t = tag(b, pos.toInt)
        val size = u32(b, pos.toInt + 4)
        require(pos + 8 + size <= b.length, s"chunk '$t' overruns buffer")
        if (t == "LIST" && size >= 4 && tag(b, pos.toInt + 8) == "movi") {
          var sp = pos + 12
          val end = pos + 8 + size
          var idx = 0
          while (sp + 8 <= end) {
            val st = tag(b, sp.toInt)
            val ss = u32(b, sp.toInt + 4)
            require(sp + 8 + ss <= end, s"movi sub-chunk '$st' overruns list")
            if (st == "00db" || st == "00dc") {
              // Essence dispatch: exact-DIB-size chunks are uncompressed
              // rasters; anything else must be a complete JPEG (MJPEG —
              // each frame a standalone T.81 stream). The size check
              // comes first so a DIB raster that happens to start with
              // FF D8 FF is never misread as a JPEG.
              if (ss == rowBytes.toLong * meta.height) {
                if (idx % stride == 0) {
                  var (sr, sg, sb, r0) = (0L, 0L, 0L, 0L)
                  val base = sp.toInt + 8
                  var y = 0
                  while (y < meta.height) {
                    // logical row y is stored row (h-1-y): bottom-up —
                    // row0SumR is the orientation-sensitive witness
                    val rowOff = base + (meta.height - 1 - y) * rowBytes
                    var x = 0
                    while (x < meta.width) {
                      sb += b(rowOff + x * 3) & 0xFF
                      sg += b(rowOff + x * 3 + 1) & 0xFF
                      val rv = b(rowOff + x * 3 + 2) & 0xFF
                      sr += rv
                      if (y == 0) r0 += rv
                      x += 1
                    }
                    y += 1
                  }
                  out += FrameStats(idx, sr, sg, sb, r0)
                }
              } else {
                val chunk = java.util.Arrays.copyOfRange(
                  b, sp.toInt + 8, sp.toInt + 8 + ss.toInt)
                require(ImageCodecs.isJpeg(chunk),
                  s"frame $idx essence is neither DIB-sized ($ss != " +
                    s"${rowBytes.toLong * meta.height}) nor JPEG")
                if (idx % stride == 0) {
                  val d = ImageCodecs.decodeJpeg(chunk)
                  require(d.width == meta.width && d.height == meta.height,
                    s"frame $idx JPEG ${d.width}x${d.height} != container " +
                      s"${meta.width}x${meta.height}")
                  var (sr, sg, sb, r0) = (0L, 0L, 0L, 0L)
                  var y = 0
                  while (y < meta.height) {   // JPEG rasters are top-down
                    var x = 0
                    while (x < meta.width) {
                      val rgb = d.rgb(x, y)
                      val rv = (rgb >> 16) & 0xFF
                      sr += rv; sg += (rgb >> 8) & 0xFF; sb += rgb & 0xFF
                      if (y == 0) r0 += rv
                      x += 1
                    }
                    y += 1
                  }
                  out += FrameStats(idx, sr, sg, sb, r0)
                }
              }
              idx += 1
            }
            sp += 8 + ss + (ss & 1)
          }
        }
        pos += 8 + size + (size & 1)
      }
      (meta, out.result())
    }

    /** Perceptual frame signature (aHash on a 4×4 grid, red channel):
      * pixel (x,y) maps to cell `(y·4 div h)·4 + (x·4 div w)`; a cell's
      * bit is set when its mean meets the frame mean, compared by
      * integer cross-multiplication `cellSum·(w·h) ≥ frameSum·cellCnt`
      * — no division anywhere, so the 16-bit signature is engine-exact.
      * The standard frame-fingerprint for near-dup video detection.
      */
    def frameAHash(b: Array[Byte], stride: Int): (AviMeta, Seq[(Int, Int)]) = {
      require(stride >= 1, "stride must be >= 1")
      val meta = decodeAviMeta(b)
      val rowBytes = (meta.width * 3 + 3) & ~3
      val out = Vector.newBuilder[(Int, Int)]
      var pos = 12L
      while (pos + 8 <= b.length) {
        val t = tag(b, pos.toInt)
        val size = u32(b, pos.toInt + 4)
        require(pos + 8 + size <= b.length, s"chunk '$t' overruns buffer")
        if (t == "LIST" && size >= 4 && tag(b, pos.toInt + 8) == "movi") {
          var sp = pos + 12
          val end = pos + 8 + size
          var idx = 0
          while (sp + 8 <= end) {
            val st = tag(b, sp.toInt)
            val ss = u32(b, sp.toInt + 4)
            require(sp + 8 + ss <= end, s"movi sub-chunk '$st' overruns list")
            if (st == "00db" || st == "00dc") {
              // same essence dispatch as decodeAviFrames: exact-DIB-size
              // first, else a standalone JPEG frame (MJPEG)
              if (ss == rowBytes.toLong * meta.height) {
                if (idx % stride == 0) {
                  val cs = new Array[Long](16); val cc = new Array[Long](16)
                  var total = 0L
                  val base = sp.toInt + 8
                  var y = 0
                  while (y < meta.height) {
                    val rowOff = base + (meta.height - 1 - y) * rowBytes
                    var x = 0
                    while (x < meta.width) {
                      val r = b(rowOff + x * 3 + 2) & 0xFF
                      val c = (y * 4 / meta.height) * 4 + (x * 4 / meta.width)
                      cs(c) += r; cc(c) += 1; total += r
                      x += 1
                    }
                    y += 1
                  }
                  val n = meta.width.toLong * meta.height
                  var sig = 0; var c = 0
                  while (c < 16) {
                    if (cc(c) > 0 && cs(c) * n >= total * cc(c)) sig |= 1 << c
                    c += 1
                  }
                  out += ((idx, sig))
                }
              } else {
                val chunk = java.util.Arrays.copyOfRange(
                  b, sp.toInt + 8, sp.toInt + 8 + ss.toInt)
                require(ImageCodecs.isJpeg(chunk),
                  s"frame $idx essence is neither DIB-sized ($ss != " +
                    s"${rowBytes.toLong * meta.height}) nor JPEG")
                if (idx % stride == 0) {
                  val d = ImageCodecs.decodeJpeg(chunk)
                  require(d.width == meta.width && d.height == meta.height,
                    s"frame $idx JPEG ${d.width}x${d.height} != container " +
                      s"${meta.width}x${meta.height}")
                  out += ((idx, gridAHash(d.width, d.height,
                    (x, y) => (d.rgb(x, y) >> 16) & 0xFF)))
                }
              }
              idx += 1
            }
            sp += 8 + ss + (ss & 1)
          }
        }
        pos += 8 + size + (size & 1)
      }
      (meta, out.result())
    }

    def decodeAviMeta(b: Array[Byte]): AviMeta = {
      require(isAvi(b), "not a RIFF/AVI")
      var pos = 12L
      var meta: AviMeta = null
      while (pos + 8 <= b.length && meta == null) {
        val t = tag(b, pos.toInt)
        val size = u32(b, pos.toInt + 4)
        require(pos + 8 + size <= b.length, s"chunk '$t' overruns buffer")
        if (t == "LIST" && size >= 4 && tag(b, pos.toInt + 8) == "hdrl") {
          // walk the hdrl sub-chunks for avih
          var sp = pos + 12
          val end = pos + 8 + size
          while (sp + 8 <= end && meta == null) {
            val st = tag(b, sp.toInt)
            val ss = u32(b, sp.toInt + 4)
            require(sp + 8 + ss <= end, s"hdrl sub-chunk '$st' overruns list")
            if (st == "avih") {
              require(ss >= 56, s"avih too small ($ss)")
              val o = sp.toInt + 8
              val uspf = u32(b, o)
              val frames = u32(b, o + 16)
              val streams = u32(b, o + 24)
              val w = u32(b, o + 32); val h = u32(b, o + 36)
              require(w >= 1 && h >= 1 && w <= (1 << 16) && h <= (1 << 16),
                s"implausible dimensions ${w}x$h")
              require(uspf >= 1 && uspf <= 10000000L, s"implausible frame duration $uspf")
              require(frames <= Int.MaxValue && streams <= 64, "implausible counts")
              meta = AviMeta(w.toInt, h.toInt, frames.toInt, uspf.toInt, streams.toInt)
            }
            sp += 8 + ss + (ss & 1)
          }
          require(meta != null, "hdrl list without avih")
        }
        pos += 8 + size + (size & 1)
      }
      require(meta != null, "missing hdrl/avih")
      meta
    }
  }

  /** Closed-form essence-bearing AVI — SMALL frames so the full-essence
    * fixture stays a few KB per doc: every decoded frame feature is
    * recomputable from (doc_id, frame, pixel index) alone, the q80
    * idiom extended with a frame term.
    */
  object VideoEssencePattern {
    def meta(id: Long): VideoCodecs.AviMeta = VideoCodecs.AviMeta(
      width = (8 + id % 9).toInt, height = (6 + id % 7).toInt,
      frames = (6 + id % 5).toInt, usecPerFrame = 40000, streams = 1)
    def rgb(id: Long)(f: Int, x: Int, y: Int): Int = {
      val seed = (id % 9973).toInt
      val i = y * meta(id).width + x
      val r = (seed + 3 * i + 17 * f) % 256
      val g = (seed + 5 * i + 23 * f + 7) % 256
      val b = (seed + 11 * i + 31 * f + 13) % 256
      (r << 16) | (g << 8) | b
    }
  }

  /** Closed-form MJPEG fixture: every frame feature is recomputable
    * from (doc_id, frame, block) alone — the [[VideoEssencePattern]]
    * idiom at the 8×8-block granularity DC-only JPEG preserves
    * exactly. Dimensions are 8-multiples so blocks tile the frame.
    */
  object MjpegPattern {
    def meta(id: Long): VideoCodecs.AviMeta = VideoCodecs.AviMeta(
      width = 8 * (2 + id % 3).toInt, height = 8 * (1 + id % 3).toInt,
      frames = (3 + id % 4).toInt, usecPerFrame = 33333, streams = 1)
    def gray(id: Long)(f: Int, bx: Int, by: Int): Int = {
      val seed = (id % 9973).toInt
      val bw = meta(id).width / 8
      val j = by * bw + bx
      (seed + 37 * j + 101 * f) % 256
    }
  }

  /** Synthesize REAL MJPEG AVI bytes: each `00dc` chunk is a complete
    * hand-encoded baseline JPEG — every 4th id carries the JUNK chunk.
    */
  def syntheticMjpeg(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("modality", StringType),
      StructField("bytes", BinaryType)))
    val rdd = docs.select("doc_id").rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        Row(id, "video",
          VideoCodecs.encodeAviMjpeg(MjpegPattern.meta(id),
            MjpegPattern.gray(id), junk = id % 4 == 0))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Synthesize REAL essence-bearing AVI bytes (full uncompressed DIB
    * frames in movi) — every 4th id carries the JUNK chunk.
    */
  def syntheticVideoEssence(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("modality", StringType),
      StructField("bytes", BinaryType)))
    val rdd = docs.select("doc_id").rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        Row(id, "video",
          VideoCodecs.encodeAviEssence(VideoEssencePattern.meta(id),
            VideoEssencePattern.rgb(id), junk = id % 4 == 0))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** REAL video frame extraction: walk the container, decode every
    * `stride`-th uncompressed DIB frame, emit exact channel sums + the
    * mean as the one derived double — the frame-sampling feature pass a
    * multimodal pipeline runs before any model. Corrupt bytes drop the
    * ROW (filter semantics); executor-side mapPartitions, one pass per
    * blob, no driver involvement.
    */
  def decodeVideoFrames(media: DataFrame, stride: Int): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sum_r", LongType), StructField("sum_g", LongType),
      StructField("sum_b", LongType),
      StructField("row0_sum_r", LongType),
      StructField("mean_r", DoubleType)))
    val rdd = media.select("media_id", "bytes").rdd.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val dec =
          try {
            if (VideoCodecs.isAvi(bytes))
              Some(VideoCodecs.decodeAviFrames(bytes, stride))
            else None
          } catch { case _: IllegalArgumentException => None }
        dec.toSeq.flatMap { case (m, frames) =>
          frames.map { fs =>
            Row(id, fs.idx, m.width, m.height, fs.sumR, fs.sumG, fs.sumB,
              fs.row0SumR, fs.sumR.toDouble / (m.width * m.height))
          }
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Grid aHash over any decoded raster — the shared fingerprint core:
    * 4×4 cells on the red channel, each bit an integer cross-multiply
    * against the image mean (the [[VideoCodecs.frameAHash]] contract).
    */
  private def gridAHash(w: Int, h: Int, red: (Int, Int) => Int): Int = {
    val cs = new Array[Long](16); val cc = new Array[Long](16); var total = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = red(x, y)
        val c = (y * 4 / h) * 4 + (x * 4 / w)
        cs(c) += r; cc(c) += 1; total += r
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    var sig = 0; var c = 0
    while (c < 16) {
      if (cc(c) > 0 && cs(c) * n >= total * cc(c)) sig |= 1 << c
      c += 1
    }
    sig
  }

  /** Perceptual signatures over the IMAGE corpus (every decodable
    * format — BMP/PPM/PNG here): the image member of the fingerprint
    * family, feeding exact-signature and Hamming-near image dedup the
    * way q181/q182 do for video frames. Corrupt/opaque blobs drop.
    */
  def imageHashes(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("format", StringType),
      StructField("sig", IntegerType)))
    val rdd = media.select("media_id", "bytes").rdd.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val dec =
          try {
            if (ImageCodecs.isBmp(bytes)) Some("bmp" -> ImageCodecs.decodeBmp(bytes))
            else if (ImageCodecs.isPpm(bytes)) Some("ppm" -> ImageCodecs.decodePpm(bytes))
            else if (ImageCodecs.isPng(bytes)) Some("png" -> ImageCodecs.decodePng(bytes))
            else None
          } catch { case _: IllegalArgumentException | _: java.io.IOException => None }
        dec.map { case (fmt, d) =>
          Row(id, fmt, gridAHash(d.width, d.height, (x, y) => (d.rgb(x, y) >> 16) & 0xFF))
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Per-frame perceptual signatures over the essence fixture — the
    * frame-fingerprint pass feeding video near-dup detection. Same
    * mapPartitions shape as [[decodeVideoFrames]]; corrupt blobs drop.
    */
  def videoFrameHashes(media: DataFrame, stride: Int): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("sig", IntegerType)))
    val rdd = media.select("media_id", "bytes").rdd.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val dec =
          try {
            if (VideoCodecs.isAvi(bytes))
              Some(VideoCodecs.frameAHash(bytes, stride))
            else None
          } catch { case _: IllegalArgumentException => None }
        dec.toSeq.flatMap { case (_, sigs) =>
          sigs.map { case (idx, sig) => Row(id, idx, sig) }
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Closed-form AVI metadata — the video twin of [[TestPattern]]. */
  object VideoTestPattern {
    def meta(id: Long): VideoCodecs.AviMeta = VideoCodecs.AviMeta(
      width = (320 + id % 16).toInt,
      height = (240 + id % 12).toInt,
      frames = (100 + id % 50).toInt,
      usecPerFrame = (if (id % 2 == 0) 33333 else 40000),
      streams = (1 + id % 2).toInt)
  }

  /** Synthesize REAL AVI container bytes; every 4th id carries the JUNK
    * padding chunk real muxers emit.
    */
  def syntheticVideo(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("modality", StringType),
      StructField("bytes", BinaryType)))
    val rdd = docs.select("doc_id").rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        Row(id, "video",
          VideoCodecs.encodeAvi(VideoTestPattern.meta(id), junk = id % 4 == 0))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** REAL video-container metadata decode: RIFF walk → LIST hdrl → avih.
    * duration_us = frames × µs/frame, exact integer. Corrupt bytes yield
    * a 'corrupt' row; unknown formats 'opaque'.
    */
  def decodeVideoMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_frames", IntegerType),
      StructField("usec_per_frame", IntegerType),
      StructField("duration_us", LongType),
      StructField("n_streams", IntegerType)))
    val rdd = media.select("media_id", "bytes").rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val decoded: Option[VideoCodecs.AviMeta] =
          try {
            if (VideoCodecs.isAvi(bytes)) Some(VideoCodecs.decodeAviMeta(bytes)) else None
          } catch { case _: IllegalArgumentException => Some(null) }
        decoded match {
          case Some(m) if m != null =>
            Row(id, "avi", m.width, m.height, m.frames, m.usecPerFrame,
              m.frames.toLong * m.usecPerFrame, m.streams)
          case other =>
            Row(id, if (other.isDefined) "corrupt" else "opaque",
              null, null, null, null, null, null)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Closed-form PCM sample function — the audio twin of [[TestPattern]]:
    * every decoded audio feature is recomputable by the DuckDB oracle from
    * (doc_id, frame index, channel) alone. Bounded small: frames ≤ 319,
    * samples in [-2000, 2000] ⊂ s16.
    */
  object AudioTestPattern {
    def sampleRate(id: Long): Int = (id % 3) match {
      case 0 => 8000; case 1 => 16000; case _ => 44100
    }
    def channels(id: Long): Int = (1 + id % 2).toInt
    def frames(id: Long): Int = (200 + id % 120).toInt
    def sample(id: Long)(ch: Int, i: Int): Int =
      ((id % 9973).toInt + 7 * i + 13 * ch + 29) % 4001 - 2000
  }

  /** Synthesize REAL WAV bytes with [[AudioTestPattern]] PCM — the audio
    * fixture generator. Every 5th id carries an unknown pre-`data` chunk,
    * so the decoder's RIFF walk (not a fixed 44-byte offset) is what the
    * oracle actually verifies.
    */
  def syntheticAudio(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("modality", StringType),
      StructField("bytes", BinaryType)))
    val rdd = docs.select("doc_id").rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = AudioCodecs.encodeWav(
          AudioTestPattern.sampleRate(id), AudioTestPattern.channels(id),
          AudioTestPattern.frames(id), AudioTestPattern.sample(id),
          padChunk = id % 5 == 0)
        Row(id, "audio", bytes)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** REAL audio decode: parses the RIFF chunk list and emits integer-exact
    * PCM features — sample rate, channel count, frame count, µs duration
    * (integer division, matching C5's µs convention), channel-0 sum and
    * sum-of-squares (the moments quality filters threshold on), the
    * all-channel peak, and channel-0 mean/RMS as the only two derived
    * doubles (one division; division then square root — both
    * correctly-rounded IEEE ops, so cross-engine exact). Corrupt bytes
    * yield a 'corrupt' row, unknown formats 'opaque' — a bad blob must
    * not fail the task at corpus scale.
    */
  def decodeAudio(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("format", StringType),
      StructField("sample_rate", IntegerType),
      StructField("channels", IntegerType),
      StructField("n_frames", IntegerType),
      StructField("duration_us", LongType),
      StructField("sum_ch0", LongType),
      StructField("sumsq_ch0", LongType),
      StructField("peak", IntegerType),
      StructField("mean_ch0", DoubleType),
      StructField("rms_ch0", DoubleType)))
    val rdd = media.select("media_id", "bytes").rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val decoded: Option[AudioCodecs.DecodedAudio] =
          try {
            if (AudioCodecs.isWav(bytes)) Some(AudioCodecs.decodeWav(bytes)) else None
          } catch { case _: IllegalArgumentException => Some(null) }
        decoded match {
          case Some(a) if a != null =>
            var (sum0, sumsq0) = (0L, 0L)
            var peak = 0
            var i = 0
            while (i < a.frames) {
              var c = 0
              while (c < a.channels) {
                val v = a.sample(c, i)
                if (c == 0) { sum0 += v; sumsq0 += v.toLong * v }
                val av = math.abs(v)
                if (av > peak) peak = av
                c += 1
              }
              i += 1
            }
            val durUs = a.frames.toLong * 1000000L / a.sampleRate
            Row(id, "wav", a.sampleRate, a.channels, a.frames, durUs,
              sum0, sumsq0, peak,
              if (a.frames > 0) sum0.toDouble / a.frames else 0.0,
              if (a.frames > 0) math.sqrt(sumsq0.toDouble / a.frames) else 0.0)
          case other =>
            Row(id, if (other.isDefined) "corrupt" else "opaque",
              null, null, null, null, null, null, null, null, null)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Q7 integer twiddle table for the [[audioSpectral]] DFT — ONE source
    * of truth for both engines: the Spark path folds over the arrays,
    * the DuckDB oracle embeds the SAME integers via [[sqlValues]], so
    * cross-engine agreement never depends on two trig implementations
    * rounding alike. Q7 (scale 128) keeps every statistic in Long:
    * |re| ≤ 64·2000·128 ≈ 1.6e7, power ≤ 5.4e14, Σk·power ≤ 2.8e17.
    */
  object SpectralTrig {
    val N = 64
    val cos: IndexedSeq[Int] =
      (0 until N).map(j => Math.round(Math.cos(2 * Math.PI * j / N) * 128).toInt)
    val sin: IndexedSeq[Int] =
      (0 until N).map(j => Math.round(Math.sin(2 * Math.PI * j / N) * 128).toInt)
    def sqlValues: String =
      (0 until N).map(j => s"($j, ${cos(j)}, ${sin(j)})").mkString(", ")
  }

  /** Spectral features over decoded PCM — the first REAL signal-domain
    * audio operator (decodeAudio stops at time-domain moments): a
    * [[SpectralTrig.N]]-point integer DFT of the first N channel-0
    * samples, emitting the dominant AC bin (argmax power, ties to the
    * lower bin), its power, total AC power, and the spectral centroid
    * Σk·p_k / Σp_k — exact BIGINTs plus ONE IEEE division, the q158
    * convention, so the oracle hash-matches everything including the
    * centroid. Executor-side mapPartitions (decode + O(N²) fold per
    * row — N=64 keeps it trivially cheap); rows too short for a frame,
    * corrupt, or non-WAV are dropped (the filter semantics of a
    * feature-extraction pass, vs decodeAudio's audit semantics).
    */
  def audioSpectral(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("dom_bin", IntegerType),
      StructField("dom_power", LongType),
      StructField("total_power", LongType),
      StructField("centroid", DoubleType)))
    val n = SpectralTrig.N
    val rdd = media.select("media_id", "bytes").rdd.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        decodedForDft(bytes).map { a =>
          val pw = dftPowers(a)
          var total = 0L; var num = 0L
          var domBin = 0; var domPw = -1L
          var k = 1
          while (k <= n / 2) {
            total += pw(k); num += k.toLong * pw(k)
            if (pw(k) > domPw) { domPw = pw(k); domBin = k }
            k += 1
          }
          Row(id, domBin, domPw, total,
            if (total > 0L) java.lang.Double.valueOf(num.toDouble / total.toDouble)
            else null)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Decode gate for the DFT passes: WAV with ≥ N frames, else drop. */
  private def decodedForDft(bytes: Array[Byte]): Option[AudioCodecs.DecodedAudio] =
    (try {
      if (AudioCodecs.isWav(bytes)) Some(AudioCodecs.decodeWav(bytes)) else None
    } catch { case _: IllegalArgumentException => None })
      .filter(_.frames >= SpectralTrig.N)

  /** AC power per bin (index 1..N/2) of the first N ch-0 samples. */
  private def dftPowers(a: AudioCodecs.DecodedAudio): Array[Long] = {
    val n = SpectralTrig.N
    val ct = SpectralTrig.cos; val st = SpectralTrig.sin
    val x = Array.tabulate(n)(i => a.sample(0, i).toLong)
    val pw = new Array[Long](n / 2 + 1)
    var k = 1
    while (k <= n / 2) {
      var re = 0L; var im = 0L; var i = 0
      while (i < n) {
        val j = (k * i) % n
        re += x(i) * ct(j); im += x(i) * st(j)
        i += 1
      }
      pw(k) = re * re + im * im
      k += 1
    }
    pw
  }

  /** Audio fingerprint — the audio member of the fingerprint family:
    * the two strongest AC bins (ties to the lower bin) packed as
    * `sig = b1·33 + b2`, plus the count of corpus files sharing the
    * signature (the exact-dup group size) via one sig-keyed window
    * over the FILE-dim table. Integer-only, engine-exact.
    */
  def audioFingerprints(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("b1", IntegerType),
      StructField("b2", IntegerType),
      StructField("sig", IntegerType)))
    val n = SpectralTrig.N
    val rdd = media.select("media_id", "bytes").rdd.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        decodedForDft(r.getAs[Array[Byte]](1)).map { a =>
          val pw = dftPowers(a)
          var b1 = 1; var k = 2
          while (k <= n / 2) { if (pw(k) > pw(b1)) b1 = k; k += 1 }
          var b2 = if (b1 == 1) 2 else 1
          k = 1
          while (k <= n / 2) {
            if (k != b1 && pw(k) > pw(b2)) b2 = k
            k += 1
          }
          Row(id, b1, b2, b1 * 33 + b2)
        }
      }
    }
    import org.apache.spark.sql.expressions.Window
    spark.createDataFrame(rdd, outSchema)
      .withColumn("n_same",
        count(lit(1)).over(Window.partitionBy("sig")).cast(LongType))
  }

  /** REAL decode: sniffs the magic bytes and decodes BMP/PPM/PNG into
    * width/height plus exact per-channel pixel sums, channel means, and
    * the top-row sums (orientation-sensitive — a bottom-up/top-down mixup
    * changes them while leaving whole-image means untouched). Unknown
    * formats yield format='opaque' with null features: the stub boundary,
    * now only for formats without a JVM decoder. Executor-side
    * mapPartitions, one decode per row, no driver involvement.
    */
  def decodeMedia(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sum_r", LongType), StructField("sum_g", LongType),
      StructField("sum_b", LongType),
      StructField("row0_sum_r", LongType), StructField("row0_sum_g", LongType),
      StructField("row0_sum_b", LongType),
      StructField("mean_r", DoubleType), StructField("mean_g", DoubleType),
      StructField("mean_b", DoubleType)))
    val rdd = media.select("media_id", "bytes").rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        // corrupt media is EXPECTED input at corpus scale: a decode
        // failure yields a 'corrupt' row, it must not fail the task (and
        // with it the whole job) four retries later
        val decoded: Option[(String, ImageCodecs.Decoded)] =
          try {
            if (ImageCodecs.isBmp(bytes)) Some("bmp" -> ImageCodecs.decodeBmp(bytes))
            else if (ImageCodecs.isPpm(bytes)) Some("ppm" -> ImageCodecs.decodePpm(bytes))
            else if (ImageCodecs.isPng(bytes)) Some("png" -> ImageCodecs.decodePng(bytes))
            else if (ImageCodecs.isGif(bytes)) Some("gif" -> ImageCodecs.decodeGif(bytes))
            else if (ImageCodecs.isJpeg(bytes)) Some("jpeg" -> ImageCodecs.decodeJpeg(bytes))
            else None
          } catch { case _: IllegalArgumentException | _: java.io.IOException => Some("corrupt" -> null) }
        decoded match {
          case Some((fmt, img)) if img != null =>
            var (sr, sg, sb) = (0L, 0L, 0L)
            var (r0r, r0g, r0b) = (0L, 0L, 0L)
            var y = 0
            while (y < img.height) {
              var x = 0
              while (x < img.width) {
                val p = img.rgb(x, y)
                sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF; sb += p & 0xFF
                if (y == 0) { r0r += (p >> 16) & 0xFF; r0g += (p >> 8) & 0xFF; r0b += p & 0xFF }
                x += 1
              }
              y += 1
            }
            val n = img.width.toLong * img.height
            Row(id, fmt, img.width, img.height, sr, sg, sb, r0r, r0g, r0b,
              sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
          case other =>
            Row(id, other.map(_._1).getOrElse("opaque"),
              null, null, null, null, null, null, null, null, null, null, null)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
