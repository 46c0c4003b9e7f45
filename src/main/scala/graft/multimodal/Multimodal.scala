package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata, decoded/feature-extracted in batched per-partition
  * workers.
  *
  * The Spark-side pattern is the real deliverable here: schema (binary
  * payload + metadata struct), partition-sized batching via
  * `mapPartitions` on a typed Dataset (one decoder init per task, not
  * per row — the same shape a JNI/FFmpeg/pillow-backed decoder needs),
  * and feature columns flowing back into relational plans.
  *
  * The decode itself has two tiers: [[decodeImageHeader]] is a REAL
  * pure-JVM container parse (PNG IHDR / BMP DIB header →
  * width/height/channels — byte-identical to what any codec would
  * report, oracle-checked in q110); the pixel-level step beyond the
  * header is where a production deployment swaps in codec bindings
  * (this container ships none), and until then [[decodeStub]] supplies
  * deterministic byte-level features (length, first byte, rolling
  * hash) for arbitrary payloads.
  *
  * Scale notes: payload bytes never shuffle — feature extraction is a
  * narrow map; only (id, features) continue into joins/aggregations.
  * Partition sizing should target payload bytes per task
  * (`spark.sql.files.maxPartitionBytes`), not row counts.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
      first_byte: Int, checksum: Long, format: Option[String],
      width: Option[Int], height: Option[Int], channels: Option[Int])

  /** Wrap any table with a binary payload column + metadata (here: text
    * bytes stand in for media payloads).
    */
  def asMediaFrame(df: DataFrame, idCol: String, payloadCol: String,
      kind: String): DataFrame =
    df.select(col(idCol).as("media_id"), lit(kind).as("kind"),
      encode(col(payloadCol), "UTF-8").as("payload"))

  /** STUB decoder for the pixel tier: deterministic fake standing in
    * for a codec call. Rolling hash mirrors TextFunctions.fingerprint
    * over bytes.
    */
  def decodeStub(payload: Array[Byte]): (Int, Long) = {
    var h = 0L
    var i = 0
    while (i < payload.length) {
      h = (h * 31 + (payload(i) & 0xff)) % 1000000007L
      i += 1
    }
    (if (payload.length > 0) payload(0) & 0xff else -1, h)
  }

  /** REAL container-header decode, pure JVM: recognizes PNG (8-byte
    * signature + IHDR chunk: big-endian dims, color type → channels)
    * and BMP ("BM" + BITMAPINFOHEADER: little-endian dims, bpp →
    * channels). Returns (format, width, height, channels); None for
    * anything else — non-image bytes must flow through as nulls, never
    * crash the task.
    */
  def decodeImageHeader(p: Array[Byte]): Option[(String, Int, Int, Int)] = {
    def be32(i: Int): Int = ((p(i) & 0xff) << 24) | ((p(i + 1) & 0xff) << 16) |
      ((p(i + 2) & 0xff) << 8) | (p(i + 3) & 0xff)
    def le32(i: Int): Int = (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8) |
      ((p(i + 2) & 0xff) << 16) | ((p(i + 3) & 0xff) << 24)
    def le16(i: Int): Int = (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)
    if (p.length >= 26 && be32(0) == 0x89504e47 && be32(4) == 0x0d0a1a0a &&
        p(12) == 'I'.toByte && p(13) == 'H'.toByte &&
        p(14) == 'D'.toByte && p(15) == 'R'.toByte) {
      val channels = (p(25) & 0xff) match {
        case 0 => Some(1) // grayscale
        case 2 => Some(3) // truecolor
        case 3 => Some(1) // palette
        case 4 => Some(2) // gray + alpha
        case 6 => Some(4) // RGBA
        case _ => None
      }
      channels.map(ch => ("png", be32(16), be32(20), ch))
    } else if (p.length >= 30 && p(0) == 'B'.toByte && p(1) == 'M'.toByte) {
      val w = le32(18)
      val h = math.abs(le32(22)) // negative height = top-down rows
      val bpp = le16(28)
      if (w > 0 && h > 0 && bpp > 0 && bpp % 8 == 0) Some(("bmp", w, h, bpp / 8))
      else None
    } else if (p.length >= 4 && (p(0) & 0xff) == 0xff &&
        (p(1) & 0xff) == 0xd8) {
      // JPEG (round 8): a REAL marker scan, not fixed offsets — dims
      // live in whichever SOFn segment follows an arbitrary number of
      // variable-length segments (APPn/COM/DQT/DHT…), so the parser
      // must walk the segment chain exactly like libjpeg does. SOF
      // family = C0-CF minus C4 (DHT), C8 (JPG reserved), CC (DAC).
      def be16(i: Int): Int = ((p(i) & 0xff) << 8) | (p(i + 1) & 0xff)
      var i = 2
      var out: Option[(String, Int, Int, Int)] = None
      var done = false
      while (!done && i + 3 < p.length) {
        if ((p(i) & 0xff) != 0xff) { done = true } // corrupt stream
        else {
          val m = p(i + 1) & 0xff
          if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 &&
              m != 0xcc) {
            if (i + 9 < p.length) {
              val h = be16(i + 5); val w = be16(i + 7)
              val nc = p(i + 9) & 0xff
              if (w > 0 && h > 0 && nc > 0) out = Some(("jpeg", w, h, nc))
            }
            done = true
          } else if (m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) {
            i += 2 // standalone marker, no length field
          } else if (m == 0xd9 || m == 0xda) {
            done = true // EOI / SOS before any SOF → no dims
          } else {
            i += 2 + be16(i + 2) // variable-length segment skip
          }
        }
      }
      out
    } else if (p.length >= 10 && p(0) == 'G'.toByte &&
        p(1) == 'I'.toByte && p(2) == 'F'.toByte && p(3) == '8'.toByte &&
        (p(4) == '7'.toByte || p(4) == '9'.toByte) && p(5) == 'a'.toByte) {
      // GIF (T186): logical screen descriptor right after the 6-byte
      // signature — LE16 width/height; palette-indexed → 1 channel
      // (the PNG color-type-3 convention above)
      val w = le16(6); val h = le16(8)
      if (w > 0 && h > 0) Some(("gif", w, h, 1)) else None
    } else if (p.length >= 12 && p(0) == 'R'.toByte &&
        p(1) == 'I'.toByte && p(2) == 'F'.toByte && p(3) == 'F'.toByte &&
        p(8) == 'W'.toByte && p(9) == 'E'.toByte && p(10) == 'B'.toByte &&
        p(11) == 'P'.toByte) {
      // WebP (T186): walk the RIFF chunk list to the first image-
      // bearing chunk. Three public layouts:
      //  - "VP8 " (lossy): 3-byte frame tag, sync 9D 01 2A, then
      //    14-bit LE width/height (top 2 bits are scale hints);
      //  - "VP8L" (lossless): 0x2F then width-1/height-1 as two
      //    14-bit fields packed LSB-first, bit 28 = alpha;
      //  - "VP8X" (extended): 1 flag byte (bit 0x10 = alpha), 3
      //    reserved, then 24-bit LE canvas width-1/height-1.
      var i = 12
      var out: Option[(String, Int, Int, Int)] = None
      while (out.isEmpty && i + 8 <= p.length) {
        val tag = new String(p, i, 4, "ISO-8859-1")
        val sz = le32(i + 4)
        val body = i + 8
        tag match {
          case "VP8 " if body + 10 <= p.length &&
              (p(body + 3) & 0xff) == 0x9d &&
              (p(body + 4) & 0xff) == 0x01 &&
              (p(body + 5) & 0xff) == 0x2a =>
            val w = le16(body + 6) & 0x3fff
            val h = le16(body + 8) & 0x3fff
            if (w > 0 && h > 0) out = Some(("webp", w, h, 3))
          case "VP8L" if body + 5 <= p.length &&
              (p(body) & 0xff) == 0x2f =>
            val bits = le32(body + 1)
            val w = (bits & 0x3fff) + 1
            val h = ((bits >>> 14) & 0x3fff) + 1
            val alpha = ((bits >>> 28) & 1) == 1
            out = Some(("webp", w, h, if (alpha) 4 else 3))
          case "VP8X" if body + 10 <= p.length =>
            val alpha = (p(body) & 0x10) != 0
            def le24(j: Int): Int = (p(j) & 0xff) |
              ((p(j + 1) & 0xff) << 8) | ((p(j + 2) & 0xff) << 16)
            val w = le24(body + 4) + 1
            val h = le24(body + 7) + 1
            out = Some(("webp", w, h, if (alpha) 4 else 3))
          case _ => // skip unknown chunk (padded to even length)
        }
        // next offset in Long: a crafted chunk size near Int.MaxValue
        // overflows Int to a NEGATIVE index and the next tag read
        // throws StringIndexOutOfBounds — decodeImageHeader must never
        // crash the task on malformed bytes (ADVICE r14)
        val next = body.toLong + sz.toLong + (sz & 1)
        i = if (sz < 0 || next > p.length) p.length else next.toInt
      }
      out
    } else None
  }

  /** Synthesize a WebP file in one of the three public layouts —
    * `variant` ∈ lossy | lossless | extended; alpha only exists for
    * the latter two. The non-header payload is deterministic filler
    * (the pixel tier stays the documented stub).
    */
  def syntheticWebp(w: Int, h: Int, variant: String,
      alpha: Boolean = false): Array[Byte] = {
    val chunk: (String, Array[Byte]) = variant match {
      case "lossy" =>
        val b = new Array[Byte](10 + 6)
        // 3-byte frame tag (key frame, version 0, show_frame): zeros
        b(3) = 0x9d.toByte; b(4) = 0x01; b(5) = 0x2a
        b(6) = (w & 0xff).toByte; b(7) = ((w >> 8) & 0x3f).toByte
        b(8) = (h & 0xff).toByte; b(9) = ((h >> 8) & 0x3f).toByte
        ("VP8 ", b)
      case "lossless" =>
        val bits = ((w - 1) & 0x3fff) | (((h - 1) & 0x3fff) << 14) |
          ((if (alpha) 1 else 0) << 28)
        val b = new Array[Byte](5 + 3)
        b(0) = 0x2f
        b(1) = (bits & 0xff).toByte; b(2) = ((bits >> 8) & 0xff).toByte
        b(3) = ((bits >> 16) & 0xff).toByte
        b(4) = ((bits >> 24) & 0xff).toByte
        ("VP8L", b)
      case "extended" =>
        val b = new Array[Byte](10)
        if (alpha) b(0) = 0x10
        def le24(v: Int, j: Int): Unit = {
          b(j) = (v & 0xff).toByte; b(j + 1) = ((v >> 8) & 0xff).toByte
          b(j + 2) = ((v >> 16) & 0xff).toByte
        }
        le24(w - 1, 4); le24(h - 1, 7)
        ("VP8X", b)
      case other =>
        throw new IllegalArgumentException(s"unknown variant $other")
    }
    val (tag, body) = chunk
    val bos = new java.io.ByteArrayOutputStream()
    def w32(v: Int): Unit = {
      bos.write(v & 0xff); bos.write((v >> 8) & 0xff)
      bos.write((v >> 16) & 0xff); bos.write((v >> 24) & 0xff)
    }
    bos.write("RIFF".getBytes("ISO-8859-1"))
    w32(4 + 8 + body.length + (body.length & 1))
    bos.write("WEBP".getBytes("ISO-8859-1"))
    bos.write(tag.getBytes("ISO-8859-1"))
    w32(body.length)
    bos.write(body)
    if ((body.length & 1) == 1) bos.write(0) // RIFF even-padding
    bos.toByteArray
  }

  /** Synthesize a minimal GIF89a: signature + logical screen
    * descriptor + trailer (no image data — header decode is the
    * tested tier, like the other synthetic containers).
    */
  def syntheticGif(w: Int, h: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bos.write("GIF89a".getBytes("ISO-8859-1"))
    bos.write(w & 0xff); bos.write((w >> 8) & 0xff)
    bos.write(h & 0xff); bos.write((h >> 8) & 0xff)
    bos.write(0); bos.write(0); bos.write(0) // no GCT, bg, aspect
    bos.write(0x3b) // trailer
    bos.toByteArray
  }

  /** EXIF orientation (tag 0x0112) from a JPEG's APP1 segment — the
    * value an image pipeline must read BEFORE pixel hashing/resizing
    * (a rotated duplicate hashes differently if orientation is
    * ignored). This is a real TIFF walk: find APP1 with the
    * `Exif\0\0` preamble, honor the byte-order mark (`II` little- vs
    * `MM` big-endian — per-file!), follow the IFD0 offset, iterate
    * 12-byte directory entries to tag 0x0112, and read the SHORT
    * value from the endianness-dependent half of the value field.
    * None for anything malformed — never a throw.
    */
  def decodeExifOrientation(p: Array[Byte]): Option[Int] = {
    def be16(i: Int): Int = ((p(i) & 0xff) << 8) | (p(i + 1) & 0xff)
    if (p.length < 4 || (p(0) & 0xff) != 0xff || (p(1) & 0xff) != 0xd8)
      return None
    var i = 2
    while (i + 3 < p.length) {
      if ((p(i) & 0xff) != 0xff) return None
      val m = p(i + 1) & 0xff
      if (m == 0xe1 && i + 10 < p.length &&
          p(i + 4) == 'E' && p(i + 5) == 'x' && p(i + 6) == 'i' &&
          p(i + 7) == 'f' && p(i + 8) == 0 && p(i + 9) == 0) {
        val t = i + 10 // TIFF header start
        val segEnd = i + 2 + be16(i + 2)
        if (t + 8 > p.length || t + 8 > segEnd) return None
        val little = p(t) == 'I' && p(t + 1) == 'I'
        val big = p(t) == 'M' && p(t + 1) == 'M'
        if (!little && !big) return None
        def u16(j: Int): Int =
          if (little) (p(j) & 0xff) | ((p(j + 1) & 0xff) << 8)
          else ((p(j) & 0xff) << 8) | (p(j + 1) & 0xff)
        def u32(j: Int): Long =
          if (little) (p(j) & 0xffL) | ((p(j + 1) & 0xffL) << 8) |
            ((p(j + 2) & 0xffL) << 16) | ((p(j + 3) & 0xffL) << 24)
          else ((p(j) & 0xffL) << 24) | ((p(j + 1) & 0xffL) << 16) |
            ((p(j + 2) & 0xffL) << 8) | (p(j + 3) & 0xffL)
        if (u16(t + 2) != 42) return None
        // the IFD0 offset is an UNSIGNED 32-bit value: a malformed
        // offset near 2^32 would wrap .toInt negative and pass the
        // upper-bound checks below, then index p(negative) — range-
        // check the raw long BEFORE narrowing (round-9 fuzz finding;
        // TIFF mandates offset ≥ 8, right past the 8-byte header)
        val ifd0Off = u32(t + 4)
        if (ifd0Off < 8 || ifd0Off > p.length.toLong - t) return None
        val ifd0 = t + ifd0Off.toInt
        if (ifd0 + 2 > p.length || ifd0 + 2 > segEnd) return None
        val n = u16(ifd0)
        var e = 0
        while (e < n) {
          val off = ifd0 + 2 + e * 12
          if (off + 12 > p.length || off + 12 > segEnd) return None
          if (u16(off) == 0x0112 && u16(off + 2) == 3 &&
              u32(off + 4) == 1L) {
            val v = u16(off + 8) // SHORT sits in the value field's
            return if (v >= 1 && v <= 8) Some(v) else None
          }
          e += 1
        }
        return None
      } else if (m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) {
        i += 2
      } else if (m == 0xd9 || m == 0xda) {
        return None
      } else {
        i += 2 + be16(i + 2)
      }
    }
    None
  }

  /** JPEG with an EXIF APP1 segment carrying the orientation tag —
    * byte order selectable so BOTH TIFF endiannesses are exercised.
    * IFD0 deliberately holds two entries (a width tag first) so the
    * decoder's entry ITERATION is tested, not offset zero.
    */
  def syntheticExifJpeg(w: Int, h: Int, nc: Int, orientation: Int,
      littleEndian: Boolean): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def m(b: Int): Unit = { bos.write(0xff); bos.write(b) }
    def be16(v: Int): Unit = { bos.write((v >> 8) & 0xff); bos.write(v & 0xff) }
    m(0xd8)
    // TIFF payload
    val tb = new java.io.ByteArrayOutputStream()
    def t16(v: Int): Unit =
      if (littleEndian) { tb.write(v & 0xff); tb.write((v >> 8) & 0xff) }
      else { tb.write((v >> 8) & 0xff); tb.write(v & 0xff) }
    def t32(v: Int): Unit =
      if (littleEndian) { tb.write(v & 0xff); tb.write((v >> 8) & 0xff)
        tb.write((v >> 16) & 0xff); tb.write((v >> 24) & 0xff) }
      else { tb.write((v >> 24) & 0xff); tb.write((v >> 16) & 0xff)
        tb.write((v >> 8) & 0xff); tb.write(v & 0xff) }
    tb.write(if (littleEndian) 'I' else 'M')
    tb.write(if (littleEndian) 'I' else 'M')
    t16(42); t32(8) // magic + IFD0 offset
    t16(2) // two entries
    t16(0x0100); t16(3); t32(1); t16(w); t16(0) // ImageWidth SHORT
    t16(0x0112); t16(3); t32(1); t16(orientation); t16(0) // Orientation
    t32(0) // next-IFD offset
    val tiff = tb.toByteArray
    m(0xe1); be16(2 + 6 + tiff.length)
    bos.write("Exif".getBytes("US-ASCII")); bos.write(0); bos.write(0)
    bos.write(tiff)
    m(0xc0); be16(8 + 3 * nc)
    bos.write(8); be16(h); be16(w); bos.write(nc)
    for (c <- 1 to nc) { bos.write(c); bos.write(0x11); bos.write(0) }
    m(0xd9)
    bos.toByteArray
  }

  /** Minimal VALID JPEG header bytes: SOI, a JFIF APP0, a COM segment
    * and a dummy DQT (so the decoder's marker WALK is exercised, not
    * just a fixed SOF offset), SOF0 with the dims, EOI. `nc` = 1
    * (grayscale) or 3 (YCbCr).
    */
  def syntheticJpeg(w: Int, h: Int, nc: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def m(b: Int): Unit = { bos.write(0xff); bos.write(b) }
    def be16(v: Int): Unit = { bos.write((v >> 8) & 0xff); bos.write(v & 0xff) }
    m(0xd8) // SOI
    m(0xe0); be16(16) // APP0, len 16
    bos.write("JFIF".getBytes("US-ASCII")); bos.write(0)
    bos.write(1); bos.write(1); bos.write(0); be16(72); be16(72); bos.write(0); bos.write(0)
    val comment = "graft synthetic".getBytes("US-ASCII")
    m(0xfe); be16(2 + comment.length); bos.write(comment) // COM
    m(0xdb); be16(2 + 65); bos.write(0) // DQT: id 0 + 64 zero entries
    for (_ <- 0 until 64) bos.write(0)
    m(0xc0); be16(8 + 3 * nc) // SOF0
    bos.write(8); be16(h); be16(w); bos.write(nc)
    for (c <- 1 to nc) { bos.write(c); bos.write(0x11); bos.write(0) }
    m(0xd9) // EOI
    bos.toByteArray
  }

  /** Minimal VALID PNG header bytes (signature + IHDR payload; CRC and
    * data chunks omitted — header-tier fixtures for decode tests).
    */
  def syntheticPng(w: Int, h: Int, colorType: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(30) // big-endian by default
    out.putInt(0x89504e47).putInt(0x0d0a1a0a)
    out.putInt(13) // IHDR length
    out.put("IHDR".getBytes("US-ASCII"))
    out.putInt(w).putInt(h)
    out.put(8.toByte).put(colorType.toByte) // bit depth, color type
    out.array()
  }

  /** Minimal VALID BMP header bytes ("BM" + BITMAPINFOHEADER). */
  def syntheticBmp(w: Int, h: Int, bpp: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(54)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte)
    out.putInt(54) // file size (header only)
    out.putInt(0).putInt(54) // reserved, pixel-data offset
    out.putInt(40) // DIB header size
    out.putInt(w).putInt(h)
    out.putShort(1.toShort).putShort(bpp.toShort) // planes, bpp
    out.array()
  }

  /** Batched per-partition feature extraction — the decoder
    * initialization (imagine codec contexts, model weights) happens once
    * per partition, rows stream through it. Byte-tier features always;
    * container dims when the payload IS a recognized image.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder init would go here
      rows.map { r =>
        val (first, checksum) = decodeStub(r.payload)
        val header = decodeImageHeader(r.payload)
        MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, first,
          checksum, header.map(_._1), header.map(_._2), header.map(_._3),
          header.map(_._4))
      }
    }
  }

  // ---- pixel tier: REAL pure-JVM decode (no codec bindings) ----

  /** Aggregate pixel statistics over every 8-bit channel sample of a
    * decoded image — the signal a multimodal curation pipeline actually
    * filters on (all-black/all-white frames, low-dynamic-range scans).
    */
  case class PixelStats(format: String, width: Int, height: Int,
      channels: Int, px_mean: Double, px_min: Int, px_max: Int)

  case class PixelFeatures(media_id: Long, format: Option[String],
      width: Option[Int], height: Option[Int], channels: Option[Int],
      px_mean: Option[Double], px_min: Option[Int], px_max: Option[Int])

  private def le32(p: Array[Byte], i: Int): Int =
    (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8) |
      ((p(i + 2) & 0xff) << 16) | ((p(i + 3) & 0xff) << 24)
  private def be32(p: Array[Byte], i: Int): Int =
    ((p(i) & 0xff) << 24) | ((p(i + 1) & 0xff) << 16) |
      ((p(i + 2) & 0xff) << 8) | (p(i + 3) & 0xff)

  /** Full pixel decode: uncompressed BMP (BI_RGB, 8/24/32 bpp, padded
    * strides, bottom-up or top-down) and PNG (8-bit depth, gray / RGB /
    * gray+alpha / RGBA, non-interlaced: IDAT chunks inflated with
    * `java.util.zip.Inflater`, all five scanline filters — None / Sub /
    * Up / Average / Paeth — undone per the PNG spec). Returns None for
    * unrecognized or malformed payloads — curation pipelines must treat
    * undecodable media as data, never as task failures.
    */
  def decodePixels(p: Array[Byte]): Option[PixelStats] =
    decodeRaw(p).map { case (fmt, w, h, ch, px) =>
      var sum = 0L
      var mn = 255
      var mx = 0
      var i = 0
      while (i < px.length) {
        val v = px(i)
        sum += v
        if (v < mn) mn = v
        if (v > mx) mx = v
        i += 1
      }
      PixelStats(fmt, w, h, ch, sum.toDouble / px.length, mn, mx)
    }

  /** Raw decode to a channel-interleaved Array[Int] in IMAGE order
    * (index `(y*w + x)*ch + c`, row 0 = top): BMP's bottom-up storage
    * is un-flipped here, which aggregate stats never see but any
    * spatial operation (resize, perceptual hash) depends on.
    */
  def decodeRaw(p: Array[Byte]): Option[(String, Int, Int, Int, Array[Int])] =
    try decodeImageHeader(p).flatMap {
      case ("bmp", w, h, ch) =>
        decodeBmpRaw(p, w, h, ch).map(px => ("bmp", w, h, ch, px))
      case ("png", w, h, ch) =>
        decodePngRaw(p, w, h, ch).map(px => ("png", w, h, ch, px))
      case _ => None
    } catch { case _: RuntimeException => None }

  private def decodeBmpRaw(p: Array[Byte], w: Int, h: Int,
      ch: Int): Option[Array[Int]] = {
    if (p.length < 34 || le32(p, 30) != 0) return None // BI_RGB only
    val off = le32(p, 10)
    val stride = ((w * ch + 3) / 4) * 4 // rows pad to 4-byte boundaries
    if (off < 0 || off.toLong + stride.toLong * h > p.length) return None
    val px = new Array[Int](w * h * ch)
    var y = 0
    while (y < h) {
      val row = off + y * stride
      // bottom-up storage: stored row y is image row h-1-y
      val outBase = (h - 1 - y) * w * ch
      var i = 0
      val rowBytes = w * ch
      while (i < rowBytes) { // padding bytes excluded
        px(outBase + i) = p(row + i) & 0xff
        i += 1
      }
      y += 1
    }
    Some(px)
  }

  private def decodePngRaw(p: Array[Byte], w: Int, h: Int,
      ch: Int): Option[Array[Int]] = {
    if ((p(24) & 0xff) != 8) return None // 8-bit depth only
    if (p.length > 28 && (p(28) & 0xff) != 0) return None // no Adam7
    // palette images index a PLTE we don't decode
    if ((p(25) & 0xff) == 3) return None
    // concatenate IDAT payloads (zlib stream may span chunks)
    val idat = new java.io.ByteArrayOutputStream()
    var pos = 8
    while (pos + 8 <= p.length) {
      val len = be32(p, pos)
      if (len < 0 || pos + 12L + len > p.length) return None
      if (p(pos + 4) == 'I' && p(pos + 5) == 'D' &&
          p(pos + 6) == 'A' && p(pos + 7) == 'T')
        idat.write(p, pos + 8, len)
      pos += 12 + len // length + type + data + crc
    }
    val comp = idat.toByteArray
    if (comp.isEmpty) return None
    val rowBytes = w * ch
    val raw = new Array[Byte]((rowBytes + 1) * h) // +1 filter byte per row
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(comp)
      var off = 0
      while (!inf.finished() && off < raw.length) {
        val n = inf.inflate(raw, off, raw.length - off)
        if (n == 0 && inf.needsInput()) return None // truncated stream
        off += n
      }
      if (off < raw.length) return None
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inf.end()
    // undo scanline filters; prev/cur hold RECONSTRUCTED byte values
    val cur = new Array[Int](rowBytes)
    val prev = new Array[Int](rowBytes)
    val px = new Array[Int](w * h * ch)
    var y = 0
    while (y < h) {
      val base = y * (rowBytes + 1)
      val ft = raw(base) & 0xff
      if (ft > 4) return None
      var i = 0
      while (i < rowBytes) {
        val x = raw(base + 1 + i) & 0xff
        val a = if (i >= ch) cur(i - ch) else 0 // left (same channel)
        val b = prev(i) // up
        val c = if (i >= ch) prev(i - ch) else 0 // up-left
        val v = ft match {
          case 0 => x
          case 1 => (x + a) & 0xff
          case 2 => (x + b) & 0xff
          case 3 => (x + (a + b) / 2) & 0xff
          case _ => // Paeth
            val pp = a + b - c
            val pa = math.abs(pp - a)
            val pb = math.abs(pp - b)
            val pc = math.abs(pp - c)
            val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
            (x + pred) & 0xff
        }
        cur(i) = v
        px(y * rowBytes + i) = v // PNG rows are already top-down
        i += 1
      }
      System.arraycopy(cur, 0, prev, 0, rowBytes)
      y += 1
    }
    Some(px)
  }

  // ---- spatial tier: resize + perceptual hash over decoded pixels ----

  /** Nearest-neighbor downsample to `ow`×`oh`, summing channels into
    * one luminance-proxy value per output pixel (channel SUM, not
    * mean — stays in exact integers; per-image hashes are scale-
    * invariant to it).
    */
  def resizeNearestLuma(w: Int, h: Int, ch: Int, px: Array[Int],
      ow: Int, oh: Int): Array[Long] = {
    val out = new Array[Long](ow * oh)
    var j = 0
    while (j < oh) {
      val sy = j * h / oh
      var i = 0
      while (i < ow) {
        val sx = i * w / ow
        var s = 0L
        var c = 0
        val base = (sy * w + sx) * ch
        while (c < ch) { s += px(base + c); c += 1 }
        out(j * ow + i) = s
        i += 1
      }
      j += 1
    }
    out
  }

  /** Average-hash (aHash), the classic perceptual image fingerprint:
    * decode → nearest-neighbor 8×8 resize → threshold each cell at the
    * mean. Returned as a 64-char '0'/'1' string in row-major order
    * (portable across engines — no sign games with bit 63). The
    * mean comparison is exact integer math: cell×64 > total.
    * Near-duplicate images (re-encodes, minor edits) collide; the
    * hash is grouping key material for perceptual dedup.
    */
  def aHashBits(p: Array[Byte]): Option[String] =
    decodeRaw(p).map { case (_, w, h, ch, px) =>
      val cells = resizeNearestLuma(w, h, ch, px, 8, 8)
      var total = 0L
      var k = 0
      while (k < 64) { total += cells(k); k += 1 }
      val sb = new java.lang.StringBuilder(64)
      k = 0
      while (k < 64) {
        sb.append(if (cells(k) * 64 > total) '1' else '0')
        k += 1
      }
      sb.toString
    }

  /** Perceptual NEAR-dup candidate join over aHash bit strings with
    * guaranteed recall: the 64-bit hash splits into 4 disjoint 16-bit
    * bands; by pigeonhole any pair within Hamming distance 3 agrees on
    * at least one full band, so the band equi-join's candidate set
    * provably covers every qualifying pair, and the exact Hamming
    * distance then verifies candidates. 16-bit bands (not 8) because
    * the band value space must outgrow the corpus: 8-bit bands have
    * 256 values and floor the candidate count at n²/256 REGARDLESS of
    * hash quality — measured as q140's 2.2M-pair blowup. At billions
    * of images the same saturation eventually reaches 2¹⁶; the levers
    * are longer hashes or two-level banding, the SimHash trade
    * ([[graft.dedup.Dedup.simhashBandPairs]]).
    *
    * Input: (idCol, hashCol) with hashCol a 64-char '0'/'1' string
    * ([[aHashBits]]). Output: (a_id, b_id, dist) with a_id < b_id and
    * dist ≤ maxDist ≤ 3.
    */
  def perceptualNearDupPairs(hashes: org.apache.spark.sql.DataFrame,
      idCol: String = "media_id", hashCol: String = "ahash",
      maxDist: Int = 3): org.apache.spark.sql.DataFrame = {
    require(maxDist >= 0 && maxDist <= 3,
      s"4x16 banding guarantees recall only for dist <= 3, got $maxDist")
    import org.apache.spark.sql.functions._
    val h = hashes.select(col(idCol), col(hashCol))
      .filter(col(hashCol).isNotNull)
    val bands = h.select(col(idCol), col(hashCol),
      explode(sequence(lit(0), lit(3))).as("bi"))
      .withColumn("band", expr(s"substring($hashCol, bi*16 + 1, 16)"))
    bands.select(col(idCol).as("a_id"), col(hashCol).as("a_hash"),
        col("bi"), col("band"))
      .join(bands.select(col(idCol).as("b_id"), col(hashCol).as("b_hash"),
        col("bi"), col("band")), Seq("bi", "band"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), col("a_hash"), col("b_hash"))
      .distinct()
      .withColumn("dist",
        expr("""aggregate(sequence(1, 64), 0L, (acc, i) ->
          acc + IF(substring(a_hash, i, 1) = substring(b_hash, i, 1),
            0L, 1L))"""))
      .filter(col("dist") <= maxDist)
      .select(col("a_id"), col("b_id"), col("dist"))
  }

  /** Full VALID 24-bpp BMP (BI_RGB, bottom-up, padded strides):
    * `f(x, y, c)` supplies channel c ∈ {0=R, 1=G, 2=B} of pixel (x, y),
    * truncated to a byte.
    */
  def syntheticBmpImage(w: Int, h: Int,
      f: (Int, Int, Int) => Int): Array[Byte] = {
    val stride = ((w * 3 + 3) / 4) * 4
    val size = 54 + stride * h
    val out = java.nio.ByteBuffer.allocate(size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte)
    out.putInt(size).putInt(0).putInt(54)
    out.putInt(40).putInt(w).putInt(h)
    out.putShort(1.toShort).putShort(24.toShort)
    out.putInt(0) // BI_RGB
    out.putInt(stride * h)
    out.putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = h - 1 // bottom-up: first stored row = bottom image row
    while (y >= 0) {
      var x = 0
      while (x < w) {
        out.put((f(x, y, 2) & 0xff).toByte) // B
          .put((f(x, y, 1) & 0xff).toByte) // G
          .put((f(x, y, 0) & 0xff).toByte) // R
        x += 1
      }
      var pad = w * 3
      while (pad < stride) { out.put(0.toByte); pad += 1 }
      y -= 1
    }
    out.array()
  }

  /** Full VALID PNG (8-bit, real zlib-deflated IDAT, real CRCs):
    * colorType ∈ {0=gray, 2=RGB, 6=RGBA}; each scanline carries filter
    * `y % 5`, so a decoder must correctly undo None, Sub, Up, Average
    * AND Paeth to reconstruct — any filter defect corrupts the stats.
    */
  def syntheticPngImage(w: Int, h: Int, colorType: Int,
      f: (Int, Int, Int) => Int): Array[Byte] = {
    val ch = colorType match {
      case 0 => 1
      case 2 => 3
      case 6 => 4
      case other => throw new IllegalArgumentException(s"colorType $other")
    }
    val rowBytes = w * ch
    val raw = new Array[Byte]((rowBytes + 1) * h)
    val cur = new Array[Int](rowBytes)
    val prev = new Array[Int](rowBytes)
    var y = 0
    while (y < h) {
      var i = 0
      while (i < rowBytes) { cur(i) = f(i / ch, y, i % ch) & 0xff; i += 1 }
      val ft = y % 5
      val base = y * (rowBytes + 1)
      raw(base) = ft.toByte
      i = 0
      while (i < rowBytes) {
        val a = if (i >= ch) cur(i - ch) else 0
        val b = prev(i)
        val c = if (i >= ch) prev(i - ch) else 0
        val pred = ft match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case _ =>
            val pp = a + b - c
            val pa = math.abs(pp - a)
            val pb = math.abs(pp - b)
            val pc = math.abs(pp - c)
            if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
        }
        raw(base + 1 + i) = ((cur(i) - pred) & 0xff).toByte
        i += 1
      }
      System.arraycopy(cur, 0, prev, 0, rowBytes)
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw)
    deflater.finish()
    val compBuf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!deflater.finished()) compBuf.write(tmp, 0, deflater.deflate(tmp))
    deflater.end()
    val comp = compBuf.toByteArray
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(12 + data.length)
      out.putInt(data.length)
      out.put(typ.getBytes("US-ASCII"))
      out.put(data)
      val crc = new java.util.zip.CRC32()
      crc.update(typ.getBytes("US-ASCII"))
      crc.update(data)
      out.putInt(crc.getValue.toInt)
      out.array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h)
      .put(8.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte)
      .array()
    val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    sig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", comp) ++
      chunk("IEND", Array.empty[Byte])
  }

  /** Batched pixel-tier extraction: same mapPartitions shape as
    * [[extractFeatures]] (per-task decoder state), undecodable payloads
    * flow through as null stats.
    */
  def extractPixelStats(media: Dataset[MediaRow]): Dataset[PixelFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        decodePixels(r.payload) match {
          case Some(s) => PixelFeatures(r.media_id, Some(s.format),
            Some(s.width), Some(s.height), Some(s.channels),
            Some(s.px_mean), Some(s.px_min), Some(s.px_max))
          case None => PixelFeatures(r.media_id, None, None, None, None,
            None, None, None)
        }
      }
    }
  }
}
