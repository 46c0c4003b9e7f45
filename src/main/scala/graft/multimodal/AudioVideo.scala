package graft.multimodal

import org.apache.spark.sql.Dataset

/** Audio/video tiers of the multimodal column family — same design as
  * the image tier in [[Multimodal]]: media are opaque `binary` columns,
  * decode is a REAL pure-JVM container parse (no codec bindings needed
  * for these formats), feature extraction is a batched `mapPartitions`
  * narrow map, and only (id, features) rows continue into relational
  * plans — payload bytes never shuffle.
  *
  * Formats chosen because they are fully decodable with the JDK alone:
  *   - WAV/RIFF PCM (the canonical uncompressed audio container;
  *     `qb`-style ETL references none, this is a north-star curation
  *     extension like the q125 pixel tier)
  *   - YUV4MPEG2 (.y4m — ffmpeg's uncompressed video interchange
  *     format: a plain-text header + raw YCbCr frame planes), which
  *     makes frame-sampling — the core video-curation primitive —
  *     implementable byte-exactly.
  *
  * Scale notes: both decoders are single-pass, allocation-light, and
  * per-row independent; partition sizing should target payload bytes
  * (`spark.sql.files.maxPartitionBytes`), not row counts. Frame
  * sampling yields one OUTPUT row per sampled frame — the explode
  * happens after decode, so only small stat rows shuffle.
  */
object AudioVideo {

  // ------------------------------ WAV ------------------------------

  /** Aggregate sample statistics over every channel sample of a PCM
    * stream: the signals an audio-curation pipeline gates on (silence
    * → near-zero spread, clipping → peaks at the rail, duration
    * filters). Sample values are the raw PCM integers: unsigned 0..255
    * for 8-bit, signed -32768..32767 for 16-bit.
    */
  case class WavStats(channels: Int, sample_rate: Int, n_frames: Long,
      duration_ms: Double, sample_mean: Double, sample_min: Int,
      sample_max: Int)

  private def le32(p: Array[Byte], i: Int): Int =
    (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8) |
      ((p(i + 2) & 0xff) << 16) | ((p(i + 3) & 0xff) << 24)
  private def le16(p: Array[Byte], i: Int): Int =
    (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)

  /** Pure-JVM RIFF/WAVE parse: walks the chunk list (word-aligned, as
    * the RIFF spec requires), reads `fmt ` (PCM format 1 only, 8- or
    * 16-bit) and `data`, and computes one-pass sample statistics.
    * Returns None for non-WAV, compressed, or malformed payloads —
    * undecodable media are data, never task failures.
    */
  def decodeWav(p: Array[Byte]): Option[WavStats] = {
    try {
      if (p.length < 44 || p(0) != 'R' || p(1) != 'I' || p(2) != 'F' ||
        p(3) != 'F' || p(8) != 'W' || p(9) != 'A' || p(10) != 'V' ||
        p(11) != 'E') return None
      var channels = 0
      var rate = 0
      var bits = 0
      var blockAlign = 0
      var fmtSeen = false
      var dataOff = -1
      var dataLen = 0
      var pos = 12
      while (pos + 8 <= p.length) {
        val id = new String(p, pos, 4, "US-ASCII")
        val len = le32(p, pos + 4)
        if (len < 0 || pos + 8L + len > p.length) return None
        if (id == "fmt " && len >= 16) {
          if (le16(p, pos + 8) != 1) return None // PCM only
          channels = le16(p, pos + 10)
          rate = le32(p, pos + 12)
          blockAlign = le16(p, pos + 20)
          bits = le16(p, pos + 22)
          fmtSeen = true
        } else if (id == "data") {
          dataOff = pos + 8
          dataLen = len
        }
        pos += 8 + len + (len & 1) // odd-sized chunks carry a pad byte
      }
      if (!fmtSeen || dataOff < 0 || channels <= 0 || rate <= 0) return None
      if (bits != 8 && bits != 16) return None
      if (blockAlign != channels * (bits / 8)) return None
      val nFrames = dataLen.toLong / blockAlign
      val nSamples = nFrames * channels
      if (nSamples == 0) return None
      var sum = 0L
      var mn = Int.MaxValue
      var mx = Int.MinValue
      var i = 0
      val end = (nSamples * (bits / 8)).toInt
      while (i < end) {
        val v =
          if (bits == 8) p(dataOff + i) & 0xff
          else {
            val lo = p(dataOff + i) & 0xff
            val hi = p(dataOff + i + 1).toInt // sign-extends
            (hi << 8) | lo
          }
        sum += v
        if (v < mn) mn = v
        if (v > mx) mx = v
        i += bits / 8
      }
      Some(WavStats(channels, rate, nFrames,
        nFrames * 1000.0 / rate, sum.toDouble / nSamples, mn, mx))
    } catch { case _: IndexOutOfBoundsException => None }
  }

  /** Full VALID PCM WAV: `f(frame, channel)` supplies each sample —
    * masked to 0..255 for bits=8, wrapped to signed 16-bit for bits=16.
    */
  def syntheticWav(nFrames: Int, channels: Int, rate: Int, bits: Int,
      f: (Int, Int) => Int): Array[Byte] = {
    require(bits == 8 || bits == 16, s"bits=$bits")
    val bytesPer = bits / 8
    val dataLen = nFrames * channels * bytesPer
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort).putShort(channels.toShort)
      .putInt(rate).putInt(rate * channels * bytesPer)
      .putShort((channels * bytesPer).toShort).putShort(bits.toShort)
    out.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var t = 0
    while (t < nFrames) {
      var c = 0
      while (c < channels) {
        val v = f(t, c)
        if (bits == 8) out.put((v & 0xff).toByte)
        else out.putShort((((v + 32768) & 0xffff) - 32768).toShort)
        c += 1
      }
      t += 1
    }
    out.array()
  }

  // ------------------------------ Y4M ------------------------------

  /** Container-level metadata plus per-SAMPLED-frame luma statistics.
    * Chroma planes are parsed (their sizes must be exact for frame
    * alignment) but not aggregated — luma is what brightness/black-
    * frame gates use.
    */
  case class FrameLuma(frame_idx: Int, y_mean: Double, y_min: Int,
      y_max: Int)
  case class Y4mSample(width: Int, height: Int, n_frames: Int,
      frames: Seq[FrameLuma])

  /** Pure-JVM YUV4MPEG2 parse with every-Nth frame sampling: reads the
    * `YUV4MPEG2 W.. H.. F..` header line, derives plane sizes from the
    * colourspace tag (C420 family = Y + quarter-size Cb/Cr, C444 =
    * three full planes, Cmono = luma only), then walks `FRAME` records
    * computing luma stats for frames where `idx % stride == 0`. The
    * chroma sizes matter even though only luma is aggregated: a
    * mis-sized plane misaligns every subsequent frame, so the stats
    * oracle doubles as a frame-alignment proof. Returns None for
    * malformed containers.
    */
  def sampleY4mFrames(p: Array[Byte], stride: Int): Option[Y4mSample] = {
    try {
      val magic = "YUV4MPEG2"
      if (p.length < magic.length + 1) return None
      if (new String(p, 0, magic.length, "US-ASCII") != magic) return None
      var eol = magic.length
      while (eol < p.length && p(eol) != 0x0a) eol += 1
      if (eol >= p.length) return None
      val params = new String(p, magic.length, eol - magic.length,
        "US-ASCII").trim.split("\\s+").filter(_.nonEmpty)
      var w = -1
      var h = -1
      var cspace = "C420" // the spec default when no C tag is present
      params.foreach { t =>
        if (t.startsWith("W")) w = t.drop(1).toInt
        else if (t.startsWith("H")) h = t.drop(1).toInt
        else if (t.startsWith("C")) cspace = t
      }
      if (w <= 0 || h <= 0) return None
      val ySize = w * h
      val chromaSize = cspace match {
        case s if s.startsWith("C420") =>
          if (w % 2 != 0 || h % 2 != 0) return None
          2 * ((w / 2) * (h / 2))
        case "C444" => 2 * ySize
        case "Cmono" => 0
        case _ => return None // C422 etc. out of scope — refuse, not garble
      }
      val frames = Seq.newBuilder[FrameLuma]
      var idx = 0
      var pos = eol + 1
      while (pos < p.length) {
        if (pos + 5 > p.length ||
          new String(p, pos, 5, "US-ASCII") != "FRAME") return None
        var fEol = pos + 5
        while (fEol < p.length && p(fEol) != 0x0a) fEol += 1
        if (fEol >= p.length) return None
        val dataStart = fEol + 1
        if (dataStart + ySize + chromaSize > p.length) return None
        if (idx % stride == 0) {
          var sum = 0L
          var mn = 255
          var mx = 0
          var i = 0
          while (i < ySize) {
            val v = p(dataStart + i) & 0xff
            sum += v
            if (v < mn) mn = v
            if (v > mx) mx = v
            i += 1
          }
          frames += FrameLuma(idx, sum.toDouble / ySize, mn, mx)
        }
        pos = dataStart + ySize + chromaSize
        idx += 1
      }
      if (idx == 0) return None
      Some(Y4mSample(w, h, idx, frames.result()))
    } catch { case _: NumberFormatException => None }
  }

  /** Full VALID YUV4MPEG2 stream (C420 chroma planes filled with a
    * derived formula so alignment bugs cannot cancel out):
    * `luma(x, y, t)` supplies Y' of pixel (x, y) in frame t.
    */
  def syntheticY4m(w: Int, h: Int, nFrames: Int,
      luma: (Int, Int, Int) => Int): Array[Byte] = {
    require(w % 2 == 0 && h % 2 == 0, s"C420 needs even dims: ${w}x$h")
    val header = s"YUV4MPEG2 W$w H$h F30:1 Ip A1:1 C420mpeg2\n"
      .getBytes("US-ASCII")
    val ySize = w * h
    val cSize = (w / 2) * (h / 2)
    val frameLen = 6 + ySize + 2 * cSize // "FRAME\n" + planes
    val out = java.nio.ByteBuffer.allocate(header.length + nFrames * frameLen)
    out.put(header)
    var t = 0
    while (t < nFrames) {
      out.put("FRAME\n".getBytes("US-ASCII"))
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { out.put((luma(x, y, t) & 0xff).toByte); x += 1 }
        y += 1
      }
      var i = 0 // chroma: deterministic non-constant filler
      while (i < 2 * cSize) { out.put(((i * 7 + t) & 0xff).toByte); i += 1 }
      t += 1
    }
    out.array()
  }

  // --------------------- batched extraction ---------------------

  case class AudioFeatures(media_id: Long, channels: Option[Int],
      sample_rate: Option[Int], n_frames: Option[Long],
      duration_ms: Option[Double], sample_mean: Option[Double],
      sample_min: Option[Int], sample_max: Option[Int])

  /** One row per media payload; undecodable audio flows through as
    * nulls. Same mapPartitions shape as the image tiers (per-task
    * decoder state).
    */
  def extractAudioStats(
      media: Dataset[Multimodal.MediaRow]): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        decodeWav(r.payload) match {
          case Some(s) => AudioFeatures(r.media_id, Some(s.channels),
            Some(s.sample_rate), Some(s.n_frames), Some(s.duration_ms),
            Some(s.sample_mean), Some(s.sample_min), Some(s.sample_max))
          case None => AudioFeatures(r.media_id, None, None, None, None,
            None, None, None)
        }
      }
    }
  }

  case class FrameFeatures(media_id: Long, width: Int, height: Int,
      n_frames: Int, frame_idx: Int, y_mean: Double, y_min: Int,
      y_max: Int)

  /** One row per SAMPLED frame (every `stride`-th); undecodable videos
    * yield zero rows — the per-container verdict, if needed, is a
    * left join away. The flatMap happens post-decode, so only compact
    * stat rows ever shuffle, never frame bytes.
    */
  def extractFrameStats(media: Dataset[Multimodal.MediaRow],
      stride: Int): Dataset[FrameFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        sampleY4mFrames(r.payload, stride).toSeq.flatMap { s =>
          s.frames.map(fr => FrameFeatures(r.media_id, s.width, s.height,
            s.n_frames, fr.frame_idx, fr.y_mean, fr.y_min, fr.y_max))
        }
      }
    }
  }
}
