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
    } else None
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
}
