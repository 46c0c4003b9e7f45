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
  * and feature columns flowing back into relational plans. The byte →
  * pixels/samples step itself is STUBBED with a deterministic fake
  * (`decodeStub`): this container has no image/audio codecs, so the stub
  * derives features from the raw bytes (length, first byte, rolling
  * hash) — swap `decodeStub` for a real codec call and nothing else
  * changes.
  *
  * Scale notes: payload bytes never shuffle — feature extraction is a
  * narrow map; only (id, features) continue into joins/aggregations.
  * Partition sizing should target payload bytes per task
  * (`spark.sql.files.maxPartitionBytes`), not row counts.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
      first_byte: Int, checksum: Long)

  /** Wrap any table with a binary payload column + metadata (here: text
    * bytes stand in for media payloads).
    */
  def asMediaFrame(df: DataFrame, idCol: String, payloadCol: String,
      kind: String): DataFrame =
    df.select(col(idCol).as("media_id"), lit(kind).as("kind"),
      encode(col(payloadCol), "UTF-8").as("payload"))

  /** STUB decoder: deterministic fake standing in for a real media
    * decode (???-grade: replace with codec bindings in production).
    * Rolling hash mirrors TextFunctions.fingerprint over bytes.
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

  /** Batched per-partition feature extraction — the decoder
    * initialization (imagine codec contexts, model weights) happens once
    * per partition, rows stream through it.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder init would go here
      rows.map { r =>
        val (first, checksum) = decodeStub(r.payload)
        MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, first, checksum)
      }
    }
  }
}
