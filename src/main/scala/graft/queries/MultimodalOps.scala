package graft.queries

import org.apache.spark.sql.functions._

import Common._
import graft.multimodal.Multimodal
import graft.ops.Hashing

/** Multimodal-column query surface: the binary → mapPartitions-decode →
  * features pipeline. Two decode tiers (see graft.multimodal
  * .Multimodal): container headers are parsed FOR REAL (PNG IHDR / BMP
  * DIB → width/height/channels, q110 proves byte-exact recovery);
  * the pixel tier beyond the header is deterministic-fake until codec
  * bindings exist. q39 runs text bytes through the same pipeline —
  * non-image payloads must yield null dims, never a crash (the oracle
  * checks the nulls).
  */
object MultimodalOps {

  val qs: Seq[Q] = Seq(
    Q("q39_multimodal_features",
      "binary payload column + batched mapPartitions feature extraction" +
        " (non-image payloads → null container dims)",
      Some(s"""SELECT doc_id AS media_id, 'text' AS kind,
          CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
          CASE WHEN length(text) > 0 THEN ascii(substr(text, 1, 1))
               ELSE -1 END AS first_byte,
          list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform(range(1, length(text)+1),
              i -> CAST(ascii(substr(text, CAST(i AS INT), 1)) AS BIGINT))),
            (a, b) -> (a*31 + b) % ${Hashing.P}) AS checksum,
          CAST(NULL AS VARCHAR) AS format, CAST(NULL AS INT) AS width,
          CAST(NULL AS INT) AS height, CAST(NULL AS INT) AS channels
        FROM documents ORDER BY media_id"""),
      (s, d) => {
        import s.implicits._
        val media = Multimodal.asMediaFrame(
          table(s, d, "documents"), "doc_id", "text", "text")
          .as[Multimodal.MediaRow]
        Multimodal.extractFeatures(media).toDF().orderBy("media_id")
      }),

    Q("q110_image_headers",
      "real container-header decode: per-doc synthesized PNG/BMP " +
        "payloads flow through the binary pipeline and the decoder must " +
        "recover format/width/height/channels byte-exactly (the oracle " +
        "knows the synthesis formula, so any parse defect hash-fails)",
      Some("""SELECT doc_id AS media_id,
          CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'png' END AS format,
          CAST(doc_id % 64 + 1 AS INT) AS width,
          CAST(doc_id % 48 + 1 AS INT) AS height,
          CAST(CASE WHEN doc_id % 2 = 0 THEN 3
                    WHEN doc_id % 4 = 1 THEN 4 ELSE 1 END AS INT) AS channels
        FROM documents ORDER BY media_id"""),
      (s, d) => {
        import s.implicits._
        // Payload synthesis happens executor-side inside the typed map —
        // the driver never holds payload bytes, mirroring how real media
        // arrive already distributed. Even docs become 24-bit BMPs, odd
        // docs PNGs alternating RGBA / grayscale color types.
        val media = table(s, d, "documents").select(col("doc_id")).as[Long]
          .map { id =>
            val w = (id % 64 + 1).toInt
            val h = (id % 48 + 1).toInt
            if (id % 2 == 0)
              Multimodal.MediaRow(id, "bmp", Multimodal.syntheticBmp(w, h, 24))
            else {
              val colorType = if (id % 4 == 1) 6 else 0
              Multimodal.MediaRow(id, "png", Multimodal.syntheticPng(w, h, colorType))
            }
          }
        Multimodal.extractFeatures(media)
          .select(col("media_id"), col("format"), col("width"),
            col("height"), col("channels"))
          .orderBy("media_id")
      })
  )
}
