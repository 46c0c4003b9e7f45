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
      }),

    Q("q125_pixel_stats",
      "REAL pixel-tier decode: per-doc synthesized 24-bpp BMPs (padded " +
        "strides, bottom-up rows) and PNGs (8-bit gray/RGB, genuine " +
        "zlib-deflated IDAT, scanline filters 0-4 cycling per row) flow " +
        "through the batched decoder; aggregate channel stats must " +
        "match the closed-form synthesis formula — any defect in " +
        "stride padding, inflate handling or filter reconstruction " +
        "hash-fails",
      Some("""WITH g AS (
          SELECT doc_id,
            CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'png' END AS format,
            CAST(doc_id % 16 + 4 AS INT) AS width,
            CAST(doc_id % 12 + 4 AS INT) AS height,
            CAST(CASE WHEN doc_id % 4 = 3 THEN 1 ELSE 3 END AS INT) AS channels
          FROM documents),
        px AS (
          SELECT g.doc_id, g.format, g.width, g.height, g.channels,
            (g.doc_id * 7 + x.x * 3 + y.y * 5 + c.c * 11) % 256 AS v
          FROM g, range(0, 20) x(x), range(0, 16) y(y), range(0, 3) c(c)
          WHERE x.x < g.width AND y.y < g.height AND c.c < g.channels)
        SELECT doc_id AS media_id, format, width, height, channels,
          CAST(SUM(v) AS DOUBLE) / COUNT(*) AS px_mean,
          CAST(MIN(v) AS INT) AS px_min, CAST(MAX(v) AS INT) AS px_max
        FROM px
        GROUP BY doc_id, format, width, height, channels
        ORDER BY media_id"""),
      (s, d) => {
        import s.implicits._
        // Synthesis is executor-side (payloads never touch the driver);
        // the deterministic per-pixel formula gives the oracle a
        // closed-form twin of the decoded statistics.
        val media = table(s, d, "documents").select(col("doc_id")).as[Long]
          .map { id =>
            val w = (id % 16 + 4).toInt
            val h = (id % 12 + 4).toInt
            def f(x: Int, y: Int, c: Int): Int =
              ((id * 7 + x * 3 + y * 5 + c * 11) % 256).toInt
            if (id % 2 == 0)
              Multimodal.MediaRow(id, "bmp",
                Multimodal.syntheticBmpImage(w, h, f))
            else {
              val colorType = if (id % 4 == 1) 2 else 0
              Multimodal.MediaRow(id, "png",
                Multimodal.syntheticPngImage(w, h, colorType, f))
            }
          }
        Multimodal.extractPixelStats(media).toDF()
          .select(col("media_id"), col("format"), col("width"),
            col("height"), col("channels"), col("px_mean"),
            col("px_min"), col("px_max"))
          .orderBy("media_id")
      })
  )
}
