package graft.queries

import org.apache.spark.sql.functions._

import Common._
import graft.multimodal.Multimodal
import graft.ops.Hashing

/** Multimodal-column query surface: documents' text bytes stand in for
  * media payloads; the full binary → mapPartitions-decode → features
  * pipeline runs for real, with the byte-level decode stubbed
  * deterministically (see graft.multimodal.Multimodal). The oracle
  * recomputes the stub's features from the text (ASCII corpus ⇒ byte
  * fold == char fold).
  */
object MultimodalOps {

  val qs: Seq[Q] = Seq(
    Q("q39_multimodal_features",
      "binary payload column + batched mapPartitions feature extraction",
      Some(s"""SELECT doc_id AS media_id, 'text' AS kind,
          CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
          CASE WHEN length(text) > 0 THEN ascii(substr(text, 1, 1))
               ELSE -1 END AS first_byte,
          list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform(range(1, length(text)+1),
              i -> CAST(ascii(substr(text, CAST(i AS INT), 1)) AS BIGINT))),
            (a, b) -> (a*31 + b) % ${Hashing.P}) AS checksum
        FROM documents ORDER BY media_id"""),
      (s, d) => {
        import s.implicits._
        val media = Multimodal.asMediaFrame(
          table(s, d, "documents"), "doc_id", "text", "text")
          .as[Multimodal.MediaRow]
        Multimodal.extractFeatures(media).toDF().orderBy("media_id")
      })
  )
}
