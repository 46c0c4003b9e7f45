package graft.queries

import org.apache.spark.sql.functions._

import Common._

/** Round-7 streaming addition (SURVEY §2.7 T91): watermark-scoped
  * streaming deduplication via Spark's `dropDuplicatesWithinWatermark`
  * — the operator a streaming ingest uses when exact-once dedup state
  * cannot grow forever. Deterministic by construction here: the OUTPUT
  * is the distinct digest set (order- and arrival-free), so the
  * streaming result equals the batch DISTINCT oracle exactly.
  */
object Streaming2 {

  val qs: Seq[Q] = Seq(
    Q("q179_stream_dedup_watermark",
      "streaming content dedup with BOUNDED state: documents replayed " +
        "as a stream, digests deduplicated via " +
        "dropDuplicatesWithinWatermark (state evicts past the " +
        "watermark — the 100 TB ingest answer where plain " +
        "dropDuplicates' state grows with the corpus), drained " +
        "exactly-once to parquet. Emission is the distinct digest SET " +
        "per source (arrival-order-free), so the driver's batch " +
        "DISTINCT oracle hash-matches the streaming result",
      Some("""SELECT source, md5(text) AS dg FROM documents
        GROUP BY source, md5(text) ORDER BY source, dg"""),
      (s, d) => {
        // replay the static table as a file stream (the q88/q102
        // harness pattern); a far-future watermark keeps every row
        // inside the dedup window for this bounded replay while the
        // OPERATOR is the state-evicting production form
        val schema = table(s, d, "documents").schema
        val scratch = Common.scratchDir("stream_wmdedup", d)
        // the file source streams a DIRECTORY; pathGlobFilter narrows
        // it to the documents table (the q88/q102 harness pattern)
        val stream = s.readStream.schema(schema)
          .option("pathGlobFilter", "documents.parquet").parquet(d)
          .select(col("source"), md5(encode(col("text"), "UTF-8")).as("dg"),
            // synthetic event time: digest-derived, stable across runs
            timestamp_seconds(lit(1700000000L)).as("ts"))
          .withWatermark("ts", "1 hour")
          .dropDuplicatesWithinWatermark("source", "dg")
        val query = stream.writeStream
          .format("parquet")
          .option("path", s"$scratch/data")
          .option("checkpointLocation", s"$scratch/chk")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        query.awaitTermination()
        s.read.parquet(s"$scratch/data")
          .select("source", "dg").orderBy("source", "dg")
      })
  )
}
