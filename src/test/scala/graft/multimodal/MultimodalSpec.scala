package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("binary payload plumbing + batched stub decode") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val media = Multimodal.asMediaFrame(docs, "doc_id", "text", "text")
    assert(media.schema("payload").dataType.typeName == "binary")

    val feats = Multimodal.extractFeatures(media.as[Multimodal.MediaRow])
    val joined = feats.toDF().join(docs, col("media_id") === col("doc_id"))
    // ASCII corpus: byte length == char count
    assert(joined.filter(col("n_bytes") =!= col("n_chars")).count() == 0)
    assert(feats.count() == docs.count())
  }

  test("stub decode is deterministic and byte-sensitive") {
    val (f1, c1) = Multimodal.decodeStub("hello".getBytes("UTF-8"))
    val (f2, c2) = Multimodal.decodeStub("hello".getBytes("UTF-8"))
    val (_, c3) = Multimodal.decodeStub("hellp".getBytes("UTF-8"))
    assert((f1, c1) == (f2, c2))
    assert(f1 == 'h'.toInt)
    assert(c1 != c3)
    assert(Multimodal.decodeStub(Array.empty[Byte]) == ((-1, 0L)))
  }
}
