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

  test("PNG/BMP header decode recovers dims; junk bytes decode to None") {
    assert(Multimodal.decodeImageHeader(Multimodal.syntheticPng(640, 480, 6))
      .contains(("png", 640, 480, 4)))
    assert(Multimodal.decodeImageHeader(Multimodal.syntheticPng(1, 99999, 0))
      .contains(("png", 1, 99999, 1)))
    assert(Multimodal.decodeImageHeader(Multimodal.syntheticPng(8, 8, 2))
      .contains(("png", 8, 8, 3)))
    assert(Multimodal.decodeImageHeader(Multimodal.syntheticBmp(1920, 1080, 24))
      .contains(("bmp", 1920, 1080, 3)))
    assert(Multimodal.decodeImageHeader(Multimodal.syntheticBmp(2, 3, 32))
      .contains(("bmp", 2, 3, 4)))
    // top-down BMP stores negative height; decoder must return |h|
    val topDown = Multimodal.syntheticBmp(10, 10, 24)
    val buf = java.nio.ByteBuffer.wrap(topDown)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(22, -10)
    assert(Multimodal.decodeImageHeader(topDown).contains(("bmp", 10, 10, 3)))
    // non-images: text, truncated PNG sig, empty
    assert(Multimodal.decodeImageHeader("hello world".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodeImageHeader(
      Multimodal.syntheticPng(4, 4, 6).take(20)).isEmpty)
    assert(Multimodal.decodeImageHeader(Array.empty[Byte]).isEmpty)
    // unknown PNG color type is rejected, not mis-channeled
    assert(Multimodal.decodeImageHeader(Multimodal.syntheticPng(4, 4, 5)).isEmpty)
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
