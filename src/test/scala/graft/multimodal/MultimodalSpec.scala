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

  test("pixel decode matches ImageIO on gradient images across " +
    "formats, color types and non-aligned strides") {
    // javax.imageio is the independent referee: a full third-party codec
    // stack that knows nothing of our decoder. Aggregate stats must
    // agree byte-exactly for every (format, colorType, w, h) tried —
    // widths chosen so BMP strides need 0-3 pad bytes.
    def imageIoStats(bytes: Array[Byte]): (Long, Int, Int, Long) = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      val raster = img.getRaster
      var sum = 0L
      var mn = 255
      var mx = 0
      var n = 0L
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth;
           b <- 0 until raster.getNumBands) {
        val v = raster.getSample(x, y, b)
        sum += v
        if (v < mn) mn = v
        if (v > mx) mx = v
        n += 1
      }
      (sum, mn, mx, n)
    }
    def grad(seed: Int)(x: Int, y: Int, c: Int): Int =
      (seed + x * 3 + y * 5 + c * 11) % 256
    val cases = Seq(
      ("bmp-pad1", Multimodal.syntheticBmpImage(5, 7, grad(1))),
      ("bmp-pad2", Multimodal.syntheticBmpImage(6, 4, grad(2))),
      ("bmp-pad3", Multimodal.syntheticBmpImage(7, 3, grad(3))),
      ("bmp-pad0", Multimodal.syntheticBmpImage(8, 9, grad(4))),
      ("png-gray", Multimodal.syntheticPngImage(11, 13, 0, grad(5))),
      ("png-rgb", Multimodal.syntheticPngImage(9, 17, 2, grad(6))),
      ("png-rgba", Multimodal.syntheticPngImage(13, 6, 6, grad(7))),
      // tall/thin shapes exercise the per-row filter cycle incl. Paeth
      ("png-tall", Multimodal.syntheticPngImage(2, 23, 2, grad(8))),
      ("png-wide", Multimodal.syntheticPngImage(31, 2, 0, grad(9))))
    cases.foreach { case (label, bytes) =>
      val got = Multimodal.decodePixels(bytes)
      assert(got.isDefined, label)
      val s = got.get
      val (refSum, refMn, refMx, refN) = imageIoStats(bytes)
      assert(refN == s.width.toLong * s.height * s.channels, label)
      assert(s.px_mean == refSum.toDouble / refN, label)
      assert(s.px_min == refMn, label)
      assert(s.px_max == refMx, label)
    }
  }

  test("pixel decode refuses malformed payloads as None, never throws") {
    val png = Multimodal.syntheticPngImage(9, 9, 2, (x, y, c) => x + y + c)
    assert(Multimodal.decodePixels(png).isDefined)
    // truncated mid-IDAT: inflate cannot complete
    assert(Multimodal.decodePixels(png.take(png.length - 20)).isEmpty)
    // header-only fixtures carry no pixel data
    assert(Multimodal.decodePixels(Multimodal.syntheticPng(4, 4, 2)).isEmpty)
    // text bytes are not an image
    assert(Multimodal.decodePixels("not an image".getBytes("UTF-8")).isEmpty)
    // compressed BMP (BI_RLE8) is out of scope → None, not garbage stats
    val bmp = Multimodal.syntheticBmpImage(4, 4, (_, _, _) => 7)
    java.nio.ByteBuffer.wrap(bmp).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(30, 1)
    assert(Multimodal.decodePixels(bmp).isEmpty)
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
