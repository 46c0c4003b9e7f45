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

  test("JPEG header decode walks the marker chain; a REAL " +
      "ImageIO-written JPEG parses with the same scanner") {
    // synthetic: padding segments (APP0 + COM + DQT) before SOF0
    assert(Multimodal.decodeImageHeader(Multimodal.syntheticJpeg(320, 240, 3))
      .contains(("jpeg", 320, 240, 3)))
    assert(Multimodal.decodeImageHeader(Multimodal.syntheticJpeg(1, 65535, 1))
      .contains(("jpeg", 1, 65535, 1)))
    // the strong referee: a genuine JPEG stream produced by the JDK's
    // libjpeg-class writer (full DQT/DHT/SOS/entropy data) — the
    // marker walk must skip everything it has never seen and still
    // land on SOF
    val img = new java.awt.image.BufferedImage(37, 23,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 37; y <- 0 until 23)
      img.setRGB(x, y, (x * 7 + y * 13) & 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val real = bos.toByteArray
    assert(Multimodal.decodeImageHeader(real).contains(("jpeg", 37, 23, 3)),
      Multimodal.decodeImageHeader(real).toString)
    // truncation before any SOF → None, never a crash
    assert(Multimodal.decodeImageHeader(real.take(6)).isEmpty)
    assert(Multimodal.decodeImageHeader(
      Array(0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xd9.toByte)).isEmpty)
  }

  test("EXIF orientation decode honors BOTH TIFF byte orders and " +
      "rejects malformed IFDs as None") {
    for (le <- Seq(true, false); ori <- 1 to 8)
      assert(Multimodal.decodeExifOrientation(
        Multimodal.syntheticExifJpeg(10, 10, 3, ori, le)).contains(ori),
        s"le=$le ori=$ori")
    // a plain JFIF jpeg has no APP1 → None
    assert(Multimodal.decodeExifOrientation(
      Multimodal.syntheticJpeg(10, 10, 3)).isEmpty)
    // out-of-range orientation value rejected
    assert(Multimodal.decodeExifOrientation(
      Multimodal.syntheticExifJpeg(10, 10, 3, 9, true)).isEmpty)
    // corrupt byte-order mark rejected
    val bad = Multimodal.syntheticExifJpeg(10, 10, 3, 5, true)
    val exifAt = {
      var i = 2
      while (!((bad(i) & 0xff) == 0xff && (bad(i + 1) & 0xff) == 0xe1))
        i += 2 + (((bad(i + 2) & 0xff) << 8) | (bad(i + 3) & 0xff))
      i
    }
    bad(exifAt + 10) = 'X'.toByte
    assert(Multimodal.decodeExifOrientation(bad).isEmpty)
    // the q191 dims walk still skips the APP1 segment cleanly
    assert(Multimodal.decodeImageHeader(
      Multimodal.syntheticExifJpeg(33, 44, 3, 6, false))
      .contains(("jpeg", 33, 44, 3)))
  }

  test("corrupted-input sweep: every truncation of every synthetic " +
      "and real JPEG decodes to a value or None, never a throw") {
    // VERDICT-r8 item 5: at 100 TB corrupt bytes are a certainty and
    // one thrown exception kills a 10-hour stage. Sweep EVERY prefix
    // length (stronger than marker boundaries — length fields get cut
    // mid-value too) of every JPEG fixture family through both
    // decoders; any exception fails loudly with the offending offset.
    val streams: Seq[(String, Array[Byte])] = {
      val img = new java.awt.image.BufferedImage(9, 7,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 9; y <- 0 until 7) img.setRGB(x, y, x * 31 + y)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      Seq(
        "plain" -> Multimodal.syntheticJpeg(320, 240, 3),
        "exif-le" -> Multimodal.syntheticExifJpeg(10, 10, 3, 6, true),
        "exif-be" -> Multimodal.syntheticExifJpeg(10, 10, 3, 6, false),
        "real" -> bos.toByteArray)
    }
    for ((label, full) <- streams; cut <- 0 to full.length) {
      val p = full.take(cut)
      try {
        Multimodal.decodeImageHeader(p)
        Multimodal.decodeExifOrientation(p)
      } catch {
        case e: Throwable =>
          fail(s"$label truncated at $cut/${full.length} threw: $e")
      }
    }
    // segment-length corruption: every length field rewritten to point
    // past the payload (the specific malformation VERDICT-r8 called
    // untested) — walk the real marker chain and blow up each length
    for ((label, full) <- streams) {
      var i = 2
      while (i + 3 < full.length && (full(i) & 0xff) == 0xff) {
        val m = full(i + 1) & 0xff
        val standalone = m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)
        if (!standalone && m != 0xd9 && m != 0xda) {
          val bad = full.clone()
          bad(i + 2) = 0xff.toByte; bad(i + 3) = 0xff.toByte
          try {
            Multimodal.decodeImageHeader(bad)
            Multimodal.decodeExifOrientation(bad)
          } catch {
            case e: Throwable =>
              fail(s"$label with length@$i -> 0xffff threw: $e")
          }
          i += 2 + (((full(i + 2) & 0xff) << 8) | (full(i + 3) & 0xff))
        } else if (standalone) i += 2
        else i = full.length
      }
    }
    // IFD0-offset corruption: an unsigned offset near 2^32 wraps a
    // naive .toInt negative and indexes p(negative) — the round-9 fix
    // range-checks the raw long (regression guard for that crash)
    for (le <- Seq(true, false)) {
      val bad = Multimodal.syntheticExifJpeg(10, 10, 3, 6, le)
      // TIFF header starts right after SOI+APP1 marker+len+"Exif\0\0"
      val t = 2 + 2 + 2 + 6
      for (v <- Seq(0xfffffff0L, 0x80000000L, 0L, 3L)) {
        val c = bad.clone()
        for (k <- 0 until 4) {
          val byte = ((v >> (8 * k)) & 0xff).toByte
          if (le) c(t + 4 + k) = byte else c(t + 7 - k) = byte
        }
        assert(Multimodal.decodeExifOrientation(c).isEmpty,
          s"le=$le ifd0=$v must be rejected")
      }
    }
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

  test("aHash is format-invariant: BMP (bottom-up BGR) and PNG " +
    "(top-down RGB) of the SAME image hash identically, and the " +
    "decoded raster matches ImageIO spatially") {
    // a vertically-asymmetric gradient: any orientation defect (missing
    // BMP un-flip) flips the hash, any channel-order defect changes the
    // per-pixel sum
    def f(x: Int, y: Int, c: Int): Int = (x * 2 + y * 29 + c * 7) % 256
    val bmp = Multimodal.syntheticBmpImage(33, 21, f)
    val png = Multimodal.syntheticPngImage(33, 21, 2, f)
    val hb = Multimodal.aHashBits(bmp).get
    val hp = Multimodal.aHashBits(png).get
    assert(hb.length == 64 && hb.count(ch => ch == '0' || ch == '1') == 64)
    assert(hb == hp, s"bmp=$hb png=$hp")
    // spatial referee: ImageIO's raster, summed across bands, must
    // equal decodeRaw at every coordinate (BGR vs RGB cancels in the sum)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bmp))
    val (_, w, h, ch, px) = Multimodal.decodeRaw(bmp).get
    for (y <- 0 until h; x <- 0 until w) {
      val ref = (0 until img.getRaster.getNumBands)
        .map(img.getRaster.getSample(x, y, _)).sum
      val got = (0 until ch).map(c => px((y * w + x) * ch + c)).sum
      assert(got == ref, s"($x,$y)")
    }
    // constant image → degenerate threshold: cell*64 > total is false
    // everywhere → all-zeros hash, not a crash
    val flat = Multimodal.syntheticPngImage(16, 16, 0, (_, _, _) => 99)
    assert(Multimodal.aHashBits(flat).get == "0" * 64)
    // undecodable payloads flow as None
    assert(Multimodal.aHashBits("not an image".getBytes("UTF-8")).isEmpty)
  }

  test("WAV decode matches the javax.sound referee across bit depths " +
    "and channel counts") {
    // javax.sound.sampled is the independent referee — a full audio
    // stack that knows nothing of our parser. Sample-exact agreement
    // required (8-bit PCM is unsigned, 16-bit is signed little-endian).
    def refereeStats(bytes: Array[Byte]): (Long, Int, Int, Long, Int, Float) = {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = in.getFormat
      val bytesPer = fmt.getSampleSizeInBits / 8
      val raw = in.readAllBytes()
      var sum = 0L
      var mn = Int.MaxValue
      var mx = Int.MinValue
      var n = 0L
      var i = 0
      while (i < raw.length) {
        val v =
          if (bytesPer == 1) raw(i) & 0xff
          else ((raw(i + 1).toInt) << 8) | (raw(i) & 0xff)
        sum += v
        if (v < mn) mn = v
        if (v > mx) mx = v
        n += 1
        i += bytesPer
      }
      (sum, mn, mx, n / fmt.getChannels, fmt.getChannels, fmt.getSampleRate)
    }
    def wave(seed: Int)(t: Int, c: Int): Int =
      (seed * 13 + t * 7 + c * 3) % 65536 - 32768
    val cases = Seq(
      ("16-bit mono", AudioVideo.syntheticWav(100, 1, 16000, 16, wave(1))),
      ("16-bit stereo", AudioVideo.syntheticWav(77, 2, 44100, 16, wave(2))),
      ("8-bit mono", AudioVideo.syntheticWav(50, 1, 8000, 8,
        (t, c) => (t * 7 + c) % 256)),
      ("8-bit stereo", AudioVideo.syntheticWav(33, 2, 22050, 8,
        (t, c) => (t * 11 + c * 5) % 256)))
    cases.foreach { case (label, bytes) =>
      val got = AudioVideo.decodeWav(bytes)
      assert(got.isDefined, label)
      val s = got.get
      val (refSum, refMn, refMx, refFrames, refCh, refRate) = refereeStats(bytes)
      assert(s.channels == refCh, label)
      assert(s.sample_rate == refRate.toInt, label)
      assert(s.n_frames == refFrames, label)
      assert(s.sample_mean == refSum.toDouble / (refFrames * refCh), label)
      assert(s.sample_min == refMn, label)
      assert(s.sample_max == refMx, label)
    }
  }

  test("WAV decode walks chunk lists (odd-size padding) and refuses " +
    "non-PCM or malformed payloads") {
    val base = AudioVideo.syntheticWav(10, 1, 8000, 16, (t, _) => t * 100)
    // splice an odd-sized LIST chunk between fmt and data; the RIFF pad
    // byte must be honored or the data chunk is never found
    val fmtEnd = 12 + 8 + 16
    val odd = Array[Byte]('L', 'I', 'S', 'T', 5, 0, 0, 0, 1, 2, 3, 4, 5, 0)
    val spliced = base.take(fmtEnd) ++ odd ++ base.drop(fmtEnd)
    // RIFF size field must cover the spliced bytes
    java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(4, spliced.length - 8)
    val viaSplice = AudioVideo.decodeWav(spliced)
    assert(viaSplice == AudioVideo.decodeWav(base))
    assert(viaSplice.get.n_frames == 10)
    // IEEE-float WAV (format code 3) is out of scope → None, not garbage
    val floatWav = base.clone()
    java.nio.ByteBuffer.wrap(floatWav).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putShort(20, 3.toShort)
    assert(AudioVideo.decodeWav(floatWav).isEmpty)
    // truncated data chunk, text bytes, empty
    assert(AudioVideo.decodeWav(base.take(base.length - 3)).isEmpty)
    assert(AudioVideo.decodeWav("not audio".getBytes("UTF-8")).isEmpty)
    assert(AudioVideo.decodeWav(Array.empty[Byte]).isEmpty)
  }

  test("Y4M frame sampling: stride honors every-Nth, full decode " +
    "matches per-frame closed form, colourspaces size planes correctly") {
    def luma(x: Int, y: Int, t: Int): Int = (x * 3 + y * 5 + t * 11) % 256
    val v = AudioVideo.syntheticY4m(8, 6, 7, luma)
    val sampled = AudioVideo.sampleY4mFrames(v, 3).get
    assert(sampled.n_frames == 7)
    assert((sampled.width, sampled.height) == ((8, 6)))
    assert(sampled.frames.map(_.frame_idx) == Seq(0, 3, 6))
    // stride=1 decodes every frame; stats match the closed form
    val full = AudioVideo.sampleY4mFrames(v, 1).get
    assert(full.frames.size == 7)
    full.frames.foreach { fr =>
      val vals = for (y <- 0 until 6; x <- 0 until 8)
        yield luma(x, y, fr.frame_idx)
      assert(fr.y_mean == vals.sum.toDouble / vals.size)
      assert(fr.y_min == vals.min)
      assert(fr.y_max == vals.max)
    }
    // C444 and Cmono change plane sizes; frame alignment must follow
    val hdr = "YUV4MPEG2 W4 H2 F25:1 C444\n".getBytes("US-ASCII")
    val fr444 = "FRAME\n".getBytes("US-ASCII") ++
      Array.tabulate[Byte](24)(i => (i % 8).toByte) // Y + Cb + Cr, 8 each
    val y444 = AudioVideo.sampleY4mFrames(hdr ++ fr444 ++ fr444, 1).get
    assert(y444.n_frames == 2)
    assert(y444.frames.head.y_mean == (0 until 8).map(_ % 8).sum / 8.0)
    val mono = "YUV4MPEG2 W4 H2 Cmono\n".getBytes("US-ASCII") ++
      ("FRAME\n".getBytes("US-ASCII") ++ Array.fill[Byte](8)(9))
    assert(AudioVideo.sampleY4mFrames(mono, 1).get.frames.head.y_mean == 9.0)
    // no C tag → spec default C420
    val noTag = "YUV4MPEG2 W4 H2\n".getBytes("US-ASCII") ++
      ("FRAME\n".getBytes("US-ASCII") ++ Array.fill[Byte](8 + 4)(4))
    assert(AudioVideo.sampleY4mFrames(noTag, 1).get.frames.head.y_mean == 4.0)
  }

  test("Y4M refuses malformed containers as None, never throws") {
    def luma(x: Int, y: Int, t: Int): Int = x + y + t
    val v = AudioVideo.syntheticY4m(4, 4, 3, luma)
    assert(AudioVideo.sampleY4mFrames(v, 2).isDefined)
    // truncated mid-frame
    assert(AudioVideo.sampleY4mFrames(v.take(v.length - 5), 1).isEmpty)
    // odd dims are impossible under C420
    val oddHdr = "YUV4MPEG2 W3 H2 C420\n".getBytes("US-ASCII")
    assert(AudioVideo.sampleY4mFrames(
      oddHdr ++ "FRAME\n".getBytes("US-ASCII") ++ Array.fill[Byte](9)(0),
      1).isEmpty)
    // unsupported colourspace refused, not garbled
    val c422 = "YUV4MPEG2 W4 H2 C422\n".getBytes("US-ASCII")
    assert(AudioVideo.sampleY4mFrames(
      c422 ++ "FRAME\n".getBytes("US-ASCII") ++ Array.fill[Byte](16)(0),
      1).isEmpty)
    // zero frames, junk magic, empty
    assert(AudioVideo.sampleY4mFrames(
      "YUV4MPEG2 W4 H2 C420\n".getBytes("US-ASCII"), 1).isEmpty)
    assert(AudioVideo.sampleY4mFrames("MPEG4 junk\n".getBytes("UTF-8"),
      1).isEmpty)
    assert(AudioVideo.sampleY4mFrames(Array.empty[Byte], 1).isEmpty)
  }

  test("perceptualNearDupPairs: exact recall vs brute-force referee, " +
    "planted Hamming 0-3 twins found, nulls dropped") {
    // deterministic diverse 64-bit hashes + planted near-dups at every
    // distance the banding guarantees (0..3) and decoys just past it
    def bits(seed: Long): String = {
      var x = seed * 6364136223846793005L + 1442695040888963407L
      val sb = new StringBuilder
      (0 until 64).foreach { _ =>
        x = x * 6364136223846793005L + 1442695040888963407L
        sb.append(if (((x >>> 33) & 1L) == 1L) '1' else '0')
      }
      sb.toString
    }
    def flip(h: String, ks: Int*): String = {
      val a = h.toCharArray
      ks.foreach(k => a(k) = if (a(k) == '0') '1' else '0')
      new String(a)
    }
    val base = (0L until 40L).map(i => i -> bits(i)).toMap
    val rows = base.toSeq ++ Seq(
      100L -> base(0L), // dist 0
      101L -> flip(base(1L), 5), // dist 1
      102L -> flip(base(2L), 3, 40), // dist 2
      103L -> flip(base(3L), 0, 21, 63), // dist 3 (boundary, kept)
      104L -> flip(base(4L), 1, 17, 33, 49), // dist 4 in ALL 4 bands:
      // banding may or may not surface it as a candidate, but the
      // exact verify must drop it either way
      105L -> null.asInstanceOf[String]) // undecodable → dropped
    val got = Multimodal.perceptualNearDupPairs(
        rows.toDF("media_id", "ahash"), "media_id", "ahash", 3)
      .as[(Long, Long, Long)].collect().toSet
    // brute referee over non-null hashes
    val hs = rows.filter(_._2 != null)
    val brute = (for {
      (ia, ha) <- hs; (ib, hb) <- hs if ia < ib
      d = ha.zip(hb).count { case (x, y) => x != y } if d <= 3
    } yield (ia, ib, d.toLong)).toSet
    assert(got == brute)
    assert(got.contains((0L, 100L, 0L)) && got.contains((1L, 101L, 1L)))
    assert(got.contains((2L, 102L, 2L)) && got.contains((3L, 103L, 3L)))
    assert(!got.exists { case (a, b, _) => b == 104L || a == 104L || b == 105L })
  }

  test("WebP/GIF header decode (T186): all five synthetic layouts " +
      "round-trip; a REAL ImageIO-written GIF parses with the same " +
      "scanner; corrupt bytes decode to None") {
    // the three WebP layouts, alpha variants included
    assert(Multimodal.decodeImageHeader(
      Multimodal.syntheticWebp(320, 240, "lossy"))
      .contains(("webp", 320, 240, 3)))
    assert(Multimodal.decodeImageHeader(
      Multimodal.syntheticWebp(1, 16383, "lossless"))
      .contains(("webp", 1, 16383, 3)))
    assert(Multimodal.decodeImageHeader(
      Multimodal.syntheticWebp(257, 129, "lossless", alpha = true))
      .contains(("webp", 257, 129, 4)))
    assert(Multimodal.decodeImageHeader(
      Multimodal.syntheticWebp(5000, 3000, "extended", alpha = true))
      .contains(("webp", 5000, 3000, 4)))
    assert(Multimodal.decodeImageHeader(Multimodal.syntheticGif(99, 47))
      .contains(("gif", 99, 47, 1)))
    // the strong referee: a genuine GIF stream from the JDK writer
    // (LZW image data, palette, extensions) — the header walk reads
    // the logical screen descriptor regardless of what follows
    val img = new java.awt.image.BufferedImage(41, 29,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 41; y <- 0 until 29)
      img.setRGB(x, y, (x * 11 + y * 17) & 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "gif", bos))
    val real = bos.toByteArray
    assert(Multimodal.decodeImageHeader(real)
      .contains(("gif", 41, 29, 1)), Multimodal.decodeImageHeader(real))
    // corrupt WebP: bad VP8 sync code, truncated chunk list → None
    val badSync = Multimodal.syntheticWebp(10, 10, "lossy")
    badSync(12 + 8 + 3) = 0x00 // clobber the 9D 01 2A sync
    assert(Multimodal.decodeImageHeader(badSync).isEmpty)
    for (cut <- Seq(4, 11, 14)) // RIFF/WEBP/chunk-header truncations
      assert(Multimodal.decodeImageHeader(
        Multimodal.syntheticWebp(10, 10, "lossless").take(cut)).isEmpty)
    assert(Multimodal.decodeImageHeader(
      Multimodal.syntheticGif(9, 9).take(8)).isEmpty)
    // crafted chunk size near Int.MaxValue: body + sz overflows Int to
    // a negative index — the walk must stop, not throw (ADVICE r14)
    val bomb = java.util.Arrays.copyOf(
      Multimodal.syntheticWebp(10, 10, "lossy"), 40)
    // overwrite the first chunk header with an unknown tag + huge size
    bomb(12) = 'J'; bomb(13) = 'U'; bomb(14) = 'N'; bomb(15) = 'K'
    bomb(16) = 0xf0.toByte; bomb(17) = 0xff.toByte
    bomb(18) = 0xff.toByte; bomb(19) = 0x7f.toByte // LE 0x7ffffff0
    assert(Multimodal.decodeImageHeader(bomb).isEmpty) // and no throw
  }
}
