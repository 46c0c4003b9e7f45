package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Referees for the concatenated-gzip member splitter (T104 / q195).
  * The JDK's own gzip stack is the independent referee in BOTH
  * directions: GZIPInputStream must accept what `gzipMember` writes
  * (RFC validity of our writer), and our walker must split what
  * GZIPOutputStream writes (the real java.util.zip-written fixture
  * VERDICT-r8 item 7 asked for). Plus the corrupted-input discipline
  * of the JPEG/TIFF tiers: truncation and bit-flip sweeps that may
  * degrade the result but must never throw.
  */
class CompressedSpec extends AnyFunSuite {

  private def payload(n: Int, seed: Int): Array[Byte] =
    Array.tabulate[Byte](n)(i => ((seed * 31 + i * 7) % 256).toByte)

  private def jdkGzip(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(b); g.close()
    bos.toByteArray
  }

  test("our writer is RFC-valid: GZIPInputStream round-trips every " +
      "payload, with and without FNAME") {
    for ((n, name) <- Seq((0, None), (1, Some("a.txt")), (257, None),
        (5000, Some("dir/file.bin")))) {
      val p = payload(n, n + 3)
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(Compressed.gzipMember(p, name)))
      assert(in.readAllBytes().toSeq == p.toSeq, s"n=$n name=$name")
    }
  }

  test("walker splits a REAL java.util.zip-written concatenation " +
      "(GZIPOutputStream members, no FNAME) with exact metadata") {
    val pays = Seq(payload(100, 1), payload(0, 2), payload(4097, 3))
    val archive = pays.map(jdkGzip).reduce(_ ++ _)
    val ms = Compressed.splitGzipMembers(archive).get
    assert(ms.length == 3)
    assert(ms.map(_.uncomp_len) == pays.map(_.length.toLong))
    assert(ms.map(_.byte_sum) ==
      pays.map(_.map(b => (b & 0xff).toLong).sum))
    assert(ms.forall(_.crc_ok))
    assert(ms.forall(_.name.isEmpty)) // GZIPOutputStream writes no FNAME
    assert(ms.map(_.comp_len).sum == archive.length.toLong)
  }

  test("mixed-writer archive: JDK member + named/unnamed own members " +
      "split in order with names recovered") {
    val archive = jdkGzip(payload(10, 7)) ++
      Compressed.gzipMember(payload(20, 8), Some("w0.txt")) ++
      Compressed.gzipMember(payload(30, 9), None)
    val ms = Compressed.splitGzipMembers(archive).get
    assert(ms.map(_.idx) == Seq(0, 1, 2))
    assert(ms.map(_.name) == Seq(None, Some("w0.txt"), None))
    assert(ms.map(_.uncomp_len) == Seq(10L, 20L, 30L))
    assert(ms.forall(_.crc_ok))
  }

  test("truncation sweep: every prefix is a shorter valid archive or " +
      "None — never a throw; exact member boundaries parse") {
    val m1 = Compressed.gzipMember(payload(40, 4), Some("x.txt"))
    val m2 = Compressed.gzipMember(payload(70, 5), None)
    val archive = m1 ++ m2
    for (cut <- 0 to archive.length) {
      val got =
        try Compressed.splitGzipMembers(archive.take(cut))
        catch { case e: Throwable => fail(s"cut=$cut threw: $e") }
      if (cut == m1.length) assert(got.exists(_.length == 1), s"cut=$cut")
      else if (cut == archive.length) assert(got.exists(_.length == 2))
      else assert(got.isEmpty, s"cut=$cut must not parse")
    }
  }

  test("bit-flip sweep: a corrupted archive degrades (None or " +
      "crc_ok=false) but never throws; a flipped TRAILER CRC " +
      "specifically yields crc_ok=false on that member only") {
    val m1 = Compressed.gzipMember(payload(64, 11), None)
    val m2 = Compressed.gzipMember(payload(64, 12), None)
    val archive = m1 ++ m2
    for (pos <- archive.indices) {
      val c = archive.clone()
      c(pos) = (c(pos) ^ 0x40).toByte
      try Compressed.splitGzipMembers(c)
      catch { case e: Throwable => fail(s"flip@$pos threw: $e") }
    }
    // surgical trailer corruption: member 1's stored CRC32 sits 8
    // bytes before its end — the deflate body stays intact, so the
    // member must parse with crc_ok=false while member 2 verifies
    val c = archive.clone()
    c(m1.length - 8) = (c(m1.length - 8) ^ 0xff).toByte
    val ms = Compressed.splitGzipMembers(c).get
    assert(ms.map(_.crc_ok) == Seq(false, true))
    // and a reserved-FLG-bit violation refuses the stream outright
    val r = archive.clone()
    r(3) = (r(3) | 0x20).toByte
    assert(Compressed.splitGzipMembers(r).isEmpty)
  }

  test("InputStream overload agrees with the array walker byte-for-byte " +
      "on full archives, every truncation, and every bit flip " +
      "(ADVICE-r9: the true-streaming ingest path)") {
    def stream(b: Array[Byte]) =
      Compressed.splitGzipMembers(new java.io.ByteArrayInputStream(b))
    val archive = jdkGzip(payload(100, 1)) ++
      Compressed.gzipMember(payload(4097, 8), Some("w0.txt")) ++
      Compressed.gzipMember(payload(0, 9), None) ++
      jdkGzip(payload(257, 2))
    assert(stream(archive) == Compressed.splitGzipMembers(archive))
    assert(stream(archive).get.length == 4)
    for (cut <- 0 to archive.length) {
      val pre = archive.take(cut)
      val a =
        try Compressed.splitGzipMembers(pre)
        catch { case e: Throwable => fail(s"array cut=$cut threw: $e") }
      val s =
        try stream(pre)
        catch { case e: Throwable => fail(s"stream cut=$cut threw: $e") }
      assert(s == a, s"cut=$cut")
    }
    for (pos <- archive.indices) {
      val c = archive.clone()
      c(pos) = (c(pos) ^ 0x40).toByte
      val a = Compressed.splitGzipMembers(c)
      val s =
        try stream(c)
        catch { case e: Throwable => fail(s"flip@$pos threw: $e") }
      assert(s == a, s"flip@$pos")
    }
  }

  test("non-gzip and empty inputs refuse as None") {
    assert(Compressed.splitGzipMembers(Array.empty[Byte]).isEmpty)
    assert(Compressed.splitGzipMembers("plain text".getBytes("UTF-8")).isEmpty)
    // a bare header with no deflate body is truncated, not a member
    assert(Compressed.splitGzipMembers(
      Array(0x1f.toByte, 0x8b.toByte, 8.toByte, 0.toByte)).isEmpty)
  }
}
