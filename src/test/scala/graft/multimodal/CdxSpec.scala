package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** CDX index + point-lookup referees (T165): the index must enable
  * single-member random access into a written archive, fail loudly on
  * stale/corrupt windows, and sort in SURT order.
  */
class CdxSpec extends AnyFunSuite {

  private def rec(uri: String, day: Int, body: String): Array[Byte] =
    Warc.write("response", f"2026-01-$day%02dT00:00:00Z",
      body.getBytes("UTF-8"), targetUri = Some(uri),
      contentType = Some("text/plain"))

  private val records = Seq(
    rec("http://b.example.com/x", 1, "body b"),
    rec("http://www.example.com/B/?b=2&a=1", 2, "body a"),
    rec("http://other.test/", 3, "body o"),
    rec("http://example.com/z", 4, "body z"))

  test("writeIndexed: member-per-record archive walks back whole; " +
      "index is SURT-sorted with correct offsets/lengths/digests") {
    val (archive, idx) = Cdx.writeIndexed(records)
    // the whole archive still parses as a T104 stream
    val members = Compressed.memberPayloads(archive).get
    assert(members.length == 4 && members.forall(_._1.crc_ok))
    // index covers every byte: offsets are a partition of the archive
    assert(idx.map(_.length).sum == archive.length.toLong)
    assert(idx.sortBy(_.offset).foldLeft(0L) { (off, e) =>
      assert(e.offset == off); off + e.length
    } == archive.length.toLong)
    // SURT sort order: example.com parent before subdomain, the
    // www/query/trailing-slash mess canonicalized into the key
    assert(idx.map(_.surt) == Seq(
      "com,example)/b?a=1&b=2", "com,example)/z",
      "com,example,b)/x", "test,other)/"))
    assert(idx.map(_.ts) == Seq("20260102000000", "20260104000000",
      "20260101000000", "20260103000000"))
    // every entry's digest matches what the record was written with
    idx.foreach { e =>
      val (r, body, _) = Cdx.readAt(archive, e.offset, e.length).get
      assert(e.digest == Warc.blockDigest(body))
      assert(r.targetUri.contains(e.uri))
    }
  }

  test("readAt: the bytes-read witness equals the indexed length and " +
      "is strictly less than the archive; every lookup touches ONE " +
      "member") {
    val (archive, idx) = Cdx.writeIndexed(records)
    idx.foreach { e =>
      val (_, _, bytesRead) = Cdx.readAt(archive, e.offset, e.length).get
      assert(bytesRead == e.length && bytesRead < archive.length.toLong)
    }
  }

  test("readAt fails loudly (None, no throw) on stale windows: " +
      "shifted offset, short/long length, two-member window, " +
      "flipped byte, out of range") {
    val (archive, idx) = Cdx.writeIndexed(records)
    val e = idx.find(_.surt.startsWith("com,example)/z")).get
    assert(Cdx.readAt(archive, e.offset + 1, e.length).isEmpty)
    assert(Cdx.readAt(archive, e.offset, e.length - 1).isEmpty)
    assert(Cdx.readAt(archive, e.offset, e.length + 1).isEmpty)
    // a window spanning two whole members is not a point lookup
    val sorted = idx.sortBy(_.offset)
    assert(Cdx.readAt(archive, sorted.head.offset,
      sorted.head.length + sorted(1).length).isEmpty)
    assert(Cdx.readAt(archive, -1, e.length).isEmpty)
    assert(Cdx.readAt(archive, archive.length.toLong - 2, 4).isEmpty)
    assert(Cdx.readAt(archive, e.offset, 0).isEmpty)
    // flip one byte inside the window: CRC or digest must catch it
    val bad = archive.clone()
    bad((e.offset + e.length / 2).toInt) =
      (bad((e.offset + e.length / 2).toInt) ^ 0x01).toByte
    assert(Cdx.readAt(bad, e.offset, e.length).isEmpty)
  }

  test("warcinfo records (no Target-URI) index under the empty key, " +
      "first in sort order, and still point-read") {
    val info = Warc.write("warcinfo", "2026-01-01T00:00:00Z",
      "software: graft\r\n".getBytes("UTF-8"),
      contentType = Some("application/warc-fields"))
    val (archive, idx) = Cdx.writeIndexed(info +: records)
    assert(idx.head.surt == "" && idx.head.uri == "")
    val (r, _, _) = Cdx.readAt(archive, idx.head.offset,
      idx.head.length).get
    assert(r.warcType == "warcinfo")
  }
}
