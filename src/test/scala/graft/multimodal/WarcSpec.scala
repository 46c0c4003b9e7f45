package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Referees for the WARC record layer (q206 / VERDICT-r9 item 3).
  * Fixtures are REAL WARC-formatted bytes — mostly hand-written
  * literals, not round-trips of our own writer — and the corrupted-
  * input discipline mirrors CompressedSpec: truncation and byte-flip
  * sweeps that may degrade the result but must never throw.
  */
class WarcSpec extends AnyFunSuite {

  private def rec(typ: String, id: String, body: Array[Byte],
      extra: Seq[(String, String)] = Seq.empty): Array[Byte] =
    Warc.render(Seq(
      "WARC-Type" -> typ,
      "WARC-Record-ID" -> id,
      "WARC-Date" -> "2026-01-01T00:00:00Z") ++ extra, body)

  test("round trip: render → parseSingle recovers structure and " +
      "witnesses; a body containing CRLFCRLF does not end the record " +
      "early (length-delimited, not scanned)") {
    val body = "line1\r\n\r\nline2 \u0000 bytes".getBytes("ISO-8859-1")
    val bytes = rec("response", "<urn:uuid:1>", body, Seq(
      "WARC-Target-URI" -> "http://ex.test/x",
      "Content-Type" -> "application/http"))
    val r = Warc.parseSingle(bytes).get
    assert(r.version == "1.0" && r.warcType == "response")
    assert(r.recordId == "<urn:uuid:1>")
    assert(r.contentLength == body.length.toLong)
    assert(r.targetUri.contains("http://ex.test/x"))
    assert(r.contentType.contains("application/http"))
    assert(r.bodySum == body.map(b => (b & 0xff).toLong).sum)
    val md = java.security.MessageDigest.getInstance("MD5")
    assert(r.bodyMd5 == md.digest(body).map("%02x".format(_)).mkString)
    // zero-length body is a valid record
    assert(Warc.parseSingle(rec("warcinfo", "<urn:uuid:2>",
      Array.emptyByteArray)).exists(_.contentLength == 0))
  }

  test("hand-written fixture: case-insensitive header names and LWS " +
      "continuation folding (ISO 28500 inherits RFC 822 folding)") {
    val bytes = ("WARC/1.1\r\n" +
      "warc-type: conversion\r\n" +
      "WARC-RECORD-ID: <urn:uuid:9>\r\n" +
      "Warc-Date: 2026-02-02T00:00:00Z\r\n" +
      "WARC-Target-URI: http://ex.test/very/long\r\n" +
      "\tcontinued/path\r\n" +
      "Content-Length: 2\r\n" +
      "\r\nhi\r\n\r\n").getBytes("ISO-8859-1")
    val r = Warc.parseSingle(bytes).get
    assert(r.version == "1.1" && r.warcType == "conversion")
    assert(r.targetUri.contains("http://ex.test/very/long continued/path"))
    assert(r.nHeaders == 5)
  }

  test("required-header enforcement: dropping any of WARC-Type / " +
      "Record-ID / Date / Content-Length → None") {
    val all = Seq(
      "WARC-Type" -> "response",
      "WARC-Record-ID" -> "<urn:uuid:3>",
      "WARC-Date" -> "2026-01-01T00:00:00Z")
    for (drop <- all.indices) {
      val hdrs = all.zipWithIndex.filter(_._2 != drop).map(_._1)
      assert(Warc.parseSingle(Warc.render(hdrs, "abc".getBytes)).isEmpty,
        s"dropped ${all(drop)._1}")
    }
    // Content-Length is appended by render — strip it by hand
    val s = new String(rec("response", "<urn:uuid:4>", "abc".getBytes),
      "ISO-8859-1").replaceFirst("Content-Length: 3\r\n", "")
    assert(Warc.parseSingle(s.getBytes("ISO-8859-1")).isEmpty)
  }

  test("strictness: bare-LF line endings, non-numeric Content-Length, " +
      "missing record terminator, trailing garbage → None, no throw") {
    val good = rec("response", "<urn:uuid:5>", "abcd".getBytes)
    assert(Warc.parseSingle(new String(good, "ISO-8859-1")
      .replace("\r\n", "\n").getBytes("ISO-8859-1")).isEmpty)
    assert(Warc.parseSingle(new String(good, "ISO-8859-1")
      .replace("Content-Length: 4", "Content-Length: four")
      .getBytes("ISO-8859-1")).isEmpty)
    assert(Warc.parseSingle(good.dropRight(1)).isEmpty)
    assert(Warc.parseSingle(good ++ "x".getBytes).isEmpty)
    assert(Warc.parseRecords(Array.emptyByteArray).isEmpty)
  }

  test("truncation sweep over a 3-record buffer: every cut parses " +
      "exactly the records whose boundary it lands on, else None — " +
      "never a throw") {
    val rs = Seq(
      rec("warcinfo", "<urn:uuid:6>", "info".getBytes),
      rec("request", "<urn:uuid:7>", Array.emptyByteArray),
      rec("response", "<urn:uuid:8>", ("x" * 300).getBytes))
    val buf = rs.reduce(_ ++ _)
    val bounds = rs.scanLeft(0)(_ + _.length).tail
    for (cut <- 0 to buf.length) {
      val got =
        try Warc.parseRecords(buf.take(cut))
        catch { case e: Throwable => fail(s"cut=$cut threw: $e") }
      bounds.indexOf(cut) match {
        case -1 => assert(got.isEmpty, s"cut=$cut must not parse")
        case b => assert(got.exists(_.length == b + 1), s"cut=$cut")
      }
    }
  }

  test("byte-flip sweep: header-region corruption → None or a " +
      "different parse, body corruption → same structure with a " +
      "different MD5; never a throw") {
    val body = "payload-bytes-here".getBytes
    val bytes = rec("response", "<urn:uuid:10>", body)
    val clean = Warc.parseSingle(bytes).get
    val bodyStart = bytes.length - 4 - body.length
    for (i <- bytes.indices) {
      val m = bytes.clone(); m(i) = (m(i) ^ 0x40).toByte
      val got =
        try Warc.parseSingle(m)
        catch { case e: Throwable => fail(s"flip@$i threw: $e") }
      if (i >= bodyStart && i < bodyStart + body.length) {
        assert(got.exists(r => r.contentLength == clean.contentLength &&
          r.bodyMd5 != clean.bodyMd5), s"flip@$i (body)")
      }
      // header/terminator flips may still parse (e.g. a flipped value
      // byte) — the contract under corruption is only: no throw
    }
  }

  test("composition referee: a Common-Crawl-shaped archive (one " +
      "record per gzip member) round-trips through memberPayloads + " +
      "parseSingle; a member holding TWO records violates the " +
      "contract and parseSingle rejects it") {
    val rs = Seq(
      rec("warcinfo", "<urn:uuid:11>", "a".getBytes),
      rec("response", "<urn:uuid:12>", ("b" * 9000).getBytes))
    val archive = rs.map(r => Compressed.gzipMember(r, None))
      .reduce(_ ++ _)
    val got = Compressed.memberPayloads(archive).get
      .flatMap { case (_, p) => Warc.parseSingle(p) }
    assert(got.map(_.recordId) == Seq("<urn:uuid:11>", "<urn:uuid:12>"))
    assert(got(1).contentLength == 9000L)
    val double = Compressed.gzipMember(rs.head ++ rs.head, None)
    val ps = Compressed.memberPayloads(double).get
    assert(ps.length == 1 &&
      Warc.parseSingle(ps.head._2).isEmpty)
    // but the sequence parser accepts the same two records
    assert(Warc.parseRecords(ps.head._2).exists(_.length == 2))
  }

  test("write path: byte-exact reproducibility, generated Record-ID " +
      "is a urn:uuid, block digest verifies against the JDK (q233)") {
    val body = "the archived response bytes".getBytes("UTF-8")
    val w1 = Warc.write("response", "2026-01-01T00:00:00Z", body,
      targetUri = Some("http://ex.test/p"),
      contentType = Some("application/http"))
    // deterministic: same logical record → byte-identical output
    val w2 = Warc.write("response", "2026-01-01T00:00:00Z", body,
      targetUri = Some("http://ex.test/p"),
      contentType = Some("application/http"))
    assert(java.util.Arrays.equals(w1, w2))
    // parses under the strict reader with everything recovered
    val (rec, parsedBody) = Warc.parseSingleWithBody(w1).get
    assert(rec.warcType == "response")
    assert(rec.targetUri.contains("http://ex.test/p"))
    assert(parsedBody.toSeq == body.toSeq)
    assert(rec.recordId.matches(
      "<urn:uuid:[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-" +
        "[0-9a-f]{12}>"), rec.recordId)
    // digest header verifies: sha1 base32 of the body, JDK-refereed
    val dig = Warc.header(w1, "WARC-Block-Digest").get
    val sha1 = java.security.MessageDigest.getInstance("SHA-1")
      .digest(body)
    assert(dig == s"sha1:${Warc.base32(sha1)}")
    // base32 itself against the RFC 4648 test vectors
    assert(Warc.base32("".getBytes) == "")
    assert(Warc.base32("f".getBytes) == "MY")
    assert(Warc.base32("fo".getBytes) == "MZXQ")
    assert(Warc.base32("foo".getBytes) == "MZXW6")
    assert(Warc.base32("foob".getBytes) == "MZXW6YQ")
    assert(Warc.base32("fooba".getBytes) == "MZXW6YTB")
    assert(Warc.base32("foobar".getBytes) == "MZXW6YTBOI")
    // and the well-known SHA1("") base32
    assert(Warc.base32(java.security.MessageDigest
      .getInstance("SHA-1").digest(Array.empty[Byte])) ==
      "3I42H3S6NNFQ2MSVX7XZKYAYSCX5QBYJ")
    // distinct logical records get distinct ids
    val w3 = Warc.write("response", "2026-01-01T00:00:00Z",
      body :+ 'x'.toByte, Some("http://ex.test/p"))
    assert(Warc.parseSingle(w3).get.recordId != rec.recordId)
    // the uri/body boundary-shift collision class (review-r11): the
    // seed length-prefixes the body, so (uri+"a", "bc") never equals
    // (uri+"ab", "c"); and contentType participates in the seed
    val a = Warc.parseSingle(Warc.write("response", "d",
      "bc".getBytes, Some("http://x/a"))).get.recordId
    val b = Warc.parseSingle(Warc.write("response", "d",
      "c".getBytes, Some("http://x/ab"))).get.recordId
    assert(a != b)
    val ct1 = Warc.parseSingle(Warc.write("response", "d",
      "z".getBytes, Some("u"), Some("text/html"))).get.recordId
    val ct2 = Warc.parseSingle(Warc.write("response", "d",
      "z".getBytes, Some("u"), Some("text/plain"))).get.recordId
    assert(ct1 != ct2)
    // the extras boundary-shift class (ADVICE-r11): keys and values
    // length-prefix in the seed, so a value containing the ','/'='
    // separators — [("a","b,c=d")] — never seeds identically to the
    // two-header list [("a","b"),("c","d")]
    val x1 = Warc.parseSingle(Warc.write("response", "d",
      "z".getBytes, Some("u"), None,
      Seq("WARC-X" -> "b,WARC-Y=d"))).get.recordId
    val x2 = Warc.parseSingle(Warc.write("response", "d",
      "z".getBytes, Some("u"), None,
      Seq("WARC-X" -> "b", "WARC-Y" -> "d"))).get.recordId
    assert(x1 != x2)
  }

  test("segmentation (T183): split + reassemble round-trips, headers " +
      "carry the ISO 28500 fields, small blocks never segment") {
    val body = (1 to 400).map(i => (i % 251).toByte).toArray
    val segs = Warc.writeSegmented("resource", "2024-01-01T00:00:00Z",
      body, 150, Some("https://ex.org/big"), Some("text/plain"))
    assert(segs.length == 3)
    // segment 1 keeps the type and carries number 1, no origin
    assert(Warc.header(segs(0), "WARC-Segment-Number").contains("1"))
    assert(Warc.header(segs(0), "WARC-Segment-Origin-ID").isEmpty)
    assert(Warc.parseSingle(segs(0)).get.warcType == "resource")
    // continuations point at segment 1's id; only the LAST declares
    // the total
    val origin = Warc.parseSingle(segs(0)).get.recordId
    for (k <- 1 to 2) {
      val r = Warc.parseSingle(segs(k)).get
      assert(r.warcType == "continuation")
      assert(Warc.header(segs(k), "WARC-Segment-Origin-ID")
        .contains(origin))
      assert(Warc.header(segs(k), "WARC-Segment-Number")
        .contains((k + 1).toString))
    }
    assert(Warc.header(segs(1), "WARC-Segment-Total-Length").isEmpty)
    assert(Warc.header(segs(2), "WARC-Segment-Total-Length")
      .contains("400"))
    // reassembly: verdict, length, logical digest, byte-exact body —
    // order-insensitive (archives interleave records)
    for (perm <- Seq(segs, segs.reverse, Seq(segs(1), segs(2), segs(0)))) {
      val re = Warc.reassembleSegments(perm)
      assert(re.verdict == "complete" && re.nSegments == 3)
      assert(re.totalLen == 400L)
      assert(re.blockDigest == Warc.blockDigest(body))
      assert(java.util.Arrays.equals(re.body.get, body))
    }
    // a block under the threshold emits ONE plain record
    val one = Warc.writeSegmented("resource", "2024-01-01T00:00:00Z",
      body, 400, Some("https://ex.org/big"))
    assert(one.length == 1)
    assert(Warc.header(one.head, "WARC-Segment-Number").isEmpty)
    val re1 = Warc.reassembleSegments(one)
    assert(re1.verdict == "complete" && re1.nSegments == 1 &&
      java.util.Arrays.equals(re1.body.get, body))
  }

  test("segmentation defects: gap, total-length lie, wrong origin, " +
      "duplicate number, flipped chunk digest, malformed record") {
    val body = ("payload " * 60).getBytes("UTF-8")
    val segs = Warc.writeSegmented("resource", "2024-01-01T00:00:00Z",
      body, 160, Some("https://ex.org/d"))
    assert(segs.length == 3)
    // missing middle → gap
    assert(Warc.reassembleSegments(Seq(segs(0), segs(2)))
      .verdict == "gap")
    // missing FIRST → gap (numbers don't start at 1)
    assert(Warc.reassembleSegments(segs.tail).verdict == "gap")
    // total-length lie → conflict
    def edit(p: Array[Byte], from: String, to: String): Array[Byte] =
      new String(p, "ISO-8859-1").replace(from, to).getBytes("ISO-8859-1")
    val lied = segs.init :+ edit(segs(2),
      s"WARC-Segment-Total-Length: ${body.length}",
      s"WARC-Segment-Total-Length: ${body.length + 1}")
    assert(Warc.reassembleSegments(lied).verdict == "conflict")
    // wrong origin id on a continuation → conflict
    val orig = Warc.parseSingle(segs(0)).get.recordId
    val reOriented = Seq(segs(0),
      edit(segs(1), orig, "<urn:uuid:00000000-0000-0000-0000-000000000000>"),
      segs(2))
    assert(Warc.reassembleSegments(reOriented).verdict == "conflict")
    // duplicate segment number → conflict
    assert(Warc.reassembleSegments(Seq(segs(0), segs(1), segs(1)))
      .verdict == "conflict")
    // a flipped body byte breaks that segment's block digest → conflict
    val tampered = segs(1).clone()
    val bodyStart = tampered.length - 4 -
      Warc.parseSingle(segs(1)).get.contentLength.toInt
    tampered(bodyStart) = (tampered(bodyStart) ^ 1).toByte
    assert(Warc.reassembleSegments(Seq(segs(0), tampered, segs(2)))
      .verdict == "conflict")
    // unparseable bytes anywhere → malformed
    assert(Warc.reassembleSegments(Seq(segs(0), "junk".getBytes))
      .verdict == "malformed")
  }
}
