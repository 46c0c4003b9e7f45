package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Referees for the HTTP response-message layer (q208). Fixtures are
  * hand-written HTTP bytes in the Common Crawl response-record shape;
  * corrupted-input discipline mirrors WarcSpec/CompressedSpec.
  */
class HttpSpec extends AnyFunSuite {

  private def md5hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(b).map("%02x".format(_)).mkString

  test("hand-written fixture: status line, case-insensitive headers, " +
      "quoted charset, exact payload witnesses") {
    val body = "<html>héllo</html>".getBytes("UTF-8")
    val bytes = ("HTTP/1.1 200 OK\r\n" +
      "Server: nginx\r\n" +
      "CONTENT-TYPE: Text/HTML; charset=\"UTF-8\"\r\n" +
      s"content-length: ${body.length}\r\n" +
      "\r\n").getBytes("ISO-8859-1") ++ body
    val r = Http.parseResponse(bytes).get
    assert(r.version == "1.1" && r.status == 200 && r.reason == "OK")
    assert(r.mediaType.contains("text/html"))
    assert(r.charset.contains("utf-8"))
    assert(r.declaredLen.contains(body.length.toLong) && r.lenMatches)
    assert(r.bodyLen == body.length.toLong)
    assert(r.bodyMd5 == md5hex(body))
    assert(r.nHeaders == 3)
  }

  test("variants: bare charset, missing Content-Type, empty reason, " +
      "status-only line") {
    val b1 = Http.render(301, "Moved Permanently",
      Seq("Content-Type" -> "text/plain; charset=iso-8859-1",
        "Location" -> "http://ex.test/"), Array.emptyByteArray)
    val r1 = Http.parseResponse(b1).get
    assert(r1.status == 301 && r1.charset.contains("iso-8859-1"))
    val b2 = Http.render(204, "", Seq.empty, Array.emptyByteArray)
    val r2 = Http.parseResponse(b2).get
    assert(r2.status == 204 && r2.reason == "" && r2.mediaType.isEmpty &&
      r2.charset.isEmpty && r2.bodyLen == 0L)
    // no reason segment at all (just "HTTP/1.0 200")
    val b3 = "HTTP/1.0 200\r\n\r\nxy".getBytes("ISO-8859-1")
    val r3 = Http.parseResponse(b3).get
    assert(r3.version == "1.0" && r3.status == 200 && r3.reason == "" &&
      r3.bodyLen == 2L && r3.declaredLen.isEmpty && r3.lenMatches)
  }

  test("crawl reality: a Content-Length that disagrees with the " +
      "captured bytes is FLAGGED, not fatal (the WARC record length " +
      "is authoritative)") {
    val full = Http.render(200, "OK", Seq.empty, "abcdefgh".getBytes)
    // truncated fetch: drop the last 3 payload bytes
    val r = Http.parseResponse(full.dropRight(3)).get
    assert(r.declaredLen.contains(8L) && r.bodyLen == 5L && !r.lenMatches)
    assert(r.bodyMd5 == md5hex("abcde".getBytes))
    // over-long capture: trailing junk beyond the declared length
    val r2 = Http.parseResponse(full ++ "zz".getBytes).get
    assert(r2.bodyLen == 10L && !r2.lenMatches)
  }

  test("strictness: bare-LF endings, colon-less header, non-numeric " +
      "Content-Length, non-digit status, missing terminator → None; " +
      "truncation + flip sweeps never throw") {
    val good = Http.render(200, "OK",
      Seq("Content-Type" -> "text/plain"), "payload".getBytes)
    def s(b: Array[Byte]) = new String(b, "ISO-8859-1")
    assert(Http.parseResponse(
      s(good).replace("\r\n", "\n").getBytes("ISO-8859-1")).isEmpty)
    assert(Http.parseResponse(
      s(good).replace("Content-Type:", "Content-Type ")
        .getBytes("ISO-8859-1")).isEmpty)
    assert(Http.parseResponse(
      s(good).replace("Content-Length: 7", "Content-Length: seven")
        .getBytes("ISO-8859-1")).isEmpty)
    assert(Http.parseResponse(
      s(good).replace("HTTP/1.1 200", "HTTP/1.1 2x0")
        .getBytes("ISO-8859-1")).isEmpty)
    val noTerm = s(good).replaceFirst("\r\n\r\n[\\s\\S]*$", "\r\n")
    assert(Http.parseResponse(noTerm.getBytes("ISO-8859-1")).isEmpty)
    val headerEnd = good.length - "payload".length
    for (cut <- 0 to good.length) {
      val got =
        try Http.parseResponse(good.take(cut))
        catch { case e: Throwable => fail(s"cut=$cut threw: $e") }
      if (cut < headerEnd) assert(got.isEmpty, s"cut=$cut")
      else assert(got.exists(_.bodyLen == (cut - headerEnd).toLong),
        s"cut=$cut")
    }
    for (i <- good.indices) {
      val m = good.clone(); m(i) = (m(i) ^ 0x40).toByte
      try Http.parseResponse(m)
      catch { case e: Throwable => fail(s"flip@$i threw: $e") }
    }
  }

  test("composition referee: gzip → WARC response record → HTTP → " +
      "UTF-8 audit, all layers on one buffer") {
    val pay = "é" * 6 // 12 bytes, 6 codepoints
    val http = Http.render(200, "OK",
      Seq("Content-Type" -> "text/plain; charset=utf-8"),
      pay.getBytes("UTF-8"))
    val warc = Warc.render(Seq(
      "WARC-Type" -> "response",
      "WARC-Record-ID" -> "<urn:uuid:77>",
      "WARC-Date" -> "2026-01-01T00:00:00Z"), http)
    val gz = Compressed.gzipMember(warc, None)
    val (rec, warcBody) = Compressed.memberPayloads(gz).get
      .flatMap { case (_, p) => Warc.parseSingleWithBody(p) }.head
    assert(rec.warcType == "response")
    val (resp, body) = Http.parseResponseWithBody(warcBody).get
    assert(resp.status == 200 && resp.charset.contains("utf-8"))
    assert(resp.bodyLen == 12L)
    val st = graft.text.Utf8.audit(body)
    assert(st.n_cp_valid == 6L && st.n_bytes == 12L)
  }

  // ---- chunked Transfer-Encoding (q217, T126) ----

  private def frame(chunks: Seq[Array[Byte]],
      exts: Boolean = false,
      trailers: Seq[String] = Nil,
      terminate: Boolean = true): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes("ISO-8859-1"))
    chunks.zipWithIndex.foreach { case (c, k) =>
      w(c.length.toHexString + (if (exts && k == 0) ";a=b" else "") +
        "\r\n")
      bos.write(c)
      w("\r\n")
    }
    if (terminate) {
      w("0\r\n")
      trailers.foreach(t => w(t + "\r\n"))
      w("\r\n")
    }
    bos.toByteArray
  }

  test("chunked: random round trips, uppercase hex, exts, trailers") {
    for (seed <- 0 until 100) {
      val rnd = new scala.util.Random(seed)
      val chunks = Seq.fill(1 + rnd.nextInt(6)) {
        val c = new Array[Byte](1 + rnd.nextInt(300)) // size 0 = last-chunk
        rnd.nextBytes(c); c
      }
      val (out, meta) = Http.decodeChunked(
        frame(chunks, exts = seed % 2 == 0,
          trailers = if (seed % 3 == 0) Seq("X-A: 1", "X-B: 2") else Nil),
        0)
      assert(meta.wellFormed, s"seed=$seed")
      assert(meta.nChunks == chunks.length, s"seed=$seed")
      assert(out.toSeq == chunks.flatten.toSeq, s"seed=$seed")
      assert(meta.nTrailers == (if (seed % 3 == 0) 2 else 0))
    }
    // uppercase hex sizes decode too
    val (o2, m2) = Http.decodeChunked(
      "A\r\n0123456789\r\n0\r\n\r\n".getBytes, 0)
    assert(m2.wellFormed && new String(o2) == "0123456789")
  }

  test("chunked: zero-size mid-stream chunk terminates the body " +
      "(it IS the last-chunk)") {
    val wire = frame(Seq("abc".getBytes)) // abc + proper termination
    val early = "3\r\nabc\r\n0\r\n\r\nEXTRA-IGNORED".getBytes
    val (out, meta) = Http.decodeChunked(early, 0)
    assert(meta.wellFormed && new String(out) == "abc")
    val (out2, meta2) = Http.decodeChunked(wire, 0)
    assert(meta2.wellFormed && new String(out2) == "abc")
  }

  test("chunked: truncation at every byte never throws; decoded is " +
      "always a prefix of the body") {
    val body = (0 until 400).map(i => ('a' + i % 26).toChar).mkString
    val wire = frame(body.getBytes.grouped(37).toSeq,
      exts = true, trailers = Seq("X-S: 1"))
    (0 until wire.length).foreach { cut =>
      val (out, meta) = Http.decodeChunked(
        java.util.Arrays.copyOf(wire, cut), 0)
      assert(!meta.wellFormed || cut == wire.length)
      assert(body.startsWith(new String(out, "ISO-8859-1")),
        s"cut=$cut")
    }
    val (full, fm) = Http.decodeChunked(wire, 0)
    assert(fm.wellFormed && new String(full) == body && fm.nExts == 1 &&
      fm.nTrailers == 1)
  }

  test("chunked: malformed size lines and missing data-CRLF degrade") {
    Seq("zz\r\nabc\r\n", "\r\n", "3\r\nabXY", "3;e\r\nab",
      "fffffffffffffffff\r\n").foreach { s =>
      val (_, meta) = Http.decodeChunked(s.getBytes, 0)
      assert(!meta.wellFormed, s)
    }
    // data not followed by CRLF
    val (_, m) = Http.decodeChunked("3\r\nabcXX0\r\n\r\n".getBytes, 0)
    assert(!m.wellFormed)
  }

  test("isChunked: RFC 9112 final-member rule; parseResponseDecoded " +
      "de-frames end-to-end") {
    def resp(te: String): Http.HttpResponse =
      Http.parseResponse(Http.renderRaw(200, "OK",
        Seq("Transfer-Encoding" -> te), Array.empty)).get
    assert(resp("chunked").isChunked)
    assert(resp("gzip, chunked").isChunked)
    assert(!resp("chunked, gzip").isChunked)
    assert(resp("GZIP, Chunked").isChunked)
    val msg = Http.renderRaw(200, "OK",
      Seq("Content-Type" -> "text/plain",
        "Transfer-Encoding" -> "chunked"),
      frame(Seq("hello ".getBytes, "world".getBytes)))
    val (r, decoded, meta) = Http.parseResponseDecoded(msg).get
    assert(r.isChunked && meta.exists(_.wellFormed))
    assert(new String(decoded) == "hello world")
    // a raw response passes through with no meta
    val raw = Http.render(200, "OK", Nil, "plain".getBytes)
    val (r2, d2, m2) = Http.parseResponseDecoded(raw).get
    assert(!r2.isChunked && m2.isEmpty && new String(d2) == "plain")
  }

  // ---- Content-Encoding (q241, T150) — JDK writers as referees ----

  private def gz(p: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(p); g.close()
    bos.toByteArray
  }
  private def zlib(p: Array[Byte], raw: Boolean = false): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val d = new java.util.zip.DeflaterOutputStream(bos,
      new java.util.zip.Deflater(
        java.util.zip.Deflater.DEFAULT_COMPRESSION, raw))
    d.write(p); d.close()
    bos.toByteArray
  }

  test("content coding: gzip/deflate decode against JDK writers, " +
      "raw-deflate compat, identity, unknown and truncated reject") {
    val p = ("payload for the content-coding referee, long enough " +
      "to actually compress " * 3).getBytes("UTF-8")
    assert(Http.decodeCoding(gz(p), "gzip").get.toSeq == p.toSeq)
    assert(Http.decodeCoding(gz(p), "x-gzip").get.toSeq == p.toSeq)
    assert(Http.decodeCoding(gz(p), "GZIP").get.toSeq == p.toSeq)
    // deflate = zlib (RFC 1950); the raw-deflate server population
    // decodes through the documented browser-compat sniff
    assert(Http.decodeCoding(zlib(p), "deflate").get.toSeq == p.toSeq)
    assert(Http.decodeCoding(zlib(p, raw = true), "deflate")
      .get.toSeq == p.toSeq)
    assert(Http.decodeCoding(p, "identity").get.toSeq == p.toSeq)
    assert(Http.decodeCoding(gz(p), "br").isEmpty)   // unsupported
    // zstd (RFC 8878): round trip, multi-frame concat, garbage and
    // truncation reject (same-library caveat: zstd-jni both ways)
    val z = com.github.luben.zstd.Zstd.compress(p)
    assert(Http.decodeCoding(z, "zstd").get.toSeq == p.toSeq)
    assert(Http.decodeCoding(z ++ com.github.luben.zstd.Zstd
      .compress("tail".getBytes), "zstd").get.toSeq ==
      (p ++ "tail".getBytes).toSeq)
    assert(Http.decodeCoding(gz(p), "zstd").isEmpty) // mislabeled
    // full truncation sweep like gzip/deflate — incl. cut=0, where
    // ZstdInputStream would otherwise read "zero frames" happily
    for (cut <- 0 until z.length)
      assert(Http.decodeCoding(z.take(cut), "zstd").isEmpty, s"cut=$cut")
    assert(Http.decodeCoding(p, "gzip").isEmpty)     // mislabeled
    // truncation at every prefix length never throws, never succeeds
    for (cut <- 0 until gz(p).length)
      assert(Http.decodeCoding(gz(p).take(cut), "gzip").isEmpty)
    for (cut <- 1 until zlib(p).length)
      assert(Http.decodeCoding(zlib(p).take(cut), "deflate").isEmpty,
        s"cut=$cut")
    // trailing garbage after the deflate stream = the label lied
    assert(Http.decodeCoding(zlib(p) ++ Array[Byte](1, 2, 3),
      "deflate").isEmpty)
    // a gzip member with a corrupted CRC trailer is a failed decode
    val bad = gz(p).clone()
    bad(bad.length - 5) = (bad(bad.length - 5) ^ 0x01).toByte
    assert(Http.decodeCoding(bad, "gzip").isEmpty)
  }

  test("content coding: the stacked list decodes right-to-left and " +
      "stops flagged at the first failure") {
    val p = "stacked codings payload".getBytes("UTF-8")
    // Content-Encoding: deflate, gzip → deflate applied first, gzip
    // second → decode gzip THEN deflate
    val wire = gz(zlib(p))
    val (d, meta) = Http.decodeContentCodings(wire,
      Some("deflate, gzip"))
    assert(meta.decoded && meta.codings == Seq("deflate", "gzip"))
    assert(d.toSeq == p.toSeq)
    // wrong order must fail (gzip bytes are not a zlib stream)
    val (_, m2) = Http.decodeContentCodings(wire, Some("gzip, deflate"))
    assert(!m2.decoded)
    // unknown member in the list fails flagged, payload stays at the
    // last clean layer
    val (d3, m3) = Http.decodeContentCodings(gz(p), Some("br, gzip"))
    assert(!m3.decoded && d3.toSeq == p.toSeq)
    // absent header is a clean no-op
    val (d4, m4) = Http.decodeContentCodings(p, None)
    assert(m4.decoded && m4.codings.isEmpty && d4.toSeq == p.toSeq)
  }

  test("parseResponseFullyDecoded: Transfer-Encoding and " +
      "Content-Encoding STACK (chunked over gzip), multiple CE " +
      "headers join into one list") {
    val p = ("the seven-layer payload: chunked framing over a gzip " +
      "content coding, exactly the Common Crawl shape").getBytes("UTF-8")
    val comp = gz(p)
    // split the COMPRESSED bytes into 3 chunks
    val chunks = Seq(comp.slice(0, 5), comp.slice(5, 11),
      comp.slice(11, comp.length))
    val msg = Http.renderRaw(200, "OK",
      Seq("Content-Type" -> "text/plain; charset=utf-8",
        "Content-Encoding" -> "gzip",
        "Transfer-Encoding" -> "chunked"),
      frame(chunks))
    val (r, payload, chunkMeta, codingMeta) =
      Http.parseResponseFullyDecoded(msg).get
    assert(r.isChunked && chunkMeta.exists(_.wellFormed))
    assert(codingMeta == Http.CodingMeta(Seq("gzip"), decoded = true))
    assert(new String(payload, "UTF-8") == new String(p, "UTF-8"))
    // two CE headers act as one comma-joined list (RFC 9110 §5.3)
    val msg2 = Http.render(200, "OK",
      Seq("Content-Encoding" -> "deflate",
        "Content-Encoding" -> "gzip"), gz(zlib(p)))
    val (_, pay2, _, cm2) = Http.parseResponseFullyDecoded(msg2).get
    assert(cm2.decoded && cm2.codings == Seq("deflate", "gzip"))
    assert(pay2.toSeq == p.toSeq)
    // an identity response is untouched with empty codings
    val (_, pay3, _, cm3) = Http.parseResponseFullyDecoded(
      Http.render(200, "OK", Nil, p)).get
    assert(cm3 == Http.CodingMeta(Nil, decoded = true) &&
      pay3.toSeq == p.toSeq)
  }

  test("repeated Transfer-Encoding headers join into one list " +
      "(ADVICE-r12): 'gzip' + 'chunked' as two lines IS chunked") {
    val p = "split transfer-encoding payload".getBytes("UTF-8")
    val comp = gz(p)
    val msg = Http.renderRaw(200, "OK",
      Seq("Transfer-Encoding" -> "gzip",
        "Transfer-Encoding" -> "chunked"),
      frame(Seq(comp)))
    val r = Http.parseResponse(msg).get
    assert(r.transferEncoding.contains("gzip,chunked"))
    assert(r.isChunked) // final member of the JOINED list is chunked
    // and the full decode de-frames the chunked layer (the TE gzip
    // layer itself is a transfer coding this engine records but does
    // not decode — the chunk payload here is the gzip bytes)
    val (_, body, chunkMeta) = Http.parseResponseDecoded(msg).get
    assert(chunkMeta.exists(_.wellFormed) && body.toSeq == comp.toSeq)
    // order matters: chunked NOT final → not chunked (RFC 9112 §6.1)
    val msg2 = Http.render(200, "OK",
      Seq("Transfer-Encoding" -> "chunked",
        "Transfer-Encoding" -> "gzip"), p)
    assert(!Http.parseResponse(msg2).get.isChunked)
  }

  test("decompression-bomb guard (ADVICE-r12): a decoded layer past " +
      "MaxDecodedBytes fails flagged on every coding; at-cap decodes") {
    // 64 MiB + 1 of zeros: tiny on the wire under every coding,
    // over the cap decoded
    val bomb = new Array[Byte]((Http.MaxDecodedBytes + 1).toInt)
    assert(Http.decodeCoding(gz(bomb), "gzip").isEmpty)
    assert(Http.decodeCoding(zlib(bomb), "deflate").isEmpty)
    assert(Http.decodeCoding(
      com.github.luben.zstd.Zstd.compress(bomb), "zstd").isEmpty)
    // stacked codings fail FLAGGED at the bombing layer, never throw
    val (_, meta) = Http.decodeContentCodings(gz(bomb), Some("gzip"))
    assert(!meta.decoded)
    // multi-member gzip whose SUM exceeds the cap is also a bomb
    val half = new Array[Byte]((Http.MaxDecodedBytes / 2 + 1).toInt)
    assert(Http.decodeCoding(gz(half) ++ gz(half), "gzip").isEmpty)
    // exactly-at-cap still decodes (the cap is a bound, not a fuzz)
    val atCap = new Array[Byte](Http.MaxDecodedBytes.toInt)
    assert(Http.decodeCoding(gz(atCap), "gzip")
      .exists(_.length == atCap.length))
  }

  test("zstd RFC 8878 known-answer vectors (VERDICT-r12 item 6): " +
      "hand-derived frame bytes, not zstd-jni round-trips") {
    // Every byte below derived by hand from RFC 8878:
    //   magic = 0xFD2FB528 little-endian               (§3.1.1)
    //   FHD 0x20 = Single_Segment_flag set, FCS_flag=0 (§3.1.1.1.1)
    //     → no Window_Descriptor, no Dictionary_ID, 1-byte FCS
    //   block header = 3 bytes LE: bit0 Last_Block,
    //     bits1-2 Block_Type, bits3.. Block_Size       (§3.1.1.2.1)
    val magic = Array(0x28, 0xb5, 0x2f, 0xfd).map(_.toByte)
    // Raw_Block (type 0), last, size 3, content "abc", FCS = 3:
    //   header = 1 | (0<<1) | (3<<3) = 0x19
    val rawFrame = magic ++ Array[Byte](0x20, 3, 0x19, 0, 0) ++
      "abc".getBytes("US-ASCII")
    assert(Http.decodeCoding(rawFrame, "zstd").get.toSeq ==
      "abc".getBytes("US-ASCII").toSeq)
    // RLE_Block (type 1), last, size 5, content one byte 'x', FCS = 5:
    //   header = 1 | (1<<1) | (5<<3) = 0x2b
    val rleFrame = magic ++ Array[Byte](0x20, 5, 0x2b, 0, 0, 'x'.toByte)
    assert(Http.decodeCoding(rleFrame, "zstd").get.toSeq ==
      "xxxxx".getBytes("US-ASCII").toSeq)
    // multi-frame: RFC rule — frames concatenate
    assert(Http.decodeCoding(rawFrame ++ rleFrame, "zstd").get.toSeq ==
      "abcxxxxx".getBytes("US-ASCII").toSeq)
    // a compressed block zstd-jni ITSELF wrote must still begin with
    // the hand-derived magic (anchors the library to the spec's frame
    // grammar from the outside)
    val libFrame = com.github.luben.zstd.Zstd.compress(
      ("spec-anchored " * 8).getBytes("US-ASCII"))
    assert(libFrame.take(4).toSeq == magic.toSeq)
    // truncation of the HAND vector at every prefix rejects
    for (cut <- 0 until rawFrame.length)
      assert(Http.decodeCoding(rawFrame.take(cut), "zstd").isEmpty,
        s"cut=$cut")
    // reserved Block_Type 3 (§3.1.1.2.1) must reject
    val badType = magic ++ Array[Byte](0x20, 3, 0x1f, 0, 0) ++
      "abc".getBytes("US-ASCII") // 1 | (3<<1) | (3<<3) = 0x1f
    assert(Http.decodeCoding(badType, "zstd").isEmpty)
    // FCS lies (declares 4, block regenerates 3) must reject
    val badFcs = magic ++ Array[Byte](0x20, 4, 0x19, 0, 0) ++
      "abc".getBytes("US-ASCII")
    assert(Http.decodeCoding(badFcs, "zstd").isEmpty)
  }

  test("varyKey (T171): repeated Vary lines join, members trim + " +
      "lower + sort + dedup, empties drop, '*' survives") {
    def hs(vs: String*): Seq[(String, String)] =
      ("content-type" -> "text/plain") +: vs.map("vary" -> _)
    assert(Http.varyKey(hs()) == Seq.empty)
    assert(Http.varyKey(hs("Accept-Encoding")) ==
      Seq("accept-encoding"))
    // two header LINES ≡ one comma list (RFC 9110 §5.3)
    assert(Http.varyKey(hs("User-Agent", "Accept-Encoding")) ==
      Seq("accept-encoding", "user-agent"))
    // intra-line list, messy spacing, dup across lines, empty member
    assert(Http.varyKey(hs(" accept-encoding ,, USER-AGENT",
      "user-agent")) == Seq("accept-encoding", "user-agent"))
    assert(Http.varyKey(hs("*")) == Seq("*"))
    // '*' does not absorb its neighbors — both survive for the
    // matcher to veto
    assert(Http.varyKey(hs("accept-encoding, *")) ==
      Seq("*", "accept-encoding"))
  }

  test("varyMatches (T171): per-field value match, absent-in-both " +
      "matches, '*' never matches, non-varied fields ignored") {
    val orig = Seq("accept-encoding" -> "gzip",
      "user-agent" -> "graftbot/1.0")
    val ae = Seq("accept-encoding")
    // empty Vary: everything matches
    assert(Http.varyMatches(Nil, orig, Seq.empty))
    // matching / differing / missing selected value
    assert(Http.varyMatches(ae, orig,
      Seq("accept-encoding" -> "gzip", "user-agent" -> "x")))
    assert(!Http.varyMatches(ae, orig,
      Seq("accept-encoding" -> "br")))
    assert(!Http.varyMatches(ae, orig, Seq("user-agent" -> "x")))
    // absent in BOTH requests matches
    assert(Http.varyMatches(Seq("cookie"), orig, orig))
    // value comparison trims, and repeated header values compare as
    // the ordered list (a second value is a different negotiation)
    assert(Http.varyMatches(ae, orig,
      Seq("accept-encoding" -> "  gzip ")))
    assert(!Http.varyMatches(ae,
      orig :+ ("accept-encoding" -> "br"), orig))
    // '*' vetoes even an identical request
    assert(!Http.varyMatches(Seq("*"), orig, orig))
    assert(!Http.varyMatches(Seq("*", "accept-encoding"), orig, orig))
  }

  test("contentRange (T176): both RFC 9110 §14.4 forms parse; " +
      "unsatisfied-range, other units, inversions, and a complete " +
      "length not exceeding last-pos reject") {
    assert(Http.contentRange("bytes 0-99/200").contains(
      (0L, 99L, Some(200L))))
    assert(Http.contentRange(" BYTES 5-9/* ").contains(
      (5L, 9L, None)))
    assert(Http.contentRange("bytes */200").isEmpty)
    assert(Http.contentRange("pages 0-9/20").isEmpty)
    assert(Http.contentRange("bytes 9-5/20").isEmpty)
    assert(Http.contentRange("bytes 0-99/99").isEmpty)  // must exceed
    assert(Http.contentRange("bytes 0-99/100").isDefined)
    assert(Http.contentRange("bytes 0-9").isEmpty)      // no slash
    assert(Http.contentRange("bytes a-9/20").isEmpty)
  }

  test("reassembleRanges (T176): out-of-order stitch, agreeing " +
      "overlap absorbs, disagreeing overlap conflicts, gap/" +
      "incomplete/malformed verdicts, declared-total referee") {
    val full = "0123456789".getBytes("US-ASCII")
    def seg(f: Int, l: Int, tot: Option[Long] = Some(10L)) =
      (f.toLong, l.toLong, tot,
        java.util.Arrays.copyOfRange(full, f, l + 1))
    // clean split + out-of-order arrival
    val r1 = Http.reassembleRanges(Seq(seg(7, 9), seg(0, 3), seg(4, 6)))
    assert(r1.verdict == "complete" && r1.coveredLen == 10 &&
      r1.body.get.toSeq == full.toSeq)
    // agreeing overlap absorbs and still completes
    val r2 = Http.reassembleRanges(Seq(seg(0, 6), seg(4, 9)))
    assert(r2.verdict == "complete" && r2.nOverlaps == 1 &&
      r2.body.get.toSeq == full.toSeq)
    // disagreeing overlap is a conflict, never a silent overwrite
    val bad = (4L, 9L, Some(10L), "XXXXXX".getBytes("US-ASCII"))
    assert(Http.reassembleRanges(Seq(seg(0, 6), bad))
      .verdict == "conflict")
    // hole → gap, no synthesized body, union coverage reported
    val r3 = Http.reassembleRanges(Seq(seg(0, 3), seg(7, 9)))
    assert(r3.verdict == "gap" && r3.coveredLen == 7 && r3.body.isEmpty)
    // contiguous but total lies / unknown / nonzero start → incomplete
    assert(Http.reassembleRanges(Seq(seg(0, 9, Some(12L))))
      .verdict == "incomplete")
    assert(Http.reassembleRanges(Seq(seg(0, 9, None)))
      .verdict == "incomplete")
    assert(Http.reassembleRanges(Seq(seg(2, 9))).verdict == "incomplete")
    // two segments declaring DIFFERENT totals conflict
    assert(Http.reassembleRanges(Seq(seg(0, 4), seg(5, 9, Some(11L))))
      .verdict == "conflict")
    // a segment whose byte count lies about its range is malformed
    assert(Http.reassembleRanges(Seq((0L, 9L, Some(10L),
      "123".getBytes("US-ASCII")))).verdict == "malformed")
    assert(Http.reassembleRanges(Nil).verdict == "malformed")
  }
}
