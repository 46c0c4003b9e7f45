package graft.multimodal

/** WARC (ISO 28500) record layer — the piece that turns the T104 gzip
  * member walk into an actual crawl-ingest source (VERDICT-r9 item 3).
  * Common Crawl WARC/WET/WAT archives are concatenated gzip members
  * with EXACTLY one WARC record per member; `Compressed.memberPayloads`
  * yields each record's bytes and this parser gives them structure.
  *
  * A record is
  * {{{
  *   WARC/1.0<CRLF>
  *   Name: value<CRLF> ...          (named headers; LWS continuation
  *   <CRLF>                          lines fold into the previous one)
  *   <Content-Length bytes of body>
  *   <CRLF><CRLF>                   (record boundary)
  * }}}
  *
  * Parse discipline (the q195/T101/T102 container rules):
  *  - REQUIRED headers per the standard — WARC-Type, WARC-Record-ID,
  *    WARC-Date, Content-Length (non-negative decimal integer). Any
  *    missing/unparseable → None, never a throw.
  *  - Header names are case-insensitive; values trim surrounding
  *    whitespace; a line starting with SP/HT continues the previous
  *    header (RFC 822 folding, which ISO 28500 inherits).
  *  - Strict CRLF line ends and the double-CRLF record terminator —
  *    a bare-LF producer is malformed input, not a dialect.
  *  - Body bytes stream through the stats accumulators (length, byte
  *    sum, MD5) and are NOT retained — at 100 TB the payload never
  *    leaves the task; only structure and witnesses do.
  */
object Warc {

  /** Structure + content witnesses of one parsed record. `bodySum` and
    * `bodyMd5` are recomputable in closed form by an oracle when the
    * body is synthesized, so a single flipped body byte hash-fails.
    */
  final case class WarcRecord(
      version: String,
      warcType: String,
      recordId: String,
      date: String,
      contentLength: Long,
      targetUri: Option[String],
      contentType: Option[String],
      nHeaders: Int,
      bodySum: Long,
      bodyMd5: String)

  /** Parse the single record that must span the WHOLE buffer — the
    * record-per-gzip-member contract of Common Crawl archives. Trailing
    * bytes after the record terminator are a malformation (they would
    * belong to the next member's record).
    */
  def parseSingle(p: Array[Byte]): Option[WarcRecord] =
    parseAt(p, 0).flatMap { case (r, end) =>
      if (end == p.length) Some(r) else None
    }

  /** [[parseSingle]] plus the body bytes — for feeding the record's
    * payload to the NEXT layer in the same task (the HTTP message
    * inside a WARC response record, q208). The body still never
    * shuffles; it is retained only across one in-task hand-off.
    */
  def parseSingleWithBody(p: Array[Byte])
      : Option[(WarcRecord, Array[Byte])] =
    parseSingle(p).map { r =>
      val start = p.length - 4 - r.contentLength.toInt
      (r, java.util.Arrays.copyOfRange(p, start, p.length - 4))
    }

  /** Parse back-to-back records until the buffer is exhausted (the
    * uncompressed-WARC shape). None unless the ENTIRE buffer parses —
    * same all-or-nothing contract as splitGzipMembers.
    */
  def parseRecords(p: Array[Byte]): Option[Seq[WarcRecord]] = {
    val out = scala.collection.mutable.ArrayBuffer[WarcRecord]()
    var i = 0
    while (i < p.length) parseAt(p, i) match {
      case Some((r, end)) => out += r; i = end
      case None => return None
    }
    if (out.isEmpty) None else Some(out.toSeq)
  }

  /** Parse one record starting at `off`; Some((record, end offset just
    * past the terminating CRLFCRLF)) or None.
    */
  def parseAt(p: Array[Byte], off: Int): Option[(WarcRecord, Int)] = {
    def line(i: Int) = ByteScan.crlfLine(p, i)
    var i = off
    val version = line(i) match {
      case Some((v, n)) if v.startsWith("WARC/") && v.length > 5 &&
          !v.exists(_.isWhitespace) =>
        i = n; v.substring(5)
      case _ => return None
    }
    val headers = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var done = false
    while (!done) line(i) match {
      case Some(("", n)) => i = n; done = true
      case Some((h, n)) if h.charAt(0) == ' ' || h.charAt(0) == '\t' =>
        // LWS continuation folds into the previous header's value
        if (headers.isEmpty) return None
        val (k, v) = headers.last
        headers(headers.length - 1) = (k, v + " " + h.trim)
        i = n
      case Some((h, n)) =>
        val c = h.indexOf(':')
        if (c <= 0) return None
        headers += ((h.substring(0, c).trim.toLowerCase, // names fold case
          h.substring(c + 1).trim))
        i = n
      case None => return None
    }
    def hdr(name: String): Option[String] =
      headers.find(_._1 == name).map(_._2)
    val warcType = hdr("warc-type").getOrElse(return None)
    val recordId = hdr("warc-record-id").getOrElse(return None)
    val date = hdr("warc-date").getOrElse(return None)
    val len = hdr("content-length") match {
      case Some(s) if s.nonEmpty && s.forall(_.isDigit) && s.length <= 18 =>
        s.toLong
      case _ => return None
    }
    if (i + len + 4 > p.length) return None // body + CRLFCRLF must fit
    val (bodySum, bodyMd5) = ByteScan.witness(p, i, len.toInt)
    i = i + len.toInt
    if (!(p(i) == '\r' && p(i + 1) == '\n' &&
        p(i + 2) == '\r' && p(i + 3) == '\n')) return None
    Some((WarcRecord(version, warcType, recordId, date, len,
      hdr("warc-target-uri"), hdr("content-type"), headers.size,
      bodySum, bodyMd5), i + 4))
  }

  /** Serialize a record (synthesis side — q206 builds its archives with
    * this + Compressed.gzipMember, so the parser is exercised on real
    * WARC bytes, not on a private intermediate form).
    */
  def render(headers: Seq[(String, String)], body: Array[Byte])
      : Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes("ISO-8859-1"))
    w("WARC/1.0\r\n")
    headers.foreach { case (k, v) => w(s"$k: $v\r\n") }
    w(s"Content-Length: ${body.length}\r\n")
    w("\r\n")
    bos.write(body)
    w("\r\n\r\n")
    bos.toByteArray
  }

  /** RFC 4648 base32 (uppercase, unpadded) — the encoding WARC block
    * digests conventionally use (Common Crawl writes
    * `WARC-Block-Digest: sha1:<base32>`); 20 SHA-1 bytes encode to
    * exactly 32 chars.
    */
  private[multimodal] def base32(b: Array[Byte]): String = {
    val alpha = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"
    val sb = new StringBuilder
    var acc = 0L
    var nBits = 0
    b.foreach { x =>
      acc = (acc << 8) | (x & 0xffL)
      nBits += 8
      while (nBits >= 5) {
        nBits -= 5
        sb += alpha(((acc >> nBits) & 31L).toInt)
      }
    }
    if (nBits > 0) sb += alpha(((acc << (5 - nBits)) & 31L).toInt)
    sb.toString
  }

  /** The WRITE path (round 11, VERDICT-r10 item 6 — the ingest story
    * was one-directional): a full production record emitter that
    * GENERATES the bookkeeping headers [[render]] expects the caller
    * to supply:
    *
    *  - `WARC-Record-ID`: a deterministic name-based (v3) UUID over
    *    (type, date, target URI, body) — determinism discipline: the
    *    engine never calls a random source, and re-emitting the same
    *    logical record yields byte-identical output (the round-trip
    *    spec's byte-exactness lever; real archives use v4, which is
    *    a one-line swap at deployment)
    *  - `WARC-Block-Digest: sha1:<base32>` over the record block —
    *    the Common-Crawl convention readers verify
    *  - `Content-Length` from the body (via [[render]])
    *
    * Header order is fixed (Type, Record-ID, Date, [Target-URI],
    * [Content-Type], Block-Digest, extras) so output is reproducible.
    */
  // per-thread digest instance (the ExprHelpers.mdPool convention) —
  // blockDigest runs twice per record in q233's per-row hot path and
  // a getInstance() per call pays JCA provider lookup + allocation
  private val sha1Pool = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("SHA-1")
  }

  /** The `sha1:<base32>` digest value [[write]] emits for `body` —
    * public so a reader can re-derive and VERIFY it (q233).
    */
  def blockDigest(body: Array[Byte]): String = {
    val md = sha1Pool.get()
    md.reset()
    "sha1:" + base32(md.digest(body))
  }

  /** The deterministic name-based Record-ID [[write]] emits — public
    * within the object so the segmentation writer can know segment 1's
    * id (the Segment-Origin-ID every continuation must carry) without
    * re-parsing its own output.
    *
    * The name-UUID seed covers EVERY field that distinguishes two
    * logical records, newline-delimited (header values cannot carry
    * a newline) with the body LENGTH-prefixed — without it,
    * (uri="…/a", body="bc") and (uri="…/ab", body="c") would build
    * identical seed bytes and collide on the globally-unique
    * Record-ID ISO 28500 requires (review-r11 finding). Extras get
    * the SAME length-prefix discipline: joined as 'k=v' with ','
    * separators, [("a","b,c=d")] and [("a","b"),("c","d")] built
    * identical seeds (ADVICE-r11) — every extra key and value is
    * length-prefixed so no separator char can shift a boundary.
    */
  private def recordId(warcType: String, date: String,
      targetUri: Option[String], contentType: Option[String],
      extra: Seq[(String, String)], body: Array[Byte]): String = {
    val idSeed = (s"$warcType\n$date\n${targetUri.getOrElse("")}\n" +
      s"${contentType.getOrElse("")}\n" +
      s"${extra.map { case (k, v) => s"${k.length}:$k=${v.length}:$v" }
        .mkString(",")}\n" +
      s"${body.length}\n").getBytes("UTF-8") ++ body
    s"<urn:uuid:${java.util.UUID.nameUUIDFromBytes(idSeed)}>"
  }

  def write(warcType: String, date: String, body: Array[Byte],
      targetUri: Option[String] = None,
      contentType: Option[String] = None,
      extra: Seq[(String, String)] = Nil): Array[Byte] = {
    val headers =
      Seq("WARC-Type" -> warcType,
        "WARC-Record-ID" -> recordId(warcType, date, targetUri,
          contentType, extra, body),
        "WARC-Date" -> date) ++
        targetUri.map("WARC-Target-URI" -> _) ++
        contentType.map("Content-Type" -> _) ++
        Seq("WARC-Block-Digest" -> blockDigest(body)) ++
        extra
    render(headers, body)
  }

  // ---------- record segmentation (ISO 28500 §5.18–5.20, T183) ----------

  /** Write one logical record as WARC segments (VERDICT-r13 item 7 —
    * the one ISO 28500 feature the archive tier lacked). A block no
    * larger than `maxSegment` emits as ONE ordinary record with no
    * segmentation headers (the standard forbids gratuitous
    * segmentation); a larger block splits into `maxSegment`-byte
    * chunks:
    *
    *  - segment 1 keeps the original record's WARC-Type / Target-URI /
    *    Content-Type and adds `WARC-Segment-Number: 1`;
    *  - segments 2..n are `WARC-Type: continuation` records carrying
    *    `WARC-Segment-Number` and `WARC-Segment-Origin-ID` (= segment
    *    1's Record-ID);
    *  - the LAST segment additionally carries
    *    `WARC-Segment-Total-Length` (the whole logical block's length).
    *
    * Every segment's Block-Digest is over ITS OWN chunk (per spec the
    * digest is a per-record field); the logical block's digest is
    * re-derived by [[reassembleSegments]] after stitching.
    */
  def writeSegmented(warcType: String, date: String, body: Array[Byte],
      maxSegment: Int,
      targetUri: Option[String] = None,
      contentType: Option[String] = None): Seq[Array[Byte]] = {
    require(maxSegment > 0, "maxSegment must be positive")
    if (body.length <= maxSegment)
      Seq(write(warcType, date, body, targetUri, contentType))
    else {
      val chunks = body.grouped(maxSegment).toSeq
      val seg1Extra = Seq("WARC-Segment-Number" -> "1")
      val originId = recordId(warcType, date, targetUri, contentType,
        seg1Extra, chunks.head)
      val first = write(warcType, date, chunks.head, targetUri,
        contentType, seg1Extra)
      val rest = chunks.tail.zipWithIndex.map { case (chunk, i) =>
        val n = i + 2
        val extra =
          Seq("WARC-Segment-Number" -> n.toString,
            "WARC-Segment-Origin-ID" -> originId) ++
            (if (n == chunks.length)
               Seq("WARC-Segment-Total-Length" -> body.length.toString)
             else Nil)
        write("continuation", date, chunk, targetUri, None, extra)
      }
      first +: rest
    }
  }

  /** One reassembled logical record (or the reason it isn't one). */
  final case class Reassembled(
      verdict: String, // complete | gap | conflict | malformed
      nSegments: Int,
      totalLen: Long,
      blockDigest: String, // of the stitched block ("" unless complete)
      body: Option[Array[Byte]])

  /** Stitch the segments of ONE logical record back together. Rules
    * (the T176 range-reassembly discipline, applied to ISO 28500):
    * any unparseable record → malformed; segment numbers must be
    * exactly 1..n with segment 1 non-continuation and 2..n
    * continuations pointing at segment 1's Record-ID (a wrong origin
    * or duplicate number → conflict); a missing number → gap; the
    * last segment's declared Segment-Total-Length must equal the
    * stitched length (a lie → conflict); every segment's own
    * Block-Digest must verify (a flip → conflict). A complete stitch
    * re-derives the LOGICAL block digest — the witness the archive
    * index stores.
    */
  def reassembleSegments(records: Seq[Array[Byte]]): Reassembled = {
    val parsed = records.map { p =>
      parseSingleWithBody(p).map { case (r, body) =>
        (r, body,
          header(p, "WARC-Segment-Number").flatMap(s =>
            if (s.nonEmpty && s.forall(_.isDigit) && s.length <= 9)
              Some(s.toInt) else None),
          header(p, "WARC-Segment-Origin-ID"),
          header(p, "WARC-Segment-Total-Length").flatMap(s =>
            if (s.nonEmpty && s.forall(_.isDigit) && s.length <= 18)
              Some(s.toLong) else None))
      }
    }
    if (parsed.exists(_.isEmpty))
      return Reassembled("malformed", records.length, 0L, "", None)
    val segs = parsed.flatten
    // single unsegmented record passes through
    if (segs.length == 1 && segs.head._3.isEmpty) {
      val (_, body, _, _, _) = segs.head
      val dig = blockDigest(body)
      if (!header(records.head, "WARC-Block-Digest").contains(dig))
        return Reassembled("conflict", 1, 0L, "", None)
      return Reassembled("complete", 1, body.length.toLong, dig,
        Some(body))
    }
    if (segs.exists(_._3.isEmpty))
      return Reassembled("malformed", segs.length, 0L, "", None)
    val byNum = segs.sortBy(_._3.get)
    val nums = byNum.map(_._3.get)
    if (nums.distinct.length != nums.length)
      return Reassembled("conflict", segs.length, 0L, "", None)
    if (nums.head != 1 || byNum.head._1.warcType == "continuation")
      return Reassembled(
        if (nums.contains(1)) "conflict" else "gap",
        segs.length, 0L, "", None)
    if (nums != (1 to nums.length))
      return Reassembled("gap", segs.length, 0L, "", None)
    val originId = byNum.head._1.recordId
    val tail = byNum.tail
    if (tail.exists(s => s._1.warcType != "continuation" ||
        !s._4.contains(originId)))
      return Reassembled("conflict", segs.length, 0L, "", None)
    // per-segment digest verification off the raw record bytes
    for ((raw, (_, body, _, _, _)) <- records.zip(parsed.map(_.get)))
      if (!header(raw, "WARC-Block-Digest").contains(blockDigest(body)))
        return Reassembled("conflict", segs.length, 0L, "", None)
    val stitched = {
      val bos = new java.io.ByteArrayOutputStream()
      byNum.foreach { case (_, body, _, _, _) => bos.write(body) }
      bos.toByteArray
    }
    val declared = byNum.last._5
    if (!declared.contains(stitched.length.toLong))
      return Reassembled("conflict", segs.length, stitched.length.toLong,
        "", None)
    Reassembled("complete", segs.length, stitched.length.toLong,
      blockDigest(stitched), Some(stitched))
  }

  /** One named header's value off raw record bytes (case-insensitive;
    * first occurrence). The WARC header section has the same
    * first-line-then-`Name: value` shape as HTTP, so this delegates
    * to the T117 walk — used by the round-trip digest verification.
    */
  def header(p: Array[Byte], name: String): Option[String] =
    Http.headerAll(p, name).headOption
}
