package graft.multimodal

/** HTTP/1.1 response-message layer (q208) — the third story of the
  * crawl-ingest stack: Common Crawl WARC `response` records carry the
  * RAW HTTP exchange, so turning an archive into documents means
  * gzip member walk (T104) → WARC record parse (T115) → THIS: status
  * line, named headers, media-type/charset extraction from
  * Content-Type, and the payload hand-off to the text tier (the UTF-8
  * auditor, T107).
  *
  * Parse discipline (the container-tier rules): strict CRLF line
  * ends and CRLFCRLF header terminator; status line must be
  * `HTTP/<ver> <3 digits> [reason]`; header names fold case; None on
  * structural malformation, never a throw. DELIBERATE delta vs the
  * WARC layer (both share ByteScan's line reader): WARC folds LWS
  * continuation lines (ISO 28500 inherits RFC 822), this parser
  * rejects them — RFC 7230 deprecated obs-fold and a leading-space
  * line here has no colon, so it parses as malformed. One crawl-reality
  * deviation from strictness: a Content-Length that DISAGREES with
  * the actual remaining bytes is flagged (`len_matches = false`), not
  * fatal — truncated fetches are endemic in crawl archives and the
  * payload that was captured is still the payload (the WARC record
  * length, not the inner Content-Length, is authoritative in CC).
  * Payload bytes stream through length/sum/MD5 witnesses.
  */
object Http {

  final case class HttpResponse(
      version: String,
      status: Int,
      reason: String,
      mediaType: Option[String],
      charset: Option[String],
      nHeaders: Int,
      declaredLen: Option[Long],
      lenMatches: Boolean,
      bodyLen: Long,
      bodySum: Long,
      bodyMd5: String,
      transferEncoding: Option[String] = None,
      contentEncoding: Option[String] = None) { // repeated CE headers
                             // pre-joined as one comma list (RFC 9110
                             // §5.3) — read in the ONE header walk so
                             // the full decode never re-scans bytes
    /** RFC 9112 §6.1: chunked is in effect when it is the FINAL
      * member of the Transfer-Encoding list.
      */
    def isChunked: Boolean = transferEncoding.exists(
      _.split(",").lastOption.exists(_.trim.equalsIgnoreCase("chunked")))
  }

  /** Status code + the collected header list in ONE walk — the
    * lightweight reader for consumers that need several headers but
    * no body witnesses (the redirect follower reads status, Location,
    * Retry-After and Date per hop; going through [[parseResponse]] +
    * [[headerAll]]×3 walked the bytes four times AND md5'd the body —
    * review-r11). Names lowercased; same strict line grammar;
    * structural malformation → None.
    */
  def statusAndHeaders(p: Array[Byte])
      : Option[(Int, Seq[(String, String)])] = {
    def line(i: Int) = ByteScan.crlfLine(p, i)
    var i = 0
    val status = line(i) match {
      case Some((s, n)) if s.startsWith("HTTP/") =>
        val sp1 = s.indexOf(' ')
        if (sp1 < 0 || s.length < sp1 + 4) return None
        val code = s.substring(sp1 + 1, sp1 + 4)
        if (!code.forall(_.isDigit)) return None
        val rest = s.substring(sp1 + 4)
        if (rest.nonEmpty && rest.charAt(0) != ' ') return None
        i = n
        code.toInt
      case _ => return None
    }
    val headers = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var done = false
    while (!done) line(i) match {
      case Some(("", n)) => i = n; done = true
      case Some((h, n)) =>
        val c = h.indexOf(':')
        if (c <= 0) return None
        headers += ((h.substring(0, c).trim.toLowerCase,
          h.substring(c + 1).trim))
        i = n
      case None => return None
    }
    Some((status, headers.toSeq))
  }

  def parseResponse(p: Array[Byte]): Option[HttpResponse] = {
    def line(i: Int) = ByteScan.crlfLine(p, i)
    var i = 0
    val (ver, status, reason) = line(i) match {
      case Some((s, n)) if s.startsWith("HTTP/") =>
        val sp1 = s.indexOf(' ')
        if (sp1 < 0 || s.length < sp1 + 4) return None
        val code = s.substring(sp1 + 1, sp1 + 4)
        if (!code.forall(_.isDigit)) return None
        // after the 3-digit code: end of line, or a space + reason
        val rest = s.substring(sp1 + 4)
        if (rest.nonEmpty && rest.charAt(0) != ' ') return None
        i = n
        (s.substring(5, sp1), code.toInt, rest.trim)
      case _ => return None
    }
    val headers = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var done = false
    while (!done) line(i) match {
      case Some(("", n)) => i = n; done = true
      case Some((h, n)) =>
        val c = h.indexOf(':')
        if (c <= 0) return None
        headers += ((h.substring(0, c).trim.toLowerCase,
          h.substring(c + 1).trim))
        i = n
      case None => return None
    }
    def hdr(name: String): Option[String] =
      headers.find(_._1 == name).map(_._2)
    // media type and charset out of Content-Type:
    //   text/html; charset="UTF-8"  →  (text/html, utf-8)
    val ctype = hdr("content-type")
    // takeWhile, not split()(0): Java split drops trailing empties, so
    // a degenerate "Content-Type: ;" yields a ZERO-length array and
    // (0) would throw — violating the never-throw contract
    val mediaType = ctype.map(_.takeWhile(_ != ';').trim.toLowerCase)
      .filter(_.nonEmpty)
    val charset = ctype.flatMap(_.split(";").drop(1)
      .map(_.trim)
      .collectFirst {
        case pmt if pmt.toLowerCase.startsWith("charset=") =>
          pmt.substring(8).trim.stripPrefix("\"").stripSuffix("\"")
            .toLowerCase
      }
      .filter(_.nonEmpty))
    val declaredLen = hdr("content-length") match {
      case Some(s) if s.nonEmpty && s.forall(_.isDigit) && s.length <= 18 =>
        Some(s.toLong)
      case Some(_) => return None // present but unparseable: malformed
      case None => None
    }
    val bodyLen = (p.length - i).toLong
    val (bodySum, bodyMd5) = ByteScan.witness(p, i, p.length - i)
    Some(HttpResponse(ver, status, reason, mediaType, charset,
      headers.size, declaredLen,
      declaredLen.forall(_ == bodyLen), bodyLen, bodySum, bodyMd5,
      // ADVICE-r12: repeated Transfer-Encoding headers join to one
      // comma list exactly like Content-Encoding (RFC 9110 §5.3) —
      // 'Transfer-Encoding: gzip' + 'Transfer-Encoding: chunked' as
      // two lines ≡ 'gzip, chunked', and isChunked's final-member
      // check must see the full list or the body reads as non-chunked
      headers.filter(_._1 == "transfer-encoding").map(_._2)
        .reduceOption(_ + "," + _).map(_.toLowerCase),
      headers.filter(_._1 == "content-encoding").map(_._2)
        .reduceOption(_ + "," + _)))
  }

  /** [[parseResponse]] plus the payload bytes — the in-task hand-off
    * to the text tier (UTF-8 audit, language ID, quality scoring).
    * The payload still never shuffles.
    */
  def parseResponseWithBody(p: Array[Byte])
      : Option[(HttpResponse, Array[Byte])] =
    parseResponse(p).map { r =>
      (r, java.util.Arrays.copyOfRange(p,
        p.length - r.bodyLen.toInt, p.length))
    }

  /** All values of one header (case-insensitive name) in order — the
    * focused reader the indexability tier (T127) uses for
    * X-Robots-Tag, which legally repeats. Same strict line walk as
    * [[parseResponse]]; structural malformation → Nil.
    */
  def headerAll(p: Array[Byte], name: String): Seq[String] = {
    val want = name.toLowerCase
    var i = ByteScan.crlfLine(p, 0).map(_._2).getOrElse(return Nil)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var done = false
    while (!done) ByteScan.crlfLine(p, i) match {
      case Some(("", _)) | None => done = true
      case Some((h, n2)) =>
        val c = h.indexOf(':')
        if (c > 0 && h.substring(0, c).trim.toLowerCase == want)
          out += h.substring(c + 1).trim
        i = n2
    }
    out.toSeq
  }

  final case class ChunkedMeta(
      nChunks: Int,
      nExts: Int,
      nTrailers: Int,
      wellFormed: Boolean)

  /** RFC 9112 §7.1 chunked Transfer-Encoding decode (q217, T126) —
    * the framing layer archived HTTP/1.1 responses actually use:
    * `chunk-size [;chunk-ext] CRLF chunk-data CRLF`, a `0`-size last
    * chunk, then an optional trailer section ending in CRLF. Crawl
    * posture: a truncated or malformed stream returns every byte
    * decoded BEFORE the defect with `wellFormed = false` — truncated
    * chunked bodies are endemic in archives and the prefix is still
    * the payload. Chunk sizes are hex (≤ 15 digits guards overflow);
    * extensions and trailers are counted, not interpreted (RFC 9110
    * §6.5: a recipient MAY discard trailer fields). Never throws.
    */
  def decodeChunked(p: Array[Byte], off: Int)
      : (Array[Byte], ChunkedMeta) = {
    val out = new java.io.ByteArrayOutputStream()
    var i = off
    var nChunks = 0
    var nExts = 0
    var nTrailers = 0
    def partial = (out.toByteArray,
      ChunkedMeta(nChunks, nExts, nTrailers, wellFormed = false))
    while (true) {
      ByteScan.crlfLine(p, i) match {
        case None => return partial
        case Some((ln, n)) =>
          val semi = ln.indexOf(';')
          val sizeStr = (if (semi >= 0) ln.substring(0, semi) else ln).trim
          if (sizeStr.isEmpty || sizeStr.length > 15 ||
              !sizeStr.forall(c => Character.digit(c, 16) >= 0))
            return partial
          val size = java.lang.Long.parseLong(sizeStr, 16)
          if (semi >= 0) nExts += 1
          i = n
          if (size == 0) {
            // trailer section: header-shaped lines, then the blank line
            var done = false
            while (!done) ByteScan.crlfLine(p, i) match {
              case Some(("", n2)) => i = n2; done = true
              case Some((t, n2)) if t.indexOf(':') > 0 =>
                nTrailers += 1; i = n2
              case _ => return partial
            }
            return (out.toByteArray,
              ChunkedMeta(nChunks, nExts, nTrailers, wellFormed = true))
          }
          if (size > Int.MaxValue.toLong || i + size + 2 > p.length)
            return partial
          out.write(p, i, size.toInt)
          i += size.toInt
          if (p(i) != '\r' || p(i + 1) != '\n') return partial
          i += 2
          nChunks += 1
      }
    }
    partial // unreachable
  }

  /** [[parseResponseWithBody]] with transfer-encoding applied: a
    * chunked body is de-framed (and Content-Length ignored, RFC 9112
    * §6.3 — when Transfer-Encoding is present the inner length field
    * carries no authority); anything else passes through raw.
    */
  def parseResponseDecoded(p: Array[Byte])
      : Option[(HttpResponse, Array[Byte], Option[ChunkedMeta])] =
    parseResponseWithBody(p).map { case (r, body) =>
      if (r.isChunked) {
        val (decoded, meta) = decodeChunked(body, 0)
        (r, decoded, Some(meta))
      } else (r, body, None)
    }

  /** How a response's Content-Encoding was handled by
    * [[parseResponseFullyDecoded]]: the coding list as declared (in
    * RFC 9110 §8.4 application order), and whether every coding
    * decoded. `decoded = false` leaves the payload at the LAST layer
    * that decoded cleanly — the crawl posture: a mislabeled or
    * truncated body is flagged, never thrown away.
    */
  final case class CodingMeta(codings: Seq[String], decoded: Boolean)

  /** Decode ONE content coding (RFC 9110 §8.4.1). None on anything
    * that is not a clean, complete decode:
    *
    *  - `gzip` / `x-gzip` — an RFC 1952 stream, decoded through the
    *    T104 walker ([[Compressed.memberPayloads]]): multi-member
    *    streams are legal and concatenate, trailers verify, truncation
    *    rejects. One deviation from the archive walker's posture: a
    *    member whose CRC32/ISIZE trailer disagrees with the inflated
    *    bytes is a FAILED decode here (the walker returns crc_ok=false
    *    per member because one rotten record must not discard an
    *    archive; a single response body with a bad trailer is itself
    *    the rotten record)
    *  - `deflate` — an RFC 1950 zlib stream. Crawl reality, documented
    *    deviation from strict §8.4.1.2: a large server population
    *    (historically IIS) sends RAW deflate under this token, and
    *    every browser sniffs both — a zlib parse failure AT THE FIRST
    *    BYTES retries raw before giving up
    *  - `zstd` — an RFC 8878 frame sequence, decoded through the
    *    zstd-jni streaming reader Spark itself ships (multi-frame
    *    streams concatenate, the RFC rule); malformation/truncation →
    *    None. Same-library caveat, documented: writer and reader are
    *    both zstd-jni (no independent JDK referee exists for zstd the
    *    way java.util.zip referees gzip/deflate)
    *  - `identity` — pass-through (deprecated on the wire, still seen)
    *  - anything else (`br`, garbage) → None — unsupported is
    *    undecodable, the caller flags it
    */
  /** Decompression-bomb guard (ADVICE-r12): the hard cap on the
    * DECODED size of one content-coding layer, enforced inside the
    * read loops of every coding (zstd ratios exceed 1000×, and
    * codings stack multiplicatively through
    * [[decodeContentCodings]] — uncapped, a KB-sized hostile body
    * expands to gigabytes in one task's ByteArrayOutputStream). 64
    * MiB is far above any legitimate single response payload in a
    * crawl corpus; exceeding it is a FAILED decode (None → flagged
    * via `CodingMeta.decoded = false`), never a throw — the crawl
    * posture for hostile input.
    */
  val MaxDecodedBytes: Long = 64L << 20

  def decodeCoding(body: Array[Byte], coding: String)
      : Option[Array[Byte]] = coding.trim.toLowerCase match {
    case "gzip" | "x-gzip" =>
      Compressed.memberPayloads(body, MaxDecodedBytes).flatMap { members =>
        if (members.exists(!_._1.crc_ok)) None
        else {
          val out = new java.io.ByteArrayOutputStream()
          members.foreach { case (_, p) => out.write(p) }
          Some(out.toByteArray)
        }
      }
    case "deflate" =>
      inflate(body, raw = false).orElse(inflate(body, raw = true))
    case "zstd" =>
      // a zero-byte body is the degenerate truncation, not an empty
      // frame sequence — gzip/deflate reject it and zstd must match
      // (review-r12: ZstdInputStream happily reads zero frames)
      if (body.isEmpty) None
      else try {
        val in = new com.github.luben.zstd.ZstdInputStream(
          new java.io.ByteArrayInputStream(body))
        try {
          val out = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          var n = in.read(buf)
          while (n >= 0) {
            out.write(buf, 0, n)
            if (out.size > MaxDecodedBytes) return None // bomb guard
            n = in.read(buf)
          }
          Some(out.toByteArray)
        } finally in.close()
      } catch { case _: java.io.IOException => None }
    case "identity" => Some(body)
    case _ => None
  }

  /** Inflate a complete zlib (raw = false) or raw-deflate stream;
    * None on malformation, truncation, or trailing garbage (a correct
    * deflate body is exactly one self-terminating stream — leftover
    * bytes mean the label lied).
    */
  private def inflate(p: Array[Byte], raw: Boolean)
      : Option[Array[Byte]] = {
    val inf = new java.util.zip.Inflater(raw)
    try {
      inf.setInput(p)
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n =
          try inf.inflate(buf)
          catch { case _: java.util.zip.DataFormatException => return None }
        if (n > 0) {
          out.write(buf, 0, n)
          if (out.size > MaxDecodedBytes) return None // bomb guard
        } else if (!inf.finished()) return None // truncated or stuck
      }
      // a zlib stream ends in its Adler-32; raw ends at final block.
      // Anything after is not this coding's data
      if (inf.getRemaining > 0) None else Some(out.toByteArray)
    } finally inf.end()
  }

  /** Decode a full `Content-Encoding` list (RFC 9110 §8.4: codings
    * are listed in the order APPLIED, so decoding runs right-to-left).
    * Stops at the first coding that fails; the meta says how far it
    * got. An absent/empty list is a clean no-op.
    */
  def decodeContentCodings(body: Array[Byte],
      contentEncoding: Option[String]): (Array[Byte], CodingMeta) = {
    val codings = contentEncoding.toSeq
      .flatMap(_.split(",")).map(_.trim.toLowerCase).filter(_.nonEmpty)
    var cur = body
    for (c <- codings.reverse) decodeCoding(cur, c) match {
      case Some(d) => cur = d
      case None => return (cur, CodingMeta(codings, decoded = false))
    }
    (cur, CodingMeta(codings, decoded = true))
  }

  /** The COMPLETE response decode (q241; VERDICT-r11 item 1 — the
    * missing story of the ingest stack): [[parseResponseDecoded]]'s
    * transfer decoding (chunked de-framing, RFC 9112 §6.1), THEN
    * content decoding (RFC 9110 §8.4 — the two layers STACK: a real
    * Common Crawl response is routinely `Transfer-Encoding: chunked`
    * over `Content-Encoding: gzip`, and handing the gzip bytes to the
    * charset/HTML tier decodes as garbage). Returns the response, the
    * fully-decoded payload, the chunked meta when chunked framing was
    * present, and the coding meta.
    */
  def parseResponseFullyDecoded(p: Array[Byte])
      : Option[(HttpResponse, Array[Byte], Option[ChunkedMeta],
        CodingMeta)] =
    parseResponseDecoded(p).map { case (r, body, chunkMeta) =>
      // the CE list rides the ONE header walk parseResponse already
      // did (review-r12: a headerAll here re-scanned the header bytes
      // per response — the same redundant-walk class review-r11
      // removed from the redirect follower)
      val (payload, codingMeta) =
        decodeContentCodings(body, r.contentEncoding)
      (r, payload, chunkMeta, codingMeta)
    }

  /** RFC 9111 §4.1 secondary cache key (T171, q261): the normalized
    * list of header FIELD NAMES a stored response's Vary declares.
    * Repeated Vary header lines are equivalent to one comma-joined
    * list (RFC 9110 §5.3 — same discipline as the T150 Content-
    * Encoding join), members trim + lowercase (field names are
    * case-insensitive), empties drop, duplicates collapse, order
    * normalizes by sort so the key is stable however the server
    * spelled it. `*` survives as a member — [[varyMatches]] gives it
    * its never-match semantics; collapsing it here would silently
    * upgrade an uncacheable response to always-cacheable.
    * Expects lowercased header names ([[statusAndHeaders]] output).
    */
  def varyKey(headers: Seq[(String, String)]): Seq[String] =
    headers.filter(_._1 == "vary")
      .flatMap(_._2.split(','))
      // Locale.ROOT (ADVICE-r13): under a Turkish-default JVM,
      // 'If-None-Match'.toLowerCase folds 'I' → 'ı' and the key stops
      // matching the request's field name — field names are ASCII.
      .map(_.trim.toLowerCase(java.util.Locale.ROOT))
      .filter(_.nonEmpty)
      .distinct.sorted

  /** RFC 9111 §4.1 match: a stored response whose Vary key is
    * `fields` may satisfy a new request iff every selected field has
    * the SAME value list in the new request as in the original one
    * (absent-in-both matches; values compare after trim — the
    * documented simplification of the spec's optional per-field
    * normalization), and a Vary of `*` NEVER matches, not even an
    * identical request. Header names in both request lists are
    * expected lowercased.
    */
  def varyMatches(fields: Seq[String],
      origReq: Seq[(String, String)],
      newReq: Seq[(String, String)]): Boolean =
    !fields.contains("*") && fields.forall { f =>
      def vals(hs: Seq[(String, String)]) =
        hs.filter(_._1 == f).map(_._2.trim)
      vals(origReq) == vals(newReq)
    }

  // ---- 206 Partial Content reassembly (T176, q266 — RFC 9110
  // §14.4/§15.3.7): large media fetches resume through byte ranges,
  // and an archive ingesting ranged captures must stitch the
  // segments back into one payload — verifying coverage, agreeing
  // overlaps, and the declared complete-length — before any digest
  // or decode tier may run.

  /** Parse a Content-Range value: `bytes first-last/complete` or
    * `bytes first-last/*` (unknown total). The unsatisfied-range
    * form (`bytes */complete`) and other units → None, as is any
    * inverted or non-numeric range, and a complete length that does
    * not exceed last-pos (§14.4: last-pos MUST be less than it).
    */
  def contentRange(v: String): Option[(Long, Long, Option[Long])] = {
    val s = v.trim
    if (!s.toLowerCase.startsWith("bytes")) return None
    val rest = s.substring(5).trim
    val slash = rest.indexOf('/')
    if (slash < 0) return None
    val range = rest.substring(0, slash).trim
    val totalS = rest.substring(slash + 1).trim
    val dash = range.indexOf('-')
    if (dash <= 0) return None
    def num(x: String): Option[Long] =
      if (x.nonEmpty && x.forall(_.isDigit))
        try Some(x.toLong) catch { case _: NumberFormatException => None }
      else None
    for {
      first <- num(range.substring(0, dash))
      last <- num(range.substring(dash + 1))
      if last >= first
      total <- totalS match {
        case "*" => Some(None)
        case t   => num(t).filter(_ > last).map(Some(_))
      }
    } yield (first, last, total)
  }

  /** One reassembly outcome: verdict ∈ complete | incomplete | gap |
    * conflict | malformed, the union coverage in bytes, how many
    * segment overlaps were absorbed, the declared complete length
    * (when any segment carried one), and the stitched payload
    * (present unless a gap/conflict/malformation made one
    * impossible or meaningless).
    */
  final case class Reassembly(
      verdict: String,
      coveredLen: Long,
      nOverlaps: Long,
      totalDeclared: Option[Long],
      body: Option[Array[Byte]])

  /** Stitch 206 segments (first, last, declaredTotal, bytes) into the
    * original payload. Rules: a segment whose byte count disagrees
    * with its range, or two segments declaring DIFFERENT complete
    * lengths, or overlapping segments whose shared bytes differ →
    * the hard verdicts (malformed / conflict — the archive must not
    * synthesize a payload nobody sent); agreeing overlaps absorb
    * (resumed downloads re-send boundary bytes routinely); a hole →
    * `gap`; contiguous from offset 0 matching the declared total →
    * `complete`; contiguous but not provably whole → `incomplete`.
    */
  def reassembleRanges(
      segs: Seq[(Long, Long, Option[Long], Array[Byte])]): Reassembly = {
    if (segs.isEmpty) return Reassembly("malformed", 0L, 0L, None, None)
    if (segs.exists { case (f, l, _, b) => l < f || b.length != l - f + 1 })
      return Reassembly("malformed", 0L, 0L, None, None)
    val totals = segs.flatMap(_._3).distinct
    if (totals.length > 1)
      return Reassembly("conflict", 0L, 0L, None, None)
    val total = totals.headOption
    val sorted = segs.sortBy(s => (s._1, s._2))
    // `gap` flags an INTERNAL hole only — a capture that starts past
    // offset 0 is a resumable suffix (incomplete), not a hole, so the
    // walk starts "covered" right before the first segment
    var end = sorted.head._1 - 1 // highest covered offset so far
    var covered = 0L
    var overlaps = 0L
    var gap = false
    val out = new java.io.ByteArrayOutputStream()
    val written = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Array[Byte])] // (first, bytes) for overlap checks
    for ((f, l, _, b) <- sorted) {
      if (f > end + 1) gap = true
      if (f <= end) {
        overlaps += 1
        // verify every overlapped byte agrees with what is already
        // stitched. Sub-range compares against each prior segment that
        // intersects [f, min(end,l)] via Arrays.mismatch (ADVICE-r13:
        // the old per-byte `written.find` was O(overlapBytes × nSegs)
        // plus a closure allocation per byte — resumed media downloads
        // re-send megabyte boundary regions). A byte of the span that
        // NO prior covers (an overlap reaching across an internal
        // hole) is a conflict, exactly as before.
        val oEnd = math.min(end, l)
        val ivs = written.iterator.flatMap { case (pf, pb) =>
          val s = math.max(f, pf)
          val e = math.min(oEnd, pf + pb.length - 1)
          if (s <= e) {
            val mm = java.util.Arrays.mismatch(
              pb, (s - pf).toInt, (e - pf + 1).toInt,
              b, (s - f).toInt, (e - f + 1).toInt)
            if (mm >= 0) return Reassembly("conflict", 0L, overlaps, total, None)
            Some((s, e))
          } else None
        }.toSeq.sorted
        var cursor = f
        for ((s, e) <- ivs) {
          if (s > cursor)
            return Reassembly("conflict", 0L, overlaps, total, None)
          cursor = math.max(cursor, e + 1)
        }
        if (cursor <= oEnd)
          return Reassembly("conflict", 0L, overlaps, total, None)
      }
      covered += math.max(0L, l - math.max(f, end + 1) + 1)
      if (l > end) {
        val from = math.max(f, end + 1)
        out.write(b, (from - f).toInt, (l - from + 1).toInt)
        end = l
      }
      written += ((f, b))
    }
    val start = sorted.head._1
    val verdict =
      if (gap) "gap"
      else if (start == 0 && total.contains(end + 1)) "complete"
      else "incomplete"
    val body = if (gap) None else Some(out.toByteArray)
    Reassembly(verdict, covered, overlaps, total, body)
  }

  /** Serialize a response with the wire body given verbatim and NO
    * implicit Content-Length (synthesis side for chunked framing,
    * q217 — a chunked response legally has no Content-Length).
    */
  def renderRaw(status: Int, reason: String,
      headers: Seq[(String, String)], wire: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes("ISO-8859-1"))
    w(s"HTTP/1.1 $status $reason\r\n")
    headers.foreach { case (k, v) => w(s"$k: $v\r\n") }
    w("\r\n")
    bos.write(wire)
    bos.toByteArray
  }

  /** Serialize a response (synthesis side for q208). */
  def render(status: Int, reason: String,
      headers: Seq[(String, String)], body: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes("ISO-8859-1"))
    w(s"HTTP/1.1 $status $reason\r\n")
    headers.foreach { case (k, v) => w(s"$k: $v\r\n") }
    w(s"Content-Length: ${body.length}\r\n")
    w("\r\n")
    bos.write(body)
    bos.toByteArray
  }
}
