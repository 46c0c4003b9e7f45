package graft.multimodal

/** HTTP revisit validators — the RFC 9111 conditional-GET decision
  * (q231, T140). A production frontier does not re-fetch every URL on
  * every cycle: the cached response's caching metadata decides, per
  * URL, whether to SKIP (still fresh), REVALIDATE (stale but the
  * server gave a validator — send If-None-Match / If-Modified-Since
  * and expect 304 most of the time), or FETCH (no usable metadata, or
  * reuse forbidden). q224 schedules recrawl from sitemap freshness
  * declarations; this is the other half — the origin's own cache
  * contract (VERDICT-r10 item 4).
  *
  * Implemented semantics (RFC 9111 unless noted):
  *
  *  - **Freshness lifetime** (§4.2.1, first match wins):
  *    `s-maxage` (shared caches — a crawler is one), else `max-age`,
  *    else `Expires − Date` (both HTTP-dates; an unparsable Expires
  *    is treated as already expired, §5.3), else the §4.2.2 heuristic
  *    `(Date − Last-Modified) / 10` (the de-facto 10% rule), else 0.
  *  - **Response age**: the caller passes `ageS` — seconds since the
  *    response was stored (the frontier knows its fetch time; the
  *    Age-header/date-correction algebra of §4.2.3 collapses to this
  *    for a cache that stamps entries itself).
  *  - **Decision** (§5.2.2): `no-store` → fetch (the entry must not
  *    be reused at all); `no-cache` → revalidate regardless of
  *    freshness (validator present) else fetch; fresh (age <
  *    lifetime) → skip; stale → revalidate with `If-None-Match`
  *    (ETag present — the stronger validator, §4.3.2 prefers it),
  *    else `If-Modified-Since` (Last-Modified present), else fetch.
  *    `must-revalidate` changes nothing for a crawler (stale already
  *    revalidates; it never serves stale).
  *  - **Cache-Control parse** (RFC 9110 §5.6.2 ABNF subset):
  *    comma-split directives, case-insensitive names, optional
  *    `=value` with quoted-string support (commas inside quotes do
  *    not split); a malformed delta-seconds value makes THAT
  *    directive unusable (treated as absent — conservative: the
  *    entry falls through to the next lifetime source), the rest of
  *    the header still applies.
  *  - **HTTP-date parse** (RFC 9110 §5.6.7): all three mandatory
  *    formats — IMF-fixdate `Sun, 06 Nov 1994 08:49:37 GMT`, obsolete
  *    RFC 850 `Sunday, 06-Nov-94 08:49:37 GMT` (2-digit year: 00–69 →
  *    20xx, 70–99 → 19xx, the POSIX pivot), and asctime
  *    `Sun Nov  6 08:49:37 1994` (day-of-month space-padded). Real
  *    calendar validation (java.time, exact integer epoch seconds);
  *    the weekday token must be syntactically valid but is not
  *    cross-checked against the date (RFC 9110: recipients SHOULD
  *    ignore it). Anything else → None, never a throw.
  *
  * Pure per-row header logic over the T117 walk's extracted headers —
  * zero shuffle; at 100 TB this runs beside the politeness gate in
  * the same narrow map over the crawl store.
  */
object Revisit {

  final case class Decision(
      action: String,     // skip | revalidate | fetch
      validator: String,  // if-none-match | if-modified-since | none
      lifetimeS: Long,    // computed freshness lifetime (seconds)
      heuristic: Boolean) // lifetime came from the 10% heuristic

  import graft.text.Dates

  private val ImfFixdate =
    "^([A-Za-z]{3}), (\\d{2}) ([A-Za-z]{3}) (\\d{4}) (\\d{2}):(\\d{2}):(\\d{2}) GMT$".r
  private val Rfc850 =
    "^([A-Za-z]+), (\\d{2})-([A-Za-z]{3})-(\\d{2}) (\\d{2}):(\\d{2}):(\\d{2}) GMT$".r
  private val Asctime =
    "^([A-Za-z]{3}) ([A-Za-z]{3}) ([ \\d]\\d) (\\d{2}):(\\d{2}):(\\d{2}) (\\d{4})$".r

  private def epochSecond(y: Int, monName: String, d: Int,
      h: Int, mi: Int, sec: Int): Option[Long] = {
    val mo = Dates.months.indexOf(monName) + 1
    if (mo == 0) return None
    try Some(java.time.LocalDateTime
      .of(y, mo, d, h, mi, sec)
      .toEpochSecond(java.time.ZoneOffset.UTC))
    catch { case _: java.time.DateTimeException => None }
  }

  /** Parse an HTTP-date (all three RFC 9110 §5.6.7 formats) to epoch
    * seconds UTC; None on anything malformed.
    */
  def parseHttpDate(s: String): Option[Long] = s.trim match {
    case ImfFixdate(wd, d, mon, y, h, mi, sec)
        if Dates.weekdaysShort(wd) =>
      epochSecond(y.toInt, mon, d.toInt, h.toInt, mi.toInt, sec.toInt)
    case Rfc850(wd, d, mon, yy, h, mi, sec)
        if Dates.weekdaysLong(wd) =>
      epochSecond(Dates.pivotYear(yy.toInt), mon, d.toInt, h.toInt,
        mi.toInt, sec.toInt)
    case Asctime(wd, mon, d, h, mi, sec, y)
        if Dates.weekdaysShort(wd) =>
      epochSecond(y.toInt, mon, d.trim.toInt, h.toInt, mi.toInt,
        sec.toInt)
    case _ => None
  }

  /** Parse a Cache-Control value into directive → optional argument
    * (names lowercased; quoted-string arguments unquoted, commas
    * inside quotes preserved). First occurrence of a directive wins.
    */
  def parseCacheControl(v: String): Map[String, Option[String]] = {
    val out = scala.collection.mutable.LinkedHashMap
      .empty[String, Option[String]]
    var i = 0
    val n = v.length
    while (i < n) {
      // one directive: token [ "=" ( token / quoted-string ) ]
      while (i < n && (v.charAt(i) == ',' || v.charAt(i).isWhitespace))
        i += 1
      val s0 = i
      while (i < n && v.charAt(i) != '=' && v.charAt(i) != ',') i += 1
      val name = v.substring(s0, i).trim.toLowerCase
      var arg: Option[String] = None
      if (i < n && v.charAt(i) == '=') {
        i += 1
        if (i < n && v.charAt(i) == '"') {
          val sb = new StringBuilder
          i += 1
          while (i < n && v.charAt(i) != '"') {
            if (v.charAt(i) == '\\' && i + 1 < n) { // quoted-pair
              sb += v.charAt(i + 1); i += 2
            } else { sb += v.charAt(i); i += 1 }
          }
          if (i < n) i += 1 // closing quote
          arg = Some(sb.toString)
        } else {
          val a0 = i
          while (i < n && v.charAt(i) != ',') i += 1
          arg = Some(v.substring(a0, i).trim)
        }
      }
      if (name.nonEmpty && !out.contains(name)) out += name -> arg
    }
    out.toMap
  }

  /** Non-negative delta-seconds grammar (Cache-Control max-age /
    * s-maxage values AND Retry-After's first form — one copy,
    * review-r11: a drifted duplicate in Redirects had a different
    * digit cap).
    */
  private[multimodal] def deltaSecondsOf(s: String): Option[Long] =
    if (s.nonEmpty && s.forall(_.isDigit) && s.length <= 10)
      Some(s.toLong)
    else None

  private def deltaSeconds(a: Option[String]): Option[Long] =
    a.flatMap(deltaSecondsOf)

  /** The conditional-GET decision for one cached response.
    *
    * @param cacheControl the Cache-Control header values (repeats
    *                     legal — they concatenate per RFC 9110 §5.3)
    * @param dateS        parsed Date header (epoch s), if any
    * @param expiresRaw   raw Expires value (an unparsable one means
    *                     "already expired", not "absent")
    * @param lastModS     parsed Last-Modified (epoch s), if any
    * @param etag         ETag value, if any
    * @param ageS         seconds since the frontier stored the entry
    */
  def decide(cacheControl: Seq[String], dateS: Option[Long],
      expiresRaw: Option[String], lastModS: Option[Long],
      etag: Option[String], ageS: Long): Decision = {
    val cc = parseCacheControl(cacheControl.mkString(","))
    val validator =
      if (etag.isDefined) "if-none-match"
      else if (lastModS.isDefined) "if-modified-since"
      else "none"
    def revalidateOrFetch(lifetime: Long, heur: Boolean): Decision =
      if (validator == "none") Decision("fetch", "none", lifetime, heur)
      else Decision("revalidate", validator, lifetime, heur)

    if (cc.contains("no-store")) return Decision("fetch", "none", 0L,
      heuristic = false)
    if (cc.contains("no-cache")) return revalidateOrFetch(0L,
      heur = false)

    val (lifetime, heur) =
      deltaSeconds(cc.get("s-maxage").flatten).map((_, false))
        .orElse(deltaSeconds(cc.get("max-age").flatten).map((_, false)))
        .orElse(expiresRaw.map { e =>
          // §5.3: invalid Expires (e.g. "0") = already expired
          (for { exp <- parseHttpDate(e); d <- dateS }
            yield math.max(0L, exp - d)).getOrElse(0L) -> false
        })
        .orElse(for { d <- dateS; lm <- lastModS if d >= lm }
          yield (d - lm) / 10 -> true)
        .getOrElse((0L, false))

    if (ageS < lifetime) Decision("skip", "none", lifetime, heur)
    else revalidateOrFetch(lifetime, heur)
  }

  /** Production entry: the decision straight off a cached raw HTTP
    * response (the T117 header walk extracts everything; the frontier
    * supplies only the entry age).
    */
  def decideFromResponse(p: Array[Byte], ageS: Long): Option[Decision] =
    Http.parseResponse(p).map { _ =>
      def one(h: String) = Http.headerAll(p, h).headOption
      decide(Http.headerAll(p, "Cache-Control"),
        one("Date").flatMap(parseHttpDate),
        one("Expires"),
        one("Last-Modified").flatMap(parseHttpDate),
        one("ETag"), ageS)
    }

  // ---- entity-tag comparison (T175, q265 — RFC 9110 §8.8.3) ----
  //
  // The conditional-GET loop above sends If-None-Match with the
  // stored ETag verbatim; these give the COMPARISON side its spec
  // semantics: a weak tag (`W/"x"`) validates semantic equivalence,
  // not byte identity, and §13.1.2 mandates the WEAK comparison for
  // If-None-Match — so `W/"x"` vs `"x"` IS a match (304, keep the
  // cached body) while a byte-exact use (If-Match, Range preconditions)
  // requires the STRONG comparison where any weak side fails.

  /** One parsed entity-tag: the weakness flag + the opaque-tag's
    * content (without the surrounding DQUOTEs).
    */
  final case class ETag(weak: Boolean, opaque: String)

  /** Parse one entity-tag: `"x"` or `W/"x"` (§8.8.3 ABNF; etagc is
    * any VCHAR except DQUOTE plus obs-text — commas and spaces
    * INSIDE the quotes are legal, which is why If-None-Match cannot
    * be comma-split naively). Unquoted or unterminated → None.
    */
  def parseETag(s0: String): Option[ETag] = {
    val s = s0.trim
    val (weak, rest) =
      if (s.startsWith("W/")) (true, s.substring(2)) else (false, s)
    if (rest.length >= 2 && rest.charAt(0) == '"' &&
        rest.charAt(rest.length - 1) == '"' &&
        rest.indexOf('"', 1) == rest.length - 1)
      Some(ETag(weak, rest.substring(1, rest.length - 1)))
    else None
  }

  /** §8.8.3.2: strong comparison — both strong AND same opaque;
    * weak comparison — same opaque, weakness ignored.
    */
  def etagMatches(a: ETag, b: ETag, strong: Boolean): Boolean =
    (!strong || (!a.weak && !b.weak)) && a.opaque == b.opaque

  /** Parse an If-None-Match / If-Match field value: `*` (Left) or
    * the listed entity-tags (Right). The scan walks quoted regions
    * so a comma INSIDE an opaque-tag never splits; a malformed
    * member is skipped (conservative: an unparseable tag can never
    * match, and the rest of the header still applies — the
    * Cache-Control directive discipline above).
    */
  def parseETagList(v: String): Either[Unit, Seq[ETag]] = {
    val s = v.trim
    if (s == "*") return Left(())
    val out = scala.collection.mutable.ArrayBuffer.empty[ETag]
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == ',' || Character.isWhitespace(c)) i += 1
      else {
        // one candidate member: optional W/, then a quoted region
        val start = i
        if (s.startsWith("W/", i)) i += 2
        if (i < s.length && s.charAt(i) == '"') {
          val close = s.indexOf('"', i + 1)
          if (close < 0) i = s.length // unterminated: drop the tail
          else {
            i = close + 1
            parseETag(s.substring(start, i)).foreach(out += _)
          }
        } else {
          // malformed member: skip to the next comma
          val nc = s.indexOf(',', i)
          i = if (nc < 0) s.length else nc + 1
        }
      }
    }
    Right(out.toSeq)
  }

  /** The §13.1.2 If-None-Match evaluation against the stored entity:
    * `*` matches whenever ANY representation is stored; otherwise
    * the listed tags compare WEAKLY against the stored tag. True →
    * the server answers 304 and the crawler keeps its cached body.
    */
  def ifNoneMatchHits(fieldValue: String, stored: Option[ETag])
      : Boolean = parseETagList(fieldValue) match {
    case Left(_)     => stored.isDefined
    case Right(tags) =>
      stored.exists(st => tags.exists(etagMatches(_, st, strong = false)))
  }
}
