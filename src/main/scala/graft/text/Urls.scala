package graft.text

/** URL canonicalization (q211, T120) — the crawl-frontier dedup key.
  * A frontier that doesn't canonicalize fetches the same page under
  * `HTTP://EX.TEST:80/a/b#top`, `http://ex.test/a/./x/../b`, and
  * `http://ex.test/%61/b` three times; at 100 TB the canonical-key
  * groupBy IS the politeness and dedup backbone. Rules (RFC 3986
  * syntax-based normalization §6.2.2 + the crawl-frontier conventions
  * of the scrapy/w3lib class):
  *
  *  - scheme and host fold to lowercase; a trailing host dot drops
  *  - default ports strip (http:80, https:443); others keep
  *  - percent-encoding normalizes: unreserved octets (ALPHA / DIGIT /
  *    `-._~`) DECODE, everything else keeps its escape with UPPERCASE
  *    hex; a malformed escape (`%G1`, trailing `%`) passes through
  *    untouched (crawl archives contain them; round-tripping beats
  *    throwing)
  *  - path applies RFC 3986 §5.2.4 remove_dot_segments; an empty
  *    path becomes `/`
  *  - query parameters sort (stable, by full `k=v` text) — the
  *    frontier convention that makes `?b=2&x=1` and `?x=1&b=2` one
  *    fetch; an empty query drops its `?`
  *  - fragments drop (never sent on the wire)
  *  - userinfo passes through verbatim (rare, semantically load-
  *    bearing when present)
  *
  * Only hierarchical `scheme://` URLs canonicalize; anything else
  * (mailto:, data:, a bare path, garbage) returns None — the caller
  * decides whether that is a drop or a flag. Never throws.
  */
object Urls {

  final case class Parts(
      scheme: String,
      userinfo: Option[String],
      host: String,
      port: Option[Int],
      path: String,
      query: Option[String],
      fragment: Option[String])

  private def isUnreserved(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
      (c >= '0' && c <= '9') || c == '-' || c == '.' || c == '_' || c == '~'

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  /** Normalize percent-escapes in one component: decode unreserved,
    * uppercase the hex of everything else, pass malformed escapes
    * through untouched.
    */
  private[text] def pctNormalize(s: String): String = {
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%') {
        val h1 = if (i + 1 < s.length) hexVal(s.charAt(i + 1)) else -1
        val h2 = if (i + 2 < s.length) hexVal(s.charAt(i + 2)) else -1
        if (h1 >= 0 && h2 >= 0) {
          val v = (h1 << 4 | h2).toChar
          if (isUnreserved(v)) out += v
          else out ++= "%" + "%02X".format(h1 << 4 | h2)
          i += 3
        } else { out += c; i += 1 }
      } else { out += c; i += 1 }
    }
    out.toString
  }

  /** RFC 3986 §5.2.4 remove_dot_segments. */
  private[text] def removeDotSegments(path: String): String = {
    val out = new scala.collection.mutable.ArrayDeque[String]()
    var in = path
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../")) {
        in = "/" + in.substring(4)
        if (out.nonEmpty) out.removeLast()
      } else if (in == "/..") {
        in = "/"
        if (out.nonEmpty) out.removeLast()
      } else if (in == "." || in == "..") in = ""
      else {
        val from = if (in.startsWith("/")) 1 else 0
        val slash = in.indexOf('/', from)
        val seg = if (slash < 0) in else in.substring(0, slash)
        out.append(seg)
        in = if (slash < 0) "" else in.substring(slash)
      }
    }
    out.mkString
  }

  /** Index of the `:` ending a leading `scheme` production
    * (ALPHA *( ALPHA / DIGIT / "+" / "-" / "." )), -1 when `s` does
    * not start with one. The single scheme scanner [[parse]] and
    * [[resolve]] share — two copies of this grammar would drift.
    */
  private def schemeEnd(s: String): Int = {
    if (s.isEmpty || !Character.isLetter(s.charAt(0))) return -1
    var i = 1
    while (i < s.length && (Character.isLetterOrDigit(s.charAt(i)) ||
      s.charAt(i) == '+' || s.charAt(i) == '-' || s.charAt(i) == '.'))
      i += 1
    if (i < s.length && s.charAt(i) == ':') i else -1
  }

  /** Reassemble a [[Parts]]' authority component verbatim. */
  private def authority(p: Parts): String = {
    val sb = new StringBuilder
    p.userinfo.foreach(u => sb ++= u += '@')
    sb ++= p.host
    p.port.foreach(pt => sb += ':' ++= pt.toString)
    sb.toString
  }

  def parse(url: String): Option[Parts] = {
    val n = url.length
    var i = schemeEnd(url)
    if (i < 0) return None
    val scheme = url.substring(0, i)
    if (!url.startsWith("//", i + 1)) return None // not hierarchical
    val authStart = i + 3
    var j = authStart
    while (j < n && url.charAt(j) != '/' && url.charAt(j) != '?' &&
      url.charAt(j) != '#') j += 1
    val auth = url.substring(authStart, j)
    val (userinfo, hostPort) = auth.lastIndexOf('@') match {
      case -1 => (None, auth)
      case at => (Some(auth.substring(0, at)), auth.substring(at + 1))
    }
    val (host, port) = hostPort.lastIndexOf(':') match {
      case -1 => (hostPort, None)
      case c if hostPort.indexOf(']') > c => (hostPort, None) // [v6]
      case c =>
        val ps = hostPort.substring(c + 1)
        if (ps.isEmpty) (hostPort.substring(0, c), None)
        else if (ps.forall(_.isDigit) && ps.length <= 5 &&
          ps.toInt <= 65535) // 99999 parses as 5 digits but is no port
          (hostPort.substring(0, c), Some(ps.toInt))
        else return None
    }
    if (host.isEmpty) return None
    var k = j
    while (k < n && url.charAt(k) != '?' && url.charAt(k) != '#') k += 1
    val path = url.substring(j, k)
    var q: Option[String] = None
    if (k < n && url.charAt(k) == '?') {
      var m = k + 1
      while (m < n && url.charAt(m) != '#') m += 1
      q = Some(url.substring(k + 1, m))
      k = m
    }
    val frag = if (k < n && url.charAt(k) == '#')
      Some(url.substring(k + 1)) else None
    Some(Parts(scheme, userinfo, host, port, path, q, frag))
  }

  /** RFC 3986 §5.2 reference resolution (q220, T129) — the step
    * between link EXTRACTION (T118 hands out href attribute values:
    * absolute, scheme-relative, absolute-path, relative-with-dots,
    * query-only, fragment-only) and canonicalization: every link a
    * crawler follows resolves against its page's base URL first.
    * Textual §5.2.2 transform: a ref with its own scheme stands
    * alone; `//…` takes the base scheme; `/…` takes scheme+authority
    * with dot segments removed; a relative path merges onto the base
    * path's directory (§5.2.3); an empty path keeps the base path and
    * — only when the ref has no query — the base query. The ref's
    * fragment rides along (canonicalize drops it later). Base must be
    * hierarchical; returns None otherwise, never throws.
    */
  def resolve(base: String, ref: String): Option[String] = {
    if (schemeEnd(ref) > 0) return Some(ref)
    parse(base).map { b =>
      val (r0, frag) = ref.indexOf('#') match {
        case -1 => (ref, "")
        case h => (ref.substring(0, h), ref.substring(h))
      }
      if (r0.startsWith("//")) {
        // network-path reference: base scheme + ref authority, with
        // §5.2.2's remove_dot_segments applied to the ref's own path
        val abs = b.scheme + ":" + r0
        parse(abs) match {
          case Some(p) =>
            p.scheme + "://" + authority(p) + removeDotSegments(p.path) +
              p.query.map("?" + _).getOrElse("") + frag
          case None => abs + frag // unparseable authority: pass through
        }
      } else {
        val (rp, rq) = r0.indexOf('?') match {
          case -1 => (r0, "")
          case q => (r0.substring(0, q), r0.substring(q))
        }
        val (path, query) =
          if (rp.isEmpty) {
            // §5.2.2: empty ref path keeps the base path; the base
            // query survives only when the ref carries none
            (b.path,
              if (rq.nonEmpty) rq else b.query.map("?" + _).getOrElse(""))
          } else if (rp.startsWith("/"))
            (removeDotSegments(rp), rq)
          else {
            // §5.2.3 merge: onto the base path's directory (an empty
            // base path with an authority merges onto "/")
            val dir = b.path.lastIndexOf('/') match {
              case -1 => "/"
              case sl => b.path.substring(0, sl + 1)
            }
            (removeDotSegments(dir + rp), rq)
          }
        b.scheme + "://" + authority(b) + path + query + frag
      }
    }
  }

  def canonicalize(url: String): Option[String] = parse(url).map { p =>
    val scheme = p.scheme.toLowerCase
    val host0 = p.host.toLowerCase
    val host = if (host0.endsWith(".") && host0.length > 1)
      host0.dropRight(1) else host0
    val defaultPort = scheme match {
      case "http" => 80; case "https" => 443; case "ftp" => 21
      case _ => -1
    }
    val port = p.port.filter(_ != defaultPort)
    val path0 = removeDotSegments(pctNormalize(p.path))
    val path = if (path0.isEmpty) "/" else path0
    val query = p.query.map(_.split('&').filter(_.nonEmpty)
      .map(pctNormalize).sorted.mkString("&")).filter(_.nonEmpty)
    val sb = new StringBuilder
    sb ++= scheme ++= "://"
    p.userinfo.foreach(u => sb ++= u += '@')
    sb ++= host
    port.foreach(pt => sb += ':' ++= pt.toString)
    sb ++= path
    query.foreach(qq => sb += '?' ++= qq)
    sb.toString
  }

  /** The tracking-parameter vocabulary [[stripTracking]] removes:
    * the `utm_*` campaign family by PREFIX plus the per-platform
    * click identifiers every large crawl sees (documented subset —
    * deployment swaps in its own list the way PublicSuffix swaps in
    * the full rule file). Matching is case-insensitive on the key.
    */
  val TrackingParams: Set[String] = Set("fbclid", "gclid", "dclid",
    "msclkid", "mc_eid", "igshid", "yclid", "twclid", "wbraid",
    "gbraid", "ref_src", "spm")

  /** Canonicalize + drop tracking query parameters (q236, T145) —
    * the dedup-grade canonical key: `?utm_source=x&id=3` and
    * `?utm_source=y&id=3` are the SAME document to a crawler, and a
    * frontier that keys on the plain canonical form fetches (and a
    * dedup that keys on it stores) every campaign variant separately.
    * A parameter is dropped when its key (the part before `=`, after
    * escape normalization) is `utm_`-prefixed or in
    * [[TrackingParams]]; everything else, including the rest of the
    * canonicalization, is [[canonicalize]] verbatim. None exactly
    * when canonicalize rejects.
    */
  def stripTracking(url: String): Option[String] =
    canonicalize(url).map { cu =>
      val q = cu.indexOf('?')
      if (q < 0) cu
      else {
        val kept = cu.substring(q + 1).split('&').filter { param =>
          val key = param.indexOf('=') match {
            case -1 => param
            case e => param.substring(0, e)
          }
          val k = key.toLowerCase
          !(k.startsWith("utm_") || TrackingParams(k))
        }
        if (kept.isEmpty) cu.substring(0, q)
        else cu.substring(0, q) + "?" + kept.mkString("&")
      }
    }

  /** SURT canonical sort key (T164, VERDICT-r12 item 3) — the
    * Sort-friendly URI Reordering Transform every real WARC consumer
    * keys CDX indexes by (the webarchive-commons / pywb convention:
    * `com,example)/path?a=1`). The property that makes it THE archive
    * sort key: host labels are reversed and comma-joined, so one
    * registrable domain's records sort contiguously — `)` (0x29)
    * orders before `,` (0x2c), so a parent host's keys group
    * immediately before its subdomains'. Implemented rules (the
    * documented webarchive-commons default-canonicalizer subset):
    *
    *  - scheme, userinfo and fragment drop; host lowercases, loses a
    *    trailing dot and ONE leading `www.` label, then reverses
    *  - a non-default port survives as `:8080` after the reversed host
    *  - the path pct-normalizes, loses dot segments, lowercases, and
    *    drops a trailing slash (except the root path)
    *  - query parameters lowercase and sort (duplicates kept), empty
    *    query drops
    *
    * Reference vectors (the public SURT README / pywb canonicalize
    * examples) are pinned in SurtSpec:
    * `http://www.archive.org/` → `org,archive)/`,
    * `http://archive.org/goo/?a=2&b&a=1` → `org,archive)/goo?a=1&a=2&b`.
    * None exactly when [[parse]] rejects.
    */
  def surt(url: String): Option[String] = parse(url).map { p =>
    val scheme = p.scheme.toLowerCase
    val host0 = p.host.toLowerCase
    val host1 = if (host0.endsWith(".") && host0.length > 1)
      host0.dropRight(1) else host0
    val host = if (host1.startsWith("www.") && host1.length > 4)
      host1.substring(4) else host1
    val defaultPort = scheme match {
      case "http" => 80; case "https" => 443; case "ftp" => 21
      case _ => -1
    }
    val port = p.port.filter(_ != defaultPort)
    val path0 = removeDotSegments(pctNormalize(p.path)).toLowerCase
    val path1 = if (path0.isEmpty) "/" else path0
    val path = if (path1.length > 1 && path1.endsWith("/"))
      path1.dropRight(1) else path1
    val query = p.query.map(_.toLowerCase.split('&').filter(_.nonEmpty)
      .map(pctNormalize).sorted.mkString("&")).filter(_.nonEmpty)
    host.split('.').reverse.mkString(",") +
      port.map(":" + _).getOrElse("") + ")" + path +
      query.map("?" + _).getOrElse("")
  }

  /** Crawl-trap heuristics (q244, T153 — VERDICT-r11 gap 4: without
    * a trap gate one pathological host eats the budget allocator):
    * the per-URL, zero-shuffle checks a frontier runs BEFORE the
    * politeness rollup. Returns the (sorted) reasons a URL looks like
    * a trap; empty = clean. Deterministic, documented rules — the
    * Heritrix/StormCrawler heuristic class, thresholds swap at
    * deployment the way the tracking-param vocabulary does:
    *
    *  - `segment_run` — the same path segment ≥ 3 times CONSECUTIVELY
    *    (`/a/a/a/`): the self-referencing-relative-link explosion
    *  - `segment_loop` — a period-2 segment cycle repeated ≥ 3 times
    *    (`/a/b/a/b/a/b`): the mirror/alias loop the run rule misses
    *  - `deep_path` — more than 12 path segments: real content sits
    *    shallow; 13-deep paths are almost always generated
    *  - `param_count` — more than 8 query parameters
    *  - `dup_key` — one query key more than 3 times: the
    *    append-don't-replace filter-state explosion
    *  - `calendar` — ≥ 2 `yyyy/mm` segment pairs (year 1900–2100,
    *    month 01–12) in one path: calendar pagination compounds into
    *    unbounded future dates
    *  - `url_len` — canonical form longer than 1024 chars
    *
    * None (no verdict at all) exactly when [[canonicalize]] rejects —
    * an uncanonicalizable URL never reaches the frontier anyway.
    */
  def trapReasons(url: String): Option[Seq[String]] =
    canonicalize(url).flatMap(cu => parse(cu).map((cu, _)))
      .map { case (cu, p) =>
      val reasons = scala.collection.mutable.ArrayBuffer.empty[String]
      val segs = p.path.split('/').filter(_.nonEmpty)
      // calendar: count yyyy/mm adjacent pairs
      def isYear(s: String) = s.length == 4 && s.forall(_.isDigit) &&
        { val y = s.toInt; y >= 1900 && y <= 2100 }
      def isMonth(s: String) = (s.length == 1 || s.length == 2) &&
        s.forall(_.isDigit) && { val m = s.toInt; m >= 1 && m <= 12 }
      val calPairs = (0 until segs.length - 1)
        .count(i => isYear(segs(i)) && isMonth(segs(i + 1)))
      if (calPairs >= 2) reasons += "calendar"
      if (segs.length > 12) reasons += "deep_path"
      val params = p.query.toSeq.flatMap(_.split('&')).filter(_.nonEmpty)
      if (params.length > 8) reasons += "param_count"
      val keys = params.map(par => par.indexOf('=') match {
        case -1 => par
        case e => par.substring(0, e)
      })
      if (keys.nonEmpty &&
          keys.groupBy(identity).valuesIterator.map(_.size).max > 3)
        reasons += "dup_key"
      // period-2 cycle: a/b/a/b/a/b with a != b (checked before the
      // run rule so each gets its own name; a run is NOT a loop)
      val hasLoop = (0 to segs.length - 6).exists { i =>
        segs(i) != segs(i + 1) &&
          segs(i + 2) == segs(i) && segs(i + 3) == segs(i + 1) &&
          segs(i + 4) == segs(i) && segs(i + 5) == segs(i + 1)
      }
      if (hasLoop) reasons += "segment_loop"
      val hasRun = (0 to segs.length - 3).exists(i =>
        segs(i) == segs(i + 1) && segs(i) == segs(i + 2))
      if (hasRun) reasons += "segment_run"
      if (cu.length > 1024) reasons += "url_len"
      reasons.sorted.toSeq
    }
}
