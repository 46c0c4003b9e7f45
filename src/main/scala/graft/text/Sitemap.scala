package graft.text

/** Sitemap XML parse (q213, T122) — the discovery half of the crawl
  * frontier ([[Robots]] is the exclusion half; robots.txt `Sitemap:`
  * lines and the protocol's well-known locations feed THIS parser,
  * whose `<loc>` output feeds [[Urls.canonicalize]] and then the
  * frontier's canonical-key groupBy).
  *
  * Implements the sitemaps.org protocol (the format Common Crawl's
  * discovery layer and every production crawler consume):
  *
  *  - root `<urlset>` → page entries `<url>`, root `<sitemapindex>` →
  *    child sitemap entries `<sitemap>`; each entry carries `<loc>`
  *    (required — entries without one are dropped), `<lastmod>`,
  *    `<changefreq>`, `<priority>`
  *  - namespace prefixes are stripped (matching is on local names —
  *    real sitemaps ship `<sm:urlset xmlns:sm=…>` and bare alike)
  *  - XML text decodes the five predefined entities + numeric
  *    charrefs; CDATA sections pass through raw; comments, the XML
  *    declaration, and DOCTYPE are skipped; unknown elements are
  *    ignored (forward compatibility, same posture as RFC 9309 §2.2.4)
  *  - `<lastmod>` validates as W3C datetime (YYYY, YYYY-MM,
  *    YYYY-MM-DD, or date`T`time with MANDATORY timezone) including
  *    real-calendar checks (2024-13-01 and 2023-02-30 are invalid);
  *    the surfaced value is the epoch day of the STATED date — the
  *    sitemaps convention attributes freshness to the local date, not
  *    a tz-shifted instant
  *  - `<priority>` is valid iff it parses as a decimal in [0.0, 1.0];
  *    `<changefreq>` iff in the protocol's seven-word vocabulary
  *  - the protocol caps a file at 50,000 entries: past the cap the
  *    scan continues (well-formedness still checked) but entries are
  *    dropped and `truncated` is set — a silent cap would read as
  *    "covered everything" at 100 TB
  *
  * Single forward scan, O(output) memory, never throws — crawl-served
  * sitemaps are exactly as malformed as every other crawl payload.
  */
object Sitemap {

  final case class Entry(
      loc: String,
      lastmod: Option[String],
      changefreq: Option[String],
      priority: Option[String]) {
    def lastmodEpochDay: Option[Long] = lastmod.flatMap(epochDay)
    def changefreqValid: Boolean = changefreq.exists(Frequencies.contains)
    def priorityValid: Boolean = priority.exists { p =>
      p.toDoubleOption.exists(v => v >= 0.0 && v <= 1.0)
    }
  }

  final case class Parsed(
      kind: String, // "urlset" | "sitemapindex" | "unknown"
      entries: Seq[Entry],
      truncated: Boolean)

  val Frequencies: Set[String] =
    Set("always", "hourly", "daily", "weekly", "monthly", "yearly", "never")

  /** sitemaps.org: at most 50,000 entries per file. */
  val MaxEntries = 50000

  private val FieldNames = Set("loc", "lastmod", "changefreq", "priority")

  /** XML 1.0 text decode: the five predefined entities + decimal/hex
    * character references. A reference that does not terminate, names
    * nothing, or encodes an invalid code point stays literal text —
    * round-tripping beats throwing on crawl-served XML.
    */
  private[text] def decodeXml(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c != '&') { out += c; i += 1 }
      else {
        val semi = s.indexOf(';', i + 1)
        if (semi < 0 || semi > i + 12) { out += c; i += 1 }
        else {
          val body = s.substring(i + 1, semi)
          val dec: Option[String] = body match {
            case "amp" => Some("&")
            case "lt" => Some("<")
            case "gt" => Some(">")
            case "quot" => Some("\"")
            case "apos" => Some("'")
            case b if b.startsWith("#") =>
              val (digits, radix) =
                if (b.length > 1 && (b.charAt(1) | 0x20) == 'x')
                  (b.substring(2), 16)
                else (b.substring(1), 10)
              if (digits.isEmpty ||
                  !digits.forall(ch => Character.digit(ch, radix) >= 0))
                None
              else {
                try {
                  val cp = java.lang.Long.parseLong(digits, radix)
                  if (cp > 0x10ffff || (cp >= 0xd800 && cp <= 0xdfff)) None
                  else Some(new String(Character.toChars(cp.toInt)))
                } catch { case _: NumberFormatException => None }
              }
            case _ => None
          }
          dec match {
            case Some(t) => out ++= t; i = semi + 1
            case None => out += c; i += 1
          }
        }
      }
    }
    out.toString
  }

  private val DatePart =
    "^(\\d{4})(?:-(\\d{2})(?:-(\\d{2}))?)?".r
  private val TimePart =
    "^T\\d{2}:\\d{2}(?::\\d{2}(?:\\.\\d+)?)?(?:Z|[+-]\\d{2}:\\d{2})$".r

  /** Epoch day of a W3C datetime's stated date, None if invalid. */
  def epochDay(s: String): Option[Long] = {
    val t = s.trim
    DatePart.findFirstMatchIn(t).flatMap { m =>
      val rest = t.substring(m.end)
      val timeOk = rest.isEmpty || TimePart.findFirstIn(rest).isDefined
      // a time requires the full date (W3C: no YYYY-MMThh:mm)
      val dateComplete = m.group(3) != null
      if (!timeOk || (rest.nonEmpty && !dateComplete)) None
      else {
        val y = m.group(1).toInt
        val mo = Option(m.group(2)).map(_.toInt).getOrElse(1)
        val d = Option(m.group(3)).map(_.toInt).getOrElse(1)
        try Some(java.time.LocalDate.of(y, mo, d).toEpochDay)
        catch { case _: java.time.DateTimeException => None }
      }
    }
  }

  private def localName(raw: String): String = {
    val c = raw.indexOf(':')
    if (c >= 0) raw.substring(c + 1) else raw
  }

  def parse(xml: String): Parsed = {
    val n = xml.length
    var i = 0
    var kind = "unknown"
    var inEntry = false
    var field: String = null // the open loc/lastmod/… element, if any
    val text = new StringBuilder
    var loc: Option[String] = None
    var lastmod: Option[String] = None
    var changefreq: Option[String] = None
    var priority: Option[String] = None
    val entries = scala.collection.mutable.ArrayBuffer.empty[Entry]
    var truncated = false

    // entry boundaries are tracked by NAME, not nesting depth: a
    // depth counter desyncs permanently on the first unclosed child
    // element (<br> inside a <url>) and silently drops every
    // subsequent entry — name-based tracking keeps the walk in sync
    // on exactly the malformed input this parser promises to survive
    def openElement(name: String): Unit = {
      if (kind == "unknown" &&
          (name == "urlset" || name == "sitemapindex")) kind = name
      else if (!inEntry && (name == "url" || name == "sitemap")) {
        inEntry = true
        loc = None; lastmod = None; changefreq = None; priority = None
      } else if (inEntry && field == null && FieldNames.contains(name)) {
        field = name
        text.clear()
      }
    }

    def closeElement(name: String): Unit = {
      if (field != null && name == field) {
        val v = decodeXml(text.toString).trim
        field match {
          case "loc" => loc = Some(v).filter(_.nonEmpty)
          case "lastmod" => lastmod = Some(v).filter(_.nonEmpty)
          case "changefreq" => changefreq = Some(v).filter(_.nonEmpty)
          case "priority" => priority = Some(v).filter(_.nonEmpty)
        }
        field = null
        text.clear()
      } else if (inEntry && (name == "url" || name == "sitemap")) {
        inEntry = false
        field = null
        loc.foreach { l =>
          if (entries.length < MaxEntries)
            entries += Entry(l, lastmod, changefreq, priority)
          else truncated = true
        }
      }
    }

    while (i < n) {
      val lt = xml.indexOf('<', i)
      if (lt < 0) { i = n }
      else {
        if (field != null && lt > i) text ++= xml.substring(i, lt)
        if (xml.startsWith("<!--", lt)) {
          val e = xml.indexOf("-->", lt + 4)
          i = if (e < 0) n else e + 3
        } else if (xml.startsWith("<![CDATA[", lt)) {
          val e = xml.indexOf("]]>", lt + 9)
          val end = if (e < 0) n else e
          if (field != null) text ++= xml.substring(lt + 9, end)
          i = if (e < 0) n else e + 3
        } else if (xml.startsWith("<?", lt)) {
          val e = xml.indexOf("?>", lt + 2)
          i = if (e < 0) n else e + 2
        } else if (xml.startsWith("<!", lt)) {
          val e = xml.indexOf('>', lt)
          i = if (e < 0) n else e + 1
        } else if (xml.startsWith("</", lt)) {
          val e = xml.indexOf('>', lt)
          val end = if (e < 0) n else e
          val name = localName(
            xml.substring(lt + 2, end).trim.takeWhile(!_.isWhitespace))
          if (name.nonEmpty) closeElement(name)
          i = if (e < 0) n else e + 1
        } else {
          // open tag: name up to whitespace / '/' / '>'; then a
          // quote-aware attribute walk to the closing '>'
          var j = lt + 1
          while (j < n && !Character.isWhitespace(xml.charAt(j)) &&
              xml.charAt(j) != '>' && xml.charAt(j) != '/') j += 1
          val name = localName(xml.substring(lt + 1, j))
          var quote: Char = 0
          var selfClosing = false
          var k = j
          var done = false
          while (k < n && !done) {
            val c = xml.charAt(k)
            if (quote != 0) { if (c == quote) quote = 0 }
            else if (c == '"' || c == '\'') quote = c
            else if (c == '>') {
              selfClosing = k > lt && xml.charAt(k - 1) == '/'
              done = true
            }
            k += 1
          }
          if (name.nonEmpty) {
            openElement(name)
            if (selfClosing) closeElement(name)
          }
          i = k
        }
      }
    }
    Parsed(kind, entries.toSeq, truncated)
  }

  /** Result of a recursive sitemap-tree walk ([[crawlTree]]). Counters
    * over dropped work are explicit (the no-silent-caps discipline):
    * a frontier reading `truncated`/`nDepthHits` knows coverage was
    * bounded, it never reads "covered everything".
    */
  final case class TreeResult(
      rootKind: String,      // parse kind of the root ("missing" if
                             // the root itself never fetched)
      nVisited: Int,         // sitemap files fetched AND parsed
      entries: Seq[Entry],   // page entries across every urlset
      nCycles: Int,          // child locs already seen (cycle guard)
      nMissing: Int,         // locs the fetch seam had nothing for
      nDepthHits: Int,       // children past maxDepth, never fetched
      nUnknown: Int,         // unresolvable locs + non-sitemap roots
      truncated: Boolean)    // stopped at maxSitemaps with work left,
                             // OR some file hit the per-file
                             // 50,000-entry cap (Parsed.truncated)

  /** Sitemap-INDEX recursion (q243, T152 — VERDICT-r11 item 3 of the
    * north-star gaps: [[parse]] distinguishes `sitemapindex` from
    * `urlset` but nothing followed the index's child locs): walk the
    * tree from `root` — fetch → parse → child `<loc>`s RESOLVE
    * against the CURRENT sitemap's URL (T129; relative locs are
    * common) → canonicalize (T120) → recurse — collecting every
    * urlset entry, with the three guards a real frontier needs:
    *
    *  - a SEEN set on canonical URLs (cycle guard — index files that
    *    reference each other otherwise walk forever)
    *  - a depth cap (the protocol says an index MUST NOT reference
    *    another index; real crawls see 2-3 levels anyway, so the cap
    *    is a guard, not a parser rule)
    *  - a total-files cap (one hostile index can declare 50,000
    *    children; `truncated` surfaces the cut)
    *
    * Scale shape: per-HOST work like robots (T121) — the frontier
    * amortizes one tree walk across every page of the host; the walk
    * is bounded by maxSitemaps × 50,000 entries regardless of what
    * the host serves.
    */
  def crawlTree(root: String, fetch: String => Option[String],
      maxDepth: Int = 3, maxSitemaps: Int = 1000): TreeResult = {
    val rootC = Urls.canonicalize(root).getOrElse(root)
    val seen = scala.collection.mutable.Set(rootC)
    val stack = scala.collection.mutable.Stack((rootC, 0))
    val out = scala.collection.mutable.ArrayBuffer.empty[Entry]
    var rootKind = "missing"
    var nVisited = 0
    var nCycles = 0
    var nMissing = 0
    var nDepthHits = 0
    var nUnknown = 0
    var entryCapHit = false
    while (stack.nonEmpty && nVisited < maxSitemaps) {
      val (url, depth) = stack.pop()
      fetch(url) match {
        case None => nMissing += 1
        case Some(xml) =>
          nVisited += 1
          val parsed = parse(xml)
          if (url == rootC && rootKind == "missing") rootKind = parsed.kind
          // a file cut at the 50,000-entry cap must surface in the
          // TREE result too — discarding the per-file flag here would
          // be exactly the silent "covered everything" misread the
          // TreeResult contract forbids (review-r12)
          if (parsed.truncated) entryCapHit = true
          parsed.kind match {
            case "urlset" => out ++= parsed.entries
            case "sitemapindex" =>
              parsed.entries.foreach { e =>
                Urls.resolve(url, e.loc).flatMap(Urls.canonicalize) match {
                  case Some(child) =>
                    // depth check BEFORE the seen set: a depth-capped
                    // child must stay reachable if a later (shallower)
                    // path references it — marking it seen here would
                    // miscount the legal revisit as a cycle and lose
                    // the subtree (review-r12: sitemap trees are DAGs,
                    // not trees)
                    if (depth + 1 > maxDepth) nDepthHits += 1
                    else if (!seen.add(child)) nCycles += 1
                    else stack.push((child, depth + 1))
                  case None => nUnknown += 1
                }
              }
            case _ => nUnknown += 1
          }
      }
    }
    TreeResult(rootKind, nVisited, out.toSeq, nCycles, nMissing,
      nDepthHits, nUnknown, truncated = stack.nonEmpty || entryCapHit)
  }
}
