package graft.text

/** RSS 2.0 + Atom feed parse (q232, T141) — the discovery channel
  * next to sitemaps (T122): real frontiers learn about new/updated
  * URLs from feeds at least as often as from sitemap files, and feed
  * pubDates drive the same recrawl scheduling q224 runs on sitemap
  * lastmod (VERDICT-r10 item 5).
  *
  * Same scanner discipline as [[Sitemap]] (single forward scan, no
  * DOM, O(output) memory, never throws, truncation-safe), extended
  * with the one capability feeds need that sitemaps do not:
  * ATTRIBUTE capture on open tags, because Atom carries its link in
  * `<link href="..."/>` rather than element text.
  *
  * Vocabulary:
  *  - **RSS 2.0**: root `rss` (the inner `channel` is transparent),
  *    entry = `item`, fields `title` / `link` (element text) /
  *    `pubDate` (RFC 822-family date).
  *  - **Atom** (RFC 4287): root `feed`, entry = `entry`, fields
  *    `title` / `link` (href attribute — the first link whose `rel`
  *    is absent or `alternate` wins, the feed-reader rule) /
  *    `published` falling back to `updated` (RFC 3339 dates, parsed
  *    by [[Sitemap.epochDay]]'s W3C-datetime validator).
  *  - Namespace prefixes strip to local names; unknown elements are
  *    ignored; entries without a link DROP (a feed entry is a link);
  *    the five XML entities + numeric charrefs decode in element
  *    text ([[Sitemap.decodeXml]]); CDATA is raw.
  *
  * Dates surface as the epoch DAY of the STATED date (the
  * [[Sitemap]] discipline — determinism wants calendar math, not
  * zone-shifted instants): RFC 822 dates accept optional weekday,
  * 1–2 digit day, 2- or 4-digit year (2-digit: 00–69 → 20xx, else
  * 19xx), optional seconds, and a zone that is GMT/UT/UTC/Z, a
  * one-letter military zone, a North-American name (EST…PDT), or a
  * ±hhmm offset; real-calendar validation; anything else → None.
  *
  * Scale shape: pure per-row work over the fetched feed payloads —
  * zero shuffle; discovered links feed T120 canonicalization and the
  * T125 politeness rollup exactly like sitemap locs.
  */
object Feeds {

  final case class Entry(
      link: String,
      title: Option[String],
      epochDay: Option[Long])

  final case class Parsed(kind: String, entries: Seq[Entry])

  private val namedZones = Set("GMT", "UT", "UTC", "Z", "EST", "EDT",
    "CST", "CDT", "MST", "MDT", "PST", "PDT")

  private val Rfc822 =
    ("^(?:([A-Za-z]{3}), )?(\\d{1,2}) ([A-Za-z]{3}) (\\d{2}|\\d{4}) " +
      "(\\d{2}):(\\d{2})(?::(\\d{2}))? ([A-Za-z]{1,3}|[+-]\\d{4})$").r

  /** Epoch day of an RFC 822/1123 date's STATED date, None if
    * invalid. RSS 2.0 inherits this grammar for `pubDate`.
    */
  def rfc822Day(s: String): Option[Long] = s.trim match {
    case Rfc822(wd, d, mon, y, h, mi, sec, zone) =>
      val mo = Dates.months.indexOf(mon) + 1
      val zoneOk = zone.head == '+' || zone.head == '-' ||
        namedZones(zone) || zone.length == 1 // military zone letter
      val wdOk = wd == null || Dates.weekdaysShort(wd)
      val hh = h.toInt
      val mm = mi.toInt
      val ss = Option(sec).map(_.toInt).getOrElse(0)
      if (mo == 0 || !zoneOk || !wdOk ||
        hh > 23 || mm > 59 || ss > 60) None
      else {
        val yr =
          if (y.length == 4) y.toInt else Dates.pivotYear(y.toInt)
        try Some(java.time.LocalDate.of(yr, mo, d.toInt).toEpochDay)
        catch { case _: java.time.DateTimeException => None }
      }
    case _ => None
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
    var field: String = null
    val text = new StringBuilder
    var link: Option[String] = None
    var title: Option[String] = None
    var date: Option[String] = None   // published / pubDate
    var dateFb: Option[String] = None // atom updated fallback
    val entries = scala.collection.mutable.ArrayBuffer.empty[Entry]

    def entryName = if (kind == "feed") "entry" else "item"

    def openElement(name: String,
        attrs: Map[String, String]): Unit = {
      if (kind == "unknown" && (name == "rss" || name == "feed"))
        kind = name
      else if (kind != "unknown" && !inEntry && name == entryName) {
        inEntry = true
        link = None; title = None; date = None; dateFb = None
      } else if (inEntry && field == null) name match {
        case "link" if kind == "feed" =>
          // Atom: href attribute; first rel-less/alternate link wins
          val rel = attrs.get("rel")
          if (link.isEmpty && (rel.isEmpty || rel.contains("alternate")))
            link = attrs.get("href")
              .map(v => Sitemap.decodeXml(v).trim).filter(_.nonEmpty)
        case "link" | "title" | "pubDate" | "published" | "updated" =>
          field = name
          text.clear()
        case _ =>
      }
    }

    def closeElement(name: String): Unit = {
      if (field != null && name == field) {
        // text runs were entity-decoded at APPEND time (an entity
        // cannot span a '<' boundary, so per-run decode ≡ whole-buffer
        // decode) while CDATA segments appended raw — decoding here
        // would wrongly decode &amp; INSIDE CDATA, which a conformant
        // parser returns literally (review-r11 finding)
        val v = text.toString.trim
        field match {
          case "link" if kind != "feed" =>
            if (link.isEmpty) link = Some(v).filter(_.nonEmpty)
          case "title" =>
            if (title.isEmpty) title = Some(v).filter(_.nonEmpty)
          case "pubDate" | "published" =>
            if (date.isEmpty) date = Some(v).filter(_.nonEmpty)
          case "updated" =>
            if (dateFb.isEmpty) dateFb = Some(v).filter(_.nonEmpty)
          case _ =>
        }
        field = null
        text.clear()
      } else if (inEntry && name == entryName) {
        inEntry = false
        field = null
        link.foreach { l =>
          val day =
            if (kind == "feed")
              date.orElse(dateFb).flatMap(Sitemap.epochDay)
            else date.flatMap(rfc822Day)
          entries += Entry(l, title, day)
        }
      }
    }

    // the Sitemap walk + a quote-aware ATTRIBUTE capture on open tags
    while (i < n) {
      val lt = xml.indexOf('<', i)
      if (lt < 0) { i = n }
      else {
        if (field != null && lt > i)
          text ++= Sitemap.decodeXml(xml.substring(i, lt))
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
          var j = lt + 1
          while (j < n && !Character.isWhitespace(xml.charAt(j)) &&
              xml.charAt(j) != '>' && xml.charAt(j) != '/') j += 1
          val name = localName(xml.substring(lt + 1, j))
          // attribute walk: name="v" / name='v', namespace-stripped,
          // first occurrence wins
          val attrs = scala.collection.mutable.Map.empty[String, String]
          var k = j
          var done = false
          var selfClosing = false
          while (k < n && !done) {
            val c = xml.charAt(k)
            if (c == '>') {
              selfClosing = k > lt && xml.charAt(k - 1) == '/'
              done = true
              k += 1
            } else if (Character.isLetter(c)) {
              val a0 = k
              while (k < n && (Character.isLetterOrDigit(xml.charAt(k))
                  || xml.charAt(k) == ':' || xml.charAt(k) == '-' ||
                  xml.charAt(k) == '_')) k += 1
              val aName = localName(xml.substring(a0, k)).toLowerCase
              var m = k
              while (m < n && Character.isWhitespace(xml.charAt(m)))
                m += 1
              if (m < n && xml.charAt(m) == '=') {
                m += 1
                while (m < n && Character.isWhitespace(xml.charAt(m)))
                  m += 1
                if (m < n &&
                    (xml.charAt(m) == '"' || xml.charAt(m) == '\'')) {
                  val q = xml.charAt(m)
                  val v0 = m + 1
                  m += 1
                  while (m < n && xml.charAt(m) != q) m += 1
                  if (!attrs.contains(aName))
                    attrs += aName -> xml.substring(v0, math.min(m, n))
                  if (m < n) m += 1
                }
                k = m
              }
            } else k += 1
          }
          if (name.nonEmpty) {
            openElement(name, attrs.toMap)
            if (selfClosing) closeElement(name)
          }
          i = k
        }
      }
    }
    Parsed(kind, entries.toSeq)
  }
}
