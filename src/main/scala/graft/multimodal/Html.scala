package graft.multimodal

/** HTML → text extraction (q209) — the fourth story of the
  * crawl-ingest stack: gzip member walk (T104) → WARC record parse
  * (T115) → HTTP payload (T117) → THIS. A crawl `text/html` payload
  * becomes a document only after markup stripping, and the stripping
  * rules are what separate a usable corpus from tag soup: script/
  * style/template payloads must vanish (they are code, not prose),
  * comments and declarations must vanish, entities must decode
  * (`&amp;X` IS the text `&X`), block-level boundaries must become
  * line boundaries (so the line-frequency boilerplate tier, T113/q204,
  * sees real lines), and inline markup must NOT split words
  * (`<b>re</b>read` is one word). This is the Trafilatura/jusText
  * extraction class re-expressed as a single-pass JVM scanner —
  * no DOM is built; memory is O(output), and the scan never throws
  * on truncated or malformed input (the container-tier discipline:
  * a crawl archive WILL contain every possible way to be wrong).
  *
  * Strictness deltas, documented: entity references require the
  * terminating `;` (the HTML5 legacy-without-semicolon list is a
  * compat shim for hand-typed pages; crawl extraction wants the
  * unambiguous grammar) — a bare `&amp` stays literal. Numeric
  * references beyond U+10FFFF or in the surrogate range decode to
  * U+FFFD exactly as browsers do. A `<` not opening a tag, comment,
  * or declaration is literal text (browser behavior). RAWTEXT
  * elements (script/style/noscript/template/textarea) skip to their
  * matching case-insensitive close tag; an unterminated one consumes
  * to EOF — truncation degrades, never throws.
  */
object Html {

  final case class Extracted(
      title: Option[String], // <title> RCDATA, decoded + collapsed
      text: String,          // one line per block run, collapsed
      nLinks: Int,           // <a> elements carrying an href attribute
      nTags: Int,            // open/self-closing tags (not closers,
                             // comments, or declarations)
      metas: Seq[(String, String)] = Nil, // <meta name= content=> pairs
                             // (lowered name, entity-decoded content),
                             // capped at 64 — the robots-directive feed
                             // for the T127 indexability gate. Metas
                             // inside comments/rawtext never appear
                             // here (the scanner already skips them)
      nNofollow: Int = 0,    // href links whose rel tokens include
                             // nofollow (token split on space/comma)
      hrefs: Seq[String] = Nil, // href values of <a> links in document
                             // order, entity-decoded, capped at 256 —
                             // the T129 link-graph feed (nLinks keeps
                             // the uncapped count)
      blocks: Seq[Block] = Nil, // the text lines AS BLOCKS, each with
                             // its anchor-text char count — the T132
                             // content-extraction feed. text above ==
                             // blocks.map(_.text).mkString("\n")
      feeds: Seq[String] = Nil, // <link rel=alternate type=rss/atom>
                             // href values (decoded, capped at 16) —
                             // the T147 feed-autodiscovery capture
      canonical: Option[String] = None, // the FIRST <link
                             // rel=canonical href> value (decoded,
                             // trimmed, non-empty) — T169: the page's
                             // self-declared dedup key. Later
                             // canonical links are ignored (the
                             // documented search-engine rule when a
                             // page contradicts itself: first wins,
                             // matching the <base> discipline); rel
                             // is a space/comma token list so
                             // rel="canonical nofollow" still counts
      alternates: Seq[(String, String)] = Nil, // <link rel=alternate
                             // hreflang=L href=H> pairs in document
                             // order (lang tag lowered + trimmed,
                             // href decoded), capped at 32 — T170:
                             // the language-variant cluster feed for
                             // parallel-corpus mining. Entries with
                             // an empty lang or href never appear
      base: Option[String] = None) // the FIRST <base href> value
                             // (decoded; later base tags are ignored,
                             // the HTML5 rule) — T151: the document
                             // base every relative href/feed URL
                             // resolves against; resolving against
                             // the page URL when a <base> is present
                             // mis-keys every relative link
                             // (VERDICT-r11 item 3)

  /** One rendered block (text line) with the count of its non-
    * whitespace characters that sat inside an href-bearing `<a>` —
    * the numerator of the jusText/boilerpipe link-density feature.
    */
  final case class Block(text: String, linkChars: Int)

  /** Elements whose character data is NOT text: consumed raw up to the
    * matching close tag, no entity processing (script bodies contain
    * `&&` and `<p>` string literals that must not resurface as prose).
    */
  private val rawText = Set("script", "style", "noscript", "template",
    "textarea")

  /** Elements whose open OR close tag ends the current text line.
    * Inline elements (a, b, i, em, span, code, …) are the complement:
    * they contribute no separator at all, so markup never splits a
    * word and `foo<b>bar</b>` reads "foobar" exactly as rendered.
    */
  private val block = Set("html", "head", "body", "p", "div", "section",
    "article", "header", "footer", "main", "aside", "nav", "h1", "h2",
    "h3", "h4", "h5", "h6", "ul", "ol", "li", "dl", "dt", "dd", "table",
    "thead", "tbody", "tfoot", "tr", "td", "th", "caption", "blockquote",
    "pre", "hr", "br", "form", "fieldset", "figure", "figcaption",
    "address", "center")

  private val named = Map("amp" -> "&", "lt" -> "<", "gt" -> ">",
    "quot" -> "\"", "apos" -> "'", "nbsp" -> " ")

  /** rel attribute token separator — compiled once; the per-link scan
    * is the hot path and String.split would recompile it per <a> tag.
    */
  private val relSep = java.util.regex.Pattern.compile("[\\s,]+")

  /** Decode one entity reference starting at `i` (which points at the
    * `&`). Returns (decoded text, next index); a reference that does
    * not terminate in `;` within 32 chars, or names nothing, is
    * literal text — return the `&` alone and let the scan continue.
    */
  private def entity(s: String, i: Int): (String, Int) = {
    val semi = s.indexOf(';', i + 1)
    if (semi < 0 || semi > i + 32) return ("&", i + 1)
    val body = s.substring(i + 1, semi)
    if (body.startsWith("#")) {
      val (digits, radix) =
        if (body.length > 1 && (body.charAt(1) == 'x' || body.charAt(1) == 'X'))
          (body.substring(2), 16)
        else (body.substring(1), 10)
      // parseLong accepts a leading sign; a signed charref is not a
      // charref — require every char be a digit of the radix
      if (digits.isEmpty ||
          !digits.forall(ch => Character.digit(ch, radix) >= 0))
        return ("&", i + 1)
      try {
        val cp = java.lang.Long.parseLong(digits, radix)
        // out-of-range / surrogate / NUL → U+FFFD, the browser rule
        // (HTML5 null-character-reference; a literal 0x00 would plant
        // the artifact class ab8c4c0 scrubbed — ADVICE r10)
        if (cp > 0x10ffff || cp == 0L || (cp >= 0xd800 && cp <= 0xdfff))
          ("�", semi + 1)
        else (new String(Character.toChars(cp.toInt)), semi + 1)
      } catch { case _: NumberFormatException => ("&", i + 1) }
    } else named.get(body) match {
      case Some(t) => (t, semi + 1)
      case None    => ("&", i + 1)
    }
  }

  /** Case-insensitive test that `s(i..)` starts the close tag of
    * `name` — `</name` followed by whitespace, `/`, `>`, or EOF.
    */
  private def atCloseOf(s: String, i: Int, name: String): Boolean = {
    if (i + 2 + name.length > s.length) return false
    if (s.charAt(i) != '<' || s.charAt(i + 1) != '/') return false
    var k = 0
    while (k < name.length) {
      if (Character.toLowerCase(s.charAt(i + 2 + k)) != name.charAt(k))
        return false
      k += 1
    }
    val j = i + 2 + name.length
    j >= s.length || s.charAt(j) == '>' || s.charAt(j) == '/' ||
      Character.isWhitespace(s.charAt(j))
  }

  def extractText(html: String): Extracted = {
    val n = html.length
    val out = new StringBuilder   // raw text with \n block markers
    var title: Option[String] = None
    var nLinks = 0
    var nTags = 0
    var nNofollow = 0
    val metas = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val hrefs = scala.collection.mutable.ArrayBuffer.empty[String]
    val feeds = scala.collection.mutable.ArrayBuffer.empty[String]
    var canonical: Option[String] = None
    val alternates =
      scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var docBase: Option[String] = None
    // per-line anchor-text accounting (T132 link density): chars
    // emitted while inside an href-bearing <a> are link chars
    val lineLinks = scala.collection.mutable.ArrayBuffer.empty[Int]
    var curLink = 0
    var anchorDepth = 0
    def newline(): Unit = { lineLinks += curLink; curLink = 0 }
    def countLink(t: String): Unit =
      if (anchorDepth > 0) curLink += t.count(!_.isWhitespace)
    var i = 0

    // skip a tag's attribute region (after the name) up to its `>`,
    // honoring quoted values (`alt="a > b"` must not close the tag);
    // returns (index past `>`, attribute names seen, attribute values
    // — first occurrence wins, raw/undecoded, truncated tag consumes
    // to EOF — and selfClosed).
    // selfClosed is decided HERE because only this scan knows whether
    // the '/' before '>' was consumed as part of an unquoted attribute
    // value (`<a href=/x/>` is an OPEN tag with value "/x/" — the
    // browser rule; ADVICE r10) or stands alone (`<br/>`).
    def attrs(start: Int): (Int, Set[String], Map[String, String], Boolean) = {
      var i = start
      val names = Set.newBuilder[String]
      val vals = Map.newBuilder[String, String]
      val seen = scala.collection.mutable.Set.empty[String]
      var bareValEnd = -1 // exclusive end of the last unquoted value
      while (i < n && html.charAt(i) != '>') {
        val c = html.charAt(i)
        if (c == '"' || c == '\'') {
          // a stray quoted run not owned by an attribute (malformed)
          i += 1
          while (i < n && html.charAt(i) != c) i += 1
          if (i < n) i += 1
        } else if (Character.isLetter(c)) {
          val s0 = i
          while (i < n && (Character.isLetterOrDigit(html.charAt(i)) ||
            html.charAt(i) == '-' || html.charAt(i) == '_')) i += 1
          val aName = html.substring(s0, i).toLowerCase
          names += aName
          // capture an `=value` (quoted or bare) so its chars don't
          // re-enter the name scan
          var j = i
          while (j < n && Character.isWhitespace(html.charAt(j))) j += 1
          if (j < n && html.charAt(j) == '=') {
            j += 1
            while (j < n && Character.isWhitespace(html.charAt(j))) j += 1
            if (j < n && (html.charAt(j) == '"' || html.charAt(j) == '\'')) {
              val q = html.charAt(j)
              val v0 = j + 1
              j += 1
              while (j < n && html.charAt(j) != q) j += 1
              if (seen.add(aName))
                vals += aName -> html.substring(v0, math.min(j, n))
              if (j < n) j += 1
              i = j
            } else {
              val v0 = j
              while (j < n && !Character.isWhitespace(html.charAt(j)) &&
                html.charAt(j) != '>') j += 1
              if (seen.add(aName)) vals += aName -> html.substring(v0, j)
              if (j > v0) bareValEnd = j
              i = j
            }
          }
        } else i += 1
      }
      // i is at '>' (or EOF); the tag self-closes iff the char before
      // '>' is a '/' that was NOT the tail of an unquoted value
      val selfClosed = i < n && i - 1 >= start &&
        html.charAt(i - 1) == '/' && bareValEnd != i
      (if (i < n) i + 1 else n, names.result(), vals.result(), selfClosed)
    }

    while (i < n) {
      val c = html.charAt(i)
      if (c == '&') {
        // `\n` in `out` is the reserved block marker — an entity
        // decoding to a line terminator (&#10;) is source whitespace,
        // not a block boundary
        val (t, ni) = entity(html, i)
        out ++= t.replace('\n', ' ').replace('\r', ' ')
        countLink(t)
        i = ni
      } else if (c != '<') {
        // source newlines are ordinary whitespace in HTML — only
        // BLOCK tags make lines (a text run split across source lines
        // is one rendered run)
        out += (if (c == '\n' || c == '\r') ' ' else c)
        if (anchorDepth > 0 && !Character.isWhitespace(c)) curLink += 1
        i += 1
      } else if (html.startsWith("<!--", i)) {
        val e = html.indexOf("-->", i + 4)
        i = if (e < 0) n else e + 3
      } else if (html.startsWith("<!", i) || html.startsWith("<?", i)) {
        val e = html.indexOf('>', i + 2)
        i = if (e < 0) n else e + 1
      } else if (html.startsWith("</", i)) {
        if (i + 2 < n && Character.isLetter(html.charAt(i + 2))) {
          var j = i + 2
          while (j < n && Character.isLetterOrDigit(html.charAt(j))) j += 1
          val name = html.substring(i + 2, j).toLowerCase
          val e = html.indexOf('>', j)
          i = if (e < 0) n else e + 1
          if (name == "a") anchorDepth = math.max(0, anchorDepth - 1)
          if (block(name)) { out += '\n'; newline() }
        } else {
          // `</>` / `</!…`: HTML5 treats these as an ignored empty end
          // tag / bogus comment — consume to `>` and emit nothing
          val e = html.indexOf('>', i + 2)
          i = if (e < 0) n else e + 1
        }
      } else if (i + 1 < n && Character.isLetter(html.charAt(i + 1))) {
        var j = i + 1
        while (j < n && Character.isLetterOrDigit(html.charAt(j))) j += 1
        val name = html.substring(i + 1, j).toLowerCase
        val (past, attrNames, attrVals, selfClosed) = attrs(j)
        nTags += 1
        if (name == "a" && attrNames("href")) {
          nLinks += 1
          if (!selfClosed) anchorDepth += 1
          if (attrVals.get("rel").exists(v => relSep.split(v)
              .exists(_.equalsIgnoreCase("nofollow"))))
            nNofollow += 1
          if (hrefs.length < 256)
            attrVals.get("href").foreach(h => hrefs += decodeAll(h).trim)
        }
        // document base (T151): the FIRST <base href> wins — HTML5
        // ignores every later base element; one inside a comment or
        // rawtext never reaches here (already skipped). An href-less
        // or empty-href base contributes nothing.
        if (name == "base" && docBase.isEmpty)
          attrVals.get("href").map(h => decodeAll(h).trim)
            .filter(_.nonEmpty).foreach(b => docBase = Some(b))
        if (name == "meta" && metas.length < 64) {
          (attrVals.get("name"), attrVals.get("content")) match {
            case (Some(mn), Some(mc)) if mn.nonEmpty =>
              metas += ((mn.trim.toLowerCase, decodeAll(mc)))
            case _ =>
          }
        }
        // <link rel=…> captures — feed autodiscovery (T147),
        // canonical (T169), hreflang alternates (T170). rel is a
        // space/comma token list matched case-insensitively; href
        // entity-decodes like every captured URL. Links inside
        // comments/rawtext never reach here (the scanner already
        // skipped them).
        if (name == "link") {
          val relToks = attrVals.get("rel").toSeq
            .flatMap(v => relSep.split(v)).filter(_.nonEmpty)
          def rel(t: String) = relToks.exists(_.equalsIgnoreCase(t))
          val href = attrVals.get("href").map(h => decodeAll(h).trim)
            .filter(_.nonEmpty)
          if (feeds.length < 16 && rel("alternate") &&
              attrVals.get("type").map(_.trim.toLowerCase).exists(t =>
                t == "application/rss+xml" ||
                  t == "application/atom+xml"))
            href.foreach(feeds += _)
          if (canonical.isEmpty && rel("canonical"))
            href.foreach(h => canonical = Some(h))
          if (alternates.length < 32 && rel("alternate"))
            attrVals.get("hreflang").map(_.trim.toLowerCase)
              .filter(_.nonEmpty)
              .foreach(lg => href.foreach(h => alternates += ((lg, h))))
        }
        if (block(name)) { out += '\n'; newline() }
        i = past
        if (name == "title" && !selfClosed) {
          val s0 = i
          while (i < n && !atCloseOf(html, i, "title")) i += 1
          if (title.isEmpty)
            title = Some(collapse(decodeAll(html.substring(s0, i))))
        } else if (rawText(name) && !selfClosed) {
          while (i < n && !atCloseOf(html, i, name)) i += 1
          // the close tag itself is consumed by the `</` branch above
        }
      } else {
        // `<` opening nothing — literal text, the browser rule
        out += c
        if (anchorDepth > 0) curLink += 1
        i += 1
      }
    }
    newline() // flush the final line's link count

    // -1 keeps trailing empty lines so rawLines aligns with lineLinks
    val rawLines = out.toString.split("\n", -1)
    val blocks = rawLines.iterator.zip(lineLinks.iterator)
      .map { case (l, lk) => Block(collapse(l), lk) }
      .filter(_.text.nonEmpty)
      .toSeq
    Extracted(title, blocks.map(_.text).mkString("\n"), nLinks, nTags,
      metas.toSeq, nNofollow, hrefs.toSeq, blocks, feeds.toSeq,
      canonical, alternates.toSeq, docBase)
  }

  /** Collapse runs of whitespace (incl. NBSP) to single spaces, trim. */
  private def collapse(s: String): String =
    s.replaceAll("[\\s\\u00A0]+", " ").trim

  /** Entity-decode a plain string (used for RCDATA title content). */
  private def decodeAll(s: String): String = {
    val out = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '&') { val (t, ni) = entity(s, i); out ++= t; i = ni }
      else { out += s.charAt(i); i += 1 }
    }
    out.toString
  }

  /** Escape text for embedding in synthesized HTML (q209's renderer):
    * the round trip `extractText(…escape(w)…)` must return `w` exactly,
    * exercising the entity decoder on every corpus word that needs it.
    */
  def escape(s: String): String = {
    val out = new StringBuilder
    s.foreach {
      case '&' => out ++= "&amp;"
      case '<' => out ++= "&lt;"
      case '>' => out ++= "&gt;"
      case '"' => out ++= "&quot;"
      case ch  => out += ch
    }
    out.toString
  }
}
