package graft.multimodal

/** Charset-aware payload decoding (q210, T119) — the bridge between
  * the HTTP layer (T117 extracts a charset LABEL from Content-Type)
  * and the text tiers (T118 HTML extraction, T107 UTF-8 audit) that
  * consume a decoded String. Crawl reality: payloads declare dozens
  * of label spellings, lie about them, or declare nothing — and the
  * decode rule that makes a corpus consistent is the WHATWG Encoding
  * Standard's, not the IANA registry's. Two of its rules matter at
  * corpus scale and are implemented here exactly:
  *
  *  - **`iso-8859-1` (and `us-ascii`) are ALIASES of windows-1252.**
  *    Pages labeled latin-1 routinely contain 0x80–0x9F smart quotes
  *    and € from Windows authoring tools; browsers therefore decode
  *    all of these labels as cp1252, and a pipeline that uses the
  *    JDK's literal ISO-8859-1 instead silently turns "smart quotes"
  *    into C1 controls that survive into training text.
  *  - **Unknown or missing labels fall back to UTF-8 with U+FFFD
  *    repair** (graft.text.Utf8's maximal-subpart policy, T107) and
  *    the fallback is FLAGGED — a mislabeled payload is a data-quality
  *    signal, not an error.
  *
  * Delta vs the JDK, documented: java.nio's windows-1252 maps the five
  * undefined bytes (0x81 0x8D 0x8F 0x90 0x9D) to U+FFFD under REPLACE;
  * the WHATWG index maps them to the same-valued C1 controls. This
  * decoder follows WHATWG (CharsetsSpec referees the other 27 bytes of
  * the 0x80–0x9F row against the JDK table directly).
  */
object Charsets {

  /** Decode outcome: the repaired text, the encoding actually used
    * (canonical name), whether the label fell back to UTF-8, and the
    * number of U+FFFD substitutions the decode required.
    */
  final case class Decoded(
      text: String,
      used: String,
      fellBack: Boolean,
      nReplacements: Long)

  /** WHATWG windows-1252 index, the 0x80–0x9F row (0xA0–0xFF is
    * identity with latin-1 = the codepoint of the byte value).
    */
  private val cp1252Hi: Array[Char] = Array(
    '€', '\u0081', '‚', 'ƒ', '„', '…',
    '†', '‡', 'ˆ', '‰', 'Š', '‹',
    'Œ', '\u008d', 'Ž', '\u008f', '\u0090', '‘',
    '’', '“', '”', '•', '–', '—',
    '˜', '™', 'š', '›', 'œ', '\u009d',
    'ž', 'Ÿ')

  /** WHATWG label → canonical encoding, the subset this engine
    * decodes natively. Labels fold case and trim (the standard strips
    * ASCII whitespace before matching).
    */
  private val labels: Map[String, String] = Map(
    "utf-8" -> "utf-8", "utf8" -> "utf-8",
    "unicode-1-1-utf-8" -> "utf-8",
    "windows-1252" -> "windows-1252", "cp1252" -> "windows-1252",
    "x-cp1252" -> "windows-1252", "ansi_x3.4-1968" -> "windows-1252",
    "ascii" -> "windows-1252", "us-ascii" -> "windows-1252",
    "iso-8859-1" -> "windows-1252", "iso8859-1" -> "windows-1252",
    "iso_8859-1" -> "windows-1252", "latin1" -> "windows-1252",
    "l1" -> "windows-1252", "cp819" -> "windows-1252",
    "iso-ir-100" -> "windows-1252",
    // the WHATWG font-hack encoding: ASCII passes, 0x80–0xFF map to
    // the U+F780–U+F7FF private-use row (lossless byte round-trip —
    // the point of the encoding). As a TRANSPORT label it decodes
    // this way; inside a <meta> the prescan quirk rewrites it to
    // windows-1252 before this map is consulted
    "x-user-defined" -> "x-user-defined",
    // WHATWG: "utf-16" labels utf-16le; a BOM-less UTF-16 page with a
    // correct transport charset must decode through the label, not
    // fall to the flagged default (review-r12 — the prescan can never
    // rescue it: '<meta' is invisible through interleaved NULs)
    "utf-16" -> "utf-16le", "utf-16le" -> "utf-16le",
    "unicodefeff" -> "utf-16le", "utf-16be" -> "utf-16be")

  /** Resolve a raw charset label (as the HTTP layer extracted it) to
    * the canonical encoding name, or None for unknown labels.
    */
  def resolve(label: String): Option[String] =
    labels.get(label.trim.toLowerCase)

  /** A [[decode]] with the WHATWG encoding-sniffing provenance: which
    * layer decided the encoding — `bom` ≻ `transport` ≻ `meta`
    * (the §13.2.3.2 prescan) ≻ `default` (UTF-8 fallback, flagged).
    */
  final case class Sniffed(source: String, decoded: Decoded)

  /** Byte-order mark at the head of `bytes`: (encoding, BOM length).
    * WHATWG: the BOM beats EVERY other declaration, including the
    * transport layer.
    */
  def bomOf(bytes: Array[Byte]): Option[(String, Int)] =
    if (bytes.length >= 3 && (bytes(0) & 0xff) == 0xef &&
        (bytes(1) & 0xff) == 0xbb && (bytes(2) & 0xff) == 0xbf)
      Some(("utf-8", 3))
    else if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xff &&
        (bytes(1) & 0xff) == 0xfe) Some(("utf-16le", 2))
    else if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xfe &&
        (bytes(1) & 0xff) == 0xff) Some(("utf-16be", 2))
    else None

  /** The HTML5 §13.2.3.2 PRESCAN (T157): scan the first `limit` bytes
    * (as an ASCII-superset view) for `<meta charset=…>` or
    * `<meta http-equiv=content-type content="…; charset=…">`, skipping
    * comments and other tags. Two spec quirks implemented exactly:
    * a meta declaring a UTF-16 flavor yields UTF-8 (the document
    * cannot be UTF-16 if its own ASCII meta was readable), and
    * `x-user-defined` in a meta yields windows-1252. Returns the
    * resolved canonical encoding; None when no (valid) declaration is
    * found in the window. Never throws on truncated/malformed input.
    */
  def prescan(bytes: Array[Byte], limit: Int = 1024): Option[String] = {
    val s = new String(bytes, 0, math.min(limit, bytes.length),
      "ISO-8859-1")
    val n = s.length
    var i = 0
    // the WHATWG "extract a character encoding from a meta element"
    // algorithm over a content="text/html; charset=…" value
    def fromContent(v: String): Option[String] = {
      val lower = v.toLowerCase
      // the spec RETRIES at the next "charset" occurrence when one is
      // not followed by '=' (review-r12: "x-charset-hint; charset=…"
      // must still yield the real parameter)
      var at = lower.indexOf("charset")
      while (at >= 0) {
        var j = at + 7
        while (j < v.length && Character.isWhitespace(v.charAt(j))) j += 1
        if (j < v.length && v.charAt(j) == '=') {
          j += 1
          while (j < v.length && Character.isWhitespace(v.charAt(j)))
            j += 1
          if (j >= v.length) return None
          return v.charAt(j) match {
            case q @ ('"' | '\'') =>
              val e = v.indexOf(q, j + 1)
              if (e < 0) None else Some(v.substring(j + 1, e))
            case _ =>
              var e = j
              while (e < v.length &&
                !Character.isWhitespace(v.charAt(e)) &&
                v.charAt(e) != ';') e += 1
              Some(v.substring(j, e))
          }
        }
        at = lower.indexOf("charset", at + 7)
      }
      None
    }
    // meta-context resolution: the two spec quirks, then the label map
    def metaResolve(label: String): Option[String] = {
      val l = label.trim.toLowerCase
      if (l == "utf-16" || l == "utf-16le" || l == "utf-16be")
        Some("utf-8")
      else if (l == "x-user-defined") Some("windows-1252")
      else resolve(l)
    }
    while (i < n) {
      if (s.startsWith("<!--", i)) {
        // HTML5: the comment ends at the first '>' preceded by two
        // '-' bytes, which MAY overlap the '<!--' opener — '<!-->'
        // and '<!--->' are complete comments (review-r12)
        val e = s.indexOf("-->", i + 2)
        i = if (e < 0) return None else e + 3
      } else if (s.regionMatches(true, i, "<meta", 0, 5) && i + 5 < n &&
          (Character.isWhitespace(s.charAt(i + 5)) ||
            s.charAt(i + 5) == '/')) {
        // quote-aware attribute walk to the tag's '>'
        var j = i + 5
        var charsetAttr: Option[String] = None
        var httpEquiv: Option[String] = None
        var contentAttr: Option[String] = None
        var done = false
        while (j < n && !done) {
          val c = s.charAt(j)
          if (c == '>') done = true
          else if (Character.isLetter(c)) {
            val a0 = j
            while (j < n && (Character.isLetterOrDigit(s.charAt(j)) ||
              s.charAt(j) == '-')) j += 1
            val aName = s.substring(a0, j).toLowerCase
            var k = j
            while (k < n && Character.isWhitespace(s.charAt(k))) k += 1
            var aVal: Option[String] = None
            if (k < n && s.charAt(k) == '=') {
              k += 1
              while (k < n && Character.isWhitespace(s.charAt(k))) k += 1
              if (k < n && (s.charAt(k) == '"' || s.charAt(k) == '\'')) {
                val q = s.charAt(k)
                val e = s.indexOf(q, k + 1)
                if (e < 0) return None // truncated inside the window
                aVal = Some(s.substring(k + 1, e)); k = e + 1
              } else {
                val v0 = k
                while (k < n && !Character.isWhitespace(s.charAt(k)) &&
                  s.charAt(k) != '>') k += 1
                aVal = Some(s.substring(v0, k))
              }
              j = k
            }
            aName match {
              case "charset" => if (charsetAttr.isEmpty) charsetAttr = aVal
              case "http-equiv" => if (httpEquiv.isEmpty) httpEquiv = aVal
              case "content" => if (contentAttr.isEmpty) contentAttr = aVal
              case _ =>
            }
          } else j += 1
        }
        // a charset ATTRIBUTE wins outright: when present but
        // unresolvable the meta contributes NOTHING — falling through
        // to the pragma form would contradict the spec's
        // need-pragma=false (review-r12)
        val found =
          if (charsetAttr.isDefined) charsetAttr.flatMap(metaResolve)
          else if (httpEquiv.exists(_.equalsIgnoreCase("content-type")))
            contentAttr.flatMap(fromContent).flatMap(metaResolve)
          else None
        // ADVICE-r12: a meta whose '>' never arrived inside the window
        // was only PARTIALLY read — WHATWG §13.2.3.2 aborts the prescan
        // without a result when input ends mid-tag, so a declaration
        // truncated at the cap boundary must NOT be honored
        if (done && found.isDefined) return found
        i = if (done) j + 1 else n
      } else if (c2Tag(s, i)) {
        // any other tag: skip to '>' honoring quotes, so a '>' inside
        // a QUOTED attribute value cannot end the tag early. A quote
        // only OPENS when it directly follows '=' — an apostrophe
        // inside an unquoted value (title=don't) is value text, not a
        // quote, and must not swallow the window (review-r12)
        var j = i + 1
        var quote: Char = 0
        var lastMeaning: Char = 0
        while (j < n && (quote != 0 || s.charAt(j) != '>')) {
          val c = s.charAt(j)
          if (quote != 0) { if (c == quote) quote = 0 }
          else {
            if ((c == '"' || c == '\'') && lastMeaning == '=') quote = c
            if (!Character.isWhitespace(c)) lastMeaning = c
          }
          j += 1
        }
        i = if (j < n) j + 1 else n
      } else i += 1
    }
    None
  }

  private def c2Tag(s: String, i: Int): Boolean =
    s.charAt(i) == '<' && i + 1 < s.length &&
      (Character.isLetter(s.charAt(i + 1)) || s.charAt(i + 1) == '/' ||
        s.charAt(i + 1) == '!' || s.charAt(i + 1) == '?')

  /** The WHATWG encoding-SNIFFING composition (q248, T157): BOM ≻
    * transport label ≻ meta prescan ≻ UTF-8 fallback (flagged via
    * `decoded.fellBack`). A BOM is stripped before decoding (the
    * standard's rule — a retained U+FEFF would poison dedup keys and
    * token counts downstream).
    */
  def sniffDecode(bytes: Array[Byte], transportLabel: Option[String])
      : Sniffed =
    bomOf(bytes) match {
      case Some((enc, bomLen)) =>
        val body = java.util.Arrays.copyOfRange(bytes, bomLen,
          bytes.length)
        Sniffed("bom", decodeCanonical(body, enc))
      case None =>
        transportLabel.flatMap(resolve) match {
          case Some(enc) => Sniffed("transport", decodeCanonical(bytes, enc))
          case None => prescan(bytes) match {
            case Some(enc) => Sniffed("meta", decodeCanonical(bytes, enc))
            case None => Sniffed("default", decode(bytes, None))
          }
        }
    }

  /** Decode by CANONICAL encoding name (label resolution AND the BOM
    * check already done — this layer never re-sniffs, so a stripped
    * BOM followed by a second literal U+FEFF stays in the text, the
    * WHATWG rule: exactly one BOM is consumed). utf-16le/be decode
    * natively: code-unit pairs, a lone trailing byte is one U+FFFD;
    * surrogate pairs pass through as their units (the JVM String is
    * UTF-16 already), an unpaired surrogate unit is kept as-is
    * (String tolerates it; downstream UTF-8 encodes it as U+FFFD —
    * the lossy path is the writer's).
    */
  private[multimodal] def decodeCanonical(bytes: Array[Byte],
      enc: String): Decoded = enc match {
    case "utf-16le" | "utf-16be" =>
      val le = enc == "utf-16le"
      val sb = new java.lang.StringBuilder(bytes.length / 2 + 1)
      var repl = 0L
      var i = 0
      while (i + 1 < bytes.length) {
        val lo = bytes(if (le) i else i + 1) & 0xff
        val hi = bytes(if (le) i + 1 else i) & 0xff
        sb.append(((hi << 8) | lo).toChar)
        i += 2
      }
      if (i < bytes.length) { sb.append('�'); repl += 1 }
      Decoded(sb.toString, enc, fellBack = false, repl)
    case "x-user-defined" =>
      val sb = new java.lang.StringBuilder(bytes.length)
      var i = 0
      while (i < bytes.length) {
        val b = bytes(i) & 0xff
        sb.append(if (b < 0x80) b.toChar else (0xf780 + b - 0x80).toChar)
        i += 1
      }
      Decoded(sb.toString, "x-user-defined", fellBack = false, 0L)
    case "windows-1252" =>
      val sb = new java.lang.StringBuilder(bytes.length)
      var i = 0
      while (i < bytes.length) {
        val b = bytes(i) & 0xff
        sb.append(
          if (b < 0x80) b.toChar
          else if (b < 0xa0) cp1252Hi(b - 0x80)
          else b.toChar)
        i += 1
      }
      Decoded(sb.toString, "windows-1252", fellBack = false, 0L)
    case "utf-8" =>
      val sb = new java.lang.StringBuilder(bytes.length)
      val st = graft.text.Utf8.decode(bytes, sb)
      Decoded(sb.toString, "utf-8", fellBack = false, st.n_replacements)
    case _ =>
      val sb = new java.lang.StringBuilder(bytes.length)
      val st = graft.text.Utf8.decode(bytes, sb)
      Decoded(sb.toString, "utf-8", fellBack = true, st.n_replacements)
  }

  /** Decode `bytes` per the declared `label`, with the full WHATWG
    * `decode` algorithm's precedence: a UTF-8/UTF-16 BOM beats the
    * label (ADVICE-r12 — a UTF-16BE-BOM body served with
    * `charset=utf-16`, which labels LE, previously byte-swapped to
    * garbage with `fellBack = false`, and an LE-BOM body kept U+FEFF
    * at the head of the text: dedup-key/md5 poison). The BOM is
    * stripped; BOM-routed decodes are NOT `fellBack` (the encoding is
    * certain, whatever the label claimed). Unknown or absent labels
    * use UTF-8 with maximal-subpart U+FFFD repair and set `fellBack`.
    * windows-1252 is total (every byte maps), so its decode never
    * replaces; UTF-8 replacement counts come from the T107 auditor.
    */
  def decode(bytes: Array[Byte], label: Option[String]): Decoded =
    bomOf(bytes) match {
      case Some((enc, bomLen)) =>
        decodeCanonical(
          java.util.Arrays.copyOfRange(bytes, bomLen, bytes.length), enc)
      case None => label.flatMap(resolve) match {
        case Some(enc) => decodeCanonical(bytes, enc)
        case None =>
          val sb = new java.lang.StringBuilder(bytes.length)
          val st = graft.text.Utf8.decode(bytes, sb)
          Decoded(sb.toString, "utf-8", fellBack = true, st.n_replacements)
      }
    }
}
