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
    "iso-ir-100" -> "windows-1252")

  /** Resolve a raw charset label (as the HTTP layer extracted it) to
    * the canonical encoding name, or None for unknown labels.
    */
  def resolve(label: String): Option[String] =
    labels.get(label.trim.toLowerCase)

  /** Decode `bytes` per the declared `label`. Unknown or absent labels
    * use UTF-8 with maximal-subpart U+FFFD repair and set `fellBack`.
    * windows-1252 is total (every byte maps), so its decode never
    * replaces; UTF-8 replacement counts come from the T107 auditor.
    */
  def decode(bytes: Array[Byte], label: Option[String]): Decoded = {
    val resolved = label.flatMap(resolve)
    resolved match {
      case Some("windows-1252") =>
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
      case Some("utf-8") =>
        val sb = new java.lang.StringBuilder(bytes.length)
        val st = graft.text.Utf8.decode(bytes, sb)
        Decoded(sb.toString, "utf-8", fellBack = false, st.n_replacements)
      case _ =>
        val sb = new java.lang.StringBuilder(bytes.length)
        val st = graft.text.Utf8.decode(bytes, sb)
        Decoded(sb.toString, "utf-8", fellBack = true, st.n_replacements)
    }
  }
}
