package graft.text

/** Sentence boundary detection (T179, q269) — the segmentation step
  * between document-aligned bitext (T170) and sentence alignment
  * (T178): Gale–Church consumes SENTENCE length sequences, so the
  * extracted page text must split first, and the splitting rules are
  * what keep decimals and honorifics from shredding the length
  * signal.
  *
  * The rule (the classic punkt-style heuristic subset, deterministic
  * and list-based rather than trained): a run of terminal
  * punctuation `[.?!]` ends a sentence when it is followed by
  * whitespace and the next non-space character is an uppercase
  * letter, a digit, or an opening quote/bracket — OR when it ends
  * the text. Two guards:
  *
  *  - a `.` does NOT end a sentence when the token before it is a
  *    known abbreviation (Dr., Mr., Prof., e.g., etc. — the
  *    documented list a deployment extends per language, the
  *    PublicSuffix/TrackingParams swap-in convention);
  *  - a `.` with no following whitespace never splits, which already
  *    covers decimals (3.14), version strings, and domain names.
  *
  * `?`/`!` always end when the whitespace+capital condition holds
  * (no abbreviation ends in them). Output sentences are trimmed and
  * non-empty; the concatenation of outputs (joined by single spaces)
  * round-trips the collapsed input.
  */
object Sentences {

  /** The abbreviation guard list (lowercased, no trailing dot) —
    * the documented subset a deployment extends per language.
    */
  private val abbrev = Set("dr", "mr", "mrs", "ms", "prof", "st",
    "vs", "etc", "fig", "no", "inc", "jr", "sr", "al")

  private def isOpener(c: Char): Boolean =
    Character.isUpperCase(c) || Character.isDigit(c) ||
      c == '"' || c == '«' || c == '(' || c == '‘' ||
      c == '“'

  /** True when the `.` at position `i` ends an abbreviation rather
    * than a sentence: the letter token before it is in the list, OR
    * it is a single letter itself preceded by another `.` (the
    * dotted-initialism shape — `e.g.`, `i.e.`, `U.S.`).
    */
  private def abbrevBefore(s: String, i: Int): Boolean = {
    var j = i - 1
    while (j >= 0 && Character.isLetter(s.charAt(j))) j -= 1
    // Locale.ROOT (ADVICE-r13): default-locale folding breaks under
    // Turkish/Azeri locales ('I' → 'ı'), so 'Inc.' would stop matching
    // the abbreviation list — cross-JVM nondeterminism.
    val tok = s.substring(j + 1, i).toLowerCase(java.util.Locale.ROOT)
    if (tok.isEmpty) false
    else if (abbrev.contains(tok)) true
    else tok.length == 1 && j >= 0 && s.charAt(j) == '.'
  }

  def split(text: String): Seq[String] = {
    val s = text
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '.' || c == '?' || c == '!') {
        // consume the full terminal run (e.g. "?!", "...")
        var j = i
        while (j + 1 < s.length && (s.charAt(j + 1) == '.' ||
            s.charAt(j + 1) == '?' || s.charAt(j + 1) == '!')) j += 1
        val atEnd = j == s.length - 1
        // whitespace after the run, then the opener test
        var k = j + 1
        while (k < s.length && Character.isWhitespace(s.charAt(k)))
          k += 1
        val wsAfter = k > j + 1
        val opens = k < s.length && isOpener(s.charAt(k))
        val abbrevGuard = c == '.' && j == i && abbrevBefore(s, i)
        if (atEnd || (wsAfter && opens && !abbrevGuard)) {
          val sent = s.substring(start, j + 1).trim
          if (sent.nonEmpty) out += sent
          start = k
          i = k
        } else i = j + 1
      } else i += 1
    }
    if (start < s.length) {
      val tail = s.substring(start).trim
      if (tail.nonEmpty) out += tail
    }
    out.toSeq
  }
}
