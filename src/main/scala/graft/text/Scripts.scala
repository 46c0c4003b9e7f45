package graft.text

/** Unicode script-mix + confusable-skeleton audit (q222, T131) — the
  * homograph gate (UTS #39 class): `exаmple.com` with a Cyrillic а
  * (U+0430) renders identically to `example.com` and is a different
  * frontier key, a different dedup digest, and a classic phishing
  * vector. A corpus build runs this audit on URL hosts (after T120
  * canonicalization) and on document text (script-mix profiling for
  * the language-ID tier, T89).
  *
  * Script classification is the JDK's own Unicode Character Database
  * binding (`Character.UnicodeScript`), so script names track the
  * platform's Unicode version rather than a hand-rolled table. Rules:
  *
  *  - COMMON/INHERITED/UNKNOWN code points don't contribute a script
  *    (digits, punctuation, combining marks ride with their word)
  *  - `mixed` = ≥ 2 distinct contributing scripts
  *  - `confusableRisk` = Latin mixed with Cyrillic or Greek — the
  *    UTS #39 highly-restrictive profile's forbidden combinations
  *    (Latin+Han/Kana/Hangul are the ALLOWED CJK mixes and do not
  *    flag)
  *  - `skeleton` maps the common Cyrillic/Greek → Latin confusables
  *    (a UTS #39 confusables.txt subset — the full table is swap-in
  *    data at deployment) and lowercases; equal skeletons with
  *    different raw strings = a spoof pair
  *
  * Pure per-string functions, never throw.
  */
object Scripts {

  final case class Mix(
      dominant: String, // contributing script with most code points,
                        // "NONE" when nothing contributes
      nScripts: Int,
      mixed: Boolean,
      confusableRisk: Boolean)

  def scriptMix(s: String): Mix = {
    val counts = scala.collection.mutable.Map.empty[String, Int]
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val sc = try Character.UnicodeScript.of(cp) catch {
        case _: IllegalArgumentException => Character.UnicodeScript.UNKNOWN
      }
      if (sc != Character.UnicodeScript.COMMON &&
          sc != Character.UnicodeScript.INHERITED &&
          sc != Character.UnicodeScript.UNKNOWN)
        counts.updateWith(sc.name()) {
          case Some(n) => Some(n + 1)
          case None => Some(1)
        }
      i += Character.charCount(cp)
    }
    if (counts.isEmpty) Mix("NONE", 0, mixed = false,
      confusableRisk = false)
    else {
      // deterministic dominant: max count, name as tiebreak
      val dominant = counts.toSeq.maxBy { case (n, c) => (c, n) }._1
      val scripts = counts.keySet
      Mix(dominant, scripts.size, scripts.size > 1,
        scripts.contains("LATIN") &&
          (scripts.contains("CYRILLIC") || scripts.contains("GREEK")))
    }
  }

  /** UTS #39 confusables.txt subset: the Cyrillic/Greek letters whose
    * lowercase glyphs are pixel-identical (or near) to Latin in
    * common fonts. Full table is deployment data.
    */
  private val Confusables: Map[Char, Char] = Map(
    // Cyrillic lowercase
    'а' -> 'a', 'е' -> 'e', 'о' -> 'o', 'р' -> 'p',
    'с' -> 'c', 'у' -> 'y', 'х' -> 'x', 'і' -> 'i',
    'ї' -> 'i', 'ј' -> 'j', 'ѕ' -> 's',
    // Cyrillic uppercase
    'А' -> 'a', 'В' -> 'b', 'Е' -> 'e', 'К' -> 'k',
    'М' -> 'm', 'Н' -> 'h', 'О' -> 'o', 'Р' -> 'p',
    'С' -> 'c', 'Т' -> 't', 'Х' -> 'x',
    // Greek
    'ο' -> 'o', 'α' -> 'a', 'ν' -> 'v', 'ρ' -> 'p',
    'υ' -> 'u', 'Ο' -> 'o', 'Α' -> 'a', 'Β' -> 'b',
    'Ε' -> 'e', 'Ζ' -> 'z', 'Η' -> 'h', 'Ι' -> 'i',
    'Κ' -> 'k', 'Μ' -> 'm', 'Ν' -> 'n', 'Ρ' -> 'p',
    'Τ' -> 't', 'Υ' -> 'y', 'Χ' -> 'x')

  /** Confusable skeleton: map known confusables to Latin, lowercase.
    * skeleton(a) == skeleton(b) with a != b ⇒ spoof pair.
    */
  def skeleton(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      // try the raw char (covers the uppercase entries whose lowercase
      // form is NOT visually Latin-like, e.g. В→b), then the
      // lowercased char (covers capitals absent from the map whose
      // lowercase IS a confusable, e.g. У → у → y)
      val mapped = Confusables.getOrElse(c,
        Confusables.getOrElse(Character.toLowerCase(c),
          Character.toLowerCase(c)))
      sb += Character.toLowerCase(mapped)
      i += 1
    }
    sb.toString
  }

  /** Does `candidate` spoof `target`? Equal skeletons, unequal raw. */
  def spoofs(candidate: String, target: String): Boolean =
    candidate != target && skeleton(candidate) == skeleton(target)
}
