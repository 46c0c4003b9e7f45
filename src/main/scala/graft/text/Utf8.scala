package graft.text

/** Byte-level UTF-8 validation / repair (round 9, T107): the mojibake
  * triage every crawl-ingest pipeline runs before text ever reaches
  * tokenization — crawl bytes routinely carry latin-1 spillover, lone
  * continuation bytes, truncated multi-byte sequences and overlong
  * encodings, and a pipeline that trusts `new String(bytes, UTF_8)`
  * without counting what was repaired cannot audit its own corpus.
  *
  * This is a REAL RFC 3629 decoder, not a regex: per-lead continuation
  * windows (E0 → A0-BF and ED → 80-9F exclude overlongs and CESU
  * surrogates; F0 → 90-BF and F4 → 80-8F pin the U+10000..U+10FFFF
  * range), with the Unicode "substitution of maximal subparts" policy —
  * one U+FFFD per longest valid prefix of a well-formed sequence, then
  * re-sync on the offending byte. That is the same policy the JDK's
  * CharsetDecoder implements, which makes `java.nio` an independent
  * full-referee in Utf8Spec (byte-exact repaired output on valid,
  * malformed AND randomly mutated inputs).
  *
  * Scale shape: a single forward pass, O(1) state, no allocation unless
  * the repaired string is requested — a codegen-friendly per-row audit
  * (the q39 binary-tier rule: payload bytes never shuffle, only counts
  * leave the task).
  */
object Utf8 {

  /** One pass over the bytes.
    * @param n_bytes        input length
    * @param n_cp_valid     well-formed codepoints decoded
    * @param n_invalid_bytes bytes consumed by malformed sequences
    * @param n_replacements U+FFFD substitutions under maximal-subpart
    *                       (≤ n_invalid_bytes: a 2-byte truncated prefix
    *                       is ONE replacement)
    * @param n_multibyte    valid codepoints encoded in ≥2 bytes
    */
  final case class Utf8Stats(n_bytes: Long, n_cp_valid: Long,
      n_invalid_bytes: Long, n_replacements: Long, n_multibyte: Long)

  private def cont(b: Int): Boolean = (b & 0xc0) == 0x80

  /** Decode with maximal-subpart substitution; when `sb` is non-null
    * the repaired text is appended to it.
    */
  def decode(p: Array[Byte], sb: java.lang.StringBuilder): Utf8Stats = {
    var i = 0
    val n = p.length
    var cp = 0L
    var bad = 0L
    var repl = 0L
    var multi = 0L
    def sub(len: Int): Unit = {
      bad += len; repl += 1; i += len
      if (sb != null) sb.append('\uFFFD')
    }
    while (i < n) {
      val b0 = p(i) & 0xff
      if (b0 < 0x80) {
        cp += 1; if (sb != null) sb.append(b0.toChar); i += 1
      } else if (b0 < 0xc2) {
        // lone continuation (80-BF) or overlong lead (C0, C1)
        sub(1)
      } else if (b0 < 0xe0) { // 2-byte, C2-DF
        if (i + 1 < n && cont(p(i + 1) & 0xff)) {
          cp += 1; multi += 1
          if (sb != null)
            sb.appendCodePoint(((b0 & 0x1f) << 6) | (p(i + 1) & 0x3f))
          i += 2
        } else sub(1)
      } else if (b0 < 0xf0) { // 3-byte, E0-EF
        // JDK malformed-length convention (probed, Utf8Spec-pinned):
        // E0's overlong window (b1 < A0) rejects at the LEAD, but a
        // surrogate-valued sequence (ED with b1 > 9F) whose
        // continuation bytes are generically valid is consumed as ONE
        // malformed unit of its full length — the JDK checks the
        // decoded VALUE there, not the per-lead window. (Strict
        // Unicode maximal-subpart would stop at ED; matching the
        // referee exactly is worth more than the stricter reading.)
        val b1 = if (i + 1 < n) p(i + 1) & 0xff else -1
        if (b1 < 0x80 || b1 > 0xbf || (b0 == 0xe0 && b1 < 0xa0)) sub(1)
        else if (!(i + 2 < n && cont(p(i + 2) & 0xff))) sub(2)
        else if (b0 == 0xed && b1 > 0x9f) sub(3) // surrogate U+D800-DFFF
        else {
          cp += 1; multi += 1
          if (sb != null) sb.appendCodePoint(
            ((b0 & 0x0f) << 12) | ((b1 & 0x3f) << 6) | (p(i + 2) & 0x3f))
          i += 3
        }
      } else if (b0 < 0xf5) { // 4-byte, F0-F4
        val lo = if (b0 == 0xf0) 0x90 else 0x80 // F0: exclude overlongs
        val hi = if (b0 == 0xf4) 0x8f else 0xbf // F4: cap at U+10FFFF
        val b1 = if (i + 1 < n) p(i + 1) & 0xff else -1
        if (b1 < lo || b1 > hi) sub(1)
        else if (!(i + 2 < n && cont(p(i + 2) & 0xff))) sub(2)
        else if (!(i + 3 < n && cont(p(i + 3) & 0xff))) sub(3)
        else {
          cp += 1; multi += 1
          if (sb != null) sb.appendCodePoint(
            ((b0 & 0x07) << 18) | ((b1 & 0x3f) << 12) |
              ((p(i + 2) & 0x3f) << 6) | (p(i + 3) & 0x3f))
          i += 4
        }
      } else sub(1) // F5-FF: never a valid lead
    }
    Utf8Stats(n.toLong, cp, bad, repl, multi)
  }

  def audit(p: Array[Byte]): Utf8Stats = decode(p, null)

  def repair(p: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(p.length)
    decode(p, sb)
    sb.toString
  }
}
