package graft.multimodal

/** RFC 4648 base64 + RFC 2397 `data:` URI decode (q219, T128). Crawl
  * payloads embed binary as text everywhere — `data:` URIs in HTML
  * src/href attributes (inline images the multimodal tier should
  * decode like any other payload), base64 bodies in JSON/XML fields —
  * and the frontier layer (T120) rightly REJECTS `data:` as a fetch
  * target, so this layer is what actually extracts the payload.
  *
  * Decode discipline:
  *
  *  - strict RFC 4648 §4 alphabet (`A–Za–z0–9+/` with `=` padding)
  *    and the URL-safe §5 variant (`-_`) are both accepted — archives
  *    contain both; the two alphabets never overlap, and the first
  *    variant-specific character LOCKS the variant: a string mixing
  *    `+/` with `-_` (e.g. `a+b_`) is valid under neither RFC 4648
  *    variant and is rejected (ADVICE r10)
  *  - MIME reality: whitespace (CR/LF/TAB/SP) is skipped (RFC 2045
  *    line wrapping); any OTHER character is a hard malformation
  *  - padding must reconstruct exactly: a final quantum of 2 or 3
  *    encoded chars (with or without `=` fill) decodes 1 or 2 bytes;
  *    a final quantum of 1 char is malformed; non-zero discarded bits
  *    are FLAGGED (`canonical=false`) but decoded — the bytes the
  *    encoder meant are recoverable and corpus reality includes
  *    non-canonical encoders (java.util.Base64 decodes these too;
  *    strict-canonical rejection would drop real data)
  *  - `data:[<mediatype>][;base64],<payload>`: mediatype defaults to
  *    `text/plain;charset=US-ASCII` (RFC 2397 §2); without `;base64`
  *    the payload is percent-decoded text ([[graft.text.Urls]]'
  *    escape rules at the byte level)
  *
  * Never throws; malformation → None.
  */
object Base64s {

  /** (decoded bytes, canonical) — canonical=false when the encoding
    * carried non-zero discarded bits in its final quantum.
    */
  def decode(s: String): Option[(Array[Byte], Boolean)] = {
    val out = new java.io.ByteArrayOutputStream(s.length * 3 / 4 + 3)
    var acc = 0
    var nBits = 0
    var i = 0
    var padSeen = false
    var canonical = true
    // 0 = undetermined, 1 = standard (+/), 2 = URL-safe (-_); the
    // first variant-specific char locks it — cross-variant mixing is
    // valid under neither RFC 4648 alphabet
    var variant = 0
    def lock(want: Int): Boolean =
      if (variant == 0) { variant = want; true } else variant == want
    while (i < s.length) {
      val c = s.charAt(i)
      val v =
        if (c >= 'A' && c <= 'Z') c - 'A'
        else if (c >= 'a' && c <= 'z') c - 'a' + 26
        else if (c >= '0' && c <= '9') c - '0' + 52
        else if (c == '+') { if (!lock(1)) return None; 62 }
        else if (c == '-') { if (!lock(2)) return None; 62 }
        else if (c == '/') { if (!lock(1)) return None; 63 }
        else if (c == '_') { if (!lock(2)) return None; 63 }
        else if (c == '=') { padSeen = true; -2 }
        else if (c == '\r' || c == '\n' || c == '\t' || c == ' ') -3
        else return None // hard malformation
      if (v >= 0) {
        if (padSeen) return None // data after padding
        acc = (acc << 6) | v
        nBits += 6
        if (nBits >= 8) {
          nBits -= 8
          out.write((acc >> nBits) & 0xff)
        }
      }
      i += 1
    }
    // final quantum: 6 dangling bits = malformed (1-char quantum);
    // 2 or 4 dangling bits are the b64 tail — flag non-zero fill
    if (nBits == 6) None
    else {
      if (nBits > 0 && (acc & ((1 << nBits) - 1)) != 0) canonical = false
      Some((out.toByteArray, canonical))
    }
  }

  final case class DataUri(
      mediaType: String,
      base64: Boolean,
      bytes: Array[Byte],
      canonical: Boolean)

  /** Percent-decode at the BYTE level (data: URI non-base64 payloads);
    * malformed escapes pass through literally (the T120 rule).
    */
  private def pctDecode(s: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(s.length)
    val raw = s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    var i = 0
    def hex(b: Byte): Int = Character.digit(b.toChar, 16)
    while (i < raw.length) {
      if (raw(i) == '%' && i + 2 < raw.length && hex(raw(i + 1)) >= 0 &&
          hex(raw(i + 2)) >= 0) {
        out.write(hex(raw(i + 1)) << 4 | hex(raw(i + 2)))
        i += 3
      } else { out.write(raw(i)); i += 1 }
    }
    out.toByteArray
  }

  def parseDataUri(uri: String): Option[DataUri] = {
    if (!uri.regionMatches(true, 0, "data:", 0, 5)) return None
    val comma = uri.indexOf(',')
    if (comma < 0) return None
    val meta = uri.substring(5, comma)
    val payload = uri.substring(comma + 1)
    val parts = meta.split(";", -1).toSeq
    val isB64 = parts.lastOption.exists(_.equalsIgnoreCase("base64"))
    val typeParts = if (isB64) parts.dropRight(1) else parts
    val mediaType = typeParts.mkString(";") match {
      case "" => "text/plain;charset=US-ASCII" // RFC 2397 §2 default
      case t if t.startsWith(";") => "text/plain" + t
      case t => t
    }
    if (isB64)
      decode(payload).map { case (b, canon) =>
        DataUri(mediaType.toLowerCase, base64 = true, b, canon)
      }
    else
      Some(DataUri(mediaType.toLowerCase, base64 = false,
        pctDecode(payload), canonical = true))
  }
}
