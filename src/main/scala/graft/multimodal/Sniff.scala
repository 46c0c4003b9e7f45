package graft.multimodal

/** MIME sniffing (q214, T123) — magic-byte content-type detection, the
  * WHATWG MIME Sniffing standard's "identify an unknown MIME type"
  * algorithm over the signatures a crawl corpus actually contains.
  * Composes with T117: HTTP Content-Type headers LIE at corpus scale
  * (mislabeled images served as text/html, gzip double-served as
  * text/plain), and every downstream router — the T118 HTML extractor,
  * the T104 gzip walk, the image tier — must trust bytes, not headers.
  * The audit that counts declared-vs-sniffed disagreement is what
  * decides how much of a 100 TB corpus is routed by the wrong decoder.
  *
  * Subset implemented (the WHATWG tables, minus font/legacy-media rows
  * our tiers don't consume, plus tar — absent from WHATWG because
  * browsers never fetch it, endemic in crawl/dataset corpora):
  *
  *  - whitespace-skippable tag patterns → text/html (the 16 tag names
  *    + comment, each requiring a tag-terminating byte ' ' or '>'),
  *    and `<?xml` → text/xml
  *  - `%PDF-` → application/pdf (no whitespace skip, per the standard)
  *  - images: PNG / JPEG / GIF / BMP / WEBP (RIFF-masked)
  *  - audio/video: WAVE + AVI (RIFF-masked), OggS, Matroska/WebM,
  *    ID3-tagged MP3, `ftyp` at offset 4 → video/mp4
  *  - archives: gzip, zip (PK\x03\x04), rar; `ustar` at offset 257 →
  *    application/x-tar (our crawl extension, documented above)
  *  - UTF-8/16 BOM → text/plain
  *  - otherwise the standard's binary-data-byte scan over the first
  *    1445 bytes: any of 0x00–0x08, 0x0B, 0x0E–0x1A, 0x1C–0x1F ⇒
  *    application/octet-stream, else text/plain
  *
  * Pure function of the payload prefix — zero allocation beyond the
  * returned constant, never throws, empty input sniffs as text/plain
  * (vacuously no binary bytes, matching the standard's scan).
  */
object Sniff {

  private def at(p: Array[Byte], off: Int, sig: String): Boolean = {
    if (off + sig.length > p.length) return false
    var i = 0
    while (i < sig.length) {
      if (p(off + i) != sig.charAt(i).toByte) return false
      i += 1
    }
    true
  }

  private def atBytes(p: Array[Byte], off: Int, sig: Int*): Boolean = {
    if (off + sig.length > p.length) return false
    var i = 0
    while (i < sig.length) {
      if ((p(off + i) & 0xff) != sig(i)) return false
      i += 1
    }
    true
  }

  /** The WHATWG tag-terminated HTML patterns (uppercase forms). */
  private val HtmlTags = Seq("<!DOCTYPE HTML", "<HTML", "<HEAD",
    "<SCRIPT", "<IFRAME", "<H1", "<DIV", "<FONT", "<TABLE", "<A",
    "<STYLE", "<TITLE", "<B", "<BODY", "<BR", "<P", "<!--")

  private def htmlTagAt(p: Array[Byte], off: Int): Boolean =
    HtmlTags.exists { tag =>
      if (off + tag.length >= p.length + 1) false
      else {
        var i = 0
        var ok = off + tag.length <= p.length
        while (ok && i < tag.length) {
          val c = Character.toUpperCase((p(off + i) & 0xff).toChar)
          if (c != tag.charAt(i)) ok = false
          i += 1
        }
        // tag-terminating byte: space or '>' (WHATWG)
        ok && off + tag.length < p.length && {
          val t = p(off + tag.length) & 0xff
          t == 0x20 || t == 0x3e
        }
      }
    }

  /** Sniff the MIME essence of a payload prefix. */
  def sniff(p: Array[Byte]): String = {
    // 1. whitespace-skippable text patterns
    var ws = 0
    while (ws < p.length && {
        val b = p(ws) & 0xff
        b == 0x09 || b == 0x0a || b == 0x0c || b == 0x0d || b == 0x20
      }) ws += 1
    if (htmlTagAt(p, ws)) return "text/html"
    if (at(p, ws, "<?xml")) return "text/xml"
    if (at(p, 0, "%PDF-")) return "application/pdf"

    // 2. exact / masked binary signatures
    if (atBytes(p, 0, 0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a))
      return "image/png"
    if (atBytes(p, 0, 0xff, 0xd8, 0xff)) return "image/jpeg"
    if (at(p, 0, "GIF87a") || at(p, 0, "GIF89a")) return "image/gif"
    if (at(p, 0, "RIFF")) {
      if (at(p, 8, "WEBP")) return "image/webp"
      if (at(p, 8, "WAVE")) return "audio/wave"
      if (at(p, 8, "AVI ")) return "video/avi"
    }
    if (at(p, 0, "BM")) return "image/bmp"
    if (at(p, 0, "OggS")) return "application/ogg"
    if (atBytes(p, 0, 0x1a, 0x45, 0xdf, 0xa3)) return "video/webm"
    if (at(p, 0, "ID3")) return "audio/mpeg"
    if (at(p, 4, "ftyp")) return "video/mp4"
    if (atBytes(p, 0, 0x1f, 0x8b, 0x08)) return "application/x-gzip"
    if (atBytes(p, 0, 0x50, 0x4b, 0x03, 0x04)) return "application/zip"
    if (at(p, 0, "Rar!") && atBytes(p, 4, 0x1a, 0x07))
      return "application/x-rar-compressed"
    if (at(p, 257, "ustar")) return "application/x-tar"

    // 3. BOMs
    if (atBytes(p, 0, 0xef, 0xbb, 0xbf) ||
        atBytes(p, 0, 0xfe, 0xff) || atBytes(p, 0, 0xff, 0xfe))
      return "text/plain"

    // 4. binary-data-byte scan (first 1445 bytes, the WHATWG window)
    val limit = math.min(p.length, 1445)
    var i = 0
    while (i < limit) {
      val b = p(i) & 0xff
      if (b <= 0x08 || b == 0x0b || (b >= 0x0e && b <= 0x1a) ||
          (b >= 0x1c && b <= 0x1f))
        return "application/octet-stream"
      i += 1
    }
    "text/plain"
  }

  /** Alias groups under which a declared type counts as agreeing with
    * the sniffed essence (both sides lowercased, parameters stripped
    * by the caller — [[Http]]'s media-type extraction does that).
    */
  private val Aliases: Seq[Set[String]] = Seq(
    Set("application/x-gzip", "application/gzip"),
    Set("text/xml", "application/xml"),
    Set("audio/wave", "audio/wav", "audio/x-wav", "audio/vnd.wave"),
    Set("application/x-tar", "application/tar"))

  def agrees(declared: String, sniffed: String): Boolean = {
    val d = declared.trim.toLowerCase
    if (d == sniffed) true
    else Aliases.exists(g => g.contains(d) && g.contains(sniffed))
  }
}
