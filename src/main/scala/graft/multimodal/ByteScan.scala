package graft.multimodal

/** Shared byte-level scanners for the record layers (Warc / Http /
  * Tar): the strict-CRLF line read and the payload witness pass — one
  * definition each, so the layers' real strictness deltas (WARC folds
  * LWS continuation lines per RFC 822; HTTP rejects obs-fold per RFC
  * 7230; tar has no lines at all) live in the layers, not in slowly
  * drifting private copies of the scanning loops (review-r10).
  */
private[multimodal] object ByteScan {

  /** The CRLF-terminated line starting at `i` → (text, offset past
    * the CRLF); None when no terminator arrives before the buffer
    * ends, or on a stray bare CR/LF inside the line (both layers
    * treat bare-LF producers as malformed, not as a dialect).
    */
  def crlfLine(p: Array[Byte], i: Int): Option[(String, Int)] = {
    var j = i
    while (j + 1 < p.length && !(p(j) == '\r' && p(j + 1) == '\n')) {
      if (p(j) == '\r' || p(j) == '\n') return None
      j += 1
    }
    if (j + 1 >= p.length) None
    else Some((new String(p, i, j - i, "ISO-8859-1"), j + 2))
  }

  /** Payload witnesses over `p[off, off+len)`: (byte sum, md5 hex).
    * The bytes stream through the accumulators and are not retained.
    */
  def witness(p: Array[Byte], off: Int, len: Int): (Long, String) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    var sum = 0L
    var k = off
    val end = off + len
    while (k < end) { sum += p(k) & 0xff; k += 1 }
    md.update(p, off, len)
    (sum, md.digest().map("%02x".format(_)).mkString)
  }
}
