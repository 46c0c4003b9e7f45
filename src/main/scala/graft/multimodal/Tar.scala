package graft.multimodal

/** POSIX ustar container walk (VERDICT-r9 stretch item 8) — the other
  * real corpus container next to concatenated gzip (T104): plain
  * 512-byte header blocks, octal fields, a spaces-substituted header
  * checksum, ustar name/prefix splitting, NUL-block termination — no
  * decompression involved, so a .tar.gz walks as
  * `Compressed.memberPayloads` (the gzip layer) composed with this
  * (the record layer), exactly like WARC-in-gzip (q206).
  *
  * Parse discipline (T101/T102/T104 rules):
  *  - All-or-nothing structure: Some(entries) only when the WHOLE
  *    buffer walks as valid headers + bodies + the two-NUL-block
  *    terminator (trailing all-zero padding accepted — GNU tar pads to
  *    its blocking factor); any structural violation → None, never a
  *    throw.
  *  - A header whose CHECKSUM disagrees is NOT structural death: the
  *    entry is returned with `chksum_ok = false` and the walk
  *    continues (the gzip crc_ok discipline — one rotted record must
  *    not discard the archive; if the size field really was corrupted
  *    the NEXT header fails structurally and the walk returns None).
  *  - Size fields parse as octal (leading spaces, NUL/space
  *    terminated) or GNU base-256 (high bit set) — the >8 GiB shape.
  *  - Body bytes stream through the stats accumulators (byte sum,
  *    MD5) and are NOT retained — only structure and witnesses leave
  *    the task.
  */
object Tar {

  /** One archive entry. `name` is the full ustar path
    * (prefix + '/' + name when the prefix field is set); `typeflag`
    * is the raw flag byte ('0'/NUL regular, '5' directory, ...).
    */
  final case class TarEntry(idx: Int, name: String, size: Long,
      typeflag: Char, chksum_ok: Boolean, bodySum: Long, bodyMd5: String)

  def parseEntries(p: Array[Byte]): Option[Seq[TarEntry]] = {
    val out = scala.collection.mutable.ArrayBuffer[TarEntry]()
    var i = 0
    var idx = 0
    def zstr(off: Int, len: Int): String = {
      var e = off
      while (e < off + len && p(e) != 0) e += 1
      new String(p, off, e - off, "ISO-8859-1")
    }
    def octal(off: Int, len: Int): Option[Long] = {
      if ((p(off) & 0x80) != 0) { // GNU base-256: big-endian payload
        var v = (p(off) & 0x7fL)
        var k = off + 1
        while (k < off + len) { v = (v << 8) | (p(k) & 0xffL); k += 1 }
        return Some(v)
      }
      var k = off
      var seen = false
      var v = 0L
      while (k < off + len && (p(k) == ' ') && !seen) k += 1 // lead pad
      while (k < off + len && p(k) >= '0' && p(k) <= '7') {
        v = v * 8 + (p(k) - '0'); k += 1; seen = true
      }
      // terminator: NUL or space (or field end)
      while (k < off + len && (p(k) == 0 || p(k) == ' ')) k += 1
      if (seen && k == off + len) Some(v) else None
    }
    def zeroBlock(off: Int): Boolean = {
      var k = off
      while (k < off + 512) { if (p(k) != 0) return false; k += 1 }
      true
    }
    if (p.length % 512 != 0) return None
    while (i + 512 <= p.length) {
      if (zeroBlock(i)) {
        // terminator: a second NUL block must follow, then only
        // all-zero padding to the end of the buffer
        if (i + 1024 > p.length || !zeroBlock(i + 512)) return None
        var k = i + 1024
        while (k + 512 <= p.length) {
          if (!zeroBlock(k)) return None
          k += 512
        }
        return if (out.isEmpty) None else Some(out.toSeq)
      }
      val size = octal(i + 124, 12).getOrElse(return None)
      // also bounds the blocks arithmetic below against Int overflow
      if (size < 0 || size > p.length.toLong) return None
      // checksum: unsigned sum of the header with the chksum field
      // (148-155) read as eight spaces
      val stored = octal(i + 148, 8)
      var sum = 0L
      var k = i
      while (k < i + 512) {
        sum += (if (k - i >= 148 && k - i < 156) 0x20L else (p(k) & 0xffL))
        k += 1
      }
      val chksumOk = stored.contains(sum)
      val rawName = zstr(i, 100)
      if (rawName.isEmpty) return None
      // ustar prefix field applies when the magic says ustar
      val magic = zstr(i + 257, 6)
      val prefix =
        if (magic.startsWith("ustar")) zstr(i + 345, 155) else ""
      val name = if (prefix.isEmpty) rawName else prefix + "/" + rawName
      val typeflag = (p(i + 156) & 0xff).toChar
      // Long arithmetic throughout: with blocks as Int, a corrupted
      // size near p.length in a ~2 GiB archive overflows blocks*512
      // negative, sails past the bound and indexes negatively later
      val blocks = (size + 511) / 512
      if (i.toLong + 512L + blocks * 512L > p.length.toLong)
        return None // truncated body
      val (bodySum, bodyMd5) = ByteScan.witness(p, i + 512, size.toInt)
      out += TarEntry(idx, name, size, typeflag, chksumOk, bodySum,
        bodyMd5)
      idx += 1
      i = (i.toLong + 512L + blocks * 512L).toInt // bounded by p.length
    }
    None // ran off the end without a terminator
  }

  /** Serialize one ustar entry (synthesis side — q207 builds archives
    * with this, TarSpec referees the walker against GNU tar's own
    * output as well). Regular files only; mtime pinned to 0 for
    * byte-determinism.
    */
  def tarEntry(name: String, body: Array[Byte]): Array[Byte] = {
    require(name.length <= 100, "synthesis names fit the name field")
    val h = new Array[Byte](512)
    def put(off: Int, s: String): Unit = {
      val b = s.getBytes("ISO-8859-1")
      System.arraycopy(b, 0, h, off, b.length)
    }
    put(0, name)
    put(100, "0000644")                       // mode
    put(108, "0000000")                       // uid
    put(116, "0000000")                       // gid
    put(124, f"${body.length}%011o")          // size, octal
    put(136, "00000000000")                   // mtime = 0
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum as spaces
    h(156) = '0'                              // regular file
    put(257, "ustar")
    h(263) = '0'; h(264) = '0'                // version "00"
    var sum = 0L
    for (k <- 0 until 512) sum += h(k) & 0xffL
    put(148, f"$sum%06o")
    h(154) = 0; h(155) = ' '                  // NUL + space per ustar
    val blocks = (body.length + 511) / 512
    val outArr = new Array[Byte](512 + blocks * 512)
    System.arraycopy(h, 0, outArr, 0, 512)
    System.arraycopy(body, 0, outArr, 512, body.length)
    outArr
  }

  /** The end-of-archive marker: two NUL blocks. */
  def tarEnd: Array[Byte] = new Array[Byte](1024)
}
