package graft.multimodal

/** ZIP (PKWARE APPNOTE) container walk (q215, T124) — the third real
  * corpus container next to gzip (T104) and ustar (T116): dataset
  * dumps, document collections, and web archives ship as .zip, and a
  * 100 TB ingest must walk them in-task without a filesystem.
  *
  * Real central-directory parse, not a stream guess:
  *
  *  1. the End-Of-Central-Directory record is found by scanning
  *     BACKWARD from the tail over the up-to-64 KiB trailing comment
  *     (`PK\x05\x06`), exactly how conformant readers do it — a ZIP's
  *     authoritative index lives at the END; when the classic record
  *     saturated (>65,535 entries / >4 GiB offsets — real corpus
  *     archives, and what the JDK writes on overflow), the ZIP64
  *     EOCD locator (`PK\x06\x07`) immediately before it points at
  *     the ZIP64 EOCD record (`PK\x06\x06`) carrying the 64-bit
  *     entry count and directory offset, and per-entry 0xFFFFFFFF
  *     sizes/offsets resolve through the 0x0001 ZIP64 extra field;
  *  2. central-directory entries (`PK\x01\x02`) carry name, method,
  *     flags, CRC-32 and both sizes; names decode as UTF-8 when
  *     general-purpose flag bit 11 is set, else CP437 (IBM437, the
  *     APPNOTE default — ISO-8859-1 fallback if the JVM lacks it);
  *  3. each entry's body is located through its local header
  *     (`PK\x03\x04`) — local name/extra lengths are read from the
  *     LOCAL header (they legally differ from the CD's), while sizes
  *     and CRC come from the CENTRAL directory because streaming
  *     writers (the JDK's ZipOutputStream included) emit data
  *     descriptors (flag bit 3) and leave the local size fields 0;
  *  4. STORED (0) bodies are sliced, DEFLATED (8) bodies stream
  *     through a raw `Inflater` (nowrap — same discipline as the gzip
  *     walk); every body is witnessed by length, CRC-32, byte sum and
  *     MD5, and `crc_ok` records agreement with the directory.
  *
  * Corruption posture (the T104 rule): an archive with no locatable
  * EOCD → None; a directory truncated mid-walk yields the entries
  * readable before the break; a per-entry defect
  * (bad local signature, truncated body, CRC mismatch, unknown
  * method) → that entry surfaces with `crc_ok=false`, the walk
  * continues. Never throws. Body bytes never leave the task — only
  * structure and witnesses do.
  */
object Zip {

  final case class Member(
      name: String,
      method: Int,
      compressedSize: Long,
      size: Long,
      crcOk: Boolean,
      bodySum: Long,
      bodyMd5: String)

  private def u16(p: Array[Byte], i: Int): Int =
    (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)

  private def u32(p: Array[Byte], i: Int): Long =
    (p(i) & 0xffL) | ((p(i + 1) & 0xffL) << 8) |
      ((p(i + 2) & 0xffL) << 16) | ((p(i + 3) & 0xffL) << 24)

  private def u64(p: Array[Byte], i: Int): Long =
    u32(p, i) | (u32(p, i + 4) << 32)

  private val Cp437: java.nio.charset.Charset =
    try java.nio.charset.Charset.forName("IBM437")
    catch { case _: Exception => java.nio.charset.StandardCharsets.ISO_8859_1 }

  /** Locate the EOCD record: backward scan from the tail across the
    * possible comment (≤ 65535 bytes), accepting the first signature
    * whose comment length reaches the archive end.
    */
  private def findEocd(p: Array[Byte]): Option[Int] = {
    val last = p.length - 22
    val floor = math.max(0, p.length - 22 - 0xffff)
    var i = last
    while (i >= floor) {
      if (p(i) == 0x50 && p(i + 1) == 0x4b && p(i + 2) == 0x05 &&
          p(i + 3) == 0x06 && i + 22 + u16(p, i + 20) == p.length)
        return Some(i)
      i -= 1
    }
    None
  }

  def parseEntries(p: Array[Byte]): Option[Seq[Member]] = {
    if (p.length < 22) return None
    findEocd(p).flatMap { eocd =>
      // ZIP64 (VERDICT-r15 item 4, APPNOTE §4.3.14/4.3.15): when any
      // EOCD field saturates (>65,535 entries or a >4 GiB directory
      // offset — the JDK's ZipOutputStream writes zip64 on overflow),
      // the authoritative totals live in the ZIP64
      // end-of-central-directory RECORD, found through the 20-byte
      // LOCATOR that sits immediately before the classic EOCD. Honor
      // the locator whenever present and self-consistent; a corrupt
      // locator/record degrades to the classic fields (the T104
      // corruption posture — never throw).
      val locAt = eocd - 20
      val (total: Long, cdOff: Long) =
        if (locAt >= 0 && u32(p, locAt) == 0x07064b50L) {
          val e64 = u64(p, locAt + 8)
          if (e64 >= 0 && e64 + 56 <= locAt &&
              u32(p, e64.toInt) == 0x06064b50L)
            (u64(p, e64.toInt + 32), u64(p, e64.toInt + 48))
          else (u16(p, eocd + 10).toLong, u32(p, eocd + 16))
        } else (u16(p, eocd + 10).toLong, u32(p, eocd + 16))
      if (cdOff > Int.MaxValue || cdOff > eocd) return None
      val out = scala.collection.mutable.ArrayBuffer.empty[Member]
      var i = cdOff.toInt
      var k = 0L
      while (k < total) {
        if (i + 46 > p.length || u32(p, i) != 0x02014b50L) return Some(out.toSeq)
        val flags = u16(p, i + 8)
        val method = u16(p, i + 10)
        val crc = u32(p, i + 16)
        var csize = u32(p, i + 20)
        var usize = u32(p, i + 24)
        val nameLen = u16(p, i + 28)
        val extraLen = u16(p, i + 30)
        val commentLen = u16(p, i + 32)
        var lho = u32(p, i + 42)
        if (i + 46 + nameLen > p.length) return Some(out.toSeq)
        // ZIP64 extended-information extra (id 0x0001): any 32-bit CD
        // field pinned at 0xFFFFFFFF stores its real value here, in
        // the fixed order usize, csize, local-header offset — only
        // the saturated fields are present (APPNOTE §4.5.3)
        if ((csize == 0xffffffffL || usize == 0xffffffffL ||
            lho == 0xffffffffL) && i + 46 + nameLen + extraLen <= p.length) {
          var e = i + 46 + nameLen
          val eEnd = e + extraLen
          while (e + 4 <= eEnd) {
            val id = u16(p, e)
            val sz = u16(p, e + 2)
            if (id == 0x0001 && e + 4 + sz <= eEnd) {
              var q = e + 4
              val qEnd = e + 4 + sz
              if (usize == 0xffffffffL && q + 8 <= qEnd) {
                usize = u64(p, q); q += 8 }
              if (csize == 0xffffffffL && q + 8 <= qEnd) {
                csize = u64(p, q); q += 8 }
              if (lho == 0xffffffffL && q + 8 <= qEnd) {
                lho = u64(p, q); q += 8 }
            }
            e += 4 + sz
          }
        }
        val charset =
          if ((flags & 0x800) != 0) java.nio.charset.StandardCharsets.UTF_8
          else Cp437
        val name = new String(p, i + 46, nameLen, charset)
        out += readBody(p, name, method, lho, csize, usize, crc)
        i += 46 + nameLen + extraLen + commentLen
        k += 1
      }
      Some(out.toSeq)
    }
  }

  /** Extract + witness one member's body via its local header. Any
    * defect → crc_ok=false with zeroed witnesses, never a throw.
    */
  private def readBody(p: Array[Byte], name: String, method: Int,
      lho: Long, csize: Long, usize: Long, crc: Long): Member = {
    val bad = Member(name, method, csize, usize, crcOk = false, 0L, "")
    if (lho > Int.MaxValue || lho.toInt + 30 > p.length ||
        u32(p, lho.toInt) != 0x04034b50L) return bad
    val lh = lho.toInt
    val dataOff = lh + 30 + u16(p, lh + 26) + u16(p, lh + 28)
    if (dataOff + csize > p.length || csize > Int.MaxValue) return bad
    try {
      val crcCalc = new java.util.zip.CRC32
      val md = java.security.MessageDigest.getInstance("MD5")
      var sum = 0L
      var outLen = 0L
      def witness(buf: Array[Byte], n: Int): Unit = {
        crcCalc.update(buf, 0, n)
        md.update(buf, 0, n)
        var j = 0
        while (j < n) { sum += buf(j) & 0xff; j += 1 }
        outLen += n
      }
      method match {
        case 0 => // STORED
          witness(java.util.Arrays.copyOfRange(p, dataOff,
            dataOff + csize.toInt), csize.toInt)
        case 8 => // DEFLATE, raw stream
          val inf = new java.util.zip.Inflater(true)
          inf.setInput(p, dataOff, csize.toInt)
          val buf = new Array[Byte](8192)
          while (!inf.finished() && outLen <= usize) {
            val n = inf.inflate(buf)
            if (n == 0 && !inf.finished()) {
              inf.end()
              return bad // needs more input than the directory gave it
            }
            if (n > 0) witness(buf, n)
          }
          inf.end()
        case _ => return bad // unknown method
      }
      val ok = outLen == usize && crcCalc.getValue == crc
      Member(name, method, csize, usize, ok, sum,
        md.digest().map("%02x".format(_)).mkString)
    } catch {
      case _: java.util.zip.DataFormatException => bad
      case _: ArrayIndexOutOfBoundsException => bad
    }
  }
}
