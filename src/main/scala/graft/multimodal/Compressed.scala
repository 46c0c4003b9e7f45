package graft.multimodal

/** Compressed-container tier (round 9, VERDICT-r8 stretch item 7):
  * splitting CONCATENATED gzip members inside the binary tier — the
  * ingest shape of every real crawl corpus (WARC/WET files are exactly
  * this: one gzip member per record, streamed back-to-back into
  * multi-GB archives), and the last gap between the testdata-parquet
  * world and real compressed ingest.
  *
  * Same discipline as the JPEG marker walk (T101) and the TIFF IFD
  * walk (T102): a REAL RFC 1952 container parse — magic + CM check,
  * reserved-FLG rejection, FEXTRA/FNAME/FCOMMENT/FHCRC header fields,
  * a genuine `java.util.zip.Inflater` raw-deflate pass to find each
  * member's end (deflate streams are self-terminating; the container
  * carries NO member-length field, so splitting requires actually
  * inflating), and CRC32 + ISIZE trailer verification against the
  * inflated bytes. Malformed or truncated input → None, never a throw
  * (at 100 TB corrupt archives are a certainty).
  *
  * Scale shape: the walker is STREAMING on the inflate side — inflated
  * bytes flow through the CRC/stats accumulators in an 8 KB buffer and
  * are dropped, so the INFLATED payload never materializes regardless
  * of member size. The `Array[Byte]` overload still holds the whole
  * compressed archive in memory (right for parquet-binary-column
  * rows); for true O(buffer) ingest of multi-GB archives use the
  * `InputStream` overload, which reads the compressed stream through
  * the same 8 KB windows (ADVICE-r9). Archive payload bytes never
  * shuffle either way (the q39/q125 binary-tier rule: one task holds
  * one archive, only extracted features leave the task).
  */
object Compressed {

  /** One member of a concatenated gzip stream: header name (FNAME field
    * if present), compressed extent in the archive, inflated length,
    * sum of inflated byte values (the cheap content witness the oracle
    * can recompute in closed form), and trailer verification.
    */
  final case class GzipMember(idx: Int, name: Option[String],
      comp_len: Long, uncomp_len: Long, byte_sum: Long, crc_ok: Boolean)

  /** Split a concatenated-gzip archive into its members. Some(members)
    * only when the ENTIRE stream parses as back-to-back valid members;
    * None on any malformation (bad magic/CM, reserved FLG bits,
    * unterminated name, truncated deflate data, missing trailer).
    * A trailer whose CRC32/ISIZE disagree with the inflated bytes is
    * NOT a parse failure — the member is returned with crc_ok = false
    * (storage rot on one record must not discard the whole archive).
    */
  def splitGzipMembers(p: Array[Byte]): Option[Seq[GzipMember]] =
    walkMembers(p, withPayload = false).map(_.map(_._1))

  /** T104 composed with the record layer above it: the SAME walk as
    * [[splitGzipMembers(p:Array[Byte])*]] (one definition — this IS
    * that walker with the payload sink turned on), but each member's
    * INFLATED payload is returned alongside its stats. Memory is
    * O(largest single member), not O(archive) — the right contract for
    * record-per-member containers (Common Crawl WARC/WET), where the
    * layer above (the WARC parser) consumes one record's bytes at a
    * time. Same failure contract: None on any container malformation.
    */
  def memberPayloads(p: Array[Byte])
      : Option[Seq[(GzipMember, Array[Byte])]] =
    walkMembers(p, withPayload = true)

  /** [[memberPayloads(p:Array[Byte])*]] with a cumulative cap on the
    * MATERIALIZED inflated bytes (ADVICE-r12 decompression-bomb
    * guard): the walk aborts with None the moment total inflated
    * output exceeds `maxTotalOut`, so a hostile tiny body can never
    * allocate more than the cap (+ one 8 KB buffer) in the task. The
    * stats-only walker needs no cap — it streams and drops.
    */
  def memberPayloads(p: Array[Byte], maxTotalOut: Long)
      : Option[Seq[(GzipMember, Array[Byte])]] =
    walkMembers(p, withPayload = true, maxTotalOut)

  private def walkMembers(p: Array[Byte], withPayload: Boolean,
      maxTotalOut: Long = Long.MaxValue)
      : Option[Seq[(GzipMember, Array[Byte])]] = {
    var cumOut = 0L
    val out = scala.collection.mutable.ArrayBuffer[(GzipMember, Array[Byte])]()
    var i = 0
    var idx = 0
    def le32(o: Int): Long = (p(o) & 0xffL) | ((p(o + 1) & 0xffL) << 8) |
      ((p(o + 2) & 0xffL) << 16) | ((p(o + 3) & 0xffL) << 24)
    while (i < p.length) {
      if (i + 10 > p.length) return None
      if ((p(i) & 0xff) != 0x1f || (p(i + 1) & 0xff) != 0x8b ||
          (p(i + 2) & 0xff) != 8) return None // magic + CM=deflate
      val flg = p(i + 3) & 0xff
      if ((flg & 0xe0) != 0) return None // RFC 1952: reserved bits zero
      var j = i + 10 // past MTIME(4) + XFL + OS
      if ((flg & 4) != 0) { // FEXTRA: little-endian XLEN + payload
        if (j + 2 > p.length) return None
        j += 2 + ((p(j) & 0xff) | ((p(j + 1) & 0xff) << 8))
        if (j > p.length) return None
      }
      var name: Option[String] = None
      if ((flg & 8) != 0) { // FNAME: zero-terminated ISO-8859-1
        val start = j
        while (j < p.length && p(j) != 0) j += 1
        if (j >= p.length) return None
        name = Some(new String(p, start, j - start, "ISO-8859-1"))
        j += 1
      }
      if ((flg & 16) != 0) { // FCOMMENT: zero-terminated, skipped
        while (j < p.length && p(j) != 0) j += 1
        if (j >= p.length) return None
        j += 1
      }
      if ((flg & 2) != 0) { // FHCRC: 2-byte header CRC, skipped
        j += 2
        if (j > p.length) return None
      }
      val inf = new java.util.zip.Inflater(true) // raw deflate
      try {
        inf.setInput(p, j, p.length - j)
        val crc = new java.util.zip.CRC32
        var total = 0L
        var byteSum = 0L
        val buf = new Array[Byte](8192)
        val payload =
          if (withPayload) new java.io.ByteArrayOutputStream() else null
        while (!inf.finished()) {
          val n =
            try inf.inflate(buf)
            catch { case _: java.util.zip.DataFormatException => return None }
          if (n == 0) {
            // fresh 8K buffer each call → 0 means the stream ended
            // without its final block: truncated member
            if (!inf.finished()) return None
          } else {
            crc.update(buf, 0, n)
            var k = 0
            while (k < n) { byteSum += buf(k) & 0xff; k += 1 }
            total += n
            if (payload != null) {
              cumOut += n
              if (cumOut > maxTotalOut) return None // bomb guard
              payload.write(buf, 0, n)
            }
          }
        }
        val t = j + inf.getBytesRead.toInt
        if (t + 8 > p.length) return None // trailer must be present
        val crcOk = le32(t) == crc.getValue &&
          le32(t + 4) == (total & 0xffffffffL)
        out += ((GzipMember(idx, name, (t + 8 - i).toLong, total, byteSum,
          crcOk),
          if (payload != null) payload.toByteArray
          else Array.emptyByteArray))
        i = t + 8
        idx += 1
      } finally inf.end()
    }
    if (out.isEmpty) None else Some(out.toSeq)
  }

  /** True-streaming twin of [[splitGzipMembers(p:Array[Byte])*]]: walks a
    * concatenated-gzip STREAM in O(buffer) memory — compressed bytes are
    * read through an 8 KB window, inflated bytes flow through the
    * CRC/stats accumulators and are dropped, and the unconsumed tail of
    * the last read (the next member's header) is pushed back. Same
    * contract as the array overload: Some(members) only when the entire
    * stream parses as back-to-back valid members, None on any
    * malformation (CompressedSpec referees the two overloads
    * byte-for-byte on full archives, truncations, and bit flips). The
    * caller owns closing `in`.
    */
  def splitGzipMembers(in: java.io.InputStream): Option[Seq[GzipMember]] = {
    val out = scala.collection.mutable.ArrayBuffer[GzipMember]()
    val pin = new java.io.PushbackInputStream(in, 8192)
    var idx = 0
    def readFully(buf: Array[Byte], n: Int): Boolean = {
      var off = 0
      while (off < n) {
        val r = pin.read(buf, off, n - off)
        if (r < 0) return false
        off += r
      }
      true
    }
    def le32(b: Array[Byte], o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    while (true) {
      val first = pin.read()
      if (first < 0) return if (out.isEmpty) None else Some(out.toSeq)
      var headerLen = 1L
      val fixed = new Array[Byte](9)
      if (!readFully(fixed, 9)) return None
      headerLen += 9
      if (first != 0x1f || (fixed(0) & 0xff) != 0x8b ||
          (fixed(1) & 0xff) != 8) return None // magic + CM=deflate
      val flg = fixed(2) & 0xff
      if ((flg & 0xe0) != 0) return None // RFC 1952: reserved bits zero
      if ((flg & 4) != 0) { // FEXTRA
        val xl = new Array[Byte](2)
        if (!readFully(xl, 2)) return None
        val xlen = (xl(0) & 0xff) | ((xl(1) & 0xff) << 8)
        val skip = new Array[Byte](xlen)
        if (!readFully(skip, xlen)) return None
        headerLen += 2 + xlen
      }
      var name: Option[String] = None
      def readZString(keep: Boolean): Option[String] = {
        val sb = new java.io.ByteArrayOutputStream()
        var b = pin.read()
        while (b > 0) { if (keep) sb.write(b); headerLen += 1; b = pin.read() }
        if (b < 0) None
        else { headerLen += 1; Some(new String(sb.toByteArray, "ISO-8859-1")) }
      }
      if ((flg & 8) != 0) readZString(keep = true) match {
        case Some(s) => name = Some(s)
        case None => return None // unterminated FNAME
      }
      if ((flg & 16) != 0) {
        if (readZString(keep = false).isEmpty) return None
      }
      if ((flg & 2) != 0) { // FHCRC
        val hc = new Array[Byte](2)
        if (!readFully(hc, 2)) return None
        headerLen += 2
      }
      val inf = new java.util.zip.Inflater(true)
      try {
        val crc = new java.util.zip.CRC32
        var total = 0L
        var byteSum = 0L
        val inBuf = new Array[Byte](8192)
        val outBuf = new Array[Byte](8192)
        var lastIn = 0
        while (!inf.finished()) {
          if (inf.needsInput()) {
            val n = pin.read(inBuf)
            if (n < 0) return None // truncated deflate stream
            inf.setInput(inBuf, 0, n)
            lastIn = n
          }
          val n =
            try inf.inflate(outBuf)
            catch { case _: java.util.zip.DataFormatException => return None }
          if (n > 0) {
            crc.update(outBuf, 0, n)
            var k = 0
            while (k < n) { byteSum += outBuf(k) & 0xff; k += 1 }
            total += n
          } else if (!inf.finished() && !inf.needsInput()) {
            return None // needsDictionary or a stuck stream — malformed
          }
        }
        // unconsumed tail of the last read belongs to trailer + next member
        val rem = inf.getRemaining
        if (rem > 0) pin.unread(inBuf, lastIn - rem, rem)
        val trailer = new Array[Byte](8)
        if (!readFully(trailer, 8)) return None
        val crcOk = le32(trailer, 0) == crc.getValue &&
          le32(trailer, 4) == (total & 0xffffffffL)
        out += GzipMember(idx, name, headerLen + inf.getBytesRead + 8,
          total, byteSum, crcOk)
        idx += 1
      } finally inf.end()
    }
    None // unreachable
  }

  /** Write one gzip member (java.util.zip.Deflater + CRC32, raw-deflate
    * body under a hand-built RFC 1952 header) with MTIME pinned to 0
    * for determinism and an optional FNAME field — the JDK's own
    * GZIPOutputStream never writes FNAME, and the walker's header-field
    * path must be exercised by the query, not just by specs.
    */
  def gzipMember(payload: Array[Byte], name: Option[String]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def w32le(v: Long): Unit = {
      bos.write((v & 0xff).toInt); bos.write(((v >> 8) & 0xff).toInt)
      bos.write(((v >> 16) & 0xff).toInt); bos.write(((v >> 24) & 0xff).toInt)
    }
    bos.write(0x1f); bos.write(0x8b); bos.write(8)
    bos.write(if (name.isDefined) 8 else 0) // FLG: FNAME only
    w32le(0L) // MTIME = 0: byte-deterministic archives
    bos.write(0) // XFL
    bos.write(255) // OS = unknown
    name.foreach { n => bos.write(n.getBytes("ISO-8859-1")); bos.write(0) }
    val defl = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    try {
      defl.setInput(payload)
      defl.finish()
      val buf = new Array[Byte](8192)
      while (!defl.finished()) bos.write(buf, 0, defl.deflate(buf))
    } finally defl.end()
    val crc = new java.util.zip.CRC32
    crc.update(payload)
    w32le(crc.getValue)
    w32le(payload.length.toLong & 0xffffffffL)
    bos.toByteArray
  }
}
