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
  * Scale shape: the walker is STREAMING — inflated bytes flow through
  * the CRC/stats accumulators in an 8 KB buffer and are dropped, so
  * memory is O(1) per member regardless of member size, and archive
  * payload bytes never shuffle (the q39/q125 binary-tier rule: one
  * task holds one archive, only extracted features leave the task).
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
  def splitGzipMembers(p: Array[Byte]): Option[Seq[GzipMember]] = {
    val out = scala.collection.mutable.ArrayBuffer[GzipMember]()
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
          }
        }
        val t = j + inf.getBytesRead.toInt
        if (t + 8 > p.length) return None // trailer must be present
        val crcOk = le32(t) == crc.getValue &&
          le32(t + 4) == (total & 0xffffffffL)
        out += GzipMember(idx, name, (t + 8 - i).toLong, total, byteSum, crcOk)
        i = t + 8
        idx += 1
      } finally inf.end()
    }
    if (out.isEmpty) None else Some(out.toSeq)
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
