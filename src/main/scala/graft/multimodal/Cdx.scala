package graft.multimodal

/** CDX-style archive index + point lookup (T165, VERDICT-r12 item 3 —
  * random access into the archive tier): the T142 write path emits
  * concatenated-gzip WARC archives, but a reader could only
  * sequential-scan them. Every real WARC consumer reads the other way:
  * a CDX index maps a SURT canonical key to the (offset, length) of
  * ONE gzip member, the reader seeks there, decompresses just that
  * member, and verifies the record's digest. This module is that pair:
  *
  *  - [[writeIndexed]] — write records as one gzip member each (the
  *    Common Crawl container rule that MAKES member-granular random
  *    access possible) while capturing per-record
  *    (surt_key, 14-digit timestamp, original URI, byte offset,
  *    compressed length, block digest); the returned index is sorted
  *    by (surt, ts) — the CDX sort order that puts one domain's
  *    records contiguously (see [[graft.text.Urls.surt]]).
  *  - [[readAt]] — the point lookup: slice EXACTLY the indexed
  *    [offset, offset+length) window, walk it as a one-member gzip
  *    stream, parse the record, and re-verify its WARC-Block-Digest
  *    against the parsed body. The bytes-read witness is the slice
  *    length — the caller can PROVE the lookup touched one member,
  *    not the archive.
  *
  * Scale shape: at 100 TB the index is itself a table — (surt, ts,
  * file, offset, length, digest) rows, sorted/bucketed by surt — and
  * lookups are index-joins followed by ranged reads; nothing here
  * shuffles archive bytes, and the index rows are a few dozen bytes
  * per record regardless of payload size.
  */
object Cdx {

  /** One index row. `ts` is the CDX 14-digit form (YYYYMMDDhhmmss)
    * of the record's WARC-Date; `length` is the COMPRESSED member
    * length (the seek window), `digest` the record's block digest as
    * written.
    */
  final case class Entry(
      surt: String,
      ts: String,
      uri: String,
      offset: Long,
      length: Long,
      digest: String)

  /** WARC-Date (`2026-01-01T00:00:00Z`) → CDX timestamp
    * (`20260101000000`): digits kept, everything else dropped —
    * tolerant of the sub-second forms WARC 1.1 allows.
    */
  def cdxTimestamp(warcDate: String): String =
    warcDate.filter(_.isDigit).take(14)

  /** Gzip-wrap each rendered WARC record as its own member,
    * concatenate, and return (archive bytes, index sorted by
    * (surt, ts)). Records without a Target-URI (warcinfo) index under
    * the empty key, first — the CDX convention of carrying them but
    * never looking them up by URL.
    */
  def writeIndexed(records: Seq[Array[Byte]])
      : (Array[Byte], Seq[Entry]) = {
    val bos = new java.io.ByteArrayOutputStream()
    var off = 0L
    val entries = records.map { rec =>
      val member = Compressed.gzipMember(rec, None)
      val uri = Warc.header(rec, "WARC-Target-URI").getOrElse("")
      val e = Entry(
        if (uri.isEmpty) "" else graft.text.Urls.surt(uri).getOrElse(uri),
        cdxTimestamp(Warc.header(rec, "WARC-Date").getOrElse("")),
        uri, off, member.length.toLong,
        Warc.header(rec, "WARC-Block-Digest").getOrElse(""))
      bos.write(member)
      off += member.length
      e
    }
    (bos.toByteArray, entries.sortBy(e => (e.surt, e.ts)))
  }

  /** Point lookup: decompress and parse the ONE record at the indexed
    * window, verifying (a) the window holds exactly one complete gzip
    * member with a clean CRC, (b) the member holds exactly one WARC
    * record, (c) the record's WARC-Block-Digest re-derives from the
    * parsed body. Returns (record, body, bytes read) — the third
    * component IS the witness that only `length` bytes were touched.
    * None on any violation (a stale index must fail loudly, not
    * return a misaligned record). Never throws.
    */
  def readAt(archive: Array[Byte], offset: Long, length: Long)
      : Option[(Warc.WarcRecord, Array[Byte], Long)] = {
    if (offset < 0 || length <= 0 ||
        offset + length > archive.length) return None
    val slice = java.util.Arrays.copyOfRange(archive,
      offset.toInt, (offset + length).toInt)
    Compressed.memberPayloads(slice) match {
      case Some(Seq((m, payload))) if m.crc_ok =>
        Warc.parseSingleWithBody(payload).flatMap { case (r, b) =>
          if (Warc.header(payload, "WARC-Block-Digest")
              .contains(Warc.blockDigest(b)))
            Some((r, b, slice.length.toLong))
          else None
        }
      case _ => None // zero, several, or corrupt members: stale index
    }
  }
}
