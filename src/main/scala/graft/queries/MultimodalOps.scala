package graft.queries

import org.apache.spark.sql.functions._

import Common._
import graft.multimodal.{AudioVideo, Multimodal}
import graft.ops.Hashing

/** Multimodal-column query surface: the binary → mapPartitions-decode →
  * features pipeline. Two decode tiers (see graft.multimodal
  * .Multimodal): container headers are parsed FOR REAL (PNG IHDR / BMP
  * DIB → width/height/channels, q110 proves byte-exact recovery);
  * the pixel tier beyond the header is deterministic-fake until codec
  * bindings exist. q39 runs text bytes through the same pipeline —
  * non-image payloads must yield null dims, never a crash (the oracle
  * checks the nulls).
  */
object MultimodalOps {

  val qs: Seq[Q] = Seq(
    Q("q39_multimodal_features",
      "binary payload column + batched mapPartitions feature extraction" +
        " (non-image payloads → null container dims)",
      Some(s"""SELECT doc_id AS media_id, 'text' AS kind,
          CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
          CASE WHEN length(text) > 0 THEN ascii(substr(text, 1, 1))
               ELSE -1 END AS first_byte,
          list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform(range(1, length(text)+1),
              i -> CAST(ascii(substr(text, CAST(i AS INT), 1)) AS BIGINT))),
            (a, b) -> (a*31 + b) % ${Hashing.P}) AS checksum,
          CAST(NULL AS VARCHAR) AS format, CAST(NULL AS INT) AS width,
          CAST(NULL AS INT) AS height, CAST(NULL AS INT) AS channels
        FROM documents ORDER BY media_id"""),
      (s, d) => {
        import s.implicits._
        val media = Multimodal.asMediaFrame(
          table(s, d, "documents"), "doc_id", "text", "text")
          .as[Multimodal.MediaRow]
        Multimodal.extractFeatures(media).toDF().orderBy("media_id")
      }),

    Q("q110_image_headers",
      "real container-header decode: per-doc synthesized PNG/BMP " +
        "payloads flow through the binary pipeline and the decoder must " +
        "recover format/width/height/channels byte-exactly (the oracle " +
        "knows the synthesis formula, so any parse defect hash-fails)",
      Some("""SELECT doc_id AS media_id,
          CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'png' END AS format,
          CAST(doc_id % 64 + 1 AS INT) AS width,
          CAST(doc_id % 48 + 1 AS INT) AS height,
          CAST(CASE WHEN doc_id % 2 = 0 THEN 3
                    WHEN doc_id % 4 = 1 THEN 4 ELSE 1 END AS INT) AS channels
        FROM documents ORDER BY media_id"""),
      (s, d) => {
        import s.implicits._
        // Payload synthesis happens executor-side inside the typed map —
        // the driver never holds payload bytes, mirroring how real media
        // arrive already distributed. Even docs become 24-bit BMPs, odd
        // docs PNGs alternating RGBA / grayscale color types.
        val media = table(s, d, "documents").select(col("doc_id")).as[Long]
          .map { id =>
            val w = (id % 64 + 1).toInt
            val h = (id % 48 + 1).toInt
            if (id % 2 == 0)
              Multimodal.MediaRow(id, "bmp", Multimodal.syntheticBmp(w, h, 24))
            else {
              val colorType = if (id % 4 == 1) 6 else 0
              Multimodal.MediaRow(id, "png", Multimodal.syntheticPng(w, h, colorType))
            }
          }
        Multimodal.extractFeatures(media)
          .select(col("media_id"), col("format"), col("width"),
            col("height"), col("channels"))
          .orderBy("media_id")
      }),

    Q("q191_jpeg_headers",
      "JPEG container decode (T101): per-doc synthesized JPEG streams " +
        "— SOI, JFIF APP0, COM, dummy DQT, SOF0, EOI — flow through " +
        "the binary pipeline; the decoder must WALK the marker chain " +
        "(variable-length segment skips, standalone-marker handling, " +
        "SOF-family match excluding DHT/JPG/DAC) to recover " +
        "width/height/components, exactly like libjpeg. The oracle " +
        "knows the synthesis formula, so any defect in the segment " +
        "walk hash-fails; MultimodalSpec additionally parses a REAL " +
        "ImageIO-written JPEG with the same scanner",
      Some("""SELECT doc_id AS media_id, 'jpeg' AS format,
          CAST(doc_id % 300 + 1 AS INT) AS width,
          CAST(doc_id % 200 + 1 AS INT) AS height,
          CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END AS INT)
            AS channels
        FROM documents ORDER BY media_id"""),
      (s, d) => {
        import s.implicits._
        val media = table(s, d, "documents").select(col("doc_id")).as[Long]
          .map { id =>
            val w = (id % 300 + 1).toInt
            val h = (id % 200 + 1).toInt
            val nc = if (id % 2 == 0) 1 else 3
            Multimodal.MediaRow(id, "jpeg", Multimodal.syntheticJpeg(w, h, nc))
          }
        Multimodal.extractFeatures(media)
          .select(col("media_id"), col("format"), col("width"),
            col("height"), col("channels"))
          .orderBy("media_id")
      }),

    Q("q193_exif_orientation",
      "EXIF orientation decode (T102): per-doc JPEGs carry an APP1 " +
        "Exif segment whose TIFF payload alternates byte order per " +
        "doc (II little- vs MM big-endian), and the decoder must do " +
        "the real TIFF walk — byte-order mark, IFD0 offset, 12-byte " +
        "entry iteration past a leading width tag — to recover " +
        "orientation tag 0x0112: the value an image dedup pipeline " +
        "reads BEFORE pixel hashing (a rotated duplicate hashes " +
        "differently if orientation is ignored). Dims come from the " +
        "same marker walk as q191 (APP1 skipped en route to SOF0); " +
        "the oracle knows the synthesis formula",
      Some("""SELECT doc_id AS media_id,
          CAST(doc_id % 8 + 1 AS INT) AS orientation,
          CASE WHEN doc_id % 2 = 0 THEN 'II' ELSE 'MM' END AS byte_order,
          CAST(doc_id % 100 + 1 AS INT) AS width,
          CAST(doc_id % 80 + 1 AS INT) AS height
        FROM documents ORDER BY media_id"""),
      (s, d) => {
        import s.implicits._
        table(s, d, "documents").select(col("doc_id")).as[Long]
          .map { id =>
            val w = (id % 100 + 1).toInt
            val h = (id % 80 + 1).toInt
            val le = id % 2 == 0
            val p = Multimodal.syntheticExifJpeg(w, h, 3,
              (id % 8 + 1).toInt, le)
            val ori = Multimodal.decodeExifOrientation(p).getOrElse(-1)
            val dims = Multimodal.decodeImageHeader(p)
            (id, ori, if (le) "II" else "MM",
              dims.map(_._2).getOrElse(-1), dims.map(_._3).getOrElse(-1))
          }
          .toDF("media_id", "orientation", "byte_order", "width", "height")
          .orderBy("media_id")
      }),

    Q("q125_pixel_stats",
      "REAL pixel-tier decode: per-doc synthesized 24-bpp BMPs (padded " +
        "strides, bottom-up rows) and PNGs (8-bit gray/RGB, genuine " +
        "zlib-deflated IDAT, scanline filters 0-4 cycling per row) flow " +
        "through the batched decoder; aggregate channel stats must " +
        "match the closed-form synthesis formula — any defect in " +
        "stride padding, inflate handling or filter reconstruction " +
        "hash-fails",
      Some("""WITH g AS (
          SELECT doc_id,
            CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'png' END AS format,
            CAST(doc_id % 16 + 4 AS INT) AS width,
            CAST(doc_id % 12 + 4 AS INT) AS height,
            CAST(CASE WHEN doc_id % 4 = 3 THEN 1 ELSE 3 END AS INT) AS channels
          FROM documents),
        px AS (
          SELECT g.doc_id, g.format, g.width, g.height, g.channels,
            (g.doc_id * 7 + x.x * 3 + y.y * 5 + c.c * 11) % 256 AS v
          FROM g, range(0, 20) x(x), range(0, 16) y(y), range(0, 3) c(c)
          WHERE x.x < g.width AND y.y < g.height AND c.c < g.channels)
        SELECT doc_id AS media_id, format, width, height, channels,
          CAST(SUM(v) AS DOUBLE) / COUNT(*) AS px_mean,
          CAST(MIN(v) AS INT) AS px_min, CAST(MAX(v) AS INT) AS px_max
        FROM px
        GROUP BY doc_id, format, width, height, channels
        ORDER BY media_id"""),
      (s, d) => {
        import s.implicits._
        // Synthesis is executor-side (payloads never touch the driver);
        // the deterministic per-pixel formula gives the oracle a
        // closed-form twin of the decoded statistics.
        val media = table(s, d, "documents").select(col("doc_id")).as[Long]
          .map { id =>
            val w = (id % 16 + 4).toInt
            val h = (id % 12 + 4).toInt
            def f(x: Int, y: Int, c: Int): Int =
              ((id * 7 + x * 3 + y * 5 + c * 11) % 256).toInt
            if (id % 2 == 0)
              Multimodal.MediaRow(id, "bmp",
                Multimodal.syntheticBmpImage(w, h, f))
            else {
              val colorType = if (id % 4 == 1) 2 else 0
              Multimodal.MediaRow(id, "png",
                Multimodal.syntheticPngImage(w, h, colorType, f))
            }
          }
        Multimodal.extractPixelStats(media).toDF()
          .select(col("media_id"), col("format"), col("width"),
            col("height"), col("channels"), col("px_mean"),
            col("px_min"), col("px_max"))
          .orderBy("media_id")
      }),

    Q("q127_audio_stats",
      "REAL audio-tier decode: per-doc synthesized RIFF/WAVE PCM " +
        "payloads (8-bit unsigned and 16-bit signed, mono and stereo, " +
        "mixed sample rates) flow through the batched decoder; " +
        "duration and one-pass sample statistics must match the " +
        "closed-form synthesis formula — any defect in chunk walking, " +
        "block alignment or sign handling hash-fails",
      Some("""WITH g AS (
          SELECT doc_id,
            CASE WHEN doc_id % 3 = 0 THEN 2 ELSE 1 END AS channels,
            CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                 ELSE 44100 END AS sample_rate,
            CAST(doc_id % 50 + 20 AS BIGINT) AS n_frames,
            doc_id % 2 = 0 AS wide
          FROM documents),
        s AS (
          SELECT g.doc_id, g.channels, g.sample_rate, g.n_frames, g.wide,
            CASE WHEN g.wide
                 THEN (g.doc_id*13 + t.t*7 + c.c*3) % 65536 - 32768
                 ELSE (g.doc_id*13 + t.t*7 + c.c*3) % 256 END AS v
          FROM g, range(0, 70) t(t), range(0, 2) c(c)
          WHERE t.t < g.n_frames AND c.c < g.channels)
        SELECT doc_id AS media_id, CAST(channels AS INT) AS channels,
          CAST(sample_rate AS INT) AS sample_rate, n_frames,
          n_frames * 1000.0 / sample_rate AS duration_ms,
          CAST(SUM(v) AS DOUBLE) / COUNT(*) AS sample_mean,
          CAST(MIN(v) AS INT) AS sample_min,
          CAST(MAX(v) AS INT) AS sample_max
        FROM s
        GROUP BY doc_id, channels, sample_rate, n_frames
        ORDER BY media_id"""),
      (s, d) => {
        import s.implicits._
        // Synthesis is executor-side, as in q110/q125: payload bytes
        // exist only inside tasks; the oracle knows the closed-form twin.
        val media = table(s, d, "documents").select(col("doc_id")).as[Long]
          .map { id =>
            val channels = if (id % 3 == 0) 2 else 1
            val rate = (id % 3) match {
              case 0 => 8000; case 1 => 16000; case _ => 44100
            }
            val frames = (id % 50 + 20).toInt
            val bits = if (id % 2 == 0) 16 else 8
            def f(t: Int, c: Int): Int =
              if (bits == 16) ((id * 13 + t * 7 + c * 3) % 65536).toInt - 32768
              else ((id * 13 + t * 7 + c * 3) % 256).toInt
            Multimodal.MediaRow(id, "wav",
              AudioVideo.syntheticWav(frames, channels, rate, bits, f))
          }
        AudioVideo.extractAudioStats(media).toDF()
          .select(col("media_id"), col("channels"), col("sample_rate"),
            col("n_frames"), col("duration_ms"), col("sample_mean"),
            col("sample_min"), col("sample_max"))
          .orderBy("media_id")
      }),

    Q("q128_frame_sample",
      "REAL video-tier frame sampling: per-doc synthesized YUV4MPEG2 " +
        "streams (C420 chroma planes with non-constant filler) are " +
        "sampled every 3rd frame by the batched decoder; per-sampled-" +
        "frame luma stats must match the closed-form formula — a " +
        "mis-sized chroma plane misaligns every later frame, so the " +
        "hash doubles as a frame-alignment proof",
      Some("""WITH g AS (
          SELECT doc_id,
            CAST(2 * (doc_id % 8 + 2) AS INT) AS width,
            CAST(2 * (doc_id % 6 + 2) AS INT) AS height,
            CAST(doc_id % 9 + 4 AS INT) AS n_frames
          FROM documents),
        px AS (
          SELECT g.doc_id, g.width, g.height, g.n_frames, t.t,
            (g.doc_id*7 + x.x*3 + y.y*5 + t.t*11) % 256 AS v
          FROM g, range(0, 13) t(t), range(0, 18) x(x), range(0, 14) y(y)
          WHERE t.t < g.n_frames AND t.t % 3 = 0
            AND x.x < g.width AND y.y < g.height)
        SELECT doc_id AS media_id, width, height, n_frames,
          CAST(t AS INT) AS frame_idx,
          CAST(SUM(v) AS DOUBLE) / COUNT(*) AS y_mean,
          CAST(MIN(v) AS INT) AS y_min, CAST(MAX(v) AS INT) AS y_max
        FROM px
        GROUP BY doc_id, width, height, n_frames, t
        ORDER BY media_id, frame_idx"""),
      (s, d) => {
        import s.implicits._
        val media = table(s, d, "documents").select(col("doc_id")).as[Long]
          .map { id =>
            val w = (2 * (id % 8 + 2)).toInt
            val h = (2 * (id % 6 + 2)).toInt
            val frames = (id % 9 + 4).toInt
            def luma(x: Int, y: Int, t: Int): Int =
              ((id * 7 + x * 3 + y * 5 + t * 11) % 256).toInt
            Multimodal.MediaRow(id, "y4m",
              AudioVideo.syntheticY4m(w, h, frames, luma))
          }
        AudioVideo.extractFrameStats(media, stride = 3).toDF()
          .select(col("media_id"), col("width"), col("height"),
            col("n_frames"), col("frame_idx"), col("y_mean"),
            col("y_min"), col("y_max"))
          .orderBy("media_id", "frame_idx")
      }),

    Q("q139_perceptual_hash",
      "REAL resize tier + perceptual dedup: decoded BMP/PNG pixels are " +
        "nearest-neighbor downsampled to 8×8 and mean-thresholded into " +
        "the classic aHash (64-bit fingerprint as a portable bit " +
        "string); the oracle recomputes the hash from the synthesis " +
        "formula, so any defect in spatial orientation (BMP bottom-up " +
        "un-flip!), NN index math or thresholding hash-fails — " +
        "n_same groups perceptual duplicates",
      Some("""WITH g AS (
          SELECT doc_id,
            CAST(doc_id % 24 + 9 AS INT) AS w,
            CAST(doc_id % 20 + 9 AS INT) AS h,
            CAST(CASE WHEN doc_id % 4 = 3 THEN 1 ELSE 3 END AS INT) AS ch
          FROM documents),
        cells AS (
          SELECT g.doc_id, j.j * 8 + i.i AS k,
            SUM((g.doc_id*7 + ((i.i*g.w)//8)*3 + ((j.j*g.h)//8)*5
                 + c.c*11) % 256) AS v
          FROM g, range(0, 8) i(i), range(0, 8) j(j), range(0, 3) c(c)
          WHERE c.c < g.ch
          GROUP BY g.doc_id, j.j * 8 + i.i),
        tot AS (SELECT doc_id, SUM(v) AS total FROM cells GROUP BY doc_id),
        hashes AS (
          SELECT c.doc_id,
            string_agg(CASE WHEN c.v * 64 > t.total THEN '1' ELSE '0' END,
              '' ORDER BY c.k) AS ahash
          FROM cells c JOIN tot t ON c.doc_id = t.doc_id
          GROUP BY c.doc_id)
        SELECT doc_id AS media_id, ahash,
          CAST(COUNT(*) OVER (PARTITION BY ahash) AS BIGINT) AS n_same
        FROM hashes ORDER BY media_id"""),
      (s, d) => {
        import s.implicits._
        val media = table(s, d, "documents").select(col("doc_id")).as[Long]
          .map { id =>
            val w = (id % 24 + 9).toInt
            val h = (id % 20 + 9).toInt
            def f(x: Int, y: Int, c: Int): Int =
              ((id * 7 + x * 3 + y * 5 + c * 11) % 256).toInt
            if (id % 2 == 0)
              Multimodal.MediaRow(id, "bmp",
                Multimodal.syntheticBmpImage(w, h, f))
            else {
              val colorType = if (id % 4 == 1) 2 else 0
              Multimodal.MediaRow(id, "png",
                Multimodal.syntheticPngImage(w, h, colorType, f))
            }
          }
        val hashes = media.mapPartitions { rows =>
          rows.map(r => (r.media_id, Multimodal.aHashBits(r.payload).orNull))
        }.toDF("media_id", "ahash")
        hashes.withColumn("n_same",
          count(lit(1)).over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("ahash"))))
          .orderBy("media_id")
      }),

    Q("q195_gzip_member_split",
      "concatenated-gzip member split (T104, VERDICT-r8 stretch): " +
        "per-doc synthesized multi-member gzip archives (the WARC/WET " +
        "crawl-ingest shape — back-to-back RFC 1952 members with FNAME " +
        "headers, written by java.util.zip.Deflater) flow through the " +
        "binary tier, and the walker must do the REAL container parse: " +
        "header-field walk (FNAME path exercised on every member), a " +
        "genuine streaming Inflater pass to find each member's end " +
        "(the container has no length field — splitting REQUIRES " +
        "inflating), CRC32+ISIZE trailer verification. Emitted stats " +
        "(member count, inflated bytes, inflated BYTE SUM, crc-valid " +
        "count, joined member names) have closed-form twins, so any " +
        "defect in header skips, deflate termination or trailer checks " +
        "hash-fails; byte_sum only matches if the inflated bytes are " +
        "byte-exact. O(1) memory per member (8 KB streaming buffer), " +
        "payload bytes never shuffle",
      Some("""WITH g AS (SELECT doc_id, doc_id % 4 + 1 AS n FROM documents),
        m AS (SELECT g.doc_id, g.n, k.k,
            g.doc_id % 50 + 10 * k.k + 1 AS len,
            97 + (g.doc_id + k.k) % 26 AS bv
          FROM g, range(0, 4) k(k) WHERE k.k < g.n)
        SELECT doc_id AS media_id, CAST(MAX(n) AS BIGINT) AS n_members,
          CAST(SUM(len) AS BIGINT) AS uncomp_bytes,
          CAST(SUM(len * bv) AS BIGINT) AS byte_sum,
          CAST(MAX(n) AS BIGINT) AS n_crc_ok,
          string_agg('m' || k || '.txt', ',' ORDER BY k) AS names
        FROM m GROUP BY doc_id ORDER BY media_id"""),
      (s, d) => {
        import s.implicits._
        import graft.multimodal.Compressed
        // Archive synthesis is executor-side (q110/q125 discipline):
        // member k of doc id carries (id%50 + 10k + 1) bytes, every
        // byte 'a' + (id+k)%26 — compressed bytes are Deflater-
        // implementation-specific but the INFLATED stats are closed-
        // form, which is what the oracle checks.
        table(s, d, "documents").select(col("doc_id")).as[Long]
          .map { id =>
            val n = (id % 4 + 1).toInt
            val bos = new java.io.ByteArrayOutputStream()
            for (k <- 0 until n) {
              val len = (id % 50 + 10 * k + 1).toInt
              val b = Array.fill[Byte](len)(('a' + ((id + k) % 26)).toByte)
              bos.write(Compressed.gzipMember(b, Some(s"m$k.txt")))
            }
            val ms = Compressed.splitGzipMembers(bos.toByteArray)
              .getOrElse(Seq.empty)
            (id, ms.length.toLong, ms.map(_.uncomp_len).sum,
              ms.map(_.byte_sum).sum, ms.count(_.crc_ok).toLong,
              ms.flatMap(_.name).mkString(","))
          }
          .toDF("media_id", "n_members", "uncomp_bytes", "byte_sum",
            "n_crc_ok", "names")
          .orderBy("media_id")
      }),

    Q("q206_warc_records",
      "WARC record parse over split gzip members (T104 composed into " +
        "the real crawl-ingest pipeline, VERDICT-r9 item 3): per-doc " +
        "archives are Common-Crawl-shaped — concatenated RFC 1952 " +
        "members, EXACTLY one ISO 28500 WARC record per member — " +
        "built by the shipped writers (Warc.render + " +
        "Compressed.gzipMember), then read back through the T104 " +
        "member walk (memberPayloads: the same walker as q195 with " +
        "the payload sink on, O(one member) memory) and the real WARC " +
        "parser: strict version line, case-insensitive named headers " +
        "with LWS folding, required-header enforcement (WARC-Type / " +
        "Record-ID / Date / Content-Length), length-delimited body, " +
        "strict CRLFCRLF record boundary. Emitted stats (record and " +
        "per-type counts, body byte totals, byte SUM, target-URI " +
        "join, full per-record body MD5 join) all have closed-form " +
        "twins, so a defect in header parse, body consumption or " +
        "boundary handling hash-fails; the MD5 column matches only " +
        "if every body byte survives the gzip+WARC round trip " +
        "exactly. WarcSpec truncation- and mutation-sweeps the parser " +
        "on real WARC bytes (the CompressedSpec discipline). Archive " +
        "and body bytes never shuffle — one task holds one archive, " +
        "only structure and witnesses leave it",
      Some("""WITH g AS (SELECT doc_id, doc_id % 3 + 1 AS n FROM documents),
        m AS (SELECT g.doc_id, k.k,
            CASE WHEN k.k = 0 THEN 'warcinfo'
                 WHEN (g.doc_id + k.k) % 2 = 0 THEN 'response'
                 ELSE 'request' END AS typ,
            g.doc_id % 40 + 5 * k.k + 7 AS len,
            97 + (g.doc_id + k.k) % 26 AS bv
          FROM g, range(0, 3) k(k) WHERE k.k < g.n)
        SELECT doc_id AS media_id,
          CAST(COUNT(*) AS BIGINT) AS n_records,
          CAST(SUM(CASE WHEN typ = 'response' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_response,
          CAST(SUM(CASE WHEN typ = 'request' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_request,
          CAST(SUM(len) AS BIGINT) AS body_bytes,
          CAST(SUM(len * bv) AS BIGINT) AS body_sum,
          string_agg(CASE WHEN typ <> 'warcinfo'
            THEN 'http://ex.test/d' || doc_id || '/r' || k END,
            ',' ORDER BY k) AS uris,
          string_agg(md5(repeat(chr(CAST(bv AS INT)), CAST(len AS INT))),
            ',' ORDER BY k) AS md5s
        FROM m GROUP BY doc_id ORDER BY media_id"""),
      (s, d) => {
        import s.implicits._
        import graft.multimodal.{Compressed, Warc}
        table(s, d, "documents").select(col("doc_id")).as[Long]
          .map { id =>
            val n = (id % 3 + 1).toInt
            val bos = new java.io.ByteArrayOutputStream()
            for (k <- 0 until n) {
              val typ =
                if (k == 0) "warcinfo"
                else if ((id + k) % 2 == 0) "response"
                else "request"
              val len = (id % 40 + 5 * k + 7).toInt
              val body = Array.fill[Byte](len)(('a' + ((id + k) % 26)).toByte)
              val hdrs = Seq(
                "WARC-Type" -> typ,
                "WARC-Record-ID" -> s"<urn:uuid:$id-$k>",
                "WARC-Date" -> "2026-01-01T00:00:00Z") ++
                (if (typ == "warcinfo")
                  Seq("Content-Type" -> "application/warc-fields")
                else Seq(
                  "WARC-Target-URI" -> s"http://ex.test/d$id/r$k",
                  "Content-Type" -> "application/http"))
              bos.write(Compressed.gzipMember(Warc.render(hdrs, body), None))
            }
            val recs = Compressed.memberPayloads(bos.toByteArray)
              .getOrElse(Seq.empty)
              .flatMap { case (_, payload) => Warc.parseSingle(payload) }
            val uris = recs.flatMap(_.targetUri)
            (id, recs.length.toLong,
              recs.count(_.warcType == "response").toLong,
              recs.count(_.warcType == "request").toLong,
              recs.map(_.contentLength).sum,
              recs.map(_.bodySum).sum,
              if (uris.isEmpty) null else uris.mkString(","),
              recs.map(_.bodyMd5).mkString(","))
          }
          .toDF("media_id", "n_records", "n_response", "n_request",
            "body_bytes", "body_sum", "uris", "md5s")
          .orderBy("media_id")
      }),

    Q("q208_http_payload",
      "HTTP response payload extraction (the third story of the " +
        "crawl-ingest stack, on top of VERDICT-r9 item 3): Common " +
        "Crawl response records carry the RAW HTTP exchange, so " +
        "per-doc archives here are gzip members → WARC response " +
        "records → real HTTP/1.1 messages (status line, named " +
        "headers, Content-Length, payload), walked by T104 " +
        "(memberPayloads) → T115 (parseSingleWithBody) → the HTTP " +
        "parser: status-code recovery, media-type + charset " +
        "extraction from Content-Type (quoted and bare), declared-vs-" +
        "actual length check (a disagreeing inner Content-Length is " +
        "FLAGGED, not fatal — truncated fetches are endemic in crawl " +
        "archives and the WARC record length is authoritative), and " +
        "the payload handed to the T107 UTF-8 auditor for codepoint " +
        "counts — multi-byte payloads (2-byte é runs) make " +
        "cp_total < payload_bytes exactly where the synthesis says. " +
        "Every stat (status/type/charset joins, byte totals, byte " +
        "sum, codepoint total, full per-payload MD5 join) has a " +
        "closed-form twin; HttpSpec sweeps the parser on truncations " +
        "and flips. Payload bytes never shuffle — the whole " +
        "three-layer walk happens inside one task per archive",
      Some("""WITH g AS (SELECT doc_id, doc_id % 3 + 1 AS n FROM documents),
        m AS (SELECT g.doc_id, k.k,
            CASE WHEN (g.doc_id + k.k) % 7 = 0 THEN 404 ELSE 200 END
              AS st,
            g.doc_id % 30 + 4 + 3 * k.k AS mm,
            (g.doc_id + k.k) % 5 = 0 AS acc,
            97 + (g.doc_id + k.k) % 26 AS bv,
            CASE WHEN k.k % 2 = 0 THEN 'text/plain' ELSE 'text/html' END
              AS mt,
            CASE WHEN k.k % 2 = 0 THEN 'utf-8' ELSE '-' END AS cs
          FROM g, range(0, 3) k(k) WHERE k.k < g.n),
        m2 AS (SELECT *, CASE WHEN acc
            THEN repeat('é', CAST(mm AS INT))
            ELSE repeat(chr(CAST(bv AS INT)), CAST(mm AS INT)) END AS pay
          FROM m)
        SELECT doc_id AS media_id,
          CAST(COUNT(*) AS BIGINT) AS n_resp,
          CAST(SUM(CASE WHEN st = 200 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_ok,
          string_agg(CAST(st AS VARCHAR), ',' ORDER BY k) AS statuses,
          string_agg(mt, ',' ORDER BY k) AS types,
          string_agg(cs, ',' ORDER BY k) AS charsets,
          CAST(COUNT(*) AS BIGINT) AS n_len_ok,
          CAST(SUM(CASE WHEN acc THEN 2 * mm ELSE mm END) AS BIGINT)
            AS payload_bytes,
          CAST(SUM(CASE WHEN acc THEN 364 * mm ELSE bv * mm END)
            AS BIGINT) AS payload_sum,
          CAST(SUM(mm) AS BIGINT) AS cp_total,
          string_agg(md5(pay), ',' ORDER BY k) AS md5s
        FROM m2 GROUP BY doc_id ORDER BY media_id"""),
      (s, d) => {
        import s.implicits._
        import graft.multimodal.{Compressed, Http, Warc}
        table(s, d, "documents").select(col("doc_id")).as[Long]
          .map { id =>
            val n = (id % 3 + 1).toInt
            val bos = new java.io.ByteArrayOutputStream()
            for (k <- 0 until n) {
              val status = if ((id + k) % 7 == 0) 404 else 200
              val mm = (id % 30 + 4 + 3 * k).toInt
              val pay =
                if ((id + k) % 5 == 0) "é" * mm
                else ("" + ('a' + ((id + k) % 26)).toChar) * mm
              val payB = pay.getBytes("UTF-8")
              val ctype =
                if (k % 2 == 0) "text/plain; charset=utf-8"
                else "text/html"
              val http = Http.render(status,
                if (status == 200) "OK" else "Not Found",
                Seq("Content-Type" -> ctype, "Server" -> "synth"), payB)
              val warc = Warc.render(Seq(
                "WARC-Type" -> "response",
                "WARC-Record-ID" -> s"<urn:uuid:$id-$k>",
                "WARC-Date" -> "2026-01-01T00:00:00Z",
                "WARC-Target-URI" -> s"http://ex.test/d$id/r$k"), http)
              bos.write(Compressed.gzipMember(warc, None))
            }
            val rs = Compressed.memberPayloads(bos.toByteArray)
              .getOrElse(Seq.empty)
              .flatMap { case (_, p) => Warc.parseSingleWithBody(p) }
              .filter(_._1.warcType == "response")
              .flatMap { case (_, body) => Http.parseResponseWithBody(body) }
            (id, rs.length.toLong,
              rs.count(_._1.status == 200).toLong,
              rs.map(_._1.status).mkString(","),
              rs.map(_._1.mediaType.getOrElse("-")).mkString(","),
              rs.map(_._1.charset.getOrElse("-")).mkString(","),
              rs.count(_._1.lenMatches).toLong,
              rs.map(_._1.bodyLen).sum,
              rs.map(_._1.bodySum).sum,
              rs.map { case (_, pay) =>
                graft.text.Utf8.audit(pay).n_cp_valid }.sum,
              rs.map(_._1.bodyMd5).mkString(","))
          }
          .toDF("media_id", "n_resp", "n_ok", "statuses", "types",
            "charsets", "n_len_ok", "payload_bytes", "payload_sum",
            "cp_total", "md5s")
          .orderBy("media_id")
      }),

    Q("q209_html_extract",
      "HTML → text extraction (the fourth story of the crawl-ingest " +
        "stack, T118): each doc's words are rendered into a real HTML " +
        "page — head with title/style/script (script body contains " +
        "markup-shaped decoy strings that must NOT resurface as " +
        "prose), h1, comment, 6-word <p> blocks with every 5th word " +
        "wrapped in an inline <a href> (inline tags must not split or " +
        "separate words), every word entity-escaped, and a final " +
        "entity-laden paragraph — then wrapped gzip → WARC response → " +
        "HTTP 200 text/html and walked back through ALL FOUR layers " +
        "(memberPayloads → parseSingleWithBody → parseResponseWithBody " +
        "→ Html.extractText): the complete Common-Crawl-archive → " +
        "documents pipeline in one task per doc, payload never " +
        "shuffling. The extractor is a single-pass scanner (no DOM): " +
        "rawtext skip, quote-aware attribute walk, entity decode, " +
        "block tags → line boundaries so the T113 boilerplate tier " +
        "sees real lines. Every output (title RCDATA, line/word/char " +
        "counts, href-link count, open-tag count, full text MD5) has " +
        "a closed-form DuckDB twin over the documents table",
      Some("""WITH w AS (SELECT doc_id,
            list_filter(regexp_split_to_array(text, '\s+'),
              x -> x <> '') AS ws
          FROM documents),
        g AS (SELECT doc_id, ws, CAST(len(ws) AS BIGINT) AS nw FROM w),
        ix AS (SELECT doc_id, ws,
            unnest(range(0, CAST(ceil(nw/6.0) AS BIGINT))) AS i
          FROM g),
        ch AS (SELECT doc_id, i,
            array_to_string(ws[CAST(6*i+1 AS BIGINT):
              CAST(6*i+6 AS BIGINT)], ' ') AS ln
          FROM ix),
        body AS (SELECT doc_id, string_agg(ln, chr(10) ORDER BY i) AS b
          FROM ch GROUP BY doc_id),
        t AS (SELECT g.doc_id, g.nw,
            'H' || CAST(g.doc_id AS VARCHAR) || chr(10) ||
            COALESCE(body.b || chr(10), '') || '&X B <t>' AS txt
          FROM g LEFT JOIN body ON g.doc_id = body.doc_id)
        SELECT doc_id, 'Doc ' || CAST(doc_id AS VARCHAR) AS title,
          CAST(2 + ceil(nw/6.0) AS BIGINT) AS n_lines,
          CAST(nw + 4 AS BIGINT) AS n_words,
          CAST(length(txt) AS BIGINT) AS n_chars,
          CAST(nw // 5 AS BIGINT) AS n_links,
          CAST(8 + ceil(nw/6.0) + nw // 5 AS BIGINT) AS n_tags,
          md5(txt) AS text_md5
        FROM t ORDER BY doc_id"""),
      (s, d) => {
        import s.implicits._
        import graft.multimodal.{Compressed, Html, Http, Warc}
        table(s, d, "documents").select(col("doc_id"), col("text"))
          .as[(Long, String)]
          .map { case (id, text) =>
            val ws = text.split("\\s+").filter(_.nonEmpty)
            val h = new StringBuilder
            h ++= s"<!DOCTYPE html><html><head><title>Doc $id</title>"
            h ++= "<style>p{margin:0} a>b{color:red}</style>"
            h ++= "<script>var s=\"<p>decoy prose</p>\";if(1&&2){}</script>"
            h ++= s"</head><body><h1>H$id</h1><!-- doc $id -->"
            var w = 0
            ws.grouped(6).foreach { grp =>
              h ++= "<p>"
              grp.zipWithIndex.foreach { case (word, k) =>
                if (k > 0) h ++= " "
                val esc = Html.escape(word)
                if (w % 5 == 4) h ++= s"""<a href="#w$w">$esc</a>"""
                else h ++= esc
                w += 1
              }
              h ++= "</p>"
            }
            h ++= "<p>&amp;X &#66; &lt;t&gt;</p></body></html>"
            val http = Http.render(200, "OK",
              Seq("Content-Type" -> "text/html; charset=utf-8"),
              h.toString.getBytes("UTF-8"))
            val warc = Warc.render(Seq(
              "WARC-Type" -> "response",
              "WARC-Record-ID" -> s"<urn:uuid:q209-$id>",
              "WARC-Date" -> "2026-01-01T00:00:00Z",
              "WARC-Target-URI" -> s"http://ex.test/p$id"), http)
            val ex = Compressed.memberPayloads(
                Compressed.gzipMember(warc, None))
              .getOrElse(Seq.empty).headOption
              .flatMap { case (_, rec) => Warc.parseSingleWithBody(rec) }
              .filter(_._1.warcType == "response")
              .flatMap { case (_, body) => Http.parseResponseWithBody(body) }
              .map { case (_, pay) =>
                Html.extractText(new String(pay, "UTF-8")) }
            ex match {
              case Some(e) =>
                val tb = e.text.getBytes("UTF-8")
                (id, e.title.getOrElse("-"),
                  e.text.split('\n').length.toLong,
                  e.text.split("\\s+").count(_.nonEmpty).toLong,
                  e.text.codePointCount(0, e.text.length).toLong,
                  e.nLinks.toLong, e.nTags.toLong,
                  java.security.MessageDigest.getInstance("MD5")
                    .digest(tb).map("%02x".format(_)).mkString)
              case None =>
                // a layer refusing its own synthesis is a loud failure:
                // sentinel row hash-mismatches the oracle
                (id, "LAYER_FAILED", -1L, -1L, -1L, -1L, -1L, "-")
            }
          }
          .toDF("doc_id", "title", "n_lines", "n_words", "n_chars",
            "n_links", "n_tags", "text_md5")
          .orderBy("doc_id")
      }),

    Q("q210_charset_decode",
      "charset-aware payload decode (T119, the T117 → T119 bridge): " +
        "four HTTP messages per doc — utf-8 with multi-byte runs, " +
        "windows-1252 smart-quote bytes, the SAME cp1252 bytes " +
        "declared iso-8859-1 (the WHATWG aliasing rule: browsers " +
        "decode latin-1 labels as cp1252, so 0x80-0x9F becomes the " +
        "quotes the author meant, not C1 controls), and an unknown " +
        "label over malformed bytes (falls back to the T107 UTF-8 " +
        "maximal-subpart repair, FLAGGED). The charset label is not " +
        "given to the decoder — it is EXTRACTED by the HTTP parser " +
        "from each message's Content-Type, so the composition is the " +
        "production path. Decoded text is witnessed per variant by " +
        "full MD5 (DuckDB constructs the expected post-decode " +
        "strings, including the WHATWG C1 mapping via chr(129)); " +
        "per-task work, nothing shuffles but the result",
      Some("""WITH b AS (SELECT doc_id,
            doc_id % 30 + 4 AS mm,
            chr(CAST(97 + doc_id % 26 AS INT)) AS ch,
            'd' || CAST(doc_id AS VARCHAR) AS pre
          FROM documents),
        t AS (SELECT doc_id, mm, pre,
            repeat(ch, CAST(mm AS INT)) || 'é😀' AS s1,
            pre || '€…‰‘’“”œ' || chr(129) || '©é' AS s2,
            pre || repeat(chr(65533), 2) AS s4
          FROM b)
        SELECT doc_id,
          'utf-8,windows-1252,windows-1252,utf-8' AS used,
          CAST(1 AS BIGINT) AS n_fallback,
          CAST(2 AS BIGINT) AS n_repl,
          CAST(mm + 2 + 2*(length(pre) + 11) + length(pre) + 2
            AS BIGINT) AS cp_total,
          md5(s1) || ',' || md5(s2) || ',' || md5(s2) || ',' || md5(s4)
            AS md5s
        FROM t ORDER BY doc_id"""),
      (s, d) => {
        import s.implicits._
        import graft.multimodal.{Charsets, Http}
        table(s, d, "documents").select(col("doc_id")).as[Long]
          .map { id =>
            val mm = (id % 30 + 4).toInt
            val pre = s"d$id"
            // (declared label, raw payload bytes) per variant
            val variants: Seq[(String, Array[Byte])] = Seq(
              ("UTF-8",
                (("" + ('a' + (id % 26)).toChar) * mm + "é😀")
                  .getBytes("UTF-8")),
              ("windows-1252",
                pre.getBytes("US-ASCII") ++
                  Array(0x80, 0x85, 0x89, 0x91, 0x92, 0x93, 0x94, 0x9c,
                    0x81, 0xa9, 0xe9).map(_.toByte)),
              ("ISO-8859-1",
                pre.getBytes("US-ASCII") ++
                  Array(0x80, 0x85, 0x89, 0x91, 0x92, 0x93, 0x94, 0x9c,
                    0x81, 0xa9, 0xe9).map(_.toByte)),
              ("x-unknown",
                pre.getBytes("US-ASCII") ++
                  Array(0xff, 0xc3).map(_.toByte)))
            val decs = variants.map { case (label, pay) =>
              val msg = Http.render(200, "OK",
                Seq("Content-Type" -> s"text/plain; charset=$label"), pay)
              val (r, body) = Http.parseResponseWithBody(msg).get
              Charsets.decode(body, r.charset)
            }
            (id,
              decs.map(_.used).mkString(","),
              decs.count(_.fellBack).toLong,
              decs.map(_.nReplacements).sum,
              decs.map(dd =>
                dd.text.codePointCount(0, dd.text.length).toLong).sum,
              decs.map { dd =>
                java.security.MessageDigest.getInstance("MD5")
                  .digest(dd.text.getBytes("UTF-8"))
                  .map("%02x".format(_)).mkString
              }.mkString(","))
          }
          .toDF("doc_id", "used", "n_fallback", "n_repl", "cp_total",
            "md5s")
          .orderBy("doc_id")
      }),

    Q("q207_tar_entries",
      "ustar member walk under the gzip layer (VERDICT-r9 stretch " +
        "item 8): per-doc .tar.gz archives — a real POSIX ustar " +
        "stream (512-byte headers, octal fields, spaces-substituted " +
        "header checksum, NUL-block terminator) wrapped in one RFC " +
        "1952 member — walked by the T104 splitter (memberPayloads) " +
        "composed with the Tar record layer: checksum verification " +
        "on every header, name/size/typeflag recovery, " +
        "length-delimited bodies with 512-block padding. Emitted " +
        "stats (entry count, name join, byte totals, byte sum, " +
        "checksum-ok count, per-entry body MD5 join) have closed-form " +
        "twins; TarSpec additionally referees the walker against GNU " +
        "tar's OWN output in both directions (it parses what " +
        "`tar --format=ustar` writes — prefix-split long paths " +
        "included — and `tar -xOf` extracts what our writer emits) " +
        "plus truncation/flip sweeps. Archive bytes never shuffle — " +
        "one task holds one archive, only structure and witnesses " +
        "leave it",
      Some("""WITH g AS (SELECT doc_id, doc_id % 4 + 1 AS n FROM documents),
        m AS (SELECT g.doc_id, k.k,
            g.doc_id % 60 + 9 * k.k + 3 AS len,
            65 + (g.doc_id + k.k) % 26 AS bv
          FROM g, range(0, 4) k(k) WHERE k.k < g.n)
        SELECT doc_id AS media_id,
          CAST(COUNT(*) AS BIGINT) AS n_entries,
          string_agg('d' || doc_id || '/f' || k || '.txt', ','
            ORDER BY k) AS names,
          CAST(SUM(len) AS BIGINT) AS total_bytes,
          CAST(SUM(len * bv) AS BIGINT) AS body_sum,
          CAST(COUNT(*) AS BIGINT) AS n_chksum_ok,
          string_agg(md5(repeat(chr(CAST(bv AS INT)), CAST(len AS INT))),
            ',' ORDER BY k) AS md5s
        FROM m GROUP BY doc_id ORDER BY media_id"""),
      (s, d) => {
        import s.implicits._
        import graft.multimodal.{Compressed, Tar}
        table(s, d, "documents").select(col("doc_id")).as[Long]
          .map { id =>
            val n = (id % 4 + 1).toInt
            val bos = new java.io.ByteArrayOutputStream()
            for (k <- 0 until n) {
              val len = (id % 60 + 9 * k + 3).toInt
              val body = Array.fill[Byte](len)(('A' + ((id + k) % 26)).toByte)
              bos.write(Tar.tarEntry(s"d$id/f$k.txt", body))
            }
            bos.write(Tar.tarEnd)
            val gz = Compressed.gzipMember(bos.toByteArray,
              Some(s"d$id.tar"))
            val es = Compressed.memberPayloads(gz).getOrElse(Seq.empty)
              .flatMap { case (_, tar) =>
                Tar.parseEntries(tar).getOrElse(Seq.empty) }
            (id, es.length.toLong,
              es.map(_.name).mkString(","),
              es.map(_.size).sum,
              es.map(_.bodySum).sum,
              es.count(_.chksum_ok).toLong,
              es.map(_.bodyMd5).mkString(","))
          }
          .toDF("media_id", "n_entries", "names", "total_bytes",
            "body_sum", "n_chksum_ok", "md5s")
          .orderBy("media_id")
      }),

    Q("q140_perceptual_near_dup",
      "perceptual NEAR-dup join with guaranteed recall: 64-bit aHashes " +
        "split into 4 bands of 16 bits — by pigeonhole, any pair within " +
        "Hamming distance 3 shares at least one full band, so the band " +
        "equi-join's candidate set provably covers every qualifying " +
        "pair; exact Hamming distance verifies candidates. The same " +
        "multi-index shape as the SimHash text tier (q62), composed " +
        "over the image tier. Image content is seed-MULTIPLICATIVE " +
        "(an additive per-image offset would cancel in the aHash mean " +
        "threshold, collapsing the corpus into a few thousand giant " +
        "exact-dup classes — measured 2.2M pairs / 428 s at sf0.1 " +
        "before this fix); every doc_id%100==1 shares its seed with " +
        "doc_id-1 plus a one-pixel corner edit, planting cross-format " +
        "BMP/PNG near-dup pairs. The oracle brute-forces all pairs " +
        "over packed 64-bit hashes, so a single missed candidate " +
        "hash-fails the recall claim",
      Some("""WITH p AS (
          SELECT doc_id, seed,
            CAST(seed % 24 + 9 AS INT) AS w,
            CAST(seed % 20 + 9 AS INT) AS h,
            CAST(CASE WHEN seed % 4 = 3 THEN 1 ELSE 3 END AS INT) AS ch,
            ((seed * 2654435761) % 1000003) % 251 + 2 AS mult,
            ((seed * 2654435761) % 1000003) % 17 AS twist
          FROM (SELECT doc_id,
              doc_id - CASE WHEN doc_id % 20 = 1 THEN 1 ELSE 0 END AS seed
            FROM documents)),
        cells AS (
          SELECT p.doc_id, j.j * 8 + i.i AS k,
            SUM((p.mult * (((i.i*p.w)//8)*7 + ((j.j*p.h)//8)*11 + c.c*3 + 1)
                 + p.twist * ((i.i*p.w)//8) * ((j.j*p.h)//8)
                 + CASE WHEN p.doc_id % 20 = 1 AND i.i = 0 AND j.j = 0
                        THEN 16 ELSE 0 END) % 256) AS v
          FROM p, range(0, 8) i(i), range(0, 8) j(j), range(0, 3) c(c)
          WHERE c.c < p.ch
          GROUP BY p.doc_id, j.j * 8 + i.i),
        tot AS (SELECT doc_id, SUM(v) AS total FROM cells GROUP BY doc_id),
        hx AS (
          SELECT c.doc_id,
            CAST(SUM(CASE WHEN c.v * 64 > t.total AND c.k < 32
              THEN (CAST(1 AS BIGINT) << c.k) ELSE 0 END) AS BIGINT) AS h1,
            CAST(SUM(CASE WHEN c.v * 64 > t.total AND c.k >= 32
              THEN (CAST(1 AS BIGINT) << (c.k - 32)) ELSE 0 END) AS BIGINT)
              AS h2
          FROM cells c JOIN tot t ON c.doc_id = t.doc_id
          GROUP BY c.doc_id)
        SELECT a.doc_id AS a_id, b.doc_id AS b_id,
          CAST(bit_count(xor(a.h1, b.h1))
             + bit_count(xor(a.h2, b.h2)) AS BIGINT) AS dist
        FROM hx a JOIN hx b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.h1, b.h1)) + bit_count(xor(a.h2, b.h2)) <= 3
        ORDER BY a_id, b_id"""),
      (s, d) => {
        import s.implicits._
        val media = table(s, d, "documents").select(col("doc_id")).as[Long]
          .map { id =>
            val planted = id % 20 == 1
            val seed = if (planted) id - 1 else id
            val w = (seed % 24 + 9).toInt
            val h = (seed % 20 + 9).toInt
            val ch = if (seed % 4 == 3) 1 else 3
            val mix = (seed * 2654435761L) % 1000003L
            val mult = (mix % 251 + 2).toInt
            val twist = (mix % 17).toInt
            // mult MULTIPLIES the spatial term: distinct seeds diverge in
            // bit pattern, not just offset (offsets cancel in the mean).
            // The planted corner edit hits only the pixel NN-sampled by
            // cell (0,0), and is small (+16/channel) so the image-mean
            // shift flips few borderline cells: planted pairs land at
            // Hamming 0-2, inside the banded join's d<=3 guarantee.
            def f(x: Int, y: Int, c: Int): Int = {
              val pert = if (planted && x == 0 && y == 0) 16 else 0
              (mult * (x * 7 + y * 11 + c * 3 + 1) + twist * x * y + pert) % 256
            }
            if (id % 2 == 0)
              Multimodal.MediaRow(id, "bmp",
                Multimodal.syntheticBmpImage(w, h, f))
            else
              Multimodal.MediaRow(id, "png",
                Multimodal.syntheticPngImage(w, h, if (ch == 1) 0 else 2, f))
          }
        val hashes = media.mapPartitions { rows =>
          rows.map(r => (r.media_id, Multimodal.aHashBits(r.payload).orNull))
        }.toDF("media_id", "ahash")
        // 4×16-bit band index — see Multimodal.perceptualNearDupPairs
        // for the recall lemma and the band-saturation rationale
        Multimodal.perceptualNearDupPairs(hashes, "media_id", "ahash", 3)
          .orderBy("a_id", "b_id")
      }),

    Q("q270_pdf_extract",
      "PDF text extraction (T180 — the crawl corpus' last big " +
        "undecoded content class): per doc a complete PDF is " +
        "synthesized in one of three wire shapes by residue — " +
        "classic xref + uncompressed streams, classic + FlateDecode, " +
        "and the modern-writer layout (page dicts inside a " +
        "compressed /ObjStm referenced by a predictor-12 xref " +
        "STREAM) — and routed through the T123 sniffer into the " +
        "full extractor: startxref → xref machinery → page-tree " +
        "walk → content-stream decode → TJ/Tj text ops with the " +
        "kerning-gap word rule. The oracle knows the synthesis " +
        "formula, so one wrong xref field width, predictor row, " +
        "objstm header offset, page order, or kern threshold " +
        "hash-fails the text md5. PdfSpec additionally runs the " +
        "SAME extractor over two real independently-written PDFs " +
        "(TeX and DocBook toolchains, 36 + 17 pages, object " +
        "streams + xref streams) and the decompression-bomb cap. " +
        "Scale shape: per-row synth+extract inside one narrow " +
        "mapPartitions tier — payload bytes never shuffle; only " +
        "(id, shape, md5) rows move",
      Some("""WITH t AS (SELECT doc_id,
            list_filter(regexp_split_to_array(text, '\s+'),
              x -> regexp_matches(x, '^[ -~]+$')) AS ws
          FROM documents),
        e AS (SELECT doc_id, ws, len(ws) AS n,
            CASE doc_id % 3 WHEN 0 THEN 'classic' WHEN 1 THEN 'flate'
              ELSE 'objstm' END AS shape,
            CASE WHEN doc_id % 2 = 1 AND len(ws) >= 2 THEN 2 ELSE 1 END
              AS np
          FROM t WHERE len(ws) >= 1),
        x AS (SELECT doc_id, shape, np,
            CASE WHEN np = 1 THEN array_to_string(ws, ' ') || chr(10)
              ELSE array_to_string(ws[1:CAST((n+1)//2 AS INT)], ' ')
                || chr(10)
                || array_to_string(ws[CAST((n+1)//2+1 AS INT):
                     CAST(n AS INT)], ' ') || chr(10) END AS txt
          FROM e)
        SELECT doc_id, shape, CAST(np AS INT) AS n_pages,
          CAST(CASE WHEN shape = 'objstm' THEN 1 ELSE 0 END AS INT)
            AS used_objstm,
          md5(txt) AS text_md5
        FROM x ORDER BY doc_id"""),
      (s, d) => {
        import s.implicits._
        import graft.multimodal.{Pdf, Sniff}
        table(s, d, "documents").select(col("doc_id"), col("text"))
          .as[(Long, String)]
          .mapPartitions(_.flatMap { case (id, text) =>
            // printable-ASCII tokens only: the byte→char identity the
            // extractor implements exactly (non-ASCII handling is the
            // charset tier's job, documented in Pdf's scaladoc)
            val ws = text.split("\\s+").toSeq
              .filter(t => t.nonEmpty && t.forall(c => c >= 0x20 && c <= 0x7e))
            if (ws.isEmpty) None
            else {
              val shape = (id % 3) match {
                case 0 => "classic"; case 1 => "flate"; case _ => "objstm"
              }
              val pages =
                if (id % 2 == 1 && ws.length >= 2) {
                  val k = (ws.length + 1) / 2
                  Seq(ws.take(k), ws.drop(k))
                } else Seq(ws)
              val pdf = Pdf.synthesize(pages, shape)
              // the sniffer routes it (T123): a PDF that does not sniff
              // as application/pdf would mis-bucket in the corpus
              val sniffed = Sniff.sniff(pdf)
              val r = Pdf.extractText(pdf)
              if (!r.ok || sniffed != "application/pdf") None
              else Some((id, shape, r.nPages,
                if (r.usedObjStm && r.usedXrefStream) 1 else 0,
                Common.md5Hex(r.text.getBytes("UTF-8"))))
            }
          })
          .toDF("doc_id", "shape", "n_pages", "used_objstm", "text_md5")
          .orderBy("doc_id")
      }),

    Q("q275_content_router",
      "content-extraction ROUTER capstone (T185 — the front door a " +
        "100 TB ingest actually runs: T123 sniff → dispatch → the " +
        "right extractor): per doc one of six wire shapes — real " +
        "HTML (T118 scanner, title + block text), a classic-xref " +
        "PDF and a modern objstm PDF (both through the T180 " +
        "extractor), UTF-8-BOM and UTF-16LE-BOM plain text (the " +
        "T119 WHATWG decode, BOM beats everything), and PNG-" +
        "signature binary (routed to the binary bucket, no text) — " +
        "is synthesized, sniffed, routed, and extracted. Route, " +
        "sniffed essence, title, text md5 and char count are all " +
        "closed-form: one mis-sniffed byte or mis-dispatched " +
        "extractor flips a row. Zero shuffle — the whole chain is " +
        "one narrow per-row tier, payload bytes never move",
      Some("""WITH t AS (SELECT doc_id,
            list_filter(regexp_split_to_array(text, '\s+'),
              x -> regexp_matches(x, '^[ -%''-;=?-~]+$')) AS ws
          FROM documents),
        e AS (SELECT doc_id, array_to_string(ws, ' ') AS body
          FROM t WHERE len(ws) >= 1)
        SELECT doc_id,
          CASE doc_id % 6 WHEN 0 THEN 'html' WHEN 1 THEN 'pdf'
            WHEN 2 THEN 'pdf' WHEN 5 THEN 'binary' ELSE 'text' END
            AS route,
          CASE doc_id % 6 WHEN 0 THEN 'text/html'
            WHEN 1 THEN 'application/pdf' WHEN 2 THEN 'application/pdf'
            WHEN 5 THEN 'image/png' ELSE 'text/plain' END AS sniffed,
          CASE WHEN doc_id % 6 = 0 THEN 'Doc ' || CAST(doc_id AS VARCHAR)
            ELSE NULL END AS title,
          CASE doc_id % 6 WHEN 0 THEN md5(body)
            WHEN 1 THEN md5(body || chr(10))
            WHEN 2 THEN md5(body || chr(10))
            WHEN 5 THEN '' ELSE md5(body) END AS text_md5,
          CAST(CASE doc_id % 6 WHEN 5 THEN 0
            WHEN 1 THEN length(body) + 1 WHEN 2 THEN length(body) + 1
            ELSE length(body) END AS BIGINT) AS n_chars
        FROM e ORDER BY doc_id"""),
      (s, d) => {
        import s.implicits._
        import graft.multimodal.{Charsets, Html, Pdf, Sniff}
        table(s, d, "documents").select(col("doc_id"), col("text"))
          .as[(Long, String)]
          .mapPartitions(_.flatMap { case (id, raw) =>
            // printable ASCII MINUS the HTML markup chars &<> (both
            // engines): body is interpolated into <p>…</p> below, and
            // an unescaped markup char would make Html.extractText
            // diverge from the oracle's md5(body) (ADVICE r14)
            val ws = raw.split("\\s+").toSeq
              .filter(t => t.nonEmpty && t.forall(c => c >= 0x20 &&
                c <= 0x7e && c != '&' && c != '<' && c != '>'))
            if (ws.isEmpty) None
            else {
              val body = ws.mkString(" ")
              val payload: Array[Byte] = (id % 6) match {
                case 0 =>
                  (s"<html><head><title>Doc $id</title></head>" +
                    s"<body><p>$body</p></body></html>")
                    .getBytes("UTF-8")
                case 1 => Pdf.synthesize(Seq(ws), "classic")
                case 2 => Pdf.synthesize(Seq(ws), "objstm")
                case 3 =>
                  Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++
                    body.getBytes("UTF-8")
                case 4 =>
                  Array[Byte](0xff.toByte, 0xfe.toByte) ++
                    body.getBytes("UTF-16LE")
                case _ =>
                  Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 0x0d,
                    0x0a, 0x1a, 0x0a) ++ Array.fill[Byte](16)(0)
              }
              // THE router: sniff, then dispatch to the tier that owns
              // the essence — the q270/q210/q39 extractors composed
              val sniffed = Sniff.sniff(payload)
              val (route, title, text) = sniffed match {
                case "text/html" =>
                  val ex = Html.extractText(
                    new String(payload, "UTF-8"))
                  ("html", ex.title, ex.text)
                case "application/pdf" =>
                  val r = Pdf.extractText(payload)
                  ("pdf", None, if (r.ok) r.text else "")
                case "text/plain" =>
                  ("text", None, Charsets.decode(payload, None).text)
                case _ => ("binary", None, "")
              }
              Some((id, route, sniffed, title.orNull,
                if (route == "binary") ""
                else Common.md5Hex(text.getBytes("UTF-8")),
                text.length.toLong))
            }
          })
          .toDF("doc_id", "route", "sniffed", "title", "text_md5",
            "n_chars")
          .orderBy("doc_id")
      }),

    Q("q276_webp_gif_headers",
      "WebP + GIF container decode (T186, closing the image-header " +
        "matrix next to PNG/BMP/JPEG): per doc one of five container " +
        "shapes — GIF89a logical screen descriptor, lossy WebP " +
        "(VP8 frame tag + 9D012A sync + 14-bit LE dims), lossless " +
        "VP8L (packed 14-bit width-1/height-1, bit-28 alpha, both " +
        "with and without), and extended VP8X (flag byte + 24-bit " +
        "LE canvas dims) — synthesized and decoded through the SAME " +
        "decodeImageHeader walk the other formats use (the RIFF " +
        "chunk list is walked for real, even-padding included). The " +
        "oracle knows the synthesis formula; one mis-read bit field " +
        "(the VP8L 14-bit packing is the classic off-by-one) " +
        "hash-fails. Per-row narrow map, payload never shuffles",
      Some("""SELECT doc_id AS media_id,
          CASE WHEN doc_id % 5 = 0 THEN 'gif' ELSE 'webp' END AS format,
          CAST(doc_id % 300 + 1 AS INT) AS width,
          CAST(doc_id % 200 + 1 AS INT) AS height,
          CAST(CASE doc_id % 5 WHEN 0 THEN 1 WHEN 3 THEN 4 WHEN 4
            THEN 4 ELSE 3 END AS INT) AS channels
        FROM documents ORDER BY media_id"""),
      (s, d) => {
        import s.implicits._
        val media = table(s, d, "documents").select(col("doc_id")).as[Long]
          .map { id =>
            val w = (id % 300 + 1).toInt
            val h = (id % 200 + 1).toInt
            val p = (id % 5) match {
              case 0 => Multimodal.syntheticGif(w, h)
              case 1 => Multimodal.syntheticWebp(w, h, "lossy")
              case 2 => Multimodal.syntheticWebp(w, h, "lossless")
              case 3 => Multimodal.syntheticWebp(w, h, "lossless",
                alpha = true)
              case _ => Multimodal.syntheticWebp(w, h, "extended",
                alpha = true)
            }
            Multimodal.MediaRow(id,
              if (id % 5 == 0) "gif" else "webp", p)
          }
        Multimodal.extractFeatures(media)
          .select(col("media_id"), col("format"), col("width"),
            col("height"), col("channels"))
          .orderBy("media_id")
      }),

    Q("q277_pdf_metadata",
      "PDF document-information extraction (T187, the /Info " +
        "dictionary a crawl corpus indexes on — PDF 32000-1 " +
        "§14.3.3): per doc the synthesized PDF carries Title / " +
        "Author / Producer / CreationDate, in BOTH legal text-string " +
        "wire forms — literal strings with escaped parens and " +
        "backslashes for even docs, BOM'd UTF-16BE hex strings for " +
        "odd — across the same three xref shapes as q270 (in the " +
        "objstm shape the Info dict itself lives inside the " +
        "compressed object stream, as modern writers emit it). The " +
        "extractor resolves trailer /Info through the full xref " +
        "machinery and decodes by BOM; every field is closed-form. " +
        "Per-row narrow map, zero shuffle",
      Some("""SELECT doc_id,
          CASE doc_id % 3 WHEN 0 THEN 'classic' WHEN 1 THEN 'flate'
            ELSE 'objstm' END AS shape,
          'Doc ' || CAST(doc_id AS VARCHAR) AS title,
          'Team (core) \ ' || CAST(doc_id % 5 AS VARCHAR) AS author,
          'graft-' || CAST(doc_id % 7 AS VARCHAR) AS producer,
          'D:202401' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
            || '000000Z' AS creation_date
        FROM documents ORDER BY doc_id"""),
      (s, d) => {
        import s.implicits._
        import graft.multimodal.Pdf
        table(s, d, "documents").select(col("doc_id")).as[Long]
          .map { id =>
            val shape = (id % 3) match {
              case 0 => "classic"; case 1 => "flate"; case _ => "objstm"
            }
            val fields = Seq(
              "Title" -> s"Doc $id",
              "Author" -> s"Team (core) \\ ${id % 5}",
              "Producer" -> s"graft-${id % 7}",
              "CreationDate" ->
                f"D:202401${id % 28 + 1}%02d000000Z")
            val pdf = Pdf.synthesize(Seq(Seq("meta")), shape,
              info = fields, utf16Info = id % 2 == 1)
            val i = Pdf.info(pdf)
            require(i.ok, s"info parse failed for $id/$shape")
            (id, shape, i.title.getOrElse(""), i.author.getOrElse(""),
              i.producer.getOrElse(""), i.creationDate.getOrElse(""))
          }
          .toDF("doc_id", "shape", "title", "author", "producer",
            "creation_date")
          .orderBy("doc_id")
      })
  )
}
