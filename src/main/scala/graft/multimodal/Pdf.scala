package graft.multimodal

/** Minimal pure-JVM PDF text extraction (T180, VERDICT-r13 item 3 —
  * the last big content-coverage hole: a real crawl corpus is several
  * percent PDF and it all fell to the binary bucket).
  *
  * Scope — the subset a deterministic corpus pipeline needs, built
  * from the public PDF 32000-1:2008 spec:
  *  - object lexer: numbers, booleans, null, names (#xx escapes),
  *    literal strings (escapes + octal + balanced parens), hex
  *    strings, arrays, dictionaries, indirect references, streams;
  *  - cross-reference machinery: classic `xref` tables AND
  *    cross-reference streams (/Type/XRef, /W field widths, /Index
  *    subsections, PNG predictors 10–15 on the decoded rows),
  *    incremental-update /Prev chains (newest entry wins);
  *  - compressed object streams (/Type/ObjStm, /First + N header
  *    pairs) — where modern writers put every page dict;
  *  - stream filters: FlateDecode (zlib, RFC 1950 — the same
  *    java.util.zip path the HTTP tier uses) with optional PNG
  *    predictor DecodeParms, ASCIIHexDecode, and identity;
  *  - page-tree walk (/Root → /Pages → /Kids recursion, /Contents
  *    stream or array of streams) and content-stream text
  *    extraction from the text-showing operators Tj ' " TJ, with
  *    the standard positioning rule: Td, TD, T-star, ' and " start
  *    a new line, TJ kerning gaps below -180/1000 em re-insert a
  *    space.
  *
  * Byte→char mapping is the printable-ASCII identity (0x20–0x7E) of
  * StandardEncoding/WinAnsi; bytes outside it (embedded-font custom
  * encodings, UTF-16 strings) are dropped — documented, like the
  * charset tier's flagged fallbacks. A malformed PDF FLAGS
  * (ok=false + stage) and never throws: the crawl discipline — the
  * corpus keeps the row, routed to the binary bucket.
  *
  * Decompression-bomb guard: total inflated stream bytes are capped
  * (64 MiB per document) like the HTTP tier's content-decode cap.
  *
  * Determinism: pure integer/byte machinery end to end — same bytes
  * in, same text out, on any JVM.
  */
object Pdf {

  // ---------- object model ----------
  sealed trait Obj
  final case class PNum(v: Double) extends Obj { def i: Long = v.toLong }
  final case class PBool(b: Boolean) extends Obj
  case object PNull extends Obj
  final case class PName(s: String) extends Obj
  final case class PStr(bytes: Array[Byte]) extends Obj
  final case class PArr(items: Vector[Obj]) extends Obj
  final case class PDict(m: Map[String, Obj]) extends Obj
  final case class PRef(num: Int, gen: Int) extends Obj
  final case class PStream(dict: PDict, raw: Array[Byte]) extends Obj

  final case class PdfText(
      ok: Boolean,
      stage: String, // "" when ok; else the failing stage
      nPages: Int,
      nTextOps: Long,
      usedObjStm: Boolean,
      usedXrefStream: Boolean,
      text: String)

  private def fail(stage: String): PdfText =
    PdfText(ok = false, stage = stage, 0, 0L, usedObjStm = false,
      usedXrefStream = false, "")

  private final class Bomb extends RuntimeException("inflate cap")
  private val InflateCap = 64 << 20

  // ---------- lexer ----------
  private final class Lexer(val b: Array[Byte], var p: Int) {
    def ws(c: Int): Boolean =
      c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == '\f' ||
        c == 0
    def delim(c: Int): Boolean =
      c == '(' || c == ')' || c == '<' || c == '>' || c == '[' ||
        c == ']' || c == '{' || c == '}' || c == '/' || c == '%'
    def skipWs(): Unit = {
      var go = true
      while (go && p < b.length) {
        if (ws(b(p) & 0xff)) p += 1
        else if (b(p) == '%') { // comment to EOL
          while (p < b.length && b(p) != '\n' && b(p) != '\r') p += 1
        } else go = false
      }
    }
    def peekKeyword(s: String): Boolean =
      p + s.length <= b.length &&
        (0 until s.length).forall(i => b(p + i) == s.charAt(i)) &&
        (p + s.length == b.length || ws(b(p + s.length) & 0xff) ||
          delim(b(p + s.length) & 0xff))
    def expect(s: String): Unit = {
      skipWs()
      if (!peekKeyword(s) &&
          !(p + s.length <= b.length &&
            (0 until s.length).forall(i => b(p + i) == s.charAt(i))))
        throw new RuntimeException(s"expected $s at $p")
      p += s.length
    }

    /** Parse one object at the cursor (streams handled by the caller —
      * the `stream` keyword needs /Length resolution).
      */
    def obj(): Obj = {
      skipWs()
      if (p >= b.length) throw new RuntimeException("eof")
      (b(p) & 0xff) match {
        case '/' => name()
        case '(' => literalString()
        case '[' =>
          p += 1
          val items = Vector.newBuilder[Obj]
          skipWs()
          while (b(p) != ']') { items += obj(); skipWs() }
          p += 1
          PArr(items.result())
        case '<' =>
          if (p + 1 < b.length && b(p + 1) == '<') dict()
          else hexString()
        case 't' if peekKeyword("true") => p += 4; PBool(true)
        case 'f' if peekKeyword("false") => p += 5; PBool(false)
        case 'n' if peekKeyword("null") => p += 4; PNull
        case c if c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9') =>
          numberOrRef()
        case c =>
          throw new RuntimeException(s"unexpected byte $c at $p")
      }
    }

    def name(): PName = {
      p += 1 // '/'
      val sb = new StringBuilder
      while (p < b.length && !ws(b(p) & 0xff) && !delim(b(p) & 0xff)) {
        if (b(p) == '#' && p + 2 < b.length) {
          sb += Integer.parseInt(
            new String(b, p + 1, 2, "ISO-8859-1"), 16).toChar
          p += 3
        } else { sb += (b(p) & 0xff).toChar; p += 1 }
      }
      PName(sb.toString)
    }

    def literalString(): PStr = {
      p += 1 // '('
      val out = new java.io.ByteArrayOutputStream()
      var depth = 1
      while (depth > 0) {
        val c = b(p) & 0xff; p += 1
        c match {
          case '\\' =>
            val e = b(p) & 0xff; p += 1
            e match {
              case 'n' => out.write('\n')
              case 'r' => out.write('\r')
              case 't' => out.write('\t')
              case 'b' => out.write('\b')
              case 'f' => out.write('\f')
              case '(' => out.write('(')
              case ')' => out.write(')')
              case '\\' => out.write('\\')
              case '\r' => if (b(p) == '\n') p += 1 // line continuation
              case '\n' => // line continuation
              case d if d >= '0' && d <= '7' =>
                var v = d - '0'
                var k = 0
                while (k < 2 && p < b.length &&
                    b(p) >= '0' && b(p) <= '7') {
                  v = v * 8 + (b(p) - '0'); p += 1; k += 1
                }
                out.write(v & 0xff)
              case other => out.write(other) // spec: backslash ignored
            }
          case '(' => depth += 1; out.write('(')
          case ')' =>
            depth -= 1; if (depth > 0) out.write(')')
          case other => out.write(other)
        }
      }
      PStr(out.toByteArray)
    }

    def hexString(): PStr = {
      p += 1 // '<'
      val out = new java.io.ByteArrayOutputStream()
      var hi = -1
      while (b(p) != '>') {
        val c = b(p) & 0xff; p += 1
        val v = Character.digit(c, 16)
        if (v >= 0) {
          if (hi < 0) hi = v
          else { out.write(hi * 16 + v); hi = -1 }
        }
      }
      p += 1
      if (hi >= 0) out.write(hi * 16) // odd count: trailing 0
      PStr(out.toByteArray)
    }

    def dict(): PDict = {
      p += 2 // '<<'
      val m = Map.newBuilder[String, Obj]
      skipWs()
      while (!(b(p) == '>' && b(p + 1) == '>')) {
        val k = name()
        val v = obj()
        m += k.s -> v
        skipWs()
      }
      p += 2
      PDict(m.result())
    }

    def numberOrRef(): Obj = {
      skipWs()
      val start = p
      if (b(p) == '+' || b(p) == '-') p += 1
      while (p < b.length &&
          ((b(p) >= '0' && b(p) <= '9') || b(p) == '.')) p += 1
      val tok = new String(b, start, p - start, "ISO-8859-1")
      val v = tok.toDouble
      // `num gen R` lookahead — integers only
      if (v >= 0 && v == v.floor && !tok.contains('.')) {
        val save = p
        skipWs()
        val genStart = p
        while (p < b.length && b(p) >= '0' && b(p) <= '9') p += 1
        if (p > genStart) {
          val gen = new String(b, genStart, p - genStart, "ISO-8859-1")
          skipWs()
          if (p < b.length && b(p) == 'R' &&
              (p + 1 == b.length || ws(b(p + 1) & 0xff) ||
                delim(b(p + 1) & 0xff))) {
            p += 1
            return PRef(v.toInt, gen.toInt)
          }
        }
        p = save
      }
      PNum(v)
    }
  }

  // ---------- filters ----------
  /** Inflate a zlib stream with the bomb cap (FlateDecode). */
  private def flate(raw: Array[Byte], budget: Array[Long]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(raw)
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    try {
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n == 0 && !inf.finished()) return out.toByteArray // truncated
        out.write(buf, 0, n)
        budget(0) -= n
        if (budget(0) < 0) throw new Bomb
      }
      out.toByteArray
    } finally inf.end()
  }

  private def asciiHex(raw: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var hi = -1
    var i = 0
    var done = false
    while (i < raw.length && !done) {
      val c = raw(i) & 0xff
      if (c == '>') done = true
      else {
        val v = Character.digit(c, 16)
        if (v >= 0) {
          if (hi < 0) hi = v else { out.write(hi * 16 + v); hi = -1 }
        }
      }
      i += 1
    }
    if (hi >= 0) out.write(hi * 16)
    out.toByteArray
  }

  /** PNG predictors 10–15 (RFC 2083 row filters) over decoded rows —
    * xref streams are routinely predictor-12 (Up). bpp=1 here: PDF
    * predictor columns are bytes for the integer-field streams we
    * decode (/Colors 1 /BitsPerComponent 8).
    */
  private def pngUnpredict(data: Array[Byte], columns: Int): Array[Byte] = {
    val rowLen = columns + 1
    val nRows = data.length / rowLen
    val out = new Array[Byte](nRows * columns)
    var r = 0
    while (r < nRows) {
      val ft = data(r * rowLen) & 0xff
      var c = 0
      while (c < columns) {
        val raw = data(r * rowLen + 1 + c) & 0xff
        val left = if (c > 0) out(r * columns + c - 1) & 0xff else 0
        val up = if (r > 0) out((r - 1) * columns + c) & 0xff else 0
        val ul =
          if (r > 0 && c > 0) out((r - 1) * columns + c - 1) & 0xff else 0
        val v = ft match {
          case 0 => raw
          case 1 => raw + left
          case 2 => raw + up
          case 3 => raw + (left + up) / 2
          case 4 => // Paeth
            val pp = left + up - ul
            val pa = math.abs(pp - left)
            val pb = math.abs(pp - up)
            val pc = math.abs(pp - ul)
            raw + (if (pa <= pb && pa <= pc) left
                   else if (pb <= pc) up else ul)
          case _ => raw
        }
        out(r * columns + c) = (v & 0xff).toByte
        c += 1
      }
      r += 1
    }
    out
  }

  // ---------- document ----------
  private final class Doc(bytes: Array[Byte]) {
    val budget = Array(InflateCap.toLong)
    // object number → either a file offset (type 1) or (objstm, idx)
    // (type 2). Newest xref section wins: every entry — INCLUDING
    // free/'f'/type-0 — claims its object number in `xrefSeen`, so an
    // object deleted in an incremental update is a tombstone an older
    // /Prev section cannot resurrect (PDF 32000-1 §7.5.6; ADVICE r14).
    val direct = scala.collection.mutable.Map.empty[Int, Long]
    val inStm = scala.collection.mutable.Map.empty[Int, (Int, Int)]
    private val xrefSeen = scala.collection.mutable.HashSet.empty[Int]
    var trailer: Map[String, Obj] = Map.empty
    var sawXrefStream = false
    var sawObjStm = false
    private val cache = scala.collection.mutable.Map.empty[Int, Obj]
    private val loading = scala.collection.mutable.Set.empty[Int]

    def resolve(o: Obj): Obj = o match {
      case PRef(n, _) => fetch(n)
      case other => other
    }
    def num(o: Obj): Option[Long] = resolve(o) match {
      case p: PNum => Some(p.i)
      case _ => None
    }

    def decodeStream(st: PStream): Array[Byte] = {
      val filters = resolve(st.dict.m.getOrElse("Filter", PNull)) match {
        case PName(s) => Seq(s)
        case PArr(items) => items.map { case PName(s) => s; case _ => "" }
        case _ => Seq.empty
      }
      val parms = resolve(st.dict.m.getOrElse("DecodeParms", PNull)) match {
        case d: PDict => Seq(Some(d))
        case PArr(items) => items.map {
          case d: PDict => Some(d); case _ => None }
        case _ => Seq.fill(filters.length)(None)
      }
      var data = st.raw
      for ((f, i) <- filters.zipWithIndex) {
        data = f match {
          case "FlateDecode" | "Fl" => flate(data, budget)
          case "ASCIIHexDecode" | "AHx" => asciiHex(data)
          case other =>
            throw new RuntimeException(s"unsupported filter $other")
        }
        val pm = if (i < parms.length) parms(i) else None
        val pred = pm.flatMap(d => num(d.m.getOrElse("Predictor", PNull)))
          .getOrElse(1L)
        if (pred >= 10) {
          val cols = pm.flatMap(d => num(d.m.getOrElse("Columns", PNull)))
            .getOrElse(1L).toInt
          data = pngUnpredict(data, cols)
        }
      }
      data
    }

    /** Parse `num gen obj ... endobj` at a file offset. */
    private def parseAt(off: Long): Obj = {
      val lx = new Lexer(bytes, off.toInt)
      lx.skipWs(); lx.numberOrRef() // object number (or spurious ref)
      lx.skipWs()
      // generation (numberOrRef above may have consumed `num gen R`?
      // no: `obj` is not `R`, so it returned PNum and the cursor is
      // after the first integer)
      lx.numberOrRef()
      lx.expect("obj")
      val o = lx.obj()
      lx.skipWs()
      o match {
        case d: PDict if lx.peekKeyword("stream") ||
            (lx.p + 6 <= bytes.length &&
              new String(bytes, lx.p, 6, "ISO-8859-1") == "stream") =>
          lx.p += 6
          if (lx.p < bytes.length && bytes(lx.p) == '\r') lx.p += 1
          if (lx.p < bytes.length && bytes(lx.p) == '\n') lx.p += 1
          val len = num(d.m.getOrElse("Length", PNull))
            .getOrElse(throw new RuntimeException("no /Length")).toInt
          val raw = java.util.Arrays.copyOfRange(bytes, lx.p, lx.p + len)
          PStream(d, raw)
        case other => other
      }
    }

    def fetch(n: Int): Obj = cache.getOrElseUpdate(n, {
      if (!loading.add(n))
        throw new RuntimeException(s"circular object $n")
      try {
        direct.get(n) match {
          case Some(off) => parseAt(off)
          case None =>
            inStm.get(n) match {
              case Some((stmNum, idx)) =>
                sawObjStm = true
                val stm = fetch(stmNum) match {
                  case s: PStream => s
                  case _ => throw new RuntimeException(s"objstm $stmNum")
                }
                val data = decodeStream(stm)
                val first = num(stm.dict.m.getOrElse("First", PNull))
                  .getOrElse(throw new RuntimeException("no /First")).toInt
                val nObjs = num(stm.dict.m.getOrElse("N", PNull))
                  .getOrElse(0L).toInt
                val hl = new Lexer(data, 0)
                val pairs = (0 until nObjs).map { _ =>
                  val on = hl.numberOrRef().asInstanceOf[PNum].i.toInt
                  val ooff = hl.numberOrRef().asInstanceOf[PNum].i.toInt
                  (on, ooff)
                }
                if (idx >= pairs.length)
                  throw new RuntimeException(s"objstm idx $idx")
                val (_, ooff) = pairs(idx)
                new Lexer(data, first + ooff).obj()
              case None => PNull // free / unknown object
            }
        }
      } finally loading -= n
    })

    /** Process ONE xref-stream section at `off`; returns its /Prev
      * offset (-1 if none). Every row — including type-0 (free) —
      * claims its object number, so a newer free entry tombstones the
      * object against older sections. */
    private def loadStreamSection(off: Long): Long = {
      sawXrefStream = true
      val o = parseAt(off)
      val st = o match {
        case s: PStream => s
        case _ => throw new RuntimeException("bad xref stream")
      }
      if (trailer.isEmpty) trailer = st.dict.m
      val data = decodeStream(st)
      val w = resolve(st.dict.m.getOrElse("W", PNull)) match {
        case PArr(items) => items.map {
          case p: PNum => p.i.toInt; case _ => 0 }
        case _ => throw new RuntimeException("no /W")
      }
      val size = num(st.dict.m.getOrElse("Size", PNull)).getOrElse(0L)
      val index = resolve(st.dict.m.getOrElse("Index", PNull)) match {
        case PArr(items) => items.map {
          case p: PNum => p.i; case _ => 0L }
        case _ => Seq(0L, size)
      }
      val rowLen = w.sum
      var pos = 0
      val pairs = index.grouped(2).toSeq
      for (Seq(start, count) <- pairs; k <- 0L until count
           if pos + rowLen <= data.length) {
        def field(fi: Int): Long = {
          val o0 = pos + w.take(fi).sum
          var v = 0L
          for (j <- 0 until w(fi)) v = (v << 8) | (data(o0 + j) & 0xff)
          v
        }
        val typ = if (w(0) == 0) 1L else field(0)
        val f2 = field(1)
        val f3 = field(2)
        val objN = (start + k).toInt
        if (xrefSeen.add(objN)) {
          if (typ == 1L) direct(objN) = f2
          else if (typ == 2L) inStm(objN) = (f2.toInt, f3.toInt)
          // typ == 0: free — tombstone only
        }
        pos += rowLen
      }
      st.dict.m.get("Prev") match {
        case Some(p: PNum) => p.i
        case _ => -1L
      }
    }

    /** Load xref section(s) starting at `off`, following /Prev. */
    def loadXref(off0: Long): Unit = {
      var off = off0
      var guard = 0
      while (off >= 0 && guard < 64) {
        guard += 1
        val lx = new Lexer(bytes, off.toInt)
        lx.skipWs()
        if (lx.peekKeyword("xref")) {
          // classic table — entries are BUFFERED, not committed, until
          // the trailer is read: a hybrid-reference file (§7.5.8.4)
          // carries /XRefStm in the classic trailer, and the stream's
          // entries take precedence over this table's (the table marks
          // objstm-resident objects free; committing table-first would
          // tombstone them and hide their text — ADVICE r14)
          val pending = scala.collection.mutable.ArrayBuffer
            .empty[(Int, Char, Long)]
          lx.p += 4
          lx.skipWs()
          while (!lx.peekKeyword("trailer")) {
            val start = lx.numberOrRef().asInstanceOf[PNum].i.toInt
            val count = lx.numberOrRef().asInstanceOf[PNum].i.toInt
            lx.skipWs()
            for (k <- 0 until count) {
              // entries: 10-digit offset, 5-digit gen, f/n — nominally
              // 20 bytes, but single-char-EOL writers emit 19; read
              // the 18 significant chars then skip the EOL run, which
              // tolerates both (the next entry starts with a digit)
              val e = new String(bytes, lx.p, 18, "ISO-8859-1")
              val entOff = e.substring(0, 10).toLong
              val typ = e.charAt(17)
              pending += ((start + k, typ, entOff))
              lx.p += 18
              while (lx.p < bytes.length && (bytes(lx.p) == ' ' ||
                  bytes(lx.p) == '\r' || bytes(lx.p) == '\n')) lx.p += 1
            }
            lx.skipWs()
          }
          lx.p += "trailer".length
          val t = lx.obj().asInstanceOf[PDict]
          if (trailer.isEmpty) trailer = t.m
          t.m.get("XRefStm") match {
            case Some(p: PNum) =>
              // hybrid file: the stream's /Prev (if any) is ignored —
              // the classic chain below carries the /Prev walk
              try loadStreamSection(p.i)
              catch { case _: Throwable => } // broken XRefStm must not
                                             // kill the classic chain
            case _ =>
          }
          for ((objN, typ, entOff) <- pending)
            if (xrefSeen.add(objN) && typ == 'n')
              direct(objN) = entOff // 'f' = tombstone: seen, no offset
          off = t.m.get("Prev") match {
            case Some(p: PNum) => p.i
            case _ => -1L
          }
        } else {
          off = loadStreamSection(off)
        }
      }
    }
  }

  /** Find the last `startxref` offset near EOF. */
  private def startxref(bytes: Array[Byte]): Long = {
    val tailLen = math.min(bytes.length, 2048)
    val tail = new String(bytes, bytes.length - tailLen, tailLen,
      "ISO-8859-1")
    val i = tail.lastIndexOf("startxref")
    if (i < 0) return -1L
    val after = tail.substring(i + 9).trim
    val numStr = after.takeWhile(_.isDigit)
    if (numStr.isEmpty) -1L else numStr.toLong
  }

  // ---------- text extraction ----------
  /** Kerning threshold: a TJ gap wider than 0.18 em reads as a word
    * space (the common heuristic; Tf sizes cancel for same-size runs).
    */
  private val KernSpace = -180.0

  private def showBytes(sb: StringBuilder, s: Array[Byte]): Unit = {
    var i = 0
    while (i < s.length) {
      val c = s(i) & 0xff
      if (c >= 0x20 && c <= 0x7e) sb += c.toChar
      i += 1
    }
  }

  /** Extract text from ONE decoded content stream. */
  private def contentText(data: Array[Byte], sb: StringBuilder): Long = {
    val lx = new Lexer(data, 0)
    var ops = 0L
    val operands = scala.collection.mutable.ArrayBuffer.empty[Obj]
    def newline(): Unit =
      if (sb.nonEmpty && sb.last != '\n') sb += '\n'
    while (lx.p < data.length) {
      lx.skipWs()
      if (lx.p >= data.length) return ops
      val c = data(lx.p) & 0xff
      if (c == '/' || c == '(' || c == '<' || c == '[' || c == '+' ||
          c == '-' || c == '.' || (c >= '0' && c <= '9')) {
        // an operand — but `<</..>>` inline dicts appear too (BDC etc.)
        operands += (try lx.obj() catch {
          case _: Throwable => lx.p = data.length; PNull })
      } else {
        // an operator token
        val start = lx.p
        while (lx.p < data.length && !lx.ws(data(lx.p) & 0xff) &&
            !lx.delim(data(lx.p) & 0xff)) lx.p += 1
        if (lx.p == start) { lx.p += 1 } // stray delimiter
        else {
          val op = new String(data, start, lx.p - start, "ISO-8859-1")
          op match {
            case "Tj" =>
              operands.lastOption.collect { case PStr(s) =>
                showBytes(sb, s); ops += 1 }
            case "'" =>
              newline()
              operands.lastOption.collect { case PStr(s) =>
                showBytes(sb, s); ops += 1 }
            case "\"" =>
              newline()
              operands.lastOption.collect { case PStr(s) =>
                showBytes(sb, s); ops += 1 }
            case "TJ" =>
              operands.lastOption.collect { case PArr(items) =>
                items.foreach {
                  case PStr(s) => showBytes(sb, s)
                  case PNum(v) if v < KernSpace =>
                    if (sb.nonEmpty && sb.last != ' ' && sb.last != '\n')
                      sb += ' '
                  case _ =>
                }
                ops += 1
              }
            case "Td" | "TD" | "T*" => newline()
            case "ET" => newline()
            case "BI" =>
              // inline image: skip to EI (binary payload would derail
              // the lexer)
              var q = lx.p
              var found = false
              while (!found && q + 1 < data.length) {
                if (data(q) == 'E' && data(q + 1) == 'I' &&
                    (q + 2 >= data.length ||
                      lx.ws(data(q + 2) & 0xff))) found = true
                else q += 1
              }
              lx.p = if (found) q + 2 else data.length
            case _ =>
          }
          operands.clear()
        }
      }
    }
    ops
  }

  /** Walk the page tree, depth-first in /Kids order. */
  private def pages(doc: Doc, node: Obj,
      acc: scala.collection.mutable.ArrayBuffer[PDict],
      depth: Int): Unit = {
    if (depth > 64) return
    doc.resolve(node) match {
      case d: PDict =>
        doc.resolve(d.m.getOrElse("Type", PNull)) match {
          case PName("Pages") =>
            doc.resolve(d.m.getOrElse("Kids", PNull)) match {
              case PArr(kids) =>
                kids.foreach(k => pages(doc, k, acc, depth + 1))
              case _ =>
            }
          case PName("Page") => acc += d
          case _ =>
        }
      case _ =>
    }
  }

  /** The public entry: parse + extract, flagged never thrown. */
  def extractText(bytes: Array[Byte]): PdfText = {
    if (bytes.length < 8 ||
        new String(bytes, 0, 5, "ISO-8859-1") != "%PDF-")
      return fail("header")
    val sx = startxref(bytes)
    if (sx < 0 || sx >= bytes.length) return fail("startxref")
    val doc = new Doc(bytes)
    try doc.loadXref(sx)
    catch { case e: Throwable =>
      if (sys.props.contains("graft.pdf.debug")) e.printStackTrace()
      return fail("xref") }
    val root = doc.trailer.get("Root") match {
      case Some(r) => r
      case None => return fail("trailer")
    }
    try {
      val rootDict = doc.resolve(root) match {
        case d: PDict => d
        case _ => return fail("root")
      }
      val pageList = scala.collection.mutable.ArrayBuffer.empty[PDict]
      pages(doc, rootDict.m.getOrElse("Pages", PNull), pageList, 0)
      if (pageList.isEmpty) return fail("pages")
      val sb = new StringBuilder
      var ops = 0L
      for (pg <- pageList) {
        val contents = doc.resolve(pg.m.getOrElse("Contents", PNull))
        val streams = contents match {
          case s: PStream => Seq(s)
          case PArr(items) => items.flatMap(i => doc.resolve(i) match {
            case s: PStream => Some(s); case _ => None })
          case _ => Seq.empty
        }
        for (st <- streams)
          ops += contentText(doc.decodeStream(st), sb)
        if (sb.nonEmpty && sb.last != '\n') sb += '\n'
      }
      PdfText(ok = true, "", pageList.length, ops,
        usedObjStm = doc.sawObjStm, usedXrefStream = doc.sawXrefStream,
        sb.toString)
    } catch {
      case _: Bomb => fail("bomb")
      case _: Throwable => fail("content")
    }
  }

  // ---------- document metadata (T187: the /Info dictionary) ----------

  /** Decoded document-information dictionary (PDF 32000-1 §14.3.3).
    * Strings decode per the spec's two text encodings: a UTF-16BE BOM
    * (FE FF) routes to UTF-16BE, anything else reads as
    * PDFDocEncoding (ASCII-transparent; the non-ASCII differences
    * from Latin-1 are dropped with the same printable discipline as
    * the text extractor).
    */
  final case class PdfInfo(
      ok: Boolean,
      title: Option[String],
      author: Option[String],
      producer: Option[String],
      creationDate: Option[String])

  private def textString(b: Array[Byte]): String =
    if (b.length >= 2 && (b(0) & 0xff) == 0xfe && (b(1) & 0xff) == 0xff)
      new String(b, 2, b.length - 2, "UTF-16BE")
    else new String(b.filter(x => (x & 0xff) >= 0x20 && (x & 0xff) <= 0x7e),
      "ISO-8859-1")

  /** Extract the trailer's /Info dictionary. Flagged, never thrown —
    * and a PDF without one is ok=true with empty fields (absence is
    * normal, not a malformation).
    */
  def info(bytes: Array[Byte]): PdfInfo = {
    if (bytes.length < 8 ||
        new String(bytes, 0, 5, "ISO-8859-1") != "%PDF-")
      return PdfInfo(ok = false, None, None, None, None)
    val sx = startxref(bytes)
    if (sx < 0 || sx >= bytes.length)
      return PdfInfo(ok = false, None, None, None, None)
    val doc = new Doc(bytes)
    try {
      doc.loadXref(sx)
      doc.trailer.get("Info").map(doc.resolve) match {
        case Some(d: PDict) =>
          def f(k: String): Option[String] = doc.resolve(
            d.m.getOrElse(k, PNull)) match {
            case PStr(b) => Some(textString(b))
            case _ => None
          }
          PdfInfo(ok = true, f("Title"), f("Author"), f("Producer"),
            f("CreationDate"))
        case _ => PdfInfo(ok = true, None, None, None, None)
      }
    } catch {
      case _: Throwable => PdfInfo(ok = false, None, None, None, None)
    }
  }

  // ---------- synthesis (the closed-form-oracle side, T101 pattern) ----------

  /** Escape a string for a PDF literal string. */
  private def esc(s: String): String =
    s.flatMap {
      case '(' => "\\("
      case ')' => "\\)"
      case '\\' => "\\\\"
      case c => c.toString
    }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Content stream for one page: tokens joined as a kerned TJ run —
    * extraction re-inserts one space per gap, so
    * extract(synthesize(tokens)) == tokens.mkString(" ") + "\n".
    */
  private def contentFor(tokens: Seq[String]): Array[Byte] = {
    val tj = tokens.map(t => s"(${esc(t)})").mkString(" -320 ")
    s"BT /F1 12 Tf 72 720 Td [$tj] TJ ET\n".getBytes("ISO-8859-1")
  }

  /** Synthesize a complete single- or multi-page PDF.
    *
    * Shapes (the query's three wire forms):
    *  - `classic`: classic xref table, uncompressed content streams;
    *  - `flate`:   classic xref table, FlateDecode content streams;
    *  - `objstm`:  catalog/pages/page dicts inside a compressed
    *    object stream referenced by a predictor-12 xref STREAM —
    *    the modern-writer layout.
    *
    * `pageTokens` — one token seq per page. `info` adds a document-
    * information dictionary (an extra trailer-referenced object; in
    * the objstm shape it lives INSIDE the object stream, as modern
    * writers do); `utf16Info` renders its strings as BOM'd UTF-16BE
    * hex strings instead of literal strings (both legal text-string
    * encodings — §14.3.3's two wire forms).
    */
  def synthesize(pageTokens: Seq[Seq[String]], shape: String,
      info: Seq[(String, String)] = Nil,
      utf16Info: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    val offsets = scala.collection.mutable.Map.empty[Int, Int]
    w("%PDF-1.5\n%âãÏÓ\n")
    val nPages = pageTokens.length
    // object numbering: 1 catalog, 2 pages, 3..(2+n) page dicts,
    // (3+n)..(2+2n) content streams, then font (3+2n); objstm shape
    // adds the object stream (4+2n) and the xref stream (5+2n)
    val catN = 1
    val pagesN = 2
    def pageN(i: Int) = 3 + i
    def contN(i: Int) = 3 + nPages + i
    val fontN = 3 + 2 * nPages
    val kids = (0 until nPages).map(i => s"${pageN(i)} 0 R").mkString(" ")
    val catalog = s"<< /Type /Catalog /Pages $pagesN 0 R >>"
    val pagesDict =
      s"<< /Type /Pages /Kids [$kids] /Count $nPages >>"
    def pageDict(i: Int) =
      s"<< /Type /Page /Parent $pagesN 0 R /MediaBox [0 0 612 792] " +
        s"/Contents ${contN(i)} 0 R /Resources << /Font << /F1 $fontN 0 R " +
        s">> >> >>"
    val fontDict =
      "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    def infoVal(v: String): String =
      if (utf16Info)
        "<FEFF" + v.getBytes("UTF-16BE").map("%02X".format(_)).mkString +
          ">"
      else s"(${esc(v)})"
    val infoDict: Option[String] =
      if (info.isEmpty) None
      else Some(info.map { case (k, v) => s"/$k ${infoVal(v)}" }
        .mkString("<< ", " ", " >>"))

    def writeObj(n: Int, body: String): Unit = {
      offsets(n) = out.size()
      w(s"$n 0 obj\n$body\nendobj\n")
    }
    def writeStreamObj(n: Int, extra: String, data: Array[Byte],
        compress: Boolean): Unit = {
      offsets(n) = out.size()
      val payload = if (compress) deflate(data) else data
      val filter = if (compress) " /Filter /FlateDecode" else ""
      w(s"$n 0 obj\n<< /Length ${payload.length}$filter$extra >>\nstream\n")
      out.write(payload)
      w("\nendstream\nendobj\n")
    }

    shape match {
      case "classic" | "flate" =>
        val compress = shape == "flate"
        writeObj(catN, catalog)
        writeObj(pagesN, pagesDict)
        for (i <- 0 until nPages) writeObj(pageN(i), pageDict(i))
        for (i <- 0 until nPages)
          writeStreamObj(contN(i), "", contentFor(pageTokens(i)), compress)
        writeObj(fontN, fontDict)
        val infoN = fontN + 1
        infoDict.foreach(d => writeObj(infoN, d))
        val xrefOff = out.size()
        val maxN = if (infoDict.isDefined) infoN else fontN
        w(s"xref\n0 ${maxN + 1}\n")
        w("0000000000 65535 f \n")
        for (n <- 1 to maxN)
          w(f"${offsets(n)}%010d 00000 n \n")
        val infoRef =
          if (infoDict.isDefined) s" /Info $infoN 0 R" else ""
        w(s"trailer\n<< /Size ${maxN + 1} /Root $catN 0 R$infoRef >>\n")
        w(s"startxref\n$xrefOff\n%%EOF\n")

      case "objstm" =>
        val objStmN = 4 + 2 * nPages
        val xrefStmN = 5 + 2 * nPages
        val infoN = 6 + 2 * nPages
        // content streams + font live as direct objects; the DICTS
        // (catalog, pages, pages, info) live inside the object stream
        for (i <- 0 until nPages)
          writeStreamObj(contN(i), "", contentFor(pageTokens(i)),
            compress = true)
        writeObj(fontN, fontDict)
        // object stream: header pairs then bodies
        val inStream: Seq[(Int, String)] =
          (Seq(catN -> catalog, pagesN -> pagesDict) ++
            (0 until nPages).map(i => pageN(i) -> pageDict(i))) ++
            infoDict.map(infoN -> _).toSeq
        val bodies = inStream.map(_._2 + "\n")
        val offs = bodies.scanLeft(0)(_ + _.length).init
        val header = inStream.zip(offs)
          .map { case ((n, _), o) => s"$n $o" }.mkString(" ") + "\n"
        val stmData =
          (header + bodies.mkString).getBytes("ISO-8859-1")
        writeStreamObj(objStmN,
          s" /Type /ObjStm /N ${inStream.length} /First ${header.length}",
          stmData, compress = true)
        // xref stream: W [1 4 2], predictor-12 rows for objects
        // 0..xrefStmN
        val xrefOff = out.size()
        val size = if (infoDict.isDefined) infoN + 1 else xrefStmN + 1
        val rows = (0 until size).map { n =>
          val (t, f2, f3): (Int, Int, Int) =
            if (n == 0) (0, 0, 65535)
            else if (n == objStmN || n == fontN ||
                (n >= contN(0) && n < contN(0) + nPages))
              (1, offsets(n), 0)
            else if (n == xrefStmN) (1, xrefOff, 0)
            else {
              val idx = inStream.indexWhere(_._1 == n)
              (2, objStmN, idx)
            }
          Array[Int](t,
            (f2 >>> 24) & 0xff, (f2 >>> 16) & 0xff,
            (f2 >>> 8) & 0xff, f2 & 0xff,
            (f3 >>> 8) & 0xff, f3 & 0xff)
        }
        val cols = 7
        // PNG Up predictor (type 2): row_i - row_{i-1}
        val pred = new java.io.ByteArrayOutputStream()
        var prev = new Array[Int](cols)
        for (r <- rows) {
          pred.write(2)
          for (c <- 0 until cols) pred.write((r(c) - prev(c)) & 0xff)
          prev = r
        }
        offsets(xrefStmN) = xrefOff
        val xdata = deflate(pred.toByteArray)
        val infoRef =
          if (infoDict.isDefined) s"/Info $infoN 0 R " else ""
        w(s"$xrefStmN 0 obj\n<< /Type /XRef /Size $size /W [1 4 2] " +
          s"/Root $catN 0 R $infoRef/Filter /FlateDecode " +
          s"/DecodeParms << /Predictor 12 /Columns $cols >> " +
          s"/Length ${xdata.length} >>\nstream\n")
        out.write(xdata)
        w("\nendstream\nendobj\n")
        w(s"startxref\n$xrefOff\n%%EOF\n")

      case other =>
        throw new IllegalArgumentException(s"unknown shape $other")
    }
    out.toByteArray
  }
}
