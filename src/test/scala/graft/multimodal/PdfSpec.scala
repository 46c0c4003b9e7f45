package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** T180 PDF text extraction: synthesized shapes with closed-form
  * expectations (the T101 JPEG pattern), a hand-written PDF in a
  * DIFFERENT style than the synthesizer's (classic xref, octal
  * escapes, hex strings, ' and " operators, ASCIIHexDecode,
  * array-of-contents), the two REAL independently-written PDFs that
  * ship in this container (TeX and DocBook toolchains), and the
  * flagged-never-thrown discipline on garbage.
  */
class PdfSpec extends AnyFunSuite {

  test("synthesized round-trip: classic / flate / objstm shapes, " +
      "single and multi page") {
    val toks1 = Seq(Seq("alpha", "beta", "gamma"))
    val toks2 = Seq(Seq("page", "one", "words"), Seq("page", "two"))
    for (shape <- Seq("classic", "flate", "objstm")) {
      val r1 = Pdf.extractText(Pdf.synthesize(toks1, shape))
      assert(r1.ok, s"$shape: ${r1.stage}")
      assert(r1.nPages == 1)
      assert(r1.text == "alpha beta gamma\n", shape)
      assert(r1.usedObjStm == (shape == "objstm"))
      assert(r1.usedXrefStream == (shape == "objstm"))

      val r2 = Pdf.extractText(Pdf.synthesize(toks2, shape))
      assert(r2.ok, s"$shape: ${r2.stage}")
      assert(r2.nPages == 2)
      assert(r2.text == "page one words\npage two\n", shape)
      assert(r2.nTextOps == 2) // one TJ per page
    }
  }

  test("token escaping survives: parens and backslashes in tokens") {
    val toks = Seq(Seq("a(b)", "c\\d", "(nested(deep))"))
    for (shape <- Seq("classic", "objstm")) {
      val r = Pdf.extractText(Pdf.synthesize(toks, shape))
      assert(r.ok && r.text == "a(b) c\\d (nested(deep))\n", shape)
    }
  }

  test("hand-written PDF in a different style: comments, octal " +
      "escapes, hex strings, ' and \" operators, Td line breaks, " +
      "ASCIIHexDecode, array-of-contents") {
    // Content stream 1: Tj with octal escape (\101 = 'A'), Td newline,
    // then the ' (move-and-show) operator.
    val c1 = "BT /F1 10 Tf 50 700 Td (\\101lpha line) Tj " +
      "0 -12 Td (second) Tj T* (third)' ET"
    // Content stream 2 (ASCIIHexDecode): hex string text via the
    // " operator (word-space, char-space, string).
    val c2raw = "BT 1 0 0 1 50 600 Tm <68657821> Tj 2 3 (quoted)\" ET"
    val c2hex = c2raw.getBytes("ISO-8859-1")
      .map(b => f"$b%02x").mkString + ">"
    val sb = new StringBuilder
    val offs = scala.collection.mutable.ArrayBuffer.empty[Int]
    def obj(body: String): Unit = {
      offs += sb.length
      sb ++= body
    }
    sb ++= "%PDF-1.4\n% hand-written referee\n"
    obj("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    obj("2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n")
    obj("3 0 obj\n<< /Type /Page /Parent 2 0 R " +
      "/MediaBox [0 0 612 792] /Contents [4 0 R 5 0 R] >>\nendobj\n")
    obj(s"4 0 obj\n<< /Length ${c1.length} >>\nstream\n$c1\nendstream\nendobj\n")
    obj(s"5 0 obj\n<< /Length ${c2hex.length} /Filter /ASCIIHexDecode >>" +
      s"\nstream\n$c2hex\nendstream\nendobj\n")
    val xref = sb.length
    sb ++= "xref\n0 6\n0000000000 65535 f \n"
    offs.foreach(o => sb ++= f"$o%010d 00000 n \n")
    sb ++= "trailer\n<< /Size 6 /Root 1 0 R >>\n"
    sb ++= s"startxref\n$xref\n%%EOF\n"
    val r = Pdf.extractText(sb.toString.getBytes("ISO-8859-1"))
    assert(r.ok, r.stage)
    assert(r.nPages == 1)
    assert(!r.usedObjStm && !r.usedXrefStream)
    // c1: "Alpha line" Tj; Td → newline; "second"; T* → newline;
    // "third" via ' (newline before show — already at line start);
    // ET → newline. c2: "hex!" then " → newline + "quoted".
    assert(r.text == "Alpha line\nsecond\nthird\nhex!\nquoted\n", r.text)
    assert(r.nTextOps == 5)
  }

  test("real independently-written PDFs parse: the container's TeX " +
      "and DocBook documents") {
    for ((path, word) <- Seq(
        "/usr/share/doc/libtasn1-doc/libtasn1.pdf" -> "ASN",
        "/usr/share/doc/shared-mime-info/shared-mime-info-spec.pdf" ->
          "MIME")) {
      val p = java.nio.file.Paths.get(path)
      assume(java.nio.file.Files.isReadable(p), s"$path not present")
      val bytes = java.nio.file.Files.readAllBytes(p)
      val r = Pdf.extractText(bytes)
      assert(r.ok, s"$path: ${r.stage}")
      assert(r.nPages > 1, s"$path pages=${r.nPages}")
      assert(r.nTextOps > 10, s"$path ops=${r.nTextOps}")
      assert(r.text.length > 500, s"$path textLen=${r.text.length}")
      assert(r.text.contains(word), s"$path missing '$word'")
    }
  }

  test("document info (T187): literal and UTF-16BE wire forms, all " +
      "three xref shapes, objstm-resident info dict, absence is ok") {
    val fields = Seq("Title" -> "A (test) \\ doc",
      "Author" -> "Jo Writer", "Producer" -> "graft",
      "CreationDate" -> "D:20240115000000Z")
    for (shape <- Seq("classic", "flate", "objstm");
         utf16 <- Seq(false, true)) {
      val pdf = Pdf.synthesize(Seq(Seq("body")), shape, fields, utf16)
      // text extraction is undisturbed by the extra object
      assert(Pdf.extractText(pdf).text == "body\n", s"$shape/$utf16")
      val i = Pdf.info(pdf)
      assert(i.ok, s"$shape/$utf16")
      assert(i.title.contains("A (test) \\ doc"), s"$shape/$utf16: $i")
      assert(i.author.contains("Jo Writer"))
      assert(i.producer.contains("graft"))
      assert(i.creationDate.contains("D:20240115000000Z"))
    }
    // no Info dict → ok with empty fields, not a failure
    val plain = Pdf.info(Pdf.synthesize(Seq(Seq("x")), "classic"))
    assert(plain.ok && plain.title.isEmpty)
    // the real PDFs: whatever their info says, the walk must not throw
    for (path <- Seq("/usr/share/doc/libtasn1-doc/libtasn1.pdf",
        "/usr/share/doc/shared-mime-info/shared-mime-info-spec.pdf")) {
      val p = java.nio.file.Paths.get(path)
      assume(java.nio.file.Files.isReadable(p), s"$path not present")
      val i = Pdf.info(java.nio.file.Files.readAllBytes(p))
      assert(i.ok, s"$path: $i")
    }
    assert(!Pdf.info("junk".getBytes).ok)
  }

  test("malformed inputs flag, never throw") {
    assert(!Pdf.extractText(Array.empty[Byte]).ok)
    assert(Pdf.extractText("%PDF-1.4 garbage".getBytes).stage
      == "startxref")
    assert(Pdf.extractText("not a pdf at all".getBytes).stage == "header")
    // valid header + startxref pointing nowhere
    val t = "%PDF-1.4\njunk\nstartxref\n3\n%%EOF\n"
    assert(!Pdf.extractText(t.getBytes).ok)
    // truncated mid-file: cut a valid PDF in half (startxref gone)
    val whole = Pdf.synthesize(Seq(Seq("x")), "flate")
    assert(!Pdf.extractText(whole.take(whole.length / 2)).ok)
    // bit-flipped xref offset digits
    val s = new String(whole, "ISO-8859-1")
      .replaceAll("startxref\n[0-9]+", "startxref\n999999")
    assert(!Pdf.extractText(s.getBytes("ISO-8859-1")).ok)
  }

  test("decompression bomb flags at the cap instead of exhausting " +
      "memory") {
    // a content stream inflating to ~80 MiB from a few KB of zlib:
    // over the 64 MiB budget → stage "bomb"
    val big = new Array[Byte](80 << 20) // zeros compress ~1000:1
    val d = new java.util.zip.Deflater(9)
    d.setInput(big); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](1 << 16)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    val payload = out.toByteArray
    val sb = new StringBuilder
    val offs = scala.collection.mutable.ArrayBuffer.empty[Int]
    sb ++= "%PDF-1.4\n"
    offs += sb.length
    sb ++= "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
    offs += sb.length
    sb ++= "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
    offs += sb.length
    sb ++= "3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
    offs += sb.length
    sb ++= s"4 0 obj\n<< /Length ${payload.length} /Filter /FlateDecode >>\nstream\n"
    val head = sb.toString.getBytes("ISO-8859-1")
    val tailSb = new StringBuilder
    tailSb ++= "\nendstream\nendobj\n"
    val xref = head.length + payload.length + "\nendstream\nendobj\n".length
    tailSb ++= "xref\n0 5\n0000000000 65535 f \n"
    offs.foreach(o => tailSb ++= f"$o%010d 00000 n \n")
    tailSb ++= "trailer\n<< /Size 5 /Root 1 0 R >>\n"
    tailSb ++= s"startxref\n$xref\n%%EOF\n"
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(head); bos.write(payload)
    bos.write(tailSb.toString.getBytes("ISO-8859-1"))
    val r = Pdf.extractText(bos.toByteArray)
    assert(!r.ok && r.stage == "bomb", r.stage)
  }

  /** Base single-page classic PDF whose content is object 4; returns
    * (text so far, offset of each object 1..4, offset of the xref).
    * All-ASCII, so char offsets == byte offsets.
    */
  private def classicBase(content: String): (StringBuilder, Seq[Int], Int) = {
    val sb = new StringBuilder
    val offs = scala.collection.mutable.ArrayBuffer.empty[Int]
    sb ++= "%PDF-1.4\n"
    offs += sb.length
    sb ++= "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
    offs += sb.length
    sb ++= "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
    offs += sb.length
    sb ++= "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n"
    offs += sb.length
    sb ++= s"4 0 obj << /Length ${content.length} >> stream\n"
    sb ++= content
    sb ++= "\nendstream endobj\n"
    val x = sb.length
    sb ++= "xref\n0 5\n0000000000 65535 f \n"
    offs.foreach(o => sb ++= f"$o%010d 00000 n \n")
    sb ++= "trailer << /Size 5 /Root 1 0 R >>\n"
    sb ++= s"startxref\n$x\n%%EOF\n"
    (sb, offs.toSeq, x)
  }

  test("incremental update, replacement: the newest section's entry " +
      "wins over the /Prev section's") {
    val (sb, _, x1) = classicBase("BT /F1 10 Tf (ghost text) Tj ET")
    val r0 = Pdf.extractText(sb.toString.getBytes("ISO-8859-1"))
    assert(r0.ok && r0.text == "ghost text\n", r0.stage + r0.text)
    // append a replacement object 4 + an update xref section
    val c2 = "BT /F1 10 Tf (updated text) Tj ET"
    val o4b = sb.length
    sb ++= s"4 0 obj << /Length ${c2.length} >> stream\n$c2\nendstream endobj\n"
    val x2 = sb.length
    sb ++= "xref\n0 1\n0000000000 65535 f \n4 1\n"
    sb ++= f"$o4b%010d 00001 n \n"
    sb ++= s"trailer << /Size 5 /Root 1 0 R /Prev $x1 >>\n"
    sb ++= s"startxref\n$x2\n%%EOF\n"
    val r1 = Pdf.extractText(sb.toString.getBytes("ISO-8859-1"))
    assert(r1.ok, r1.stage)
    assert(r1.text == "updated text\n", r1.text)
  }

  test("incremental update, deletion: a FREED object is a tombstone " +
      "the older /Prev section must not resurrect (ADVICE r14; " +
      "PDF 32000-1 §7.5.6 newest-entry-wins includes free entries)") {
    val (sb, _, x1) = classicBase("BT /F1 10 Tf (ghost text) Tj ET")
    // update section: object 4 deleted (type 'f') — the page's
    // /Contents now resolves to null, so the ghost text must vanish
    val x2 = sb.length
    sb ++= "xref\n0 1\n0000000000 65535 f \n4 1\n"
    sb ++= "0000000000 00002 f \n"
    sb ++= s"trailer << /Size 5 /Root 1 0 R /Prev $x1 >>\n"
    sb ++= s"startxref\n$x2\n%%EOF\n"
    val r = Pdf.extractText(sb.toString.getBytes("ISO-8859-1"))
    assert(r.ok, r.stage)
    assert(r.nPages == 1)
    assert(r.text == "", s"freed object resurrected: '${r.text}'")
  }

  test("hybrid-reference file (§7.5.8.4): the classic trailer's " +
      "/XRefStm maps an objstm-resident page dict the classic table " +
      "marks free — stream entries take precedence (ADVICE r14)") {
    val sb = new StringBuilder
    sb ++= "%PDF-1.5\n"
    val o1 = sb.length
    sb ++= "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
    val o2 = sb.length
    sb ++= "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
    // object 3 (the page dict) lives INSIDE object stream 5 — the
    // classic table below marks it free, hybrid-writer style
    val c = "BT /F1 10 Tf (hybrid works) Tj ET"
    val o4 = sb.length
    sb ++= s"4 0 obj << /Length ${c.length} >> stream\n$c\nendstream endobj\n"
    val stmData = "3 0\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"
    val o5 = sb.length
    sb ++= s"5 0 obj << /Type /ObjStm /N 1 /First 4 " +
      s"/Length ${stmData.length} >> stream\n$stmData\nendstream endobj\n"
    // xref STREAM (object 6): W [1 2 1], Index [3 1], one type-2 row
    // (objstm 5, idx 0); no /Filter — raw rows
    val xrefRow = new String(Array[Char](2, 0, 5, 0))
    val o6 = sb.length
    sb ++= "6 0 obj << /Type /XRef /Size 7 /W [1 2 1] /Index [3 1] " +
      s"/Root 1 0 R /Length 4 >> stream\n$xrefRow\nendstream endobj\n"
    // classic table: everything direct EXCEPT object 3, marked free
    val x = sb.length
    sb ++= "xref\n0 7\n"
    sb ++= "0000000000 65535 f \n"
    sb ++= f"$o1%010d 00000 n \n"
    sb ++= f"$o2%010d 00000 n \n"
    sb ++= "0000000000 00000 f \n" // page dict: free in the table
    sb ++= f"$o4%010d 00000 n \n"
    sb ++= f"$o5%010d 00000 n \n"
    sb ++= f"$o6%010d 00000 n \n"
    sb ++= s"trailer << /Size 7 /Root 1 0 R /XRefStm $o6 >>\n"
    sb ++= s"startxref\n$x\n%%EOF\n"
    val r = Pdf.extractText(sb.toString.getBytes("ISO-8859-1"))
    assert(r.ok, r.stage)
    assert(r.nPages == 1)
    assert(r.text == "hybrid works\n", r.text)
    assert(r.usedObjStm && r.usedXrefStream)
  }
}
