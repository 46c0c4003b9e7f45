package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Referees for the charset-decode layer (q210). The windows-1252
  * table referees directly against the JDK's own cp1252 decoder for
  * every byte the JDK defines; the five WHATWG-vs-JDK delta bytes are
  * pinned by value. Fallback behavior referees against the T107 UTF-8
  * auditor byte-for-byte.
  */
class CharsetsSpec extends AnyFunSuite {

  test("windows-1252: JDK agreement on every defined byte, WHATWG C1 " +
      "mapping on the five undefined ones, latin-1 identity above 0x9F") {
    val undefinedBytes = Set(0x81, 0x8d, 0x8f, 0x90, 0x9d)
    val jdk = java.nio.charset.Charset.forName("windows-1252")
    for (b <- 0 until 256) {
      val got = Charsets.decode(Array(b.toByte), Some("windows-1252"))
      assert(got.text.length == 1 && got.nReplacements == 0)
      if (undefinedBytes(b))
        assert(got.text.charAt(0) == b.toChar, f"byte $b%02x")
      else {
        val viaJdk = new String(Array(b.toByte), jdk)
        assert(got.text == viaJdk, f"byte $b%02x")
      }
      if (b >= 0xa0) assert(got.text.charAt(0) == b.toChar)
    }
  }

  test("label resolution: WHATWG aliasing (latin-1 and ascii ARE " +
      "cp1252), case folding, trim; unknown → None") {
    for (l <- Seq("ISO-8859-1", " iso-8859-1 ", "Latin1", "US-ASCII",
        "ascii", "CP1252", "x-cp1252", "iso_8859-1", "l1"))
      assert(Charsets.resolve(l).contains("windows-1252"), l)
    for (l <- Seq("UTF-8", "utf8", "Unicode-1-1-UTF-8"))
      assert(Charsets.resolve(l).contains("utf-8"), l)
    for (l <- Seq("shift_jis", "koi8-r", ""))
      assert(Charsets.resolve(l).isEmpty, l)
    // WHATWG: "utf-16" labels utf-16le (review-r12 — a BOM-less
    // UTF-16 page with a correct transport label must not fall to
    // the flagged default: the prescan can never rescue it)
    assert(Charsets.resolve("UTF-16").contains("utf-16le"))
    assert(Charsets.resolve("utf-16be").contains("utf-16be"))
  }

  test("utf-8 path: valid multi-byte decodes clean; malformed counts " +
      "match the T107 auditor; unknown label falls back flagged") {
    val good = "héllo 😀".getBytes("UTF-8")
    val d1 = Charsets.decode(good, Some("utf-8"))
    assert(d1.text == "héllo 😀" && !d1.fellBack && d1.nReplacements == 0)

    val bad = "ab".getBytes("UTF-8") ++ Array(0xff.toByte, 0xc3.toByte)
    val d2 = Charsets.decode(bad, Some("UTF-8"))
    assert(d2.text == "ab��" && d2.nReplacements == 2)
    assert(d2.nReplacements == graft.text.Utf8.audit(bad).n_replacements)

    val d3 = Charsets.decode(good, Some("x-weird"))
    assert(d3.fellBack && d3.used == "utf-8" && d3.text == "héllo 😀")
    val d4 = Charsets.decode(good, None)
    assert(d4.fellBack && d4.text == "héllo 😀")
  }

  test("smart-quote reality: a latin-1-labeled cp1252 byte run decodes " +
      "to the quotes the author meant, not C1 controls") {
    val bytes = Array(0x93, 0x68, 0x69, 0x94).map(_.toByte) // “hi”
    assert(Charsets.decode(bytes, Some("iso-8859-1")).text == "“hi”")
  }

  test("T117 → T119 composition: the charset label extracted by the " +
      "HTTP parser drives the decode") {
    val pay = Array(0x80, 0x9c).map(_.toByte) // €œ in cp1252
    val msg = Http.render(200, "OK",
      Seq("Content-Type" -> "text/plain; charset=ISO-8859-1"), pay)
    val (r, body) = Http.parseResponseWithBody(msg).get
    val d = Charsets.decode(body, r.charset)
    assert(d.text == "€œ" && d.used == "windows-1252" && !d.fellBack)
  }

  test("prescan (T157): meta charset, http-equiv form, comment decoy, " +
      "quoted '>' inside attrs, utf-16/x-user-defined quirks, window cap") {
    def p(html: String) = Charsets.prescan(html.getBytes("ISO-8859-1"))
    assert(p("""<head><meta charset="windows-1252"></head>""")
      .contains("windows-1252"))
    assert(p("<META CHARSET=UTF-8>").contains("utf-8")) // case + bare
    assert(p("""<meta http-equiv="Content-Type" """ +
      """content="text/html; charset=iso-8859-1">""")
      .contains("windows-1252")) // label aliasing applies
    // http-equiv that is not content-type contributes nothing
    assert(p("""<meta http-equiv="refresh" content="1; charset=utf-8">""")
      .isEmpty)
    // comment decoy skipped; real meta after it still found
    assert(p("""<!-- <meta charset="utf-8"> --><meta charset="cp1252">""")
      .contains("windows-1252"))
    // a '>' inside a quoted attribute must not end the preceding tag
    assert(p("""<img alt="a > b"><meta charset="utf-8">""")
      .contains("utf-8"))
    // spec quirks: utf-16 flavors → utf-8; x-user-defined → cp1252
    assert(p("""<meta charset="UTF-16BE">""").contains("utf-8"))
    assert(p("""<meta charset="x-user-defined">""")
      .contains("windows-1252"))
    // unknown label: no declaration
    assert(p("""<meta charset="klingon">""").isEmpty)
    // the 1024-byte window: a meta past it is invisible
    assert(p("<p>" + "x" * 1100 + "</p><meta charset=\"utf-8\">")
      .isEmpty)
    // first valid declaration wins
    assert(p("""<meta charset="utf-8"><meta charset="cp1252">""")
      .contains("utf-8"))
    // review-r12 conformance set:
    // empty comments are CLOSED comments (the end dashes may overlap
    // the opener) — the meta after them must be found
    assert(p("""<!--><meta charset="cp1252">""")
      .contains("windows-1252"))
    assert(p("""<!---><meta charset="cp1252">""")
      .contains("windows-1252"))
    // an apostrophe inside an UNQUOTED attribute value is value text,
    // not an open quote — it must not swallow the window
    assert(p("""<a title=don't><meta charset="cp1252">""")
      .contains("windows-1252"))
    // fromContent retries past a 'charset' substring with no '='
    assert(p("""<meta http-equiv="content-type" """ +
      """content="x-charset-hint; charset=cp1252">""")
      .contains("windows-1252"))
    // a present-but-unresolvable charset ATTRIBUTE makes the meta
    // contribute nothing — never falls through to the pragma form
    assert(p("""<meta charset="bogus" http-equiv="content-type" """ +
      """content="text/html; charset=cp1252">""").isEmpty)
    // an unresolvable first meta does not stop the scan
    assert(p("""<meta charset="bogus"><meta charset="cp1252">""")
      .contains("windows-1252"))
    // ADVICE-r12: a meta whose '>' lands PAST the window boundary was
    // only partially read — WHATWG §13.2.3.2 aborts without a result
    // at end-of-input mid-tag, so the declaration must NOT be honored
    // (the charset value itself fits; only the tag close is cut)
    val pad = "<p>" + "y" * (1024 - 3 - 22)
    val cut = pad + """<meta charset="utf-8" """ // 1024 bytes, no '>'
    assert(cut.length == 1024)
    assert(Charsets.prescan(
      (cut + ">").getBytes("ISO-8859-1")).isEmpty)
    // …and the SAME tag wholly inside the window is honored
    assert(Charsets.prescan(
      (pad.dropRight(1) + """<meta charset="utf-8" >""")
        .getBytes("ISO-8859-1")).contains("utf-8"))
  }

  test("plain decode honors a BOM over ANY label (ADVICE-r12, the " +
      "WHATWG decode algorithm): stripped, not fellBack") {
    val text = "bom wins é中"
    // UTF-16BE BOM + BE body served as charset=utf-16 (labels LE):
    // pre-fix this byte-swapped to garbage with fellBack=false
    val be = Array[Byte](0xfe.toByte, 0xff.toByte) ++
      text.getBytes("UTF-16BE")
    val dbe = Charsets.decode(be, Some("utf-16"))
    assert(dbe.used == "utf-16be" && dbe.text == text && !dbe.fellBack)
    // UTF-16LE BOM + LE body + matching label: BOM must be STRIPPED
    // (pre-fix the text kept U+FEFF at the head — dedup-key poison)
    val le = Array[Byte](0xff.toByte, 0xfe.toByte) ++
      text.getBytes("UTF-16LE")
    val dle = Charsets.decode(le, Some("utf-16"))
    assert(dle.used == "utf-16le" && dle.text == text)
    assert(!dle.text.startsWith("﻿"))
    // a UTF-8 BOM beats a cp1252 label too (full WHATWG precedence)
    val u8 = Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++
      text.getBytes("UTF-8")
    val du8 = Charsets.decode(u8, Some("windows-1252"))
    assert(du8.used == "utf-8" && du8.text == text && !du8.fellBack)
    // exactly ONE BOM is consumed: a second literal U+FEFF stays
    val dbl = Array[Byte](0xff.toByte, 0xfe.toByte) ++
      ("﻿" + text).getBytes("UTF-16LE")
    assert(Charsets.decode(dbl, Some("utf-16")).text == "﻿" + text)
    // no BOM: the label path is unchanged (byte-order from the label)
    val plain = Charsets.decode(text.getBytes("UTF-16LE"),
      Some("utf-16"))
    assert(plain.used == "utf-16le" && plain.text == text)
    // refereed against the JDK: java.nio's "UTF-16" charset does the
    // same BOM-first dispatch on both orders
    for (body <- Seq(be, le)) {
      val jdk = new String(body, java.nio.charset.StandardCharsets.UTF_16)
      assert(Charsets.decode(body, Some("utf-16")).text == jdk)
    }
  }

  test("sniffDecode (T157): BOM > transport > meta > flagged default; " +
      "BOM stripped; utf-16 BOM decode refereed against the JDK") {
    val metaCp = """<meta charset="windows-1252">"""
    // payload bytes that decode differently per encoding
    val tail = Array[Byte](0x93.toByte, 'p', 0x94.toByte)
    val plain = (metaCp + "x").getBytes("ISO-8859-1") ++ tail
    // BOM beats a lying transport label AND the meta
    val bommed = Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++
      plain
    val sb = Charsets.sniffDecode(bommed, Some("windows-1252"))
    assert(sb.source == "bom" && sb.decoded.used == "utf-8")
    assert(!sb.decoded.text.startsWith("﻿")) // BOM stripped
    assert(sb.decoded.nReplacements == 2L) // 0x93 and 0x94 → U+FFFD
    // transport beats meta
    val st = Charsets.sniffDecode(plain, Some("utf-8"))
    assert(st.source == "transport" && st.decoded.used == "utf-8")
    // meta used when transport is absent/unknown
    val sm = Charsets.sniffDecode(plain, None)
    assert(sm.source == "meta" && sm.decoded.used == "windows-1252")
    assert(sm.decoded.text.endsWith("“p”"))
    val su = Charsets.sniffDecode(plain, Some("klingon"))
    assert(su.source == "meta") // unknown transport label falls through
    // nothing declared: flagged utf-8 fallback
    val sd = Charsets.sniffDecode("plain text".getBytes ++ tail, None)
    assert(sd.source == "default" && sd.decoded.fellBack)
    // utf-16le/be BOM paths, JDK-refereed (JDK strips the BOM for
    // "UTF-16" with a BOM; compare against explicit LE/BE decode of
    // the post-BOM bytes)
    for ((name, jdk) <- Seq("utf-16le" -> "UTF-16LE",
        "utf-16be" -> "UTF-16BE")) {
      val text = "chars é中 ok"
      val bom = if (name == "utf-16le") Array[Byte](0xff.toByte,
        0xfe.toByte) else Array[Byte](0xfe.toByte, 0xff.toByte)
      val payload = bom ++ text.getBytes(jdk)
      val s16 = Charsets.sniffDecode(payload, None)
      assert(s16.source == "bom" && s16.decoded.used == name)
      assert(s16.decoded.text == text, name)
    }
    // lone trailing byte in a utf-16 stream: one U+FFFD, no throw
    val odd = Array[Byte](0xff.toByte, 0xfe.toByte, 'a', 0, 'x')
    val so = Charsets.sniffDecode(odd, None)
    assert(so.decoded.text == "a�" && so.decoded.nReplacements == 1L)
    // x-user-defined as a TRANSPORT label: ASCII passes, high bytes
    // land on the U+F780 private-use row (lossless round trip — the
    // encoding's whole point); in a META the quirk rewrites it to
    // cp1252 instead (covered in the prescan test)
    val xud = Charsets.decode(Array[Byte]('a', 0x80.toByte,
      0xff.toByte), Some("x-user-defined"))
    assert(xud.text == "a\uf780\uf7ff" && !xud.fellBack &&
      xud.nReplacements == 0L)
  }
}
