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
    for (l <- Seq("shift_jis", "utf-16", "koi8-r", ""))
      assert(Charsets.resolve(l).isEmpty, l)
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
}
