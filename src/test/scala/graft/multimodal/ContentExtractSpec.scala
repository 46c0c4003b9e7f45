package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Referees for block-level content extraction (q223, T132): the
  * scanner's per-block anchor accounting and the jusText-class
  * context-free + neighbor-adoption rules.
  */
class ContentExtractSpec extends AnyFunSuite {

  test("scanner counts anchor chars per block: partial anchors, " +
      "entities, href-less anchors, text alignment") {
    val ex = Html.extractText(
      """<p>See <a href="/x">this link</a> now</p>
        |<p><a href="/y">&amp;co</a></p>
        |<p><a name="anchor-no-href">plain</a> text</p>
        |<p>no links at all here</p>""".stripMargin)
    assert(ex.blocks.map(_.text) == Seq("See this link now", "&co",
      "plain text", "no links at all here"))
    assert(ex.blocks(0).linkChars == 8) // "thislink"
    assert(ex.blocks(1).linkChars == 3) // "&co" via entity decode
    assert(ex.blocks(2).linkChars == 0) // href-less <a> is not a link
    assert(ex.blocks(3).linkChars == 0)
    // invariant the q209 surface depends on
    assert(ex.text == ex.blocks.map(_.text).mkString("\n"))
  }

  test("context-free rules: nav bad, prose good, fragment bad, " +
      "undecided in between") {
    def one(b: Html.Block) = ContentExtract.classify(Seq(b)).head.cls
    assert(one(Html.Block("Home About Contact", 16)) == "bad") // density 1
    assert(one(Html.Block(
      "the quick brown fox jumps over the lazy dog and then it rests",
      0)) == "good")
    assert(one(Html.Block("ok", 0)) == "bad") // fragment
    // 15..39 chars, no stopwords, no links -> undecided; alone -> bad
    assert(one(Html.Block("Copyright portal pages", 0)) == "bad")
    // long but link-heavy: density rule fires first
    assert(one(Html.Block("a" * 60, 30)) == "bad")
  }

  test("neighbor adoption: undecided promotes next to good on either " +
      "side, dies stranded between bads") {
    val good = Html.Block(
      "the quick brown fox jumps over the lazy dog and then it rests", 0)
    val nav = Html.Block("Home About Contact", 16)
    val und = Html.Block("Updated on day 7", 0)
    def cls(bs: Html.Block*) = ContentExtract.classify(bs).map(_.cls)
    assert(cls(good, und, nav) == Seq("good", "promoted", "bad"))
    assert(cls(nav, und, good) == Seq("bad", "promoted", "good"))
    assert(cls(nav, und, nav) == Seq("bad", "bad", "bad"))
    // adoption is one step: a chain of two undecided does not cascade
    assert(cls(good, und, und, nav) ==
      Seq("good", "promoted", "bad", "bad"))
  }

  test("six-layer composition referee (q226's walk): gzip → WARC → " +
      "chunked HTTP → charset → HTML → content, one buffer") {
    val content =
      "the quick brown fox jumps over the lazy dog and then it rests"
    val html = s"<html><body><div><a href=\"/h\">Home</a> " +
      s"<a href=\"/a\">About pages</a></div><p>$content</p></body></html>"
    val hb = html.getBytes("UTF-8")
    val wire = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = wire.write(s.getBytes("US-ASCII"))
    // two chunks, uneven split
    val cut = hb.length / 3
    w(cut.toHexString + "\r\n"); wire.write(hb, 0, cut); w("\r\n")
    w((hb.length - cut).toHexString + "\r\n")
    wire.write(hb, cut, hb.length - cut); w("\r\n0\r\n\r\n")
    val http = Http.renderRaw(200, "OK",
      Seq("Content-Type" -> "text/html; charset=utf-8",
        "Transfer-Encoding" -> "chunked"), wire.toByteArray)
    val warc = Warc.render(Seq("WARC-Type" -> "response",
      "WARC-Record-ID" -> "<urn:uuid:six>",
      "WARC-Date" -> "2026-01-01T00:00:00Z"), http)
    val gz = Compressed.gzipMember(warc, Some("six.warc"))

    val (rec, body) = Compressed.memberPayloads(gz).get
      .flatMap { case (_, p) => Warc.parseSingleWithBody(p) }.head
    assert(rec.warcType == "response")
    val (resp, payload, meta) = Http.parseResponseDecoded(body).get
    assert(resp.isChunked && meta.exists(m => m.wellFormed && m.nChunks == 2))
    val dec = Charsets.decode(payload, resp.charset)
    assert(dec.used == "utf-8" && !dec.fellBack)
    assert(dec.text == html)
    val blocks = Html.extractText(dec.text).blocks
    assert(ContentExtract.contentText(blocks) == content)
  }

  test("contentText assembles good + promoted in order") {
    val good = Html.Block(
      "the quick brown fox jumps over the lazy dog and then it rests", 0)
    val nav = Html.Block("Home About Contact", 16)
    val und = Html.Block("Updated on day 7", 0)
    assert(ContentExtract.contentText(Seq(nav, good, und, nav)) ==
      good.text + "\n" + und.text)
    assert(ContentExtract.contentText(Seq(nav, nav)) == "")
  }
}
