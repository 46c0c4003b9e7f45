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
