package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Referees for the HTML → text extraction layer (q209).
  *
  * The load-bearing referee is the randomized planted-token round
  * trip: a seeded generator renders a KNOWN word sequence into
  * adversarial markup (random inline/block nesting, decoy prose
  * inside script/style/comments/attributes, entity-escaped words,
  * attribute values containing `>`), and the extractor must return
  * exactly the planted sequence — any decoy leaking in, any word
  * lost, split, or reordered fails. Corrupted-input discipline
  * mirrors CompressedSpec/WarcSpec/HttpSpec: every truncation of a
  * fixture must degrade, never throw.
  */
class HtmlSpec extends AnyFunSuite {

  private def words(s: String): Seq[String] =
    s.split("\\s+").filter(_.nonEmpty).toSeq

  test("kitchen-sink fixture: rawtext drop, comments, entities, " +
      "inline vs block, title RCDATA, link/tag counts") {
    val html =
      """<!DOCTYPE html><html><head><title> The &amp; Title </title>
        |<style>p > b {color:red} /* decoy style prose */</style>
        |<script type="text/javascript">
        |  var s = "<p>decoy prose</p>"; if (a && b) { c(); }
        |</script></head>
        |<body><h1>Head&#x31;</h1><!-- decoy comment prose -->
        |<p>one <b>two</b> thr<i>ee</i> <a href="#x">four</a></p>
        |<p title="decoy > attr prose">five &lt;six&gt; &#55;</p>
        |<ul><li>seven</li><li>eight</li></ul>
        |<p>&X B < t 5 &unknown; &amp tail</p>
        |</body></html>""".stripMargin
    val e = Html.extractText(html)
    assert(e.title.contains("The & Title"))
    assert(e.text.split('\n').toSeq == Seq(
      "Head1",
      "one two three four",
      "five <six> 7",
      "seven",
      "eight",
      "&X B < t 5 &unknown; &amp tail"))
    assert(e.nLinks == 1)
  }

  test("literal `<` before a non-letter is text; `</>` is ignored") {
    val e = Html.extractText("<p>a < b and 1<2 but x</>y</p>")
    assert(e.text == "a < b and 1<2 but xy")
  }

  test("entity decoding: named, decimal, hex, out-of-range, " +
      "surrogate, unterminated, unknown") {
    val e = Html.extractText(
      "<p>&amp; &lt; &gt; &quot; &apos; &#65; &#x41; &#x1F600; " +
        "&#1114112; &#xD800; &bogus; &amp &#; &#xZZ;</p>")
    assert(e.text ==
      "& < > \" ' A A 😀 � � &bogus; &amp &#; &#xZZ;")
  }

  test("inline tags never split or separate words; block tags do") {
    val e = Html.extractText(
      "<div>re<b>read</b> <span>a</span>b<br>next<p>para</p></div>")
    assert(e.text.split('\n').toSeq == Seq("reread ab", "next", "para"))
  }

  test("rawtext close-tag matching is case-insensitive and " +
      "prefix-exact (scriptx does not close script)") {
    val e = Html.extractText(
      "<p>a</p><script>x = '</scriptx>' + 1;</SCRIPT><p>b</p>")
    assert(e.text.split('\n').toSeq == Seq("a", "b"))
  }

  test("quoted attribute values hide `>` and quotes of the other kind") {
    val e = Html.extractText(
      """<p><img alt="a > b" src='x">y.png'>word</p>""")
    assert(e.text == "word")
  }

  test("nbsp and whitespace runs collapse; blank lines drop") {
    val e = Html.extractText(
      "<p>a&nbsp;&nbsp;b</p><p>   \t\n </p><p>c   d</p>")
    assert(e.text.split('\n').toSeq == Seq("a b", "c d"))
  }

  test("source newlines are whitespace, not line boundaries — only " +
      "block tags make lines (incl. &#10;)") {
    val e = Html.extractText("<p>a\nb</p><p>c&#10;d\r\ne</p>")
    assert(e.text.split('\n').toSeq == Seq("a b", "c d e"))
    // a signed numeric charref is not a charref (and must not throw)
    assert(Html.extractText("<p>&#-5; &#+5;</p>").text == "&#-5; &#+5;")
  }

  test("title: first wins, entities decode, self-closed title has none") {
    assert(Html.extractText("<title>A&#32;B</title><title>C</title>")
      .title.contains("A B"))
    assert(Html.extractText("<title/>x").title.isEmpty)
  }

  test("unquoted attr value ending in '/' keeps the tag OPEN " +
      "(browser rule, ADVICE r10); a standalone '/' self-closes") {
    // <a href=/x/> is an open anchor with href "/x/": its text counts
    // as link chars and the later </a> closes it (no clamp absorption)
    val open = Html.extractText("<p><a href=/x/>link</a> tail</p>")
    assert(open.nLinks == 1)
    assert(open.hrefs == Seq("/x/"))
    assert(open.blocks.head.linkChars == 4) // "link", not 0
    // a genuinely self-closed anchor contributes no anchor depth
    val closed = Html.extractText("<p><a href=\"/x/\"/>text</p>")
    assert(closed.nLinks == 1)
    assert(closed.blocks.head.linkChars == 0)
  }

  test("&#0; decodes to U+FFFD, never a raw NUL (HTML5 null charref)") {
    val e = Html.extractText("<p>a&#0;b &#x0;c</p>")
    assert(!e.text.contains('\u0000'))
    assert(e.text == "a�b �c")
  }

  test("feed autodiscovery: rel=alternate + rss/atom type captured " +
      "(rel token list, case-insensitive type, entity-decoded href); " +
      "stylesheet/wrong-type/comment/href-less decoys never leak") {
    val e = Html.extractText(
      "<head><link rel=\"alternate\" type=\"application/rss+xml\" " +
        "href=\"/feed.xml?a=1&amp;b=2\">" +
        "<link rel=\"ALTERNATE stylesheet\" " +
        "type=\"APPLICATION/ATOM+XML\" href=\"/atom\"/>" +
        "<link rel=\"stylesheet\" type=\"text/css\" href=\"/s.css\">" +
        "<link rel=\"alternate\" type=\"text/html\" href=\"/mobile\">" +
        "<!-- <link rel=\"alternate\" type=\"application/rss+xml\" " +
        "href=\"/decoy\"> -->" +
        "<link rel=\"alternate\" type=\"application/rss+xml\">" +
        "</head>")
    assert(e.feeds == Seq("/feed.xml?a=1&b=2", "/atom"))
  }

  test("escape/extract round trip on every printable ASCII char") {
    val nasty = (0x20 to 0x7e).map(_.toChar).mkString
    val e = Html.extractText(s"<p>${Html.escape(nasty)}</p>")
    // the extractor collapses interior whitespace; escape preserves it
    assert(e.text == nasty.replaceAll("\\s+", " ").trim)
  }

  test("planted-token referee: 200 seeded adversarial renders " +
      "return exactly the planted words") {
    val inline = Seq("b", "i", "em", "span", "code", "strong")
    val blocks = Seq("p", "div", "li", "h2", "blockquote", "td")
    for (seed <- 0 until 200) {
      val rnd = new scala.util.Random(seed)
      val planted = (0 until 3 + rnd.nextInt(40)).map(k =>
        s"w${seed}x$k" + (if (rnd.nextBoolean()) "&<>\"" else ""))
      val sb = new StringBuilder("<html><body>")
      planted.foreach { w =>
        rnd.nextInt(6) match {
          case 0 => sb ++= s"<!-- decoy $seed -->"
          case 1 => sb ++= s"<script>var a='<p>decoy</p>';</script>"
          case 2 => sb ++= s"<style>q{content:'decoy'}</style>"
          case 3 => sb ++= s"""<img alt="decoy > words" src="d.png">"""
          case _ => ()
        }
        if (rnd.nextBoolean()) {
          val t = blocks(rnd.nextInt(blocks.length))
          sb ++= s"<$t>"
        } else sb ++= " "
        val esc = Html.escape(w)
        if (rnd.nextBoolean()) {
          val t = inline(rnd.nextInt(inline.length))
          sb ++= s"<$t>$esc</$t>"
        } else sb ++= esc
        if (rnd.nextBoolean()) sb ++= " "
      }
      sb ++= "</body></html>"
      val got = words(Html.extractText(sb.toString).text)
      assert(got == planted, s"seed=$seed")
    }
  }

  test("truncation sweep: every prefix of a fixture degrades, " +
      "never throws") {
    val html = "<!DOCTYPE html><html><head><title>T&amp;</title>" +
      "<script>s='</scr'+'ipt>';</script></head><body><h1>H</h1>" +
      "<p>a <a href=\"#\">b</a> &#x41; &nbsp;</p><!-- c --></body></html>"
    for (n <- 0 to html.length) {
      val e = Html.extractText(html.substring(0, n)) // must not throw
      assert(e.nTags >= 0)
    }
  }

  test("four-layer composition: gzip → WARC → HTTP → HTML returns " +
      "the planted text (the q209 walk)") {
    val page = "<html><head><title>T</title></head><body>" +
      "<h1>Hello</h1><p>crawl &amp; extract</p></body></html>"
    val http = Http.render(200, "OK",
      Seq("Content-Type" -> "text/html; charset=utf-8"),
      page.getBytes("UTF-8"))
    val warc = Warc.render(Seq(
      "WARC-Type" -> "response",
      "WARC-Record-ID" -> "<urn:uuid:spec>",
      "WARC-Date" -> "2026-01-01T00:00:00Z",
      "WARC-Target-URI" -> "http://ex.test/"), http)
    val e = Compressed.memberPayloads(Compressed.gzipMember(warc, None))
      .get.headOption
      .flatMap { case (_, rec) => Warc.parseSingleWithBody(rec) }
      .flatMap { case (_, body) => Http.parseResponseWithBody(body) }
      .map { case (_, pay) => Html.extractText(new String(pay, "UTF-8")) }
      .get
    assert(e.title.contains("T"))
    assert(e.text.split('\n').toSeq == Seq("Hello", "crawl & extract"))
  }

  test("base capture (T151): first <base href> wins, later/commented/" +
      "rawtext/href-less bases ignored, entity decode, absent → None") {
    assert(Html.extractText("<p>no base</p>").base.isEmpty)
    assert(Html.extractText("<base href=\"/a/\">").base.contains("/a/"))
    // first wins — HTML5 ignores every later base element
    assert(Html.extractText(
      "<base href=\"/first/\"><base href=\"/second/\">")
      .base.contains("/first/"))
    // href-less base contributes nothing; the NEXT base still counts
    assert(Html.extractText("<base target=\"_blank\"><base href=\"/b/\">")
      .base.contains("/b/"))
    // commented-out and rawtext bases never reach the capture
    assert(Html.extractText(
      "<!-- <base href=\"/c/\"> --><script><base href=\"/s/\"></script>")
      .base.isEmpty)
    // href entity-decodes like every captured URL; relative and
    // absolute forms pass through verbatim (resolution is T129's job)
    assert(Html.extractText("<base href=\"/x?a=1&amp;b=2\">")
      .base.contains("/x?a=1&b=2"))
    assert(Html.extractText("<base href=\"http://cdn.ex.test/as/\">")
      .base.contains("http://cdn.ex.test/as/"))
    // empty href is as good as none
    assert(Html.extractText("<base href=\"\"><base href=\"/d/\">")
      .base.contains("/d/"))
  }

  test("canonical capture (T169): first rel=canonical wins; rel token " +
      "list counts; commented/rawtext/href-less/empty decoys ignored") {
    assert(Html.extractText("<p>none</p>").canonical.isEmpty)
    assert(Html.extractText(
      "<link rel=\"canonical\" href=\"/art1\">").canonical
      .contains("/art1"))
    // first wins — a page contradicting itself keeps the first claim
    assert(Html.extractText(
      "<link rel=\"canonical\" href=\"/first\">" +
        "<link rel=\"canonical\" href=\"/second\">").canonical
      .contains("/first"))
    // rel is a token list and matches case-insensitively
    assert(Html.extractText(
      "<link rel=\"CANONICAL nofollow\" href=\"/tok\">").canonical
      .contains("/tok"))
    // near-miss token never matches; href entity-decodes
    assert(Html.extractText(
      "<link rel=\"canonicalish\" href=\"/no\">" +
        "<link rel=\"canonical\" href=\"/x?a=1&amp;b=2\">").canonical
      .contains("/x?a=1&b=2"))
    // commented / rawtext / href-less / empty-href contribute nothing
    assert(Html.extractText(
      "<!-- <link rel=\"canonical\" href=\"/c\"> -->" +
        "<script><link rel=\"canonical\" href=\"/s\"></script>" +
        "<link rel=\"canonical\">" +
        "<link rel=\"canonical\" href=\"\">").canonical.isEmpty)
  }

  test("hreflang alternates (T170): lang lowered+trimmed, document " +
      "order kept, lang-less/href-less entries and decoys dropped, " +
      "feed capture unaffected by hreflang presence") {
    val e = Html.extractText(
      "<head>" +
        "<link rel=\"alternate\" hreflang=\"EN\" href=\"/en/p\">" +
        "<link rel=\"alternate\" hreflang=\"de\" href=\"/de/p\">" +
        "<link rel=\"ALTERNATE\" hreflang=\" fr \" href=\"/fr/p\">" +
        "<link rel=\"alternate\" hreflang=\"x-default\" href=\"/p\">" +
        // decoys: no hreflang (plain alternate), no href, empty lang,
        // commented, wrong rel
        "<link rel=\"alternate\" href=\"/mobile\">" +
        "<link rel=\"alternate\" hreflang=\"es\">" +
        "<link rel=\"alternate\" hreflang=\"\" href=\"/none\">" +
        "<!-- <link rel=\"alternate\" hreflang=\"it\" href=\"/it\"> -->" +
        "<link rel=\"stylesheet\" hreflang=\"pt\" href=\"/pt\">" +
        // an rss alternate carrying hreflang lands in BOTH captures
        "<link rel=\"alternate\" hreflang=\"en\" " +
        "type=\"application/rss+xml\" href=\"/feed.xml\">" +
        "</head>")
    assert(e.alternates == Seq("en" -> "/en/p", "de" -> "/de/p",
      "fr" -> "/fr/p", "x-default" -> "/p", "en" -> "/feed.xml"))
    assert(e.feeds == Seq("/feed.xml"))
  }
}
