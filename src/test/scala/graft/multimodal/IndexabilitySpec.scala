package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Referees for the page-level robots gate (q218, T127): the T118
  * scanner's meta/rel capture (incl. the must-not-leak comment and
  * rawtext cases) and the directive evaluation rules.
  */
class IndexabilitySpec extends AnyFunSuite {

  test("scanner surfaces meta name/content pairs, decoded, first " +
      "value wins; comment/rawtext metas never leak") {
    val ex = Html.extractText(
      """<head>
        |<meta name="robots" content="noindex,&#32;nofollow">
        |<meta name=ROBOTS content=all>
        |<meta charset="utf-8">
        |<meta name="desc">
        |<!-- <meta name="robots" content="noarchive"> -->
        |<script>document.write('<meta name="robots" content="none">')</script>
        |<textarea><meta name="robots" content="nosnippet"></textarea>
        |</head>""".stripMargin)
    assert(ex.metas == Seq(("robots", "noindex, nofollow"),
      ("robots", "all")))
  }

  test("scanner counts rel=nofollow links: token rules, quoting " +
      "styles, case") {
    val ex = Html.extractText(
      """<a href="/1" rel="nofollow">a</a>
        |<a href="/2" rel="external nofollow noopener">b</a>
        |<a href="/3" rel=NoFollow>c</a>
        |<a href="/4" rel="external,nofollow">d</a>
        |<a href="/5" rel="nofollower">e</a>
        |<a href="/6">f</a>
        |<a rel="nofollow">no href, not a link</a>""".stripMargin)
    assert(ex.nLinks == 6)
    assert(ex.nNofollow == 4) // 1,2,3,4; "nofollower" is not a token
  }

  test("evaluate: restrictive union, none expansion, all asserts " +
      "nothing, unknown directives ignored") {
    def v(metas: Seq[(String, String)], hdrs: Seq[String] = Nil) =
      Indexability.evaluate(metas, hdrs, "graftbot")
    assert(v(Nil) == Indexability.Verdict(true, true, true, true, 0))
    assert(v(Seq(("robots", "all"))).index)
    assert(!v(Seq(("robots", "NONE"))).index)
    assert(!v(Seq(("robots", "none"))).follow)
    assert(!v(Seq(("robots", "all"), ("robots", "noindex"))).index)
    assert(!v(Seq(("robots", "index"), ("graftbot", "noindex"))).index)
    assert(v(Seq(("otherbot", "noindex"))).index) // other bot's meta
    assert(v(Seq(("robots", "wibble, index"))).index) // unknown ignored
    assert(!v(Seq(("robots", " Noarchive "))).archive)
  }

  test("X-Robots-Tag crawler scoping: bot prefix, other-bot prefix, " +
      "unscoped, directive-looking prefix is NOT a scope") {
    def v(hdrs: String*) = Indexability.evaluate(Nil, hdrs, "graftbot")
    assert(!v("noindex").index)
    assert(!v("graftbot: noindex").index)
    assert(v("otherbot: noindex").index)
    assert(!v("GRAFTBOT: nosnippet").snippet)
    // `unavailable_after: <date>`-style values where the prefix IS a
    // directive name must not be read as a bot scope; conservatively
    // treat `noindex: x` as unscoped noindex-bearing text? No — the
    // directive-name prefix keeps the whole value unscoped, and the
    // tokens after the colon are what they are
    assert(v("noindex: 2026").nSources == 1)
    // valued directives carry a colon that is NOT a crawler scope —
    // misreading it would silently drop the co-listed noindex
    assert(!v("max-snippet:20, noindex").index)
    assert(!v("unavailable_after: 2026-01-01, noindex").index)
    assert(v("max-image-preview:large").nSources == 1)
    assert(v().nSources == 0)
    assert(Indexability.evaluate(
      Seq(("robots", "index")), Seq("graftbot: notranslate"),
      "graftbot").nSources == 2)
  }
}
