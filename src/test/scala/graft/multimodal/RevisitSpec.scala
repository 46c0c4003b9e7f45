package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Referees for the RFC 9111 revisit decision (q231, T140): the
  * HTTP-date parser against java.time formatters across all three
  * RFC 9110 §5.6.7 formats, the Cache-Control grammar, the decision
  * table branch by branch, and the production path off real rendered
  * response bytes.
  */
class RevisitSpec extends AnyFunSuite {
  import java.time.{Instant, ZoneOffset}
  import java.time.format.DateTimeFormatter
  import java.util.Locale

  private def fmt(p: String) = DateTimeFormatter.ofPattern(p, Locale.US)
    .withZone(ZoneOffset.UTC)

  test("JDK referee: 500 random instants round-trip through all " +
      "three HTTP-date formats") {
    val imf = fmt("EEE, dd MMM yyyy HH:mm:ss 'GMT'")
    val r850 = fmt("EEEE, dd-MMM-yy HH:mm:ss 'GMT'")
    val asc = fmt("EEE MMM ppd HH:mm:ss yyyy")
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 500) {
      // 1970..2069 so the RFC 850 two-digit-year pivot is identity
      val epoch = rnd.nextLong(3155760000L)
      val inst = Instant.ofEpochSecond(epoch)
      assert(Revisit.parseHttpDate(imf.format(inst)).contains(epoch),
        imf.format(inst))
      assert(Revisit.parseHttpDate(r850.format(inst)).contains(epoch),
        r850.format(inst))
      assert(Revisit.parseHttpDate(asc.format(inst)).contains(epoch),
        asc.format(inst))
    }
  }

  test("malformed HTTP-dates reject: wrong zone, bogus weekday, " +
      "impossible calendar date, wrong padding, garbage") {
    for (s <- Seq(
        "Sun, 06 Nov 1994 08:49:37 PST", // not GMT
        "Foo, 06 Nov 1994 08:49:37 GMT", // bogus weekday token
        "Sun, 31 Feb 1994 08:49:37 GMT", // invalid calendar date
        "Sun, 6 Nov 1994 08:49:37 GMT", // fixdate day must be 2-digit
        "Sun, 06 Nov 1994 08:49:37", "", "now",
        "Sun, 06 Nov 1994 08:49 GMT", // missing seconds
        "06 Nov 1994 08:49:37 GMT")) // missing weekday
      assert(Revisit.parseHttpDate(s).isEmpty, s)
  }

  test("Cache-Control grammar: case folding, quoted strings hide " +
      "commas, first directive occurrence wins, malformed " +
      "delta-seconds falls through") {
    val cc = Revisit.parseCacheControl(
      """Max-Age=60, no-CACHE, private="set-cookie, x", max-age=999""")
    assert(cc("max-age").contains("60")) // first wins
    assert(cc.contains("no-cache"))
    assert(cc("private").contains("set-cookie, x")) // comma in quotes
    // malformed max-age makes the directive unusable: the decision
    // falls through to Expires (absent here) and the entry is stale
    val d = Revisit.decide(Seq("max-age=abc"), None, None, None,
      Some("\"e1\""), ageS = 0L)
    assert(d.action == "revalidate" && d.lifetimeS == 0L)
  }

  test("decision table: every branch") {
    val D = 1700000000L
    // fresh max-age → skip
    assert(Revisit.decide(Seq("max-age=100"), None, None, None, None,
      50L) == Revisit.Decision("skip", "none", 100L, heuristic = false))
    // stale + ETag → if-none-match (preferred over Last-Modified)
    assert(Revisit.decide(Seq("max-age=100"), None, None, Some(D),
      Some("\"x\""), 200L).validator == "if-none-match")
    // stale + only Last-Modified → if-modified-since
    assert(Revisit.decide(Seq("max-age=100"), None, None, Some(D),
      None, 200L).validator == "if-modified-since")
    // stale, no validators → fetch
    assert(Revisit.decide(Seq("max-age=100"), None, None, None, None,
      200L).action == "fetch")
    // no-store beats everything → fetch
    assert(Revisit.decide(Seq("no-store, max-age=9999"), None, None,
      None, Some("\"x\""), 0L).action == "fetch")
    // no-cache → revalidate even when fresh
    assert(Revisit.decide(Seq("no-cache, max-age=9999"), None, None,
      Some(D), None, 0L).action == "revalidate")
    // s-maxage beats max-age for a shared cache
    assert(Revisit.decide(Seq("s-maxage=500, max-age=1"), None, None,
      None, None, 100L).action == "skip")
    // Expires − Date when no CC lifetime
    assert(Revisit.decide(Nil, Some(D),
      Some("Tue, 14 Nov 2023 22:26:40 GMT"), None, None,
      100L) == Revisit.Decision("skip", "none", 800L,
        heuristic = false))
    // unparsable Expires = already expired (RFC 9111 §5.3)
    assert(Revisit.decide(Nil, Some(D), Some("0"), None, Some("\"e\""),
      0L).action == "revalidate")
    // heuristic: (Date − Last-Modified) / 10
    val h = Revisit.decide(Nil, Some(D), None, Some(D - 20000L), None,
      1000L)
    assert(h == Revisit.Decision("skip", "none", 2000L,
      heuristic = true))
    // nothing at all → stale at age 0, no validator → fetch
    assert(Revisit.decide(Nil, None, None, None, None, 0L).action ==
      "fetch")
  }

  test("production path: the decision off real rendered response " +
      "bytes (T117 header walk), repeated Cache-Control headers " +
      "concatenate") {
    val body = "cached".getBytes("UTF-8")
    val p = Http.render(200, "OK", Seq(
      "Content-Type" -> "text/html",
      "Cache-Control" -> "public",
      "Cache-Control" -> "max-age=300",
      "ETag" -> "\"v7\"",
      "Date" -> "Tue, 14 Nov 2023 22:13:20 GMT"), body)
    val fresh = Revisit.decideFromResponse(p, 100L).get
    assert(fresh == Revisit.Decision("skip", "none", 300L,
      heuristic = false))
    val stale = Revisit.decideFromResponse(p, 301L).get
    assert(stale.action == "revalidate" &&
      stale.validator == "if-none-match")
    assert(Revisit.decideFromResponse("garbage".getBytes, 0L).isEmpty)
  }

  test("entity-tag parse (T175): strong, weak, comma/space inside " +
      "quotes, unquoted/unterminated/garbage reject") {
    import Revisit.{parseETag, ETag}
    assert(parseETag("\"x\"").contains(ETag(weak = false, "x")))
    assert(parseETag(" W/\"x\" ").contains(ETag(weak = true, "x")))
    assert(parseETag("\"a,b c\"").contains(ETag(weak = false, "a,b c")))
    assert(parseETag("\"\"").contains(ETag(weak = false, "")))
    assert(parseETag("x").isEmpty)        // unquoted
    assert(parseETag("\"x").isEmpty)      // unterminated
    assert(parseETag("w/\"x\"").isEmpty)  // weak marker is case-SENSITIVE
    assert(parseETag("\"a\"b\"").isEmpty) // interior DQUOTE
  }

  test("etag comparison (RFC 9110 §8.8.3.2 table): weak matches on " +
      "opaque alone, strong fails on ANY weak side") {
    import Revisit.{etagMatches, ETag}
    val s1 = ETag(weak = false, "1"); val w1 = ETag(weak = true, "1")
    val s2 = ETag(weak = false, "2")
    // the spec's §8.8.3.2 example table, all eight cells
    assert(etagMatches(w1, w1, strong = false))
    assert(!etagMatches(w1, w1, strong = true))
    assert(etagMatches(w1, ETag(weak = true, "1"), strong = false))
    assert(etagMatches(w1, s1, strong = false))
    assert(!etagMatches(w1, s1, strong = true))
    assert(etagMatches(s1, s1, strong = false))
    assert(etagMatches(s1, s1, strong = true))
    assert(!etagMatches(s1, s2, strong = false))
    assert(!etagMatches(s1, s2, strong = true))
  }

  test("If-None-Match list evaluation (§13.1.2): star, quoted " +
      "commas, malformed members skipped, weak comparison mandated") {
    import Revisit.{parseETagList, ifNoneMatchHits, parseETag}
    val stored = parseETag("\"v7\"")
    assert(ifNoneMatchHits("*", stored))
    assert(!ifNoneMatchHits("*", None))
    assert(ifNoneMatchHits("\"v7\"", stored))
    assert(ifNoneMatchHits("W/\"v7\"", stored)) // weak comparison
    assert(ifNoneMatchHits("\"a,b\", W/\"x\", \"v7\"", stored))
    assert(!ifNoneMatchHits("\"a,b\", W/\"x\"", stored))
    // the comma-in-quotes trap parses as ONE tag, not two
    assert(parseETagList("\"a,b\"").toOption.get.map(_.opaque) ==
      Seq("a,b"))
    // malformed member skipped, later members still apply
    assert(ifNoneMatchHits("\"miss\", garbage, \"v7\"", stored))
    assert(parseETagList("\"a\", not-quoted, W/\"b\"").toOption.get
      .map(_.opaque) == Seq("a", "b"))
    // unterminated tail drops without matching
    assert(!ifNoneMatchHits("\"v7", stored))
  }
}
