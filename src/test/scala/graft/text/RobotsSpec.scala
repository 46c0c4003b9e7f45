package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** Referees for the RFC 9309 robots.txt layer (q212, T121). The
  * longest-match table is the one Google's robots documentation
  * publishes (the de-facto conformance suite); group/agent selection
  * cases come from RFC 9309 §2.2.1 and §5.
  */
class RobotsSpec extends AnyFunSuite {

  private def allowed(txt: String, agent: String, path: String): Boolean =
    Robots.isAllowed(Robots.parse(txt), agent, path)

  test("rule matching: prefix, wildcard, end anchor") {
    assert(Robots.ruleMatches("/", "/anything"))
    assert(Robots.ruleMatches("/fish", "/fish"))
    assert(Robots.ruleMatches("/fish", "/fish.html"))
    assert(Robots.ruleMatches("/fish", "/fish/salmon"))
    assert(!Robots.ruleMatches("/fish", "/Fish"))         // case-sensitive
    assert(!Robots.ruleMatches("/fish", "/catfish"))      // anchored at start
    assert(Robots.ruleMatches("/fish*", "/fishheads/ya"))
    assert(Robots.ruleMatches("/fish/", "/fish/salmon"))
    assert(!Robots.ruleMatches("/fish/", "/fish"))
    assert(Robots.ruleMatches("/*.php", "/index.php"))
    assert(Robots.ruleMatches("/*.php", "/folder/any.php.file"))
    assert(!Robots.ruleMatches("/*.php", "/php/"))        // no .php octets
    assert(Robots.ruleMatches("/*.php$", "/filename.php"))
    assert(!Robots.ruleMatches("/*.php$", "/filename.php?x=1"))
    assert(!Robots.ruleMatches("/*.php$", "/filename.php5"))
    assert(Robots.ruleMatches("/fish*.php", "/fish.php"))
    assert(Robots.ruleMatches("/fish*.php", "/fishheads/catfish.php?p=1"))
    assert(!Robots.ruleMatches("/fish*.php", "/Fish.PHP"))
    assert(!Robots.ruleMatches("", "/anything"))          // empty = no match
    assert(Robots.ruleMatches("/$", "/"))
    assert(!Robots.ruleMatches("/$", "/page"))
    // multiple stars with anchored tail
    assert(Robots.ruleMatches("/a*b*c$", "/aXbYc"))
    assert(Robots.ruleMatches("/a*b*c$", "/abbc"))
    assert(!Robots.ruleMatches("/a*b*c$", "/aXbYcZ"))
  }

  test("longest-match precedence, allow wins length ties " +
      "(Google conformance table)") {
    val t1 = "user-agent: *\nallow: /p\ndisallow: /"
    assert(allowed(t1, "bot", "/page"))
    val t2 = "user-agent: *\nallow: /folder\ndisallow: /folder"
    assert(allowed(t2, "bot", "/folder/page")) // equal length -> allow
    val t3 = "user-agent: *\nallow: /page\ndisallow: /*.htm"
    assert(!allowed(t3, "bot", "/page.htm"))   // /*.htm (6) > /page (5)
    val t4 = "user-agent: *\nallow: /page\ndisallow: /*.ph"
    assert(allowed(t4, "bot", "/page.php5"))   // equal length 5 -> allow
    val t5 = "user-agent: *\nallow: /$\ndisallow: /"
    assert(allowed(t5, "bot", "/"))
    assert(!allowed(t5, "bot", "/page.htm"))
  }

  test("group selection: exact token, longest prefix, * fallback, " +
      "no group means allowed") {
    val txt =
      """user-agent: graftbot-news
        |disallow: /news-private/
        |
        |user-agent: graftbot
        |disallow: /private/
        |
        |user-agent: *
        |disallow: /
        |""".stripMargin
    // exact group wins; its rules alone apply (no inheritance)
    assert(!allowed(txt, "graftbot-news", "/news-private/x"))
    assert(allowed(txt, "graftbot-news", "/private/x"))
    // longest-prefix: graftbot-images has no exact group; 'graftbot'
    // is the longest prefix match
    assert(!allowed(txt, "graftbot-images", "/private/x"))
    assert(allowed(txt, "graftbot-images", "/public"))
    // unknown bot falls to *
    assert(!allowed(txt, "otherbot", "/anything"))
    // case-insensitive agent match
    assert(!allowed(txt, "GraftBot", "/private/x"))
    // no groups at all -> allowed
    assert(allowed("", "bot", "/x"))
    // robots.txt itself always fetchable, even under disallow: /
    assert(allowed(txt, "otherbot", "/robots.txt"))
  }

  test("adjacent user-agent lines share a group; same agent in two " +
      "groups merges (RFC 9309 §2.2.1)") {
    val txt =
      """user-agent: a
        |user-agent: b
        |disallow: /x/
        |
        |user-agent: a
        |disallow: /y/
        |""".stripMargin
    assert(!allowed(txt, "a", "/x/1"))
    assert(!allowed(txt, "a", "/y/1")) // merged from the second group
    assert(!allowed(txt, "b", "/x/1"))
    assert(allowed(txt, "b", "/y/1"))  // b is not in the second group
  }

  test("parsing: comments, CRLF, whitespace, unrecognized lines, " +
      "rules before any group, empty disallow") {
    val txt = "# header comment\r\n" +
      "disallow: /orphan/   # ignored: precedes any group\r\n" +
      "User-Agent:   Bot   # mixed case + spaces\r\n" +
      "unknown-directive: whatever\r\n" +
      "Disallow: /a/ # trailing comment\r\n" +
      "Allow:\r\n" + // empty allow value: matches nothing
      "Disallow:\r\n" // empty disallow value: allows everything
    val r = Robots.parse(txt)
    assert(r.groups.length == 1)
    assert(r.groups.head.agents == Seq("bot"))
    assert(r.groups.head.rules == Seq(
      Robots.Rule(allow = false, "/a/"),
      Robots.Rule(allow = true, ""),
      Robots.Rule(allow = false, "")))
    assert(!Robots.isAllowed(r, "bot", "/a/page"))
    assert(Robots.isAllowed(r, "bot", "/orphan/page"))
    assert(Robots.isAllowed(r, "bot", "/b"))
  }

  test("crawl-delay and sitemap surface; sitemap is global and does " +
      "not drop the open group's later rules") {
    val txt =
      """user-agent: bot
        |crawl-delay: 7
        |disallow: /a/
        |sitemap: http://ex.test/sm1.xml
        |disallow: /b/
        |
        |user-agent: *
        |crawl-delay: not-a-number
        |sitemap: http://ex.test/sm2.xml
        |""".stripMargin
    val r = Robots.parse(txt)
    assert(r.sitemaps == Seq("http://ex.test/sm1.xml",
      "http://ex.test/sm2.xml"))
    assert(Robots.crawlDelay(r, "bot").contains(7L))
    assert(Robots.crawlDelay(r, "other").isEmpty) // malformed -> ignored
    assert(!Robots.isAllowed(r, "bot", "/a/x"))
    assert(!Robots.isAllowed(r, "bot", "/b/x")) // group survived sitemap
  }

  test("regex referee: 2000 randomized (pattern, path) pairs agree " +
      "with the java.util.regex translation of the rule grammar") {
    // a robots rule is exactly the regex ^quote(p) with * -> .* and a
    // trailing $ kept — the star-backtracking matcher must agree with
    // the JDK engine everywhere
    def regexMatch(pattern: String, path: String): Boolean = {
      if (pattern.isEmpty) return false
      val anchored = pattern.endsWith("$")
      val body = if (anchored) pattern.dropRight(1) else pattern
      val rx = "^" + body.split("\\*", -1)
        .map(java.util.regex.Pattern.quote)
        .mkString("(?s:.*)") + (if (anchored) "$" else "")
      java.util.regex.Pattern.compile(rx).matcher(path).find()
    }
    val pieces = Seq("/", "a", "b", ".", "php", "*", "fish", "?x=1")
    for (seed <- 0 until 2000) {
      val rnd = new scala.util.Random(seed)
      val pattern = "/" + Seq.fill(rnd.nextInt(5))(
        pieces(rnd.nextInt(pieces.length))).mkString +
        (if (rnd.nextBoolean()) "$" else "")
      val path = "/" + Seq.fill(rnd.nextInt(6))(
        pieces(rnd.nextInt(pieces.length - 2))(0)).mkString +
        (if (rnd.nextBoolean()) "/fish.php" else "")
      assert(Robots.ruleMatches(pattern, path) ==
        regexMatch(pattern, path),
        s"seed=$seed pattern='$pattern' path='$path'")
    }
  }

  test("never throws on garbage") {
    val garbage = Seq("", ":", ":::", "user-agent:", "\u0000\u0001",
      "disallow", "user-agent: *\ndisallow: /\u0000*$$*",
      "crawl-delay: 9999999999999999999999")
    garbage.foreach { g =>
      val r = Robots.parse(g)
      Robots.isAllowed(r, "bot", "/x")
    }
  }
}
