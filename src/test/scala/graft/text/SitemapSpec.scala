package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** Referees for the sitemap layer (q213, T122): fixture cases for the
  * scanner's XML subset, W3C-datetime validation pins, the 50k
  * protocol cap, and a randomized referee against the JDK's real DOM
  * parser on well-formed documents (our scanner must agree with a
  * conformant XML parser wherever both accept the input; ours
  * additionally survives the malformed tail a crawl serves).
  */
class SitemapSpec extends AnyFunSuite {

  test("decodeXml: predefined entities, charrefs, malformed stay literal") {
    assert(Sitemap.decodeXml("a&amp;b&lt;c&gt;d&quot;e&apos;f") ==
      "a&b<c>d\"e'f")
    assert(Sitemap.decodeXml("x&#33;&#x21;y") == "x!!y")
    assert(Sitemap.decodeXml("bad&nope;kept&#zz;&#xD800;&") ==
      "bad&nope;kept&#zz;&#xD800;&")
    assert(Sitemap.decodeXml("no-amp") == "no-amp")
  }

  test("epochDay: W3C datetime forms, calendar validity, tz required " +
      "with time") {
    assert(Sitemap.epochDay("1970-01-01").contains(0L))
    assert(Sitemap.epochDay("2024-02-01").contains(19754L))
    assert(Sitemap.epochDay("2024").contains(19723L)) // YYYY -> Jan 1
    assert(Sitemap.epochDay("2024-02").contains(19754L)) // YYYY-MM -> 1st
    assert(Sitemap.epochDay("2023-06-15T10:30:00+02:00").contains(19523L))
    assert(Sitemap.epochDay("2023-06-15T10:30Z").contains(19523L))
    assert(Sitemap.epochDay("2023-06-15T10:30:00.5Z").contains(19523L))
    assert(Sitemap.epochDay("2024-13-01").isEmpty) // no month 13
    assert(Sitemap.epochDay("2023-02-30").isEmpty) // not a real day
    assert(Sitemap.epochDay("2023-06-15T10:30:00").isEmpty) // tz missing
    assert(Sitemap.epochDay("2023-06T10:30Z").isEmpty) // time needs full date
    assert(Sitemap.epochDay("junk").isEmpty)
    assert(Sitemap.epochDay("").isEmpty)
  }

  test("parse: urlset with CDATA, prefixes, unknown elements, " +
      "self-closing noise") {
    val xml =
      """<?xml version="1.0"?>
        |<!DOCTYPE urlset>
        |<!-- c -->
        |<sm:urlset xmlns:sm="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <sm:url><sm:loc><![CDATA[http://a.test/x?r=1&s=2]]></sm:loc>
        |    <sm:lastmod>2024-01-05</sm:lastmod>
        |    <extra attr="v > w"/>
        |    <sm:changefreq>daily</sm:changefreq>
        |    <sm:priority>0.5</sm:priority></sm:url>
        |  <sm:url><sm:loc>http://a.test/y?q=1&amp;p=2</sm:loc></sm:url>
        |  <sm:url><sm:priority>0.9</sm:priority></sm:url>
        |</sm:urlset>""".stripMargin
    val p = Sitemap.parse(xml)
    assert(p.kind == "urlset")
    assert(!p.truncated)
    // third url has no loc -> dropped
    assert(p.entries.length == 2)
    assert(p.entries(0).loc == "http://a.test/x?r=1&s=2")
    assert(p.entries(0).lastmodEpochDay.contains(19727L))
    assert(p.entries(0).changefreqValid && p.entries(0).priorityValid)
    assert(p.entries(1).loc == "http://a.test/y?q=1&p=2")
    assert(p.entries(1).lastmod.isEmpty)
  }

  test("parse: sitemapindex, priority/changefreq validation bounds") {
    val xml =
      """<sitemapindex>
        |  <sitemap><loc>http://a.test/s1.xml</loc></sitemap>
        |  <sitemap><loc>http://a.test/s2.xml</loc>
        |    <lastmod>2024-01-02</lastmod></sitemap>
        |</sitemapindex>""".stripMargin
    val p = Sitemap.parse(xml)
    assert(p.kind == "sitemapindex")
    assert(p.entries.map(_.loc) ==
      Seq("http://a.test/s1.xml", "http://a.test/s2.xml"))
    assert(Sitemap.Entry("x", None, None, Some("0.0")).priorityValid)
    assert(Sitemap.Entry("x", None, None, Some("1.0")).priorityValid)
    assert(!Sitemap.Entry("x", None, None, Some("1.5")).priorityValid)
    assert(!Sitemap.Entry("x", None, None, Some("-0.1")).priorityValid)
    assert(!Sitemap.Entry("x", None, None, Some("high")).priorityValid)
    assert(Sitemap.Entry("x", None, Some("never"), None).changefreqValid)
    assert(!Sitemap.Entry("x", None, Some("sometimes"), None).changefreqValid)
  }

  test("50,000-entry protocol cap sets truncated and keeps the walk alive") {
    val sb = new StringBuilder("<urlset>")
    (0 until 50002).foreach(j =>
      sb ++= s"<url><loc>http://a.test/$j</loc></url>")
    sb ++= "</urlset>"
    val p = Sitemap.parse(sb.toString)
    assert(p.truncated)
    assert(p.entries.length == Sitemap.MaxEntries)
    assert(p.entries.last.loc == "http://a.test/49999")
  }

  test("an unclosed child element inside an entry does not desync " +
      "the walk (entries are name-tracked, not depth-tracked)") {
    val p = Sitemap.parse(
      "<urlset><url><loc>http://a.test/1</loc><br></url>" +
        "<url><loc>http://a.test/2</loc></url></urlset>")
    assert(p.entries.map(_.loc) ==
      Seq("http://a.test/1", "http://a.test/2"))
  }

  test("never throws on malformed input") {
    val cases = Seq("", "<", "<!", "<urlset", "<urlset><url><loc>x",
      "</loc></url>", "<urlset><url><loc>a</url></urlset>",
      "<a><![CDATA[", "<?xml", "<!-- unterminated",
      "<urlset><url/><url><loc></loc></url></urlset>")
    cases.foreach(c => Sitemap.parse(c))
  }

  test("DOM-parser referee: 200 randomized well-formed sitemaps") {
    val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    for (seed <- 0 until 200) {
      val rnd = new scala.util.Random(seed)
      val n = 1 + rnd.nextInt(6)
      val entries = (0 until n).map { j =>
        val loc = s"http://h$seed.test/p$j?a=${rnd.nextInt(9)}&amp;b=$j"
        val lastmod =
          if (rnd.nextBoolean()) Some(f"202${rnd.nextInt(5)}%d-0${1 + rnd.nextInt(9)}%d-1${rnd.nextInt(9)}%d")
          else None
        (loc, lastmod)
      }
      val xml = "<?xml version=\"1.0\"?><urlset>" + entries.map {
        case (l, lm) =>
          s"<url><loc>$l</loc>" +
            lm.map(v => s"<lastmod>$v</lastmod>").getOrElse("") + "</url>"
      }.mkString + "</urlset>"

      val ours = Sitemap.parse(xml)
      val doc = dbf.newDocumentBuilder()
        .parse(new java.io.ByteArrayInputStream(
          xml.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      val dom = doc.getElementsByTagName("url")
      assert(ours.entries.length == dom.getLength, s"seed=$seed")
      (0 until dom.getLength).foreach { k =>
        val el = dom.item(k).asInstanceOf[org.w3c.dom.Element]
        val loc = el.getElementsByTagName("loc").item(0).getTextContent
        assert(ours.entries(k).loc == loc, s"seed=$seed k=$k")
        val lm = el.getElementsByTagName("lastmod")
        val domLm = if (lm.getLength > 0) Some(lm.item(0).getTextContent)
        else None
        assert(ours.entries(k).lastmod == domLm, s"seed=$seed k=$k")
      }
    }
  }

  test("crawlTree (T152): recursion, relative locs, cycle guard, " +
      "depth cap, missing children, file cap, missing root") {
    def urlset(locs: String*) = "<urlset>" + locs.map(l =>
      s"<url><loc>$l</loc></url>").mkString + "</urlset>"
    def index(locs: String*) = "<sitemapindex>" + locs.map(l =>
      s"<sitemap><loc>$l</loc></sitemap>").mkString + "</sitemapindex>"
    val h = "http://a.test"
    // two-level tree with a relative child loc and a cycle back up
    val store = Map(
      s"$h/sitemap.xml" -> index("/sm/i.xml", s"$h/sm/u1.xml"),
      s"$h/sm/i.xml" -> index("/sitemap.xml", "u2.xml"), // cycle + rel
      s"$h/sm/u1.xml" -> urlset(s"$h/p1", s"$h/p2"),
      s"$h/sm/u2.xml" -> urlset(s"$h/p3"))
    val r = Sitemap.crawlTree(s"$h/sitemap.xml", store.get)
    assert(r.rootKind == "sitemapindex" && r.nVisited == 4)
    assert(r.entries.map(_.loc).sorted ==
      Seq(s"$h/p1", s"$h/p2", s"$h/p3"))
    assert(r.nCycles == 1 && r.nMissing == 0 && !r.truncated)
    // MUTUAL cycle between two children terminates too
    val mutual = Map(
      s"$h/sitemap.xml" -> index("/a.xml"),
      s"$h/a.xml" -> index("/b.xml"),
      s"$h/b.xml" -> index("/a.xml", "/u.xml"),
      s"$h/u.xml" -> urlset(s"$h/p"))
    val rm = Sitemap.crawlTree(s"$h/sitemap.xml", mutual.get)
    assert(rm.nCycles == 1 && rm.entries.length == 1)
    // depth cap: the chain past maxDepth is counted, never fetched
    val chain = Map(
      s"$h/sitemap.xml" -> index("/c1.xml"),
      s"$h/c1.xml" -> index("/c2.xml"),
      s"$h/c2.xml" -> index("/c3.xml"),
      s"$h/c3.xml" -> urlset(s"$h/deep"))
    val rd = Sitemap.crawlTree(s"$h/sitemap.xml", chain.get,
      maxDepth = 2)
    assert(rd.nDepthHits == 1 && rd.nVisited == 3 && rd.entries.isEmpty)
    // file cap: truncated is explicit, never a silent stop
    val wide = Map(s"$h/sitemap.xml" ->
      index((1 to 9).map(k => s"/w$k.xml"): _*)) ++
      (1 to 9).map(k => s"$h/w$k.xml" -> urlset(s"$h/wp$k")).toMap
    val rc = Sitemap.crawlTree(s"$h/sitemap.xml", wide.get,
      maxSitemaps = 4)
    assert(rc.truncated && rc.nVisited == 4)
    // missing root / missing child
    val r404 = Sitemap.crawlTree(s"$h/sitemap.xml", (_: String) => None)
    assert(r404.rootKind == "missing" && r404.nMissing == 1 &&
      r404.nVisited == 0)
    val rmiss = Sitemap.crawlTree(s"$h/sitemap.xml",
      Map(s"$h/sitemap.xml" -> index("/gone.xml")).get)
    assert(rmiss.nMissing == 1 && rmiss.entries.isEmpty)
    // a root that parses as neither kind counts unknown
    val rjunk = Sitemap.crawlTree(s"$h/sitemap.xml",
      Map(s"$h/sitemap.xml" -> "<html>not a sitemap</html>").get)
    assert(rjunk.rootKind == "unknown" && rjunk.nUnknown == 1)
    // DAG shape (review-r12): a child depth-capped on one path must
    // stay reachable via a later SHALLOWER path — root lists B then A
    // (LIFO pops A first... order-independent: both orders must land
    // the subtree); B -> C -> X is past the cap, A -> X is legal
    val dag = Map(
      s"$h/sitemap.xml" -> index("/b.xml", "/a2.xml"),
      s"$h/b.xml" -> index("/c.xml"),
      s"$h/c.xml" -> index("/x.xml"), // X at depth 3 via B: capped
      s"$h/a2.xml" -> index("/x.xml"), // X at depth 2 via A: legal
      s"$h/x.xml" -> urlset(s"$h/px"))
    val rdag = Sitemap.crawlTree(s"$h/sitemap.xml", dag.get,
      maxDepth = 2)
    assert(rdag.entries.map(_.loc) == Seq(s"$h/px"),
      s"depth-capped child lost: $rdag")
    assert(rdag.nDepthHits == 1 && rdag.nCycles == 0)
    // a file cut at the per-file 50k entry cap surfaces as tree-level
    // truncation (review-r12: no silent caps)
    val big = "<urlset>" + (1 to 50001).map(k =>
      s"<url><loc>$h/big$k</loc></url>").mkString + "</urlset>"
    val rbig = Sitemap.crawlTree(s"$h/sitemap.xml",
      Map(s"$h/sitemap.xml" -> big).get)
    assert(rbig.truncated && rbig.entries.length == 50000)
  }
}
