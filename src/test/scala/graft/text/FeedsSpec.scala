package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** Referees for the feed-discovery layer (q232, T141): RFC 822 date
  * pins, RSS/Atom fixture cases (CDATA, comment decoys, rel
  * selection, link-less drops), a randomized referee against the
  * JDK's real DOM parser on well-formed feeds of BOTH dialects, and
  * the truncation sweep every scanner in this repo carries.
  */
class FeedsSpec extends AnyFunSuite {

  test("rfc822Day: weekday optional, 1-2 digit day, 2/4-digit year " +
      "pivot, zones, calendar validity") {
    assert(Feeds.rfc822Day("Mon, 01 Jan 2024 00:00:00 GMT")
      .contains(19723L))
    assert(Feeds.rfc822Day("1 Jan 2024 00:00 GMT").contains(19723L))
    assert(Feeds.rfc822Day("Sat, 15 Jun 2024 12:30:00 +0000")
      .contains(19889L))
    assert(Feeds.rfc822Day("15 Jun 2024 12:30:00 -0800")
      .contains(19889L)) // STATED date, zone never shifts it
    assert(Feeds.rfc822Day("15 Jun 24 12:30:00 EST").contains(19889L))
    assert(Feeds.rfc822Day("15 Jun 99 12:30:00 GMT")
      .contains(java.time.LocalDate.of(1999, 6, 15).toEpochDay))
    assert(Feeds.rfc822Day("29 Feb 2023 00:00:00 GMT").isEmpty)
    assert(Feeds.rfc822Day("Xxx, 01 Jan 2024 00:00:00 GMT").isEmpty)
    assert(Feeds.rfc822Day("01 Jan 2024 25:00:00 GMT").isEmpty)
    assert(Feeds.rfc822Day("01 Jan 2024 00:00:00 LOCAL").isEmpty)
    assert(Feeds.rfc822Day("not a date").isEmpty)
    assert(Feeds.rfc822Day("").isEmpty)
  }

  test("RSS 2.0: channel transparent, CDATA links, entity titles, " +
      "comment decoys never leak, link-less items drop") {
    val xml =
      """<?xml version="1.0"?>
        |<rss version="2.0"><channel>
        |  <title>Chan</title><link>http://c.test/</link>
        |  <!-- <item><link>http://decoy.test/</link></item> -->
        |  <item><title>A &amp; B</title>
        |    <link><![CDATA[http://a.test/p?x=1&y=2]]></link>
        |    <pubDate>Mon, 01 Jan 2024 00:00:00 GMT</pubDate></item>
        |  <item><title>no link, drops</title></item>
        |  <item><link>http://a.test/q</link>
        |    <pubDate>bogus</pubDate></item>
        |</channel></rss>""".stripMargin
    val p = Feeds.parse(xml)
    assert(p.kind == "rss")
    assert(p.entries.length == 2)
    assert(p.entries(0) == Feeds.Entry("http://a.test/p?x=1&y=2",
      Some("A & B"), Some(19723L)))
    assert(p.entries(1) == Feeds.Entry("http://a.test/q", None, None))
  }

  test("entities inside CDATA stay LITERAL (XML semantics); entities " +
      "in plain text decode — per-run decode at append time") {
    val p = Feeds.parse(
      "<rss><channel><item>" +
        "<link><![CDATA[http://a.test/?a=1&amp;b=2]]></link>" +
        "<title>pre &amp; <![CDATA[raw &amp;]]> post &lt;x</title>" +
        "</item></channel></rss>")
    // a DOM parser returns the CDATA characters verbatim
    assert(p.entries.head.link == "http://a.test/?a=1&amp;b=2")
    assert(p.entries.head.title.contains("pre & raw &amp; post <x"))
  }

  test("channel-level link/title never bleed into entries (RSS)") {
    // the channel's own <link>/<title> sit OUTSIDE any <item> and
    // must not seed the first entry
    val p = Feeds.parse(
      "<rss><channel><link>http://chan.test/</link>" +
        "<item><link>http://e.test/1</link></item></channel></rss>")
    assert(p.entries.map(_.link) == Seq("http://e.test/1"))
  }

  test("Atom: href attribute, rel selection (alternate or rel-less " +
      "wins, enclosure skipped), published beats updated, " +
      "updated is the fallback") {
    val xml =
      """<feed xmlns="http://www.w3.org/2005/Atom">
        |  <title>F</title><link href="http://f.test/self" rel="self"/>
        |  <entry><title>E1</title>
        |    <link rel="enclosure" href="http://f.test/audio.mp3"/>
        |    <link rel="alternate" href="http://f.test/e1?a=1&amp;b=2"/>
        |    <link href="http://f.test/e1-too-late"/>
        |    <published>2024-01-01T00:00:00Z</published>
        |    <updated>2024-06-15T00:00:00Z</updated></entry>
        |  <entry><link href="http://f.test/e2"/>
        |    <updated>2024-06-15T08:00:00Z</updated></entry>
        |  <entry><title>linkless, drops</title></entry>
        |</feed>""".stripMargin
    val p = Feeds.parse(xml)
    assert(p.kind == "feed")
    assert(p.entries.length == 2)
    assert(p.entries(0) == Feeds.Entry("http://f.test/e1?a=1&b=2",
      Some("E1"), Some(19723L)))
    assert(p.entries(1) == Feeds.Entry("http://f.test/e2", None,
      Some(19889L)))
  }

  test("DOM-parser referee: 200 randomized well-formed feeds, both " +
      "dialects") {
    val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    for (seed <- 0 until 200) {
      val rnd = new scala.util.Random(seed)
      val atom = seed % 2 == 1
      val n = 1 + rnd.nextInt(6)
      val entries = (0 until n).map { j =>
        val link = s"http://h$seed.test/p$j?a=${rnd.nextInt(9)}&amp;b=$j"
        val title = s"t$seed &amp; $j"
        val day = 19000 + rnd.nextInt(1000)
        (link, title, day.toLong)
      }
      val xml =
        if (atom)
          "<?xml version=\"1.0\"?><feed>" + entries.map {
            case (l, t, day) =>
              val d = java.time.LocalDate.ofEpochDay(day)
              s"<entry><title>$t</title><link href=\"$l\"/>" +
                s"<updated>${d}T00:00:00Z</updated></entry>"
          }.mkString + "</feed>"
        else
          "<?xml version=\"1.0\"?><rss><channel>" + entries.map {
            case (l, t, day) =>
              val d = java.time.LocalDate.ofEpochDay(day)
              val fmt = java.time.format.DateTimeFormatter
                .ofPattern("EEE, dd MMM yyyy", java.util.Locale.US)
              s"<item><title>$t</title><link>$l</link>" +
                s"<pubDate>${fmt.format(d)} 08:30:00 GMT</pubDate></item>"
          }.mkString + "</channel></rss>"

      val ours = Feeds.parse(xml)
      val doc = dbf.newDocumentBuilder()
        .parse(new java.io.ByteArrayInputStream(
          xml.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      val dom = doc.getElementsByTagName(if (atom) "entry" else "item")
      assert(ours.kind == (if (atom) "feed" else "rss"), s"seed=$seed")
      assert(ours.entries.length == dom.getLength, s"seed=$seed")
      for (j <- 0 until dom.getLength) {
        val el = dom.item(j).asInstanceOf[org.w3c.dom.Element]
        val domLink =
          if (atom) el.getElementsByTagName("link").item(0)
            .asInstanceOf[org.w3c.dom.Element].getAttribute("href")
          else el.getElementsByTagName("link").item(0).getTextContent
        val domTitle =
          el.getElementsByTagName("title").item(0).getTextContent
        assert(ours.entries(j).link == domLink, s"seed=$seed j=$j")
        assert(ours.entries(j).title.contains(domTitle),
          s"seed=$seed j=$j")
        assert(ours.entries(j).epochDay.contains(entries(j)._3),
          s"seed=$seed j=$j")
      }
    }
  }

  test("truncation sweep: every prefix degrades, never throws") {
    val xml = "<rss><channel><item><title>T&amp;</title>" +
      "<link><![CDATA[http://a.test/x]]></link>" +
      "<pubDate>Mon, 01 Jan 2024 00:00:00 GMT</pubDate></item>" +
      "</channel></rss>"
    for (k <- 0 to xml.length) {
      val p = Feeds.parse(xml.substring(0, k)) // must not throw
      assert(p.entries.length <= 1)
    }
  }

  test("garbage and non-feed XML → unknown kind, zero entries") {
    for (s <- Seq("", "not xml at all", "<urlset><url/></urlset>",
        "<html><body><a href='x'>y</a></body></html>"))
      assert(Feeds.parse(s) == Feeds.Parsed("unknown", Nil), s)
  }
}
