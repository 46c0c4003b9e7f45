package graft.queries

import org.apache.spark.sql.functions._

import graft.queries.Common.table

/** The crawl-frontier wave (round 10): the operators that turn the
  * archive-ingest stack (T104 gzip → T115 WARC → T117 HTTP → T119
  * charset → T118 HTML → T120 canonical URL) into an operating crawl
  * frontier — politeness (robots exclusion), discovery (sitemaps),
  * and payload-type trust (magic-byte sniffing).
  *
  * Scale shape: all per-row work — robots.txt is parsed once per HOST
  * (bounded by hosts, not pages) and the verdict join is the T120
  * canonical-key groupBy the frontier already pays. Nothing here
  * shuffles document text.
  */
object Crawl {

  def qs: Seq[Q] = Seq(

    Q("q212_robots_gate",
      "RFC 9309 robots exclusion gate (T121, graft.text.Robots — the " +
        "politeness layer over T120's canonical keys): per doc, a " +
        "synthesized robots.txt (agent-specific group with wildcard + " +
        "end-anchor rules, an even-doc Allow override, crawl-delay, a " +
        "catch-all * group whose severity varies by doc, comments/CRLF " +
        "noise, a global Sitemap line) is parsed by the real parser " +
        "and four probe paths are evaluated for two crawler tokens: " +
        "graftbot-news (exercises longest-PREFIX agent selection onto " +
        "the graftbot group, then longest-match-wins rule precedence " +
        "incl. the $-anchored Allow beating the shorter Disallow) and " +
        "otherbot (falls to the * group). The oracle knows every " +
        "verdict closed-form, so the hash match proves agent " +
        "selection, rule precedence, anchor/wildcard matching, and " +
        "crawl-delay/sitemap extraction all at once. Pure per-row " +
        "work, zero shuffle; at 100 TB robots parse cost is per-HOST " +
        "(bounded by the frontier's canonical-key groupBy), never " +
        "per-page",
      Some("""SELECT doc_id,
          CAST(4 AS BIGINT) AS n_probes,
          CAST(CASE WHEN doc_id % 2 = 0 THEN 2 ELSE 1 END AS BIGINT)
            AS n_allowed_bot,
          CAST(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS BIGINT)
            AS n_allowed_other,
          CAST(1 + doc_id % 5 AS BIGINT) AS crawl_delay,
          'http://ex' || CAST(doc_id % 97 AS VARCHAR) ||
            '.test/sitemap.xml' AS sitemap
        FROM documents ORDER BY doc_id"""),
      (s, d) => {
        import s.implicits._
        import graft.text.Robots
        table(s, d, "documents").select(col("doc_id")).as[Long]
          .map { id =>
            val g = id % 97
            val allowLine =
              if (id % 2 == 0) "Allow: /private/pub$ # carve-out\r\n"
              else ""
            val starRule = if (id % 3 == 0) "/p" else "/"
            val txt =
              s"# synthetic robots for doc $id\r\n" +
                "User-Agent: GraftBot\r\n" +
                "Disallow: /private/\r\n" +
                allowLine +
                "Disallow: /tmp*\r\n" +
                s"Crawl-delay: ${1 + id % 5}\r\n" +
                "\r\n" +
                "User-agent: *\r\n" +
                s"Disallow: $starRule\r\n" +
                "\r\n" +
                s"Sitemap: http://ex$g.test/sitemap.xml\r\n"
            val robots = Robots.parse(txt)
            val probes = Seq("/private/pub", "/private/x",
              "/pub/a?x=1", "/tmpfile")
            val nBot = probes
              .count(Robots.isAllowed(robots, "graftbot-news", _))
            val nOther = probes
              .count(Robots.isAllowed(robots, "otherbot", _))
            (id, probes.length.toLong, nBot.toLong, nOther.toLong,
              Robots.crawlDelay(robots, "graftbot-news")
                .getOrElse(-1L),
              robots.sitemaps.headOption.getOrElse("-"))
          }
          .toDF("doc_id", "n_probes", "n_allowed_bot",
            "n_allowed_other", "crawl_delay", "sitemap")
          .orderBy("doc_id")
      })
  )
}
