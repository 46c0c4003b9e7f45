package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Referees for redirect-chain resolution (q235, T144): relative
  * Location resolution, canonical-key loop detection, the hop cap,
  * dangling/error terminals, and both RFC 9110 §10.2.3 Retry-After
  * forms.
  */
class RedirectsSpec extends AnyFunSuite {

  private def resp(status: Int, headers: (String, String)*)
      : Array[Byte] =
    Http.render(status, "x", headers.toSeq, Array.empty[Byte])

  test("chain: relative Location resolves against the CURRENT url, " +
      "cross-host absolute hops, final 200 canonicalized") {
    val site = Map(
      "http://a.test/dir/start" ->
        resp(301, "Location" -> "../r1"), // relative (RFC 9110 allows)
      "http://a.test/r1" ->
        resp(302, "Location" -> "HTTP://B.TEST:80/r2#frag"),
      "http://b.test/r2" -> resp(200))
    val o = Redirects.follow("HTTP://A.TEST:80/dir/start", site.get)
    assert(o == Redirects.Outcome("ok", 2,
      Some("http://b.test/r2"), None, Some(200)))
  }

  test("loop detected on CANONICAL keys (messy variant of a seen " +
      "url loops), too_many at the cap, dangling forms") {
    val loop = Map(
      "http://a.test/a" -> resp(301, "Location" -> "/b"),
      "http://a.test/b" ->
        resp(301, "Location" -> "HTTP://A.TEST:80/a#f")) // seen /a
    assert(Redirects.follow("http://a.test/a", loop.get).status ==
      "loop")
    val deep = (0 to 9).map(k => s"http://a.test/h$k" ->
      resp(301, "Location" -> s"/h${k + 1}")).toMap
    val tm = Redirects.follow("http://a.test/h0", deep.get)
    assert(tm.status == "too_many" && tm.hops == 5)
    // dangling: no Location / non-hierarchical Location
    assert(Redirects.follow("http://a.test/x",
      Map("http://a.test/x" -> resp(301)).get).status == "dangling")
    assert(Redirects.follow("http://a.test/y",
      Map("http://a.test/y" -> resp(302,
        "Location" -> "mailto:a@b.c")).get).status == "dangling")
  }

  test("304 is the revalidation SUCCESS path, not a redirect: the " +
      "cached document at the current url stands (review-r11)") {
    val o = Redirects.follow("HTTP://A.TEST:80/cached",
      Map("http://a.test/cached" -> resp(304)).get)
    assert(o == Redirects.Outcome("not_modified", 0,
      Some("http://a.test/cached"), None, Some(304)))
    // even mid-chain: a redirect INTO a 304 ends not_modified there
    val chain = Map(
      "http://a.test/m" -> resp(301, "Location" -> "/cached"),
      "http://a.test/cached" -> resp(304))
    val o2 = Redirects.follow("http://a.test/m", chain.get)
    assert(o2 == Redirects.Outcome("not_modified", 1,
      Some("http://a.test/cached"), None, Some(304)))
  }

  test("robots fetch policy (RFC 9309 §2.3.1): 2xx rules, 4xx " +
      "allow_all, 5xx/429 disallow_all, redirects chase, " +
      "undeliverable chains allow") {
    val body = "User-agent: *\nDisallow: /private/\n".getBytes("UTF-8")
    val okStore = Map("http://a.test/robots.txt" ->
      Http.render(200, "OK", Seq("Content-Type" -> "text/plain"), body))
    val (p1, b1) =
      Redirects.fetchRobots("HTTP://A.TEST:80/robots.txt", okStore.get)
    assert(p1 == "rules" && b1.get.toSeq == body.toSeq)
    def one(st: Int) = Redirects.fetchRobots("http://a.test/robots.txt",
      Map("http://a.test/robots.txt" -> resp(st)).get)._1
    assert(one(404) == "allow_all")
    assert(one(410) == "allow_all")
    assert(one(500) == "disallow_all")
    assert(one(503) == "disallow_all")
    assert(one(429) == "disallow_all")
    // redirected robots.txt is chased to its rules
    val moved = Map(
      "http://a.test/robots.txt" -> resp(301, "Location" -> "/r2"),
      "http://a.test/r2" ->
        Http.render(200, "OK", Nil, body))
    val (pm, bm) =
      Redirects.fetchRobots("http://a.test/robots.txt", moved.get)
    assert(pm == "rules" && bm.get.toSeq == body.toSeq)
    // a redirect loop / missing file is "unreachable by redirect" →
    // the §2.3.1.2 MAY: treat as unavailable, allow all
    val loop = Map(
      "http://a.test/robots.txt" -> resp(301, "Location" -> "/b"),
      "http://a.test/b" ->
        resp(301, "Location" -> "/robots.txt"))
    assert(Redirects.fetchRobots("http://a.test/robots.txt",
      loop.get)._1 == "allow_all")
    assert(Redirects.fetchRobots("http://a.test/robots.txt",
      (_: String) => None)._1 == "allow_all")
    // a 304 on a conditional robots re-fetch means the CACHED rules
    // stand — never allow_all (ADVICE-r11: the catch-all dropped a
    // host's restrictions on every successful revalidation)
    assert(Redirects.fetchRobots("http://a.test/robots.txt",
      Map("http://a.test/robots.txt" -> resp(304)).get)._1 == "cached")
  }

  test("retry: delta-seconds and HTTP-date Retry-After; error and " +
      "unfetchable terminals") {
    val r1 = Redirects.follow("http://a.test/r",
      Map("http://a.test/r" -> resp(503,
        "Retry-After" -> "120")).get)
    assert(r1 == Redirects.Outcome("retry", 0, None, Some(120L),
      Some(503)))
    val r2 = Redirects.follow("http://a.test/r",
      Map("http://a.test/r" -> resp(429,
        "Retry-After" -> "Tue, 14 Nov 2023 22:15:20 GMT",
        "Date" -> "Tue, 14 Nov 2023 22:13:20 GMT")).get)
    assert(r2.backoffS.contains(120L))
    // date form without a parsable Date header -> no backoff value
    val r3 = Redirects.follow("http://a.test/r",
      Map("http://a.test/r" -> resp(503,
        "Retry-After" -> "Tue, 14 Nov 2023 22:15:20 GMT")).get)
    assert(r3.status == "retry" && r3.backoffS.isEmpty)
    assert(Redirects.follow("http://a.test/e",
      Map("http://a.test/e" -> resp(404)).get).status == "error")
    assert(Redirects.follow("http://a.test/gone",
      (_: String) => None).status == "unfetchable")
    assert(Redirects.follow("mailto:a@b.c",
      (_: String) => None).status == "unfetchable")
    // a redirect INTO a missing page is unfetchable at hop 1
    val part = Map("http://a.test/p" -> resp(301, "Location" -> "/q"))
    val o = Redirects.follow("http://a.test/p", part.get)
    assert(o.status == "unfetchable" && o.hops == 1)
  }
}
