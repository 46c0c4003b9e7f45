package graft.multimodal

import graft.text.Urls

/** HTTP redirect-chain resolution (q235, T144) — the hop between a
  * frontier's scheduled fetch and the document it actually lands on.
  * Real crawls see 3xx on a large fraction of scheduled URLs; a
  * frontier that does not follow chains (with the safety rails
  * below) either loses those documents or loops forever. Composes
  * the existing layers: status + headers from the T117 walk,
  * `Location` resolved against the CURRENT url by the §5.4-conformant
  * [[graft.text.Urls.resolve]] (RFC 9110 §10.2.2 explicitly allows a
  * relative Location), every hop canonicalized by T120 so the
  * loop-detection SEEN set runs on frontier keys, not raw strings.
  *
  * Outcomes:
  *  - `ok` — a 2xx was reached; `finalUrl` is its canonical URL
  *    (what the frontier records as the fetch's true identity)
  *  - `not_modified` — a 304: the q231 revalidation SUCCESS path,
  *    not a redirect — the cached document at the current URL stands
  *  - `loop` — a canonical URL repeated within the chain
  *  - `too_many` — more than `maxHops` redirects (the crawler cap;
  *    browsers use ~20, crawlers 5)
  *  - `dangling` — a 3xx without a usable Location (absent,
  *    non-hierarchical, or malformed after resolution)
  *  - `retry` — 429/503 with the backoff surfaced: `Retry-After` as
  *    delta-seconds, or as an HTTP-date minus the response's `Date`
  *    (RFC 9110 §10.2.3 — both forms are legal; date form without a
  *    parsable Date header yields no backoff)
  *  - `error` — any other non-2xx/3xx terminal status
  *  - `unfetchable` — the start URL rejects canonicalization, or a
  *    hop's payload is missing/unparsable
  *
  * Pure per-row logic over archived exchanges — zero shuffle; at
  * 100 TB the chain walk rides the same narrow map as the T117
  * parse, and `finalUrl` feeds the T120 dedup key so a document
  * reached via 5 different entry URLs is ONE document.
  */
object Redirects {

  final case class Outcome(
      status: String,
      hops: Int,
      finalUrl: Option[String],
      backoffS: Option[Long],
      lastStatus: Option[Int] = None) // the terminal HTTP status when
                                      // one was read (ok/not_modified/
                                      // retry/error) — what the robots
                                      // fetch policy (T149) branches on

  /** Seconds of backoff a Retry-After value demands, given the
    * response's parsed Date (for the HTTP-date form). Delta-seconds
    * grammar shared with [[Revisit]] (one copy — review-r11).
    */
  private def backoffOf(retryAfter: Option[String],
      date: Option[Long]): Option[Long] =
    retryAfter.map(_.trim).flatMap { s =>
      Revisit.deltaSecondsOf(s).orElse(for {
        at <- Revisit.parseHttpDate(s)
        d <- date
      } yield math.max(0L, at - d))
    }

  /** Follow the redirect chain from `start`, fetching each canonical
    * URL's raw response bytes through `fetch` (the crawl store / HTTP
    * client seam; None = nothing archived for that URL). Each hop
    * reads status + headers in ONE byte walk ([[Http.statusAndHeaders]]
    * — review-r11: the parseResponse route md5'd the body and
    * re-walked headers per named lookup).
    */
  def follow(start: String, fetch: String => Option[Array[Byte]],
      maxHops: Int = 5): Outcome = {
    var cur = Urls.canonicalize(start).getOrElse(
      return Outcome("unfetchable", 0, None, None))
    val seen = scala.collection.mutable.Set(cur)
    var hops = 0
    while (true) {
      val p = fetch(cur).getOrElse(
        return Outcome("unfetchable", hops, None, None))
      val (status, headers) = Http.statusAndHeaders(p).getOrElse(
        return Outcome("unfetchable", hops, None, None))
      def hdr(name: String): Option[String] =
        headers.find(_._1 == name).map(_._2)
      status match {
        case s if s >= 200 && s <= 299 =>
          return Outcome("ok", hops, Some(cur), None, Some(s))
        // 304 is NOT a redirect: it is the q231 revalidation success
        // path — the cached document at the CURRENT url stands
        // (review-r11: the 3xx catch-all misread it as a dead link)
        case 304 =>
          return Outcome("not_modified", hops, Some(cur), None,
            Some(304))
        case s if s >= 300 && s <= 399 =>
          val next = hdr("location")
            .flatMap(loc => Urls.resolve(cur, loc))
            .flatMap(Urls.canonicalize)
          next match {
            case None =>
              return Outcome("dangling", hops, None, None)
            case Some(n) =>
              if (hops + 1 > maxHops)
                return Outcome("too_many", hops, None, None)
              if (!seen.add(n))
                return Outcome("loop", hops + 1, None, None)
              cur = n
              hops += 1
          }
        case s if s == 429 || s == 503 =>
          return Outcome("retry", hops, None,
            backoffOf(hdr("retry-after"),
              hdr("date").flatMap(Revisit.parseHttpDate)), Some(s))
        case s =>
          return Outcome("error", hops, None, None, Some(s))
      }
    }
    Outcome("unfetchable", hops, None, None) // unreachable
  }

  /** RFC 9309 §2.3.1 robots-FETCH policy (q240, T149) — what governs
    * a host before any rule can: chase redirects to the robots.txt
    * (§2.3.1.2, the usual ≤5-hop cap), then
    *
    *  - 2xx → `rules`: parse the returned body and obey it
    *  - 4xx "unavailable" (§2.3.1.3) → `allow_all` — an absent
    *    robots.txt means no restrictions
    *  - 5xx / 429 "unreachable" (§2.3.1.4) → `disallow_all` — the
    *    crawler MUST assume complete disallow until it can read the
    *    file (the persistent-unreachability relaxation is a scheduler
    *    policy above this layer)
    *  - 304 → `cached` — a conditional robots re-fetch answered Not
    *    Modified: the PREVIOUSLY PARSED rules stand (ADVICE-r11: the
    *    old catch-all read this as allow_all, silently dropping a
    *    host's restrictions on every successful revalidation); the
    *    caller (which owns the rules dimension, [[graft.queries
    *    .Crawl.hostRobots]]) keeps its cached entry
    *  - undeliverable chains (loop / hop cap / dangling / missing) →
    *    `allow_all`, the §2.3.1.2 MAY for unreachable-by-redirect
    *
    * Seam contract (ADVICE-r11): `fetch` returning None means
    * CONFIRMED absence — nothing archived/served at that URL, the
    * §2.3.1.3 "unavailable" class → allow_all. A transport that can
    * fail transiently must surface the failure as a 5xx response
    * payload (the §2.3.1.4 "unreachable" class → disallow_all), never
    * as None — collapsing "couldn't reach" into "doesn't exist" turns
    * an outage into a politeness violation.
    *
    * Returns (policy, response payload bytes when policy == rules).
    */
  def fetchRobots(url: String, fetch: String => Option[Array[Byte]])
      : (String, Option[Array[Byte]]) =
    follow(url, fetch) match {
      case Outcome("ok", _, Some(fin), _, _) =>
        ("rules", fetch(fin).flatMap(Http.parseResponseWithBody)
          .map(_._2))
      case Outcome("not_modified", _, _, _, _) => ("cached", None)
      case o if o.status == "retry" ||
          (o.status == "error" && o.lastStatus.exists(_ >= 500)) =>
        ("disallow_all", None)
      case _ => ("allow_all", None)
    }
}
