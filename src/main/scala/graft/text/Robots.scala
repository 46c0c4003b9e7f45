package graft.text

/** robots.txt parse + allow/disallow matching (q212, T121) — the crawl
  * politeness layer. A 100 TB crawl is legally and operationally bound
  * by robots exclusion; the frontier joins every canonical URL (T120,
  * [[Urls]]) against its host's parsed rule set before scheduling a
  * fetch. Implements RFC 9309 (Robots Exclusion Protocol) plus the two
  * de-facto extensions every large crawler honors:
  *
  *  - **Lines**: split on CR / LF / CRLF; `#` starts a comment to EOL;
  *    `key: value` with the key case-insensitive and whitespace trimmed
  *    on both sides; unrecognized lines are ignored (RFC 9309 §2.2.4)
  *    and do NOT break a group (the Google parser's behavior — a
  *    `sitemap:` between rule lines leaves the group open).
  *  - **Groups** (§2.2.1): one or more adjacent `user-agent` lines
  *    start a group; subsequent `allow` / `disallow` lines belong to
  *    every agent named. A `user-agent` line appearing after rule
  *    lines starts a NEW group. Rules before any group are ignored.
  *    Multiple groups naming the same agent merge (§2.2.1 "combined
  *    into one group").
  *  - **Agent selection** (§2.2.1): case-insensitive; exact product-
  *    token match wins, else the LONGEST agent value that is a prefix
  *    of the crawler's token, else the `*` group, else no group (and
  *    no group ⇒ everything allowed, §2.3.1).
  *  - **Rule matching** (§2.2.2): patterns match from the start of the
  *    path-and-query; `*` matches any octet sequence; a trailing `$`
  *    anchors the end. The MOST SPECIFIC match wins = longest pattern
  *    in octets; on an allow/disallow tie of equal length, allow wins
  *    (§2.2.2 "SHOULD use the least restrictive rule"). An empty rule
  *    value matches nothing (an empty `Disallow:` allows everything).
  *    `/robots.txt` itself is implicitly always allowed.
  *  - **Extensions**: `crawl-delay` (seconds, integer) is a group
  *    member; `sitemap` is global (§2.2.4 treats it as "other
  *    records"). Both surface to the scheduler.
  *
  * Parsing never throws: a malformed line is skipped, a malformed
  * crawl-delay is ignored — crawl archives contain every possible
  * corruption and the frontier must keep moving.
  *
  * Reference shape: the reference repo has no crawl layer at all; this
  * belongs to the north-star training-data surface (SURVEY §2.7),
  * composing with T120 (canonical key), T110 (domain mix) and the
  * T104→T118 archive-ingest stack.
  */
object Robots {

  final case class Rule(allow: Boolean, pattern: String)

  final case class Group(
      agents: Seq[String],
      rules: Seq[Rule],
      crawlDelay: Option[Long])

  final case class RobotsTxt(groups: Seq[Group], sitemaps: Seq[String])

  /** Parse robots.txt text into groups + global sitemap lines. */
  def parse(text: String): RobotsTxt = {
    val groups = scala.collection.mutable.ArrayBuffer.empty[Group]
    val sitemaps = scala.collection.mutable.ArrayBuffer.empty[String]

    var agents = List.empty[String] // reversed accumulation
    var rules = List.empty[Rule]
    var delay: Option[Long] = None
    var inAgents = false // true while adjacent user-agent lines accumulate
    var open = false // a group is being built

    def flush(): Unit = {
      if (open && agents.nonEmpty)
        groups += Group(agents.reverse, rules.reverse, delay)
      agents = Nil; rules = Nil; delay = None; open = false
    }

    text.split("\r\n|\r|\n", -1).foreach { raw =>
      val noComment = {
        val h = raw.indexOf('#')
        if (h >= 0) raw.substring(0, h) else raw
      }
      val line = noComment.trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = line.substring(0, colon).trim.toLowerCase
        val value = line.substring(colon + 1).trim
        key match {
          case "user-agent" =>
            if (!inAgents) flush()
            if (value.nonEmpty) {
              agents = value.toLowerCase :: agents
              open = true
            }
            inAgents = true
          case "allow" | "disallow" =>
            inAgents = false
            if (open) rules = Rule(key == "allow", value) :: rules
          case "crawl-delay" =>
            inAgents = false
            if (open && delay.isEmpty)
              delay = value.toLongOption.filter(_ >= 0)
          case "sitemap" =>
            // global record: captured; leaves the open group's rules
            // intact but ends a user-agent accumulation run
            inAgents = false
            if (value.nonEmpty) sitemaps += value
          case _ => // unrecognized line: ignored, group stays open
        }
      }
      // blank / malformed lines are ignored and do not break a group
    }
    flush()
    RobotsTxt(groups.toSeq, sitemaps.toSeq)
  }

  /** Does `pattern` match `path` under §2.2.2 semantics? Anchored at
    * the path start; `*` = any sequence; trailing `$` anchors the end;
    * otherwise matching a PREFIX of the path suffices. Iterative
    * star-backtracking — no regex compilation in the per-URL hot loop.
    */
  private[text] def ruleMatches(pattern: String, path: String): Boolean = {
    if (pattern.isEmpty) return false // empty rule value matches nothing
    val anchored = pattern.endsWith("$")
    val pat = if (anchored) pattern.substring(0, pattern.length - 1)
    else pattern
    var p = 0; var s = 0
    var starP = -1; var starS = -1
    while (true) {
      if (p == pat.length) {
        if (!anchored || s == path.length) return true
        // anchored with path left over: widen the last star, if any
        if (starP < 0 || starS >= path.length) return false
        starS += 1; s = starS; p = starP + 1
      } else if (pat.charAt(p) == '*') {
        starP = p; starS = s; p += 1
      } else if (s < path.length && pat.charAt(p) == path.charAt(s)) {
        p += 1; s += 1
      } else if (starP >= 0 && starS < path.length) {
        starS += 1; s = starS; p = starP + 1
      } else return false
    }
    false // unreachable
  }

  /** Select + merge the groups governing `agent` (§2.2.1): exact
    * case-insensitive token match first, else longest prefix match,
    * else the `*` group, else None.
    */
  def group(robots: RobotsTxt, agent: String): Option[Group] = {
    val tok = agent.toLowerCase
    def merged(pick: String => Boolean): Option[Group] = {
      val gs = robots.groups.filter(_.agents.exists(pick))
      if (gs.isEmpty) None
      else Some(Group(
        gs.flatMap(_.agents).distinct,
        gs.flatMap(_.rules),
        gs.flatMap(_.crawlDelay).headOption))
    }
    merged(_ == tok)
      .orElse {
        val prefixes = robots.groups.flatMap(_.agents)
          .filter(a => a != "*" && tok.startsWith(a))
        prefixes.maxByOption(_.length)
          .flatMap(best => merged(_ == best))
      }
      .orElse(merged(_ == "*"))
  }

  /** Evaluate a pre-selected rule list (the agent's merged group, as
    * [[group]] returns it) against `path` — longest-match-wins, allow
    * wins length ties, no matching rule ⇒ allowed, `/robots.txt`
    * always allowed. This is the per-URL half of the split the
    * production frontier uses: [[parse]]+[[group]] run once per HOST
    * (a host-keyed rules dimension, broadcast to pages), and pages
    * evaluate their verdict against the joined rule array (round 11 —
    * the per-document parse the round-10 pipeline did is linear narrow
    * work but re-parses the same host's robots once per page).
    */
  def evalRules(rules: Seq[Rule], path: String): Boolean = {
    if (path == "/robots.txt") return true
    val hits = rules.filter(r => ruleMatches(r.pattern, path))
    if (hits.isEmpty) true
    else {
      val maxLen = hits.iterator.map(_.pattern.length).max
      hits.exists(r => r.pattern.length == maxLen && r.allow)
    }
  }

  /** Is `path` (path-and-query, e.g. `/a/b?x=1`) fetchable by `agent`?
    * Longest-match-wins; allow wins length ties; no matching rule or
    * no matching group ⇒ allowed; `/robots.txt` always allowed.
    */
  def isAllowed(robots: RobotsTxt, agent: String, path: String): Boolean =
    group(robots, agent) match {
      case None    => true
      case Some(g) => evalRules(g.rules, path)
    }

  /** The crawl-delay the scheduler must honor for `agent`, if any. */
  def crawlDelay(robots: RobotsTxt, agent: String): Option[Long] =
    group(robots, agent).flatMap(_.crawlDelay)
}
