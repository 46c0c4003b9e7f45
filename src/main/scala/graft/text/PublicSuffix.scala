package graft.text

/** Public-suffix / registrable-domain extraction (q221, T130) — the
  * key production frontiers ACTUALLY group by: politeness, crawl
  * quotas and dedup scopes operate on the registrable domain (eTLD+1:
  * `news.bbc.co.uk` → `bbc.co.uk`), not the raw host, because one
  * site spans many hosts while `co.uk` spans many sites. Implements
  * the publicsuffix.org algorithm exactly:
  *
  *  1. rules match label-wise from the right, case-insensitively;
  *     `*` matches exactly one label; a rule prevails over none
  *  2. an exception rule (`!` prefix) beats every normal rule and
  *     makes ITS OWN match depth the registrable domain (the
  *     algorithm's `!` semantics: the public suffix is the exception
  *     minus its leftmost label)
  *  3. otherwise the LONGEST (most labels) matching rule wins
  *  4. no rule matches ⇒ the implicit `*` rule: the public suffix is
  *     the last label alone
  *  5. registrable domain = public suffix + one more label; a host
  *     that IS a public suffix has none
  *
  * The rule table here is a compiled-in SUBSET of the list (the full
  * ~9k-rule file is a data artifact this sandbox cannot fetch; the
  * ALGORITHM is what this layer owns — swap in the full list as data
  * at deployment). The subset covers the algorithm's whole rule
  * grammar: plain multi-label suffixes (`co.uk`), wildcards (`*.ck`),
  * exceptions (`!www.ck`), and private-registry suffixes
  * (`github.io`). IP literals and single-label hosts return None.
  * Never throws.
  */
/** The publicsuffix.org algorithm over an arbitrary rule list — the
  * full ~9k-rule file loads here as data at deployment
  * (`new PslMatcher(lines)`); [[PublicSuffix]] is the compiled-in
  * default instance over the grammar-complete subset.
  */
class PslMatcher(rules: => Seq[String]) { // by-name + lazy parse: the
  // default instance passes its own companion val to the super
  // constructor before that val initializes

  private final case class Rule(labels: Array[String], exception: Boolean)

  private lazy val parsed: Seq[Rule] = rules.iterator
    .map(_.trim)
    .filter(r => r.nonEmpty && !r.startsWith("//")) // PSL file comments
    .map { r =>
      val ex = r.startsWith("!")
      Rule((if (ex) r.substring(1) else r).split('.').reverse, ex)
    }
    .toSeq

  private def isIpLiteral(host: String): Boolean =
    host.nonEmpty && (host.forall(c => c.isDigit || c == '.') ||
      host.startsWith("["))

  /** Longest matching rule's label count for `labels` (reversed host
    * labels), honoring wildcard and exception semantics. Returns the
    * public-suffix label count.
    */
  private def suffixLen(labels: Array[String]): Int = {
    var best = 1 // the implicit * rule
    var exceptionLen = -1
    parsed.foreach { r =>
      if (r.labels.length <= labels.length) {
        var i = 0
        var ok = true
        while (ok && i < r.labels.length) {
          val rl = r.labels(i)
          if (rl != "*" && rl != labels(i)) ok = false
          i += 1
        }
        if (ok) {
          if (r.exception)
            // the public suffix is the exception minus its leftmost
            // label
            exceptionLen = math.max(exceptionLen, r.labels.length - 1)
          else best = math.max(best, r.labels.length)
        }
      }
    }
    if (exceptionLen >= 0) exceptionLen else best
  }

  /** The public suffix of a (lowercased, trailing-dot-free) host. */
  def publicSuffix(host: String): Option[String] = {
    if (host.isEmpty || isIpLiteral(host)) return None
    val labels = host.toLowerCase.stripSuffix(".").split('.')
    if (labels.exists(_.isEmpty)) return None
    val n = suffixLen(labels.reverse)
    if (n > labels.length) None
    else Some(labels.takeRight(n).mkString("."))
  }

  /** The registrable domain (eTLD+1), None when the host IS a public
    * suffix (or unusable: IP literal, single public-suffix label,
    * empty labels).
    */
  def registrableDomain(host: String): Option[String] = {
    if (host.isEmpty || isIpLiteral(host)) return None
    val labels = host.toLowerCase.stripSuffix(".").split('.')
    if (labels.exists(_.isEmpty)) return None
    val n = suffixLen(labels.reverse)
    if (labels.length <= n) None
    else Some(labels.takeRight(n + 1).mkString("."))
  }
}

/** Compiled-in rule subset — grammar-complete, deployment swaps in
  * the full publicsuffix.org list as data via [[PslMatcher]].
  */
private[text] object DefaultPslRules {
  val Rules: Seq[String] = Seq(
    // ICANN, plain
    "com", "org", "net", "edu", "gov", "io", "co", "ai", "dev", "app",
    "uk", "co.uk", "org.uk", "ac.uk", "gov.uk",
    "au", "com.au", "org.au",
    "jp", "co.jp", "ne.jp",
    "br", "com.br",
    "test",
    // wildcard + exceptions (the .ck family is the canonical example)
    "*.ck", "!www.ck",
    // private registries
    "github.io", "gitlab.io", "s3.amazonaws.com")
}

object PublicSuffix extends PslMatcher(DefaultPslRules.Rules) {
  val Rules: Seq[String] = DefaultPslRules.Rules
}
