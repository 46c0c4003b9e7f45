package graft.multimodal

/** Robots directive evaluation for page-level sources (q218, T127) —
  * the in-page counterpart of the robots.txt gate (T121): robots META
  * tags from the T118 HTML scan and `X-Robots-Tag` response headers
  * from the T117 walk. A training-corpus build honors these the same
  * way a search indexer does — `noindex` pages are excluded from the
  * corpus, `nofollow` cuts the link graph the frontier would
  * otherwise expand.
  *
  * Rules (the REP page-level conventions Google/Bing document):
  *
  *  - directive lists are comma-separated, case-insensitive;
  *    `none` ≡ `noindex, nofollow`; `all` asserts nothing
  *  - a meta tag applies when its `name` is `robots` (all crawlers)
  *    or the crawler's own token; when several sources apply, the
  *    MOST RESTRICTIVE union wins
  *  - an `X-Robots-Tag` value optionally scopes to one crawler with a
  *    leading `token:` — a single-word prefix before `:` that is not
  *    itself a directive; unscoped values apply to everyone, values
  *    scoped to another bot are ignored
  *  - metas inside comments or script/style rawtext never apply (the
  *    T118 scanner already never surfaces them)
  *
  * Pure functions, never throw; unknown directives are ignored
  * (forward compatibility, the RFC 9309 §2.2.4 posture again).
  */
object Indexability {

  final case class Verdict(
      index: Boolean,
      follow: Boolean,
      archive: Boolean,
      snippet: Boolean,
      nSources: Int) // how many directive sources applied

  // includes the VALUED directive names (max-snippet:20,
  // unavailable_after: <date>) — their colon is directive syntax, not
  // a crawler scope, and misreading it as a scope would silently drop
  // co-listed noindex values
  private val Directives = Set("index", "noindex", "follow", "nofollow",
    "all", "none", "noarchive", "nosnippet", "notranslate",
    "noimageindex", "max-snippet", "max-image-preview",
    "max-video-preview", "unavailable_after", "indexifembedded")

  private[multimodal] def tokens(value: String): Seq[String] =
    value.split(",").iterator.map(_.trim.toLowerCase)
      .filter(_.nonEmpty).toSeq

  /** Directive lists applying to `bot` from the page's meta tags. */
  def fromMetas(metas: Seq[(String, String)], bot: String): Seq[String] = {
    val b = bot.toLowerCase
    metas.collect {
      case (name, content) if name == "robots" || name == b => content
    }
  }

  /** Directive lists applying to `bot` from X-Robots-Tag values,
    * resolving the optional `token:` crawler scope.
    */
  def fromHeaders(values: Seq[String], bot: String): Seq[String] = {
    val b = bot.toLowerCase
    values.flatMap { v =>
      val c = v.indexOf(':')
      val prefix = if (c > 0) v.substring(0, c).trim.toLowerCase else ""
      if (c > 0 && prefix.nonEmpty && !prefix.exists(_.isWhitespace) &&
          !prefix.contains(',') && !Directives.contains(prefix)) {
        if (prefix == b) Some(v.substring(c + 1)) else None
      } else Some(v)
    }
  }

  /** Most-restrictive union over every applicable directive list. */
  def evaluate(metas: Seq[(String, String)], headerValues: Seq[String],
      bot: String): Verdict = {
    val sources = fromMetas(metas, bot) ++ fromHeaders(headerValues, bot)
    val ds = sources.flatMap(tokens).toSet
    val none = ds.contains("none")
    Verdict(
      index = !ds.contains("noindex") && !none,
      follow = !ds.contains("nofollow") && !none,
      archive = !ds.contains("noarchive"),
      snippet = !ds.contains("nosnippet"),
      nSources = sources.size)
  }
}
