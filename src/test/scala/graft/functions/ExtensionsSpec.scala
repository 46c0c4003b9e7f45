package graft.functions

import graft.SparkSpec

/** GraftExtensions must expose the custom expressions in SQL text on any
  * session of a context configured with spark.sql.extensions (a STATIC
  * conf — it binds at first-session construction, which is why the
  * shared test session carries it). `newSession()` gives a fresh
  * function registry, so resolution below can only come from the
  * extension injection, never from a leftover runtime `register` call.
  */
class ExtensionsSpec extends SparkSpec {

  test("spark.sql.extensions injects graft functions for SQL text") {
    val fresh = spark.newSession()
    val r = fresh.sql(
      """SELECT graft_jaccard(array('a b c', 'b c d'), array('b c d')) AS j,
         graft_minhash_signature('one two three four') AS sig""").head
    assert(r.getDouble(0) == 0.5)
    assert(r.getSeq[Long](1).length == 8)
  }

  test("graft_nfc composes decomposed sequences, identity on NFC text") {
    val fresh = spark.newSession()
    // input is DECOMPOSED ('e' + U+0301, 2 code points); NFC must
    // compose it to the precomposed form (1 code point)
    val r = fresh.sql(
      "SELECT graft_nfc('Cafe\u0301') AS c, graft_nfc('ascii only') AS a," +
        " graft_nfc(graft_nfc('Cafe\u0301')) AS cc").head
    assert(r.getString(0) == "Caf\u00e9", r.getString(0))
    assert(r.getString(0).length == 4)
    assert(r.getString(1) == "ascii only") // fast path: already NFC
    assert(r.getString(2) == r.getString(0)) // idempotent
  }

  test("frontier scalars resolve via extensions and agree with the " +
      "text modules; rejects surface as NULL; non-string args fail " +
      "analysis (q234)") {
    val fresh = spark.newSession()
    val r = fresh.sql(
      """SELECT graft_canonical_url('HTTP://Ex.TEST:80/a/../b?x=1#f') AS c,
           graft_canonical_url('mailto:a@b.c') AS bad,
           graft_registrable_domain('news.site.co.uk') AS rd,
           graft_registrable_domain('co.uk') AS rdbad,
           graft_robots_allowed(
             'User-agent: *\nDisallow: /private/\n',
             'graftbot', '/private/x') AS denied,
           graft_robots_allowed(
             'User-agent: *\nDisallow: /private/\n',
             'graftbot', '/public/x') AS allowed""").head
    assert(r.getString(0) == "http://ex.test/b?x=1")
    assert(r.isNullAt(1))
    assert(r.getString(2) == "site.co.uk")
    assert(r.isNullAt(3))
    assert(!r.getBoolean(4) && r.getBoolean(5))
    val e = intercept[Exception](
      fresh.sql("SELECT graft_canonical_url(42)").head)
    assert(e.getMessage.contains("string"), e.getMessage)
  }

  test("wrong arity fails analysis instead of silently discarding " +
      "arguments (review-r11)") {
    val fresh = spark.newSession()
    for (sql <- Seq(
        "SELECT graft_canonical_url('http://x/', 'surplus')",
        "SELECT graft_registrable_domain()",
        "SELECT graft_robots_allowed('', 'bot', '/p', 'extra')",
        "SELECT graft_jaccard(array('a'))",
        "SELECT graft_nfc('a', 'b')")) {
      val e = intercept[Exception](fresh.sql(sql).head)
      assert(e.getMessage.contains("argument"), s"$sql -> ${e.getMessage}")
    }
    // the runtime register() path carries the same gate
    GraftFunctions.register(fresh)
    val e2 = intercept[Exception](
      fresh.sql("SELECT graft_shingles('a b c', 'extra')").head)
    assert(e2.getMessage.contains("argument"), e2.getMessage)
  }
}
