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
}
