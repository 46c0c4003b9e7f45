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
}
