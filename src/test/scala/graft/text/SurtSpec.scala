package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** SURT canonical-key vectors (T164). The reference examples are the
  * publicly documented ones from the webarchive-commons SURT README
  * and pywb's canonicalize docs/tests; the rest pin this
  * implementation's documented rule subset at its boundaries.
  */
class SurtSpec extends AnyFunSuite {

  private def s(u: String): String = Urls.surt(u).get

  test("public reference vectors (webarchive-commons / pywb)") {
    assert(s("http://www.archive.org/") == "org,archive)/")
    assert(s("http://archive.org/goo/?a=2&b&a=1") ==
      "org,archive)/goo?a=1&a=2&b")
    assert(s("http://archive.org/") == "org,archive)/")
    assert(s("https://example.com/path/file.html") ==
      "com,example)/path/file.html")
  }

  test("host rules: lowercase, trailing dot, ONE www strip, label " +
      "reversal; ports keep only when non-default") {
    assert(s("HTTP://WWW.Example.COM/") == "com,example)/")
    assert(s("http://example.com./") == "com,example)/")
    // only one www label strips — www.www.example.com keeps one
    assert(s("http://www.www.example.com/") == "com,example,www)/")
    // a bare "www" host must not strip to nothing
    assert(s("http://www./x") == "www)/x")
    assert(s("http://sub.example.co.uk/") == "uk,co,example,sub)/")
    assert(s("http://example.com:80/") == "com,example)/")
    assert(s("https://example.com:443/") == "com,example)/")
    assert(s("https://example.com:8443/") == "com,example:8443)/")
  }

  test("path/query rules: lowercase, dot segments, trailing slash, " +
      "sorted params with duplicates kept; userinfo + fragment drop") {
    assert(s("http://example.com/A/B/../C/") == "com,example)/a/c")
    assert(s("http://example.com/p?") == "com,example)/p")
    assert(s("http://example.com/p#frag") == "com,example)/p")
    assert(s("http://user:pw@example.com/p") == "com,example)/p")
    assert(s("http://example.com/P?B=2&a=1") == "com,example)/p?a=1&b=2")
    assert(s("http://example.com") == "com,example)/")
    // duplicates survive the sort (they are distinct captures)
    assert(s("http://example.com/?x=2&x=1") == "com,example)/?x=1&x=2")
  }

  test("the SORT property the key exists for: one domain's records " +
      "group contiguously — ')' orders before ',' so a parent host " +
      "precedes its subdomains") {
    val keys = Seq(
      s("http://example.com/z"),
      s("http://a.example.com/a"),
      s("http://example.com/a"),
      s("http://examplf.com/a"),
      s("http://b.example.com/a")).sorted
    // all example.com keys (parent first, then subdomains) precede
    // the lexicographically-next domain
    assert(keys == Seq(
      "com,example)/a", "com,example)/z",
      "com,example,a)/a", "com,example,b)/a",
      "com,examplf)/a"))
  }

  test("None exactly when parse rejects; never throws") {
    assert(Urls.surt("not a url").isEmpty)
    assert(Urls.surt("mailto:a@b.c").isEmpty)
    assert(Urls.surt("").isEmpty)
  }
}
