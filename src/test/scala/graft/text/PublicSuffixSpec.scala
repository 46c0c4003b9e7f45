package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** Referees for registrable-domain extraction (q221, T130): the
  * publicsuffix.org algorithm's own documented test vectors, mapped
  * onto the compiled-in rule subset.
  */
class PublicSuffixSpec extends AnyFunSuite {

  private def rd(h: String) = PublicSuffix.registrableDomain(h)
  private def ps(h: String) = PublicSuffix.publicSuffix(h)

  test("plain rules: longest match wins") {
    assert(ps("example.com").contains("com"))
    assert(rd("example.com").contains("example.com"))
    assert(rd("a.b.example.com").contains("example.com"))
    assert(ps("news.bbc.co.uk").contains("co.uk"))
    assert(rd("news.bbc.co.uk").contains("bbc.co.uk"))
    assert(rd("bbc.co.uk").contains("bbc.co.uk"))
    // 'uk' and 'co.uk' both match -> co.uk (longest) wins
    assert(ps("x.co.uk").contains("co.uk"))
    // implicit * rule for unknown TLDs
    assert(ps("foo.unknowntld").contains("unknowntld"))
    assert(rd("foo.unknowntld").contains("foo.unknowntld"))
  }

  test("wildcard and exception rules (the .ck family)") {
    assert(ps("stuff.ck").contains("stuff.ck")) // *.ck
    assert(rd("stuff.ck").isEmpty) // it IS a public suffix
    assert(rd("shop.stuff.ck").contains("shop.stuff.ck"))
    assert(rd("a.shop.stuff.ck").contains("shop.stuff.ck"))
    // exception: !www.ck -> public suffix is ck, rd is www.ck
    assert(ps("www.ck").contains("ck"))
    assert(rd("www.ck").contains("www.ck"))
    assert(rd("sub.www.ck").contains("www.ck"))
  }

  test("private registries") {
    assert(rd("alice.github.io").contains("alice.github.io"))
    assert(rd("deep.alice.github.io").contains("alice.github.io"))
    assert(rd("github.io").isEmpty)
    assert(rd("bucket.s3.amazonaws.com").contains(
      "bucket.s3.amazonaws.com"))
  }

  test("PslMatcher loads arbitrary rule lists as data (the full PSL " +
      "file path): comments/blank lines skipped, fresh rules honored") {
    val m = new PslMatcher(Seq(
      "// ===BEGIN ICANN DOMAINS===",
      "", "  nz  ", "co.nz", "*.kawasaki.jp", "!city.kawasaki.jp"))
    assert(m.registrableDomain("shop.example.co.nz").contains(
      "example.co.nz"))
    assert(m.publicSuffix("x.kawasaki.jp").contains("x.kawasaki.jp"))
    assert(m.registrableDomain("city.kawasaki.jp").contains(
      "city.kawasaki.jp"))
    // the default instance is just the compiled-in rule list
    assert(new PslMatcher(PublicSuffix.Rules)
      .registrableDomain("a.b.co.uk") ==
      PublicSuffix.registrableDomain("a.b.co.uk"))
  }

  test("case folding, trailing dots, rejects") {
    assert(rd("WWW.EXAMPLE.COM").contains("example.com"))
    assert(rd("example.com.").contains("example.com"))
    assert(rd("com").isEmpty) // a public suffix itself
    assert(rd("localhost").isEmpty) // single label
    assert(rd("192.168.0.1").isEmpty) // IPv4 literal
    assert(rd("[2001:db8::1]").isEmpty) // IPv6 literal
    assert(rd("").isEmpty)
    assert(rd("a..b.com").isEmpty) // empty label
    assert(rd(".").isEmpty)
  }
}
