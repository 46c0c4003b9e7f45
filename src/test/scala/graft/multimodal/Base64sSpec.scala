package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Referees for base64/data-URI decode (q219, T128): randomized
  * agreement with java.util.Base64 across all three encoder variants,
  * the canonical-fill flag, padding/quantum rules, and RFC 2397
  * mediatype handling.
  */
class Base64sSpec extends AnyFunSuite {

  test("JDK referee: 300 random payloads x {standard, URL-safe, MIME}") {
    for (seed <- 0 until 300) {
      val rnd = new scala.util.Random(seed)
      val b = new Array[Byte](rnd.nextInt(200))
      rnd.nextBytes(b)
      val encs = Seq(
        java.util.Base64.getEncoder.encodeToString(b),
        java.util.Base64.getUrlEncoder.encodeToString(b),
        java.util.Base64.getUrlEncoder.withoutPadding.encodeToString(b),
        java.util.Base64.getMimeEncoder.encodeToString(b))
      encs.foreach { e =>
        val r = Base64s.decode(e)
        assert(r.isDefined, s"seed=$seed")
        assert(r.get._1.toSeq == b.toSeq, s"seed=$seed")
        assert(r.get._2, s"seed=$seed canonical expected")
      }
    }
  }

  test("final-quantum rules: 1-char quantum rejects, non-zero fill " +
      "bits decode flagged (JDK agreement)") {
    assert(Base64s.decode("YQ==").exists { case (b, c) =>
      new String(b) == "a" && c })
    assert(Base64s.decode("YQ").exists { case (b, c) =>
      new String(b) == "a" && c })
    // YR: fill bits 0001 -> same byte, flagged; JDK decodes it too
    val jdk = java.util.Base64.getDecoder.decode("YR==")
    assert(new String(jdk) == "a")
    assert(Base64s.decode("YR==").exists { case (b, c) =>
      new String(b) == "a" && !c })
    assert(Base64s.decode("YWJjZA").isDefined) // 6 chars unpadded = 4 bytes... no: 6 chars = 36 bits = 4 bytes + 4 dangling
    assert(Base64s.decode("a").isEmpty) // 1-char quantum
    assert(Base64s.decode("abcde").isEmpty) // 5 = 4 + 1-char quantum
    assert(Base64s.decode("ab=c").isEmpty) // data after padding
    assert(Base64s.decode("ab!c").isEmpty) // alphabet violation
    assert(Base64s.decode("").exists(_._1.isEmpty))
  }

  test("whitespace skipped anywhere (RFC 2045 wrapping)") {
    val b = "The quick brown fox".getBytes
    val wrapped = java.util.Base64.getEncoder.encodeToString(b)
      .grouped(5).mkString("\r\n") + "\n"
    assert(Base64s.decode(wrapped).exists(_._1.toSeq == b.toSeq))
    assert(Base64s.decode(" Y Q = = ").exists(r =>
      new String(r._1) == "a"))
  }

  test("data: URIs: mediatype default, base64 flag, percent text, " +
      "rejects") {
    val t = Base64s.parseDataUri("data:,A%20brief%20note").get
    assert(t.mediaType == "text/plain;charset=us-ascii")
    assert(!t.base64 && new String(t.bytes) == "A brief note")
    val p = Base64s.parseDataUri(
      "data:text/html;charset=utf-8,%3Cp%3Ehi").get
    assert(p.mediaType == "text/html;charset=utf-8")
    assert(new String(p.bytes) == "<p>hi")
    val b = Base64s.parseDataUri("data:image/gif;base64,R0lGODdh").get
    assert(b.base64 && b.mediaType == "image/gif")
    assert(b.bytes.toSeq ==
      java.util.Base64.getDecoder.decode("R0lGODdh").toSeq)
    // charset param without a type keeps the text/plain default type
    val c = Base64s.parseDataUri("data:;charset=utf-8,x").get
    assert(c.mediaType == "text/plain;charset=utf-8")
    assert(Base64s.parseDataUri("data:nocomma").isEmpty)
    assert(Base64s.parseDataUri("http://x/,y").isEmpty)
    assert(Base64s.parseDataUri("data:;base64,!!").isEmpty)
    // malformed percent escapes pass through literally, never throw
    val m = Base64s.parseDataUri("data:,a%GGb%").get
    assert(new String(m.bytes) == "a%GGb%")
  }

  test("cross-variant mixing rejects: the first variant-specific " +
      "char locks the alphabet (ADVICE r10)") {
    // mixed standard (+ or /) with URL-safe (- or _): valid under
    // neither RFC 4648 variant
    for (s <- Seq("a+b_", "a-b/", "ab/c-d", "a_b+"))
      assert(Base64s.decode(s).isEmpty, s)
    // single-variant strings with the same chars still decode
    for (s <- Seq("a+b/", "a-b_", "abcd"))
      assert(Base64s.decode(s).isDefined, s)
  }
}
