package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.text.Utf8

/** Referee for the UTF-8 maximal-subpart decoder (T107 / q198): the
  * JDK's CharsetDecoder implements the same Unicode substitution-of-
  * maximal-subparts policy, so repaired output must match BYTE-FOR-BYTE
  * on well-formed, hand-built-malformed and randomly mutated inputs —
  * any divergence in lead windows (overlong/surrogate/range rejection)
  * or subpart lengths shows up as a character diff.
  */
class Utf8Spec extends AnyFunSuite {

  private def javaRepair(p: Array[Byte]): String = {
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPLACE)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPLACE)
    dec.decode(java.nio.ByteBuffer.wrap(p)).toString
  }

  test("well-formed text round-trips with zero repairs across all " +
      "encoded lengths") {
    val s = "ascii éü € ࠀ 𐀀 􏿿 𝄞 end" // 1-4 bytes
    val p = s.getBytes("UTF-8")
    val st = Utf8.audit(p)
    assert(Utf8.repair(p) == s)
    assert(st.n_invalid_bytes == 0 && st.n_replacements == 0)
    assert(st.n_cp_valid == s.codePointCount(0, s.length))
    assert(st.n_bytes == p.length)
  }

  test("hand-built malformations: overlongs, surrogates, truncations, " +
      "range overflow — counts and repaired output match java.nio") {
    val cases: Seq[(String, Array[Byte], Long, Long)] = Seq(
      // (label, bytes, expected invalid bytes, expected replacements)
      ("lone continuation", Array(0x80), 1, 1),
      ("overlong 2-byte slash C0 AF", Array(0xc0, 0xaf), 2, 2),
      ("overlong 3-byte E0 80 AF", Array(0xe0, 0x80, 0xaf), 3, 3),
      // JDK convention: generically-valid continuations around a
      // surrogate VALUE consume as one malformed unit (not per-window
      // maximal subpart) — probed and matched in graft.text.Utf8
      ("CESU surrogate ED A0 80", Array(0xed, 0xa0, 0x80), 3, 1),
      ("truncated 3-byte E2 82", Array(0xe2, 0x82), 2, 1),
      ("truncated 4-byte F0 90 80", Array(0xf0, 0x90, 0x80), 3, 1),
      ("beyond U+10FFFF F4 90 80 80", Array(0xf4, 0x90, 0x80, 0x80), 4, 4),
      ("invalid lead F5", Array(0xf5, 0x41), 1, 1),
      ("mid-stream resync", Array(0x41, 0xe0, 0xa0, 0x42), 2, 1)
    ).map { case (l, a, ib, r) => (l, a.map(_.toByte), ib.toLong, r.toLong) }
    for ((label, p, ib, r) <- cases) {
      val st = Utf8.audit(p)
      assert(st.n_invalid_bytes == ib, s"$label invalid: $st")
      assert(st.n_replacements == r, s"$label repl: $st")
      assert(Utf8.repair(p) == javaRepair(p), label)
    }
  }

  test("randomized mutation referee: repaired output equals java.nio " +
      "on 2000 seeded random byte strings and mutated valid strings") {
    for (seed <- Seq(5, 77, 901)) {
      val rnd = new scala.util.Random(seed)
      for (_ <- 0 until 400) {
        // pure random bytes: mostly malformed
        val p = Array.fill[Byte](rnd.nextInt(40))(rnd.nextInt(256).toByte)
        assert(Utf8.repair(p) == javaRepair(p),
          s"seed=$seed bytes=${p.map(b => f"${b & 0xff}%02x").mkString(",")}")
        val st = Utf8.audit(p)
        assert(st.n_replacements <= st.n_invalid_bytes)
        assert(st.n_bytes == p.length)
      }
      for (_ <- 0 until 267) {
        // valid text with k random byte mutations: structured damage
        val s = (0 until rnd.nextInt(12))
          .map(_ => Seq("a", "é", "€", "𝄞", " ")(rnd.nextInt(5)))
          .mkString
        val p = s.getBytes("UTF-8")
        for (_ <- 0 to rnd.nextInt(3); if p.nonEmpty)
          p(rnd.nextInt(p.length)) = rnd.nextInt(256).toByte
        assert(Utf8.repair(p) == javaRepair(p),
          s"seed=$seed mutated=${p.map(b => f"${b & 0xff}%02x").mkString(",")}")
      }
    }
  }

  test("the q198 synthesis units audit to their closed forms") {
    // the five unit shapes the oracle's formula models, in cycle order
    val payload = Array(
      'a'.toInt, 0xc3, 0xa9, 0xe2, 0x82, 0xac, 0x80, 0xe0, 0xa0,
      'a'.toInt).map(_.toByte)
    val st = Utf8.audit(payload)
    assert(st == Utf8.Utf8Stats(10, 4, 3, 2, 2), st.toString)
    assert(Utf8.repair(payload) == "aé€��a")
  }
}
