package graft.text

/** Punycode (RFC 3492) — the ACE encoding behind every
  * internationalized hostname a crawl sees (`xn--bcher-kva` IS
  * `bücher`). The frontier needs the DECODE direction (T177, q267):
  * the UTS #39 homograph/confusable gate (T131) runs on code points,
  * so an ACE-encoded Cyrillic spoof (`xn--exmple-…`) sails through a
  * gate that only ever sees ASCII — the attack surface this module
  * closes. Both directions are implemented straight from the RFC 3492
  * §6.2/§6.3 pseudocode (pure integer arithmetic, no locale, no
  * library), refereed in PunycodeSpec against the JDK's own
  * `java.net.IDN` and a pinned known-answer vector.
  *
  * Strictness notes: decoding rejects (None, never throws) on any
  * out-of-alphabet digit, arithmetic overflow (the RFC's maxint
  * guards, here against Int.MaxValue), a decoded code point in the
  * basic range (the RFC forbids re-encoding ASCII), or a surrogate /
  * out-of-range code point. Case-insensitive digits are accepted on
  * decode (the RFC allows either); encoding emits lowercase — the
  * registry-canonical form.
  */
object Punycode {

  private val Base = 36
  private val TMin = 1
  private val TMax = 26
  private val Skew = 38
  private val Damp = 700
  private val InitialBias = 72
  private val InitialN = 128

  /** RFC 3492 §6.1 bias adaptation. */
  private def adapt(delta0: Int, numPoints: Int, firstTime: Boolean)
      : Int = {
    var delta = if (firstTime) delta0 / Damp else delta0 / 2
    delta += delta / numPoints
    var k = 0
    while (delta > ((Base - TMin) * TMax) / 2) {
      delta /= Base - TMin
      k += Base
    }
    k + ((Base - TMin + 1) * delta) / (delta + Skew)
  }

  private def digitValue(c: Char): Int = c match {
    case lc if lc >= 'a' && lc <= 'z' => lc - 'a'
    case uc if uc >= 'A' && uc <= 'Z' => uc - 'A'
    case d if d >= '0' && d <= '9'    => d - '0' + 26
    case _                            => -1
  }

  private def digitChar(d: Int): Char =
    if (d < 26) ('a' + d).toChar else ('0' + d - 26).toChar

  /** Decode one Punycode string (the part AFTER `xn--`) to its
    * Unicode text (§6.2). None on any malformation.
    */
  def decode(input: String): Option[String] = {
    val out = new java.lang.StringBuilder
    // basic portion = everything before the LAST delimiter, if any
    val d = input.lastIndexOf('-')
    var pos = 0
    if (d >= 0) {
      var j = 0
      while (j < d) {
        val c = input.charAt(j)
        if (c >= 0x80) return None // basic code points only
        out.append(c)
        j += 1
      }
      pos = d + 1
    }
    var n = InitialN
    var i = 0
    var bias = InitialBias
    while (pos < input.length) {
      val oldi = i
      var w = 1
      var k = Base
      var done = false
      while (!done) {
        if (pos >= input.length) return None // truncated variable-int
        val digit = digitValue(input.charAt(pos))
        pos += 1
        if (digit < 0) return None
        if (digit > (Int.MaxValue - i) / w) return None // overflow
        i += digit * w
        val t = if (k <= bias) TMin
          else if (k >= bias + TMax) TMax
          else k - bias
        if (digit < t) done = true
        else {
          if (w > Int.MaxValue / (Base - t)) return None // overflow
          w *= Base - t
          k += Base
        }
      }
      val outLen = out.codePointCount(0, out.length) + 1
      bias = adapt(i - oldi, outLen, oldi == 0)
      if (i / outLen > Int.MaxValue - n) return None // overflow
      n += i / outLen
      i %= outLen
      if (n < 0x80) return None // the RFC forbids ACE-encoded ASCII
      if (n > 0x10ffff || (n >= 0xd800 && n <= 0xdfff)) return None
      // insert code point n at code-point position i
      val insertAt = out.offsetByCodePoints(0, i)
      out.insert(insertAt, Character.toChars(n))
      i += 1
    }
    Some(out.toString)
  }

  /** Encode Unicode text to its Punycode form (§6.3), lowercase
    * digits. None on overflow or an unpaired surrogate.
    */
  def encode(input: String): Option[String] = {
    val cps = {
      val b = Seq.newBuilder[Int]
      var j = 0
      while (j < input.length) {
        val cp = input.codePointAt(j)
        if (cp >= 0xd800 && cp <= 0xdfff) return None // unpaired
        b += cp
        j += Character.charCount(cp)
      }
      b.result()
    }
    val out = new StringBuilder
    val basic = cps.filter(_ < 0x80)
    basic.foreach(cp => out += cp.toChar)
    val b = basic.length
    var h = b
    if (b > 0) out += '-' // §6.3: delimiter whenever basics exist
                          // (pure-ASCII "abc" encodes "abc-", the
                          // round-trip-exact RFC form)
    var n = InitialN
    var delta = 0
    var bias = InitialBias
    while (h < cps.length) {
      val m = cps.filter(_ >= n).min
      if ((m - n).toLong * (h + 1) > Int.MaxValue - delta) return None
      delta += (m - n) * (h + 1)
      n = m
      for (cp <- cps) {
        if (cp < n) {
          delta += 1
          if (delta == Int.MaxValue) return None
        }
        if (cp == n) {
          var q = delta
          var k = Base
          var done = false
          while (!done) {
            val t = if (k <= bias) TMin
              else if (k >= bias + TMax) TMax
              else k - bias
            if (q < t) done = true
            else {
              out += digitChar(t + (q - t) % (Base - t))
              q = (q - t) / (Base - t)
              k += Base
            }
          }
          out += digitChar(q)
          bias = adapt(delta, h + 1, h == b)
          delta = 0
          h += 1
        }
      }
      delta += 1
      n += 1
    }
    Some(out.toString)
  }

  /** Decode one hostname LABEL: an `xn--` (case-insensitive) ACE
    * label decodes; anything else passes through unchanged. Returns
    * (decoded label, wasAce, valid) — an invalid ACE label keeps its
    * ASCII form with valid=false (flagged, never thrown: the
    * frontier must still be able to key on the host it saw).
    */
  def decodeLabel(label: String): (String, Boolean, Boolean) =
    if (label.length >= 4 &&
        label.substring(0, 4).equalsIgnoreCase("xn--"))
      decode(label.substring(4)) match {
        // A bare "xn--" decodes to the EMPTY string, but an empty
        // label is forbidden for A-labels (RFC 5890 §2.3.2.1;
        // ADVICE-r13) — accepting it would collapse 'a.xn--.b' to
        // 'a..b' and collide with a genuinely different host key.
        // Keep the wire form, flagged invalid, like any bad ACE.
        case Some(u) if u.nonEmpty => (u, true, true)
        case _                     => (label, true, false)
      }
    else (label, false, true)

  /** Decode every ACE label of a hostname: (decoded host, number of
    * ACE labels seen, number of INVALID ACE labels kept verbatim).
    */
  def decodeHost(host: String): (String, Int, Int) = {
    val parts = host.split('.').map(decodeLabel)
    (parts.map(_._1).mkString("."),
      parts.count(_._2), parts.count(p => p._2 && !p._3))
  }
}
