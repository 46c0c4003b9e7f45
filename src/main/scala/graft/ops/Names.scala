package graft.ops

/** Column-name normalization (SURVEY §2.3 R2/R3).
  *
  * Replicates the reference's camelCase→snake_case algorithm exactly
  * (reference: qb_bills.py:92, qb_billpayments.py:100-103): prepend `_`
  * before every uppercase char, lowercase, strip leading `_`, then map
  * `.` → `_` and collapse `__` → `_` (single left-to-right pass, matching
  * Python's `str.replace`).
  *
  * The quirk is intentional: `CCAccountRef` → `c_c_account_ref`, which the
  * reference then patches by hand (qb_billpayments.py:106-107); per-entity
  * patch maps live in the EntitySpec rename tables.
  */
object Names {

  /** The bare char-wise algorithm (no dot handling) — qb_bills.py:92. */
  def snakeCaseBare(name: String): String = {
    val sb = new StringBuilder(name.length + 8)
    name.foreach { c =>
      if (c.isUpper) { sb += '_'; sb += c.toLower } else sb += c
    }
    sb.toString.dropWhile(_ == '_')
  }

  /** Full algorithm incl. the `.`→`_` and `__`→`_` passes
    * (qb_billpayments.py:102-103). Most scripts apply all three steps;
    * qb_bills.py omits the dot pass (a latent defect — dotted names then
    * silently skip the astype loop at qb_bills.py:116-118). We implement
    * the declared semantics: dots always become underscores.
    */
  def snakeCase(name: String): String =
    replaceOnce(snakeCaseBare(name).replace('.', '_'), "__", "_")

  /** Python-`str.replace` semantics: one left-to-right non-overlapping pass. */
  private def replaceOnce(s: String, from: String, to: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      if (s.regionMatches(i, from, 0, from.length)) { sb ++= to; i += from.length }
      else { sb += s.charAt(i); i += 1 }
    }
    sb.toString
  }
}
