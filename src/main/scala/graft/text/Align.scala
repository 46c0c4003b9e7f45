package graft.text

/** Length-based sentence alignment (T178, q268) — the Gale–Church
  * dynamic program (Gale & Church 1993, "A Program for Aligning
  * Sentences in Bilingual Corpora"), the classic algorithm that turns
  * document-aligned bitext (the T170 hreflang clusters) into the
  * SENTENCE pairs translation models actually train on. Their insight
  * survives intact: translated sentences have strongly correlated
  * lengths, so a DP over the six alignment operations (1-1
  * substitution, 1-0/0-1 deletion/insertion, 2-1/1-2 contraction/
  * expansion, 2-2 merger) recovers the alignment from lengths alone —
  * no dictionary, no embeddings.
  *
  * Deviation, documented: the original scores operations with a
  * Gaussian log-likelihood of the length ratio plus empirical op
  * priors — transcendental floating math this engine's determinism
  * gate forbids in any oracle-checked path. This re-expression keeps
  * the DP exact-integer: an operation costs the absolute difference
  * of its source/target length sums plus a fixed op penalty
  * (1-1: 0, 2-1/1-2: 10, 2-2: 14, 1-0/0-1: flat 15 with NO length
  * term — a length term on deletions would make every long unmatched
  * sentence absorb into its neighbor as a spurious expansion). The
  * penalty ordering mirrors the paper's op priors (substitution ≫
  * contraction/expansion > merger > deletion/insertion).
  *
  * Ties break deterministically by fixed move order, so the op
  * sequence is reproducible to the byte on any JVM/executor.
  */
object Align {

  /** (dSrc, dTgt, kind, penalty) in tie-break order. */
  private val Moves = Seq(
    (1, 1, "11", 0L),
    (2, 1, "21", 10L),
    (1, 2, "12", 10L),
    (2, 2, "22", 14L),
    (1, 0, "10", 15L),
    (0, 1, "01", 15L))

  /** Align two sentence-length sequences; returns the op-kind
    * sequence (source order) and the total integer cost.
    */
  def align(src: Seq[Long], tgt: Seq[Long]): (Seq[String], Long) = {
    val n = src.length
    val m = tgt.length
    val inf = Long.MaxValue / 4
    val dp = Array.fill(n + 1, m + 1)(inf)
    val bk = Array.fill[Int](n + 1, m + 1)(-1)
    val ps = src.scanLeft(0L)(_ + _).toArray
    val pt = tgt.scanLeft(0L)(_ + _).toArray
    dp(0)(0) = 0L
    var i = 0
    while (i <= n) {
      var j = 0
      while (j <= m) {
        if (!(i == 0 && j == 0)) {
          var mi = 0
          while (mi < Moves.length) {
            val (di, dj, _, pen) = Moves(mi)
            if (i >= di && j >= dj && dp(i - di)(j - dj) < inf) {
              // length term only when BOTH sides contribute text
              val lenTerm =
                if (di > 0 && dj > 0)
                  math.abs((ps(i) - ps(i - di)) - (pt(j) - pt(j - dj)))
                else 0L
              val c = dp(i - di)(j - dj) + pen + lenTerm
              if (c < dp(i)(j)) { dp(i)(j) = c; bk(i)(j) = mi }
            }
            mi += 1
          }
        }
        j += 1
      }
      i += 1
    }
    // backtrack from (n, m)
    val ops = scala.collection.mutable.ArrayBuffer.empty[String]
    var ci = n
    var cj = m
    while (ci > 0 || cj > 0) {
      val mi = bk(ci)(cj)
      require(mi >= 0, s"unreachable DP cell ($ci,$cj)")
      val (di, dj, kind, _) = Moves(mi)
      ops += kind
      ci -= di
      cj -= dj
    }
    (ops.reverse.toSeq, dp(n)(m))
  }

  /** Op-kind histogram of an alignment: counts for
    * 11/21/12/22/10/01 in that fixed order.
    */
  def opCounts(ops: Seq[String]): Map[String, Long] =
    Moves.map(_._3).map(k =>
      k -> ops.count(_ == k).toLong).toMap
}
