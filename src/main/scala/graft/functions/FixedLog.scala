package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Engine-exact fixed-point logarithm: `lnLat12(num, den)` = ln(num/den)
  * on the 1e-12 integer lattice, computed by a deterministic
  * integer-only digit-extraction algorithm — the structural cure for
  * the last class of cross-engine hash flakes (a `ln()` emitted through
  * a decimal cast is boundary-sensitive: Java's fdlibm-derived
  * Math.log and DuckDB's libm ln may differ by 1 ulp, which flips the
  * rounded decimal whenever the true value sits within an ulp of a
  * lattice boundary; at scale 12 that is a ~1e-4 per-value event —
  * guaranteed to bite eventually across testdata regenerations).
  *
  * Here the VALUE ITSELF is defined as a pure function of the two
  * integers, so both engines compute the identical lattice point at
  * every input:
  *
  *  1. orient: if num < den swap and negate at the end (ln(1/x)=-ln x);
  *  2. exponent: a 6-step shift ladder (2^32..2^1) finds e with
  *     d = den·2^e ≤ num < 2·d — pure integer compares
  *     (num DIV 2^k ≥ d ⟺ num ≥ d·2^k for integers);
  *  3. mantissa: q0 = (num·10^18) DIV d ∈ [10^18, 2·10^18) — one exact
  *     floor division on the 38-digit decimal lattice;
  *  4. fraction: 40 binary log digits by mantissa squaring
  *     (t = m² DIV 10^18; bit = t ≥ 2·10^18; m' = bit ? t DIV 2 : t) —
  *     every step exact integer arithmetic, m² ≤ 4·10^36 < 10^38;
  *  5. combine: ln = (e·2^40 + frac)·ln2 / 2^40, realized as one
  *     integer multiply by LN2 on the 1e-18 lattice and one half-away
  *     division.
  *
  * Accuracy: the 2^-40 fraction truncation dominates → |error| ≲
  * 1.5e-12, i.e. the lattice value is ln to ~12 significant decimals;
  * the point is not precision but DETERMINISM — both engines land on
  * the same integer at EVERY input, boundaries included.
  *
  * Cost shape: the folds are higher-order-function loops (6 + 40
  * steps), intended for MODEL-SIZED frames — score tables, vocabularies,
  * df/idf maps (≤ thousands of rows) — after which the lattice values
  * broadcast-join back to the corpus; never evaluate per corpus row
  * when a distinct-value frame exists.
  */
object FixedLog {

  /** 10^18 — the mantissa lattice. */
  val One18 = 1000000000000000000L
  private val Two18 = 2000000000000000000L
  /** ln(2) on the 1e-18 lattice (0.693147180559945309417…). */
  val Ln2Lat18 = 693147180559945309L
  private val Pow40 = 1099511627776L            // 2^40
  private val Den = 1099511627776000000L        // 2^40 · 10^6
  private val Half = 549755813888000000L        // Den / 2

  private val Dec38 = DecimalType(38, 0)
  private val LadderSteps: Seq[(Long, Long)] =
    Seq((4294967296L, 32L), (65536L, 16L), (256L, 8L),
      (16L, 4L), (4L, 2L), (2L, 1L))

  /** ln(num/den)·1e12, rounded half-away-from-zero, as LongType.
    * `num` and `den` must be positive integers (longs).
    */
  def lnLat12(numIn: Column, denIn: Column): Column = {
    val num = numIn.cast("long")
    val den = denIn.cast("long")
    val swap = num < den
    val a = when(swap, den).otherwise(num)
    val b = when(swap, num).otherwise(den)

    val ladder = array(LadderSteps.map { case (pk, k) =>
      struct(lit(pk).as("pk"), lit(k).as("k"))
    }: _*)
    val normed = aggregate(ladder, struct(b.as("d"), lit(0L).as("e")),
      (acc, it) => {
        val d = acc.getField("d")
        val e = acc.getField("e")
        val pk = it.getField("pk")
        // num ≥ d·2^k without overflow: num DIV 2^k ≥ d
        val fits = call_function("div", a, pk) >= d
        struct(when(fits, d * pk).otherwise(d).as("d"),
          when(fits, e + it.getField("k")).otherwise(e).as("e"))
      })
    val q0 = call_function("div",
      a.cast(Dec38) * lit(One18).cast(Dec38), normed.getField("d"))

    val fr = aggregate(sequence(lit(1), lit(40)),
      struct(q0.as("m"), lit(0L).as("f")),
      (acc, _) => {
        val m = acc.getField("m")
        val f = acc.getField("f")
        val t = call_function("div",
          m.cast(Dec38) * m.cast(Dec38), lit(One18))
        val hi = t >= lit(Two18)
        struct(when(hi, call_function("div", t, lit(2L))).otherwise(t).as("m"),
          when(hi, f * 2 + 1).otherwise(f * 2).as("f"))
      })

    val t40 = normed.getField("e") * lit(Pow40) + fr.getField("f")
    // t40 ≥ 0 here, so +Half then floor-div is exact half-away rounding
    val lpos = call_function("div",
      t40.cast(Dec38) * lit(Ln2Lat18).cast(Dec38) + lit(Half).cast(Dec38),
      lit(Den))
    when(swap, -lpos).otherwise(lpos).cast("long")
  }

  /** The DuckDB twin of [[lnLat12]] — the identical algorithm in
    * HUGEINT arithmetic, as one SQL expression over `$num` / `$den`
    * expression strings (keep them simple column refs; they are
    * spliced multiple times).
    */
  def lnLat12Sql(num: String, den: String): String = {
    // fold states are HUGEINT 2-lists ([pk,k] / [m,f]), NOT structs:
    // DuckDB 1.0.0's list_reduce mis-executes struct accumulators when
    // rows in a vectorized batch take different CASE branches (verified:
    // single-row correct, multi-row garbage); list accumulators are fine
    val ladderItems = LadderSteps.map { case (pk, k) =>
      s"[CAST($pk AS HUGEINT), CAST($k AS HUGEINT)]"
    }.mkString("[", ", ", "]")
    def ga = s"CAST(greatest($num, $den) AS HUGEINT)"
    def lb = s"CAST(least($num, $den) AS HUGEINT)"
    // the 6-step exponent ladder; re-evaluated inline where needed
    // (deterministic, bounded cost — intended for model-sized frames)
    val norm =
      s"""list_reduce(list_prepend(
         |  [$lb, CAST(0 AS HUGEINT)], $ladderItems),
         |  (acc, it) -> CASE WHEN ($ga // it[1]) >= acc[1]
         |    THEN [acc[1] * it[1], acc[2] + it[2]]
         |    ELSE [acc[1], acc[2]] END)""".stripMargin
    val q0 = s"(($ga * CAST($One18 AS HUGEINT)) // ($norm)[1])"
    val fracItems =
      "list_transform(range(1, 41), i -> " +
        "[CAST(0 AS HUGEINT), CAST(0 AS HUGEINT)])"
    val frac =
      s"""list_reduce(list_prepend(
         |  [$q0, CAST(0 AS HUGEINT)], $fracItems),
         |  (acc, it) -> CASE
         |    WHEN ((acc[1] * acc[1]) // $One18) >= $Two18
         |    THEN [((acc[1] * acc[1]) // $One18) // 2, acc[2] * 2 + 1]
         |    ELSE [(acc[1] * acc[1]) // $One18, acc[2] * 2] END)""".stripMargin
    s"""(CAST((CASE WHEN ($num) < ($den) THEN -1 ELSE 1 END) *
       |  ((CAST(($norm)[2] * $Pow40 + ($frac)[2] AS HUGEINT)
       |    * $Ln2Lat18 + $Half) // $Den) AS BIGINT))""".stripMargin
  }
}
