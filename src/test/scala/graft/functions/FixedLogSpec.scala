package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The fixed-point ln: a defined integer algorithm, so the spec checks
  * (a) closeness to the true ln (the 2^-40 truncation bound) and
  * (b) the exact lattice values at pinned inputs — these exact values
  * are the cross-engine contract (the DuckDB twin must produce the
  * identical integers; the oracle gate on q100/q112/q149 enforces it).
  */
class FixedLogSpec extends SparkSpec {
  import spark.implicits._

  test("lnLat12 within 3e-12 of true ln across magnitudes") {
    val cases = Seq(
      (1L, 1L), (2L, 1L), (3L, 1L), (1L, 2L), (1L, 3L),
      (7L, 5L), (5L, 7L), (1000003L, 999983L),
      (123456789L, 3L), (3L, 123456789L),
      (981273647L, 1L), (1L, 981273647L),
      (6700417L, 2147483647L), (9007199254740993L, 4503599627370497L))
    val got = cases.toDF("n", "d")
      .select(col("n"), col("d"),
        FixedLog.lnLat12(col("n"), col("d")).as("l"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (n, d, l) =>
      val truth = math.log(n.toDouble / d.toDouble)
      assert(math.abs(l / 1e12 - truth) < 3e-12,
        s"lnLat12($n,$d)=$l vs ln=$truth")
    }
  }

  test("lnLat12 exact pinned lattice values (the cross-engine contract)") {
    // expected integers independently computed by the DuckDB twin
    // (FixedLog.lnLat12Sql) — exact equality here IS the cross-engine
    // determinism guarantee the q100/q112/q149 oracles rely on
    val pinned = Seq(
      (1L, 1L) -> 0L,
      (2L, 1L) -> 693147180560L,
      (1L, 2L) -> -693147180560L,
      (1024L, 1L) -> 6931471805599L,
      (10L, 1L) -> 2302585092994L,
      (3L, 1L) -> 1098612288668L,
      (7L, 5L) -> 336472236621L,
      (5L, 7L) -> -336472236621L,
      (1000003L, 999983L) -> 20000140L,
      (123456789L, 3L) -> 17532789477500L,
      (3L, 123456789L) -> -17532789477500L,
      (981273647L, 1L) -> 20704361925623L,
      (1L, 981273647L) -> -20704361925623L,
      (6700417L, 2147483647L) -> -5769882275662L,
      (9007199254740993L, 4503599627370497L) -> 693147180559L)
    val got = pinned.map(_._1).toDF("n", "d")
      .select(FixedLog.lnLat12(col("n"), col("d")).as("l"))
      .as[Long].collect().toSeq
    got.zip(pinned).foreach { case (g, ((n, d), e)) =>
      assert(g == e, s"lnLat12($n,$d): spark=$g duckdb-twin=$e")
    }
  }

  test("lnLat12 antisymmetric by construction") {
    val df = Seq((17L, 5L), (999999937L, 11L), (123L, 456L))
      .toDF("n", "d")
      .select(FixedLog.lnLat12(col("n"), col("d")).as("a"),
        (-FixedLog.lnLat12(col("d"), col("n"))).as("b"))
      .as[(Long, Long)].collect()
    df.foreach { case (a, b) => assert(a == b) }
  }
}
