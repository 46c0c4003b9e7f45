package graft.similarity

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector similarity primitives: exact cosine (sequential-fold
  * dot products, so the oracle reproduces the same IEEE doubles) and a
  * deterministic random-hyperplane LSH for approximate nearest-neighbor
  * search.
  *
  * Scale design: brute-force top-k is a cross join — O(Q·N·dim), fine
  * when Q is small or N fits a broadcast, wrong at corpus scale. The LSH
  * path buckets vectors by hyperplane sign pattern (a narrow map), then
  * joins query↔candidate only within buckets — the shuffle carries
  * (bucket, id, vector) once instead of N×Q pairs. Recall/latency trades
  * via number of planes (fewer planes → bigger buckets → higher recall).
  *
  * The "random" hyperplanes are derived from a public LCG formula
  * (plane p, dim d → coefficient in [-0.5, 0.5)) so any engine can
  * re-derive them — no stored model state.
  */
object Vectors {

  /** Sequential-fold dot product (matches DuckDB list_reduce order). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine with precomputed norms (pass norm columns to avoid
    * recomputing the fold per pair).
    */
  def cosinePre(dotAb: Column, normA: Column, normB: Column): Column =
    dotAb / (normA * normB)

  def cosine(a: Column, b: Column): Column = cosinePre(dot(a, b), norm(a), norm(b))

  /** Sequential-fold squared L2 distance (IVF cell assignment metric). */
  def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)

  /** Quantize a double vector onto the 1e-6 integer lattice as
    * `array<long>`, half-away-from-zero — the ONE double→integer step
    * for the exact Gram/power-iteration family (q142/q151). Built from
    * floor/ceil on the binary double value only (both exact IEEE
    * operations, bit-identical in Spark and DuckDB at every boundary),
    * deliberately NOT `round()`: Spark's round() routes through the
    * double's shortest *decimal* representation (BigDecimal.valueOf)
    * while DuckDB rounds the *binary* value, and those disagree exactly
    * at representation boundaries — the root cause of the round-6
    * cross-engine hash flakes.
    */
  def latticize(a: Column, scale: Double = 1e6): Column =
    transform(a, x =>
      when(x >= 0, floor(x * scale + 0.5))
        .otherwise(ceil(x * scale - 0.5))
        .cast("long"))

  /** The DuckDB-side twin of [[latticize]] (same floor/ceil semantics). */
  def latticizeSql(arrayExpr: String, scale: String = "1000000.0"): String =
    s"list_transform($arrayExpr, x -> CAST(CASE WHEN x >= 0 " +
      s"THEN floor(x * $scale + 0.5) " +
      s"ELSE ceil(x * $scale - 0.5) END AS BIGINT))"

  /** Scalar [[latticize]]: one double onto an integer lattice,
    * half-away-from-zero via floor/ceil on the binary value (exact IEEE
    * ops — the cross-engine-safe replacement for `round(x*scale)`).
    */
  def latScalar(x: Column, scale: Double): Column =
    when(x >= 0, floor(x * scale + 0.5))
      .otherwise(ceil(x * scale - 0.5))
      .cast("long")

  /** DuckDB twin of [[latScalar]] ($x spliced twice — keep it simple). */
  def latScalarSql(x: String, scale: String): String =
    s"CAST(CASE WHEN ($x) >= 0 THEN floor(($x) * $scale + 0.5) " +
      s"ELSE ceil(($x) * $scale - 0.5) END AS BIGINT)"

  /** LCG-derived hyperplane coefficient for (plane p, dimension d). */
  def planeCoef(p: Column, d: Column): Column =
    (((p * 64 + d) * 1103515245L + 12345L) % 2147483648L).cast("double") /
      2147483648.0 - 0.5

  /** Dot of a vector with deterministic hyperplane p (0-based getItem). */
  def planeDot(emb: Column, p: Column): Column =
    aggregate(sequence(lit(0L), lit(63L)), lit(0.0),
      (acc, d) => acc + emb.getItem(d.cast("int")) * planeCoef(p, d))

  /** Sign-pattern LSH bucket id over nPlanes hyperplanes. */
  def lshBucket(emb: Column, nPlanes: Int): Column =
    aggregate(sequence(lit(0L), lit(nPlanes - 1L)), lit(0L),
      (acc, p) => acc + when(planeDot(emb, p) > 0,
        call_function("shiftleft", lit(1L), p)).otherwise(lit(0L)))
}
