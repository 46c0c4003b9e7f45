package graft.text

import graft.SparkSpec
import graft.queries.{Audit, Audit2, Audit3}

/** Referees for the round-7 audit waves: invariants the oracle
  * hash-compare can't express — curve monotonicity, estimator-formula
  * recomputation, conservation laws, and the meter-vs-ground-truth
  * containment relations.
  */
class AuditSpec extends SparkSpec {
  import spark.implicits._

  private def q(qs: Seq[graft.queries.Q], name: String) =
    qs.find(_.name == name).get.run(spark, sfDir)

  test("q172: the band-sweep curve is monotone non-decreasing and ends " +
      "at the full q34 candidate count") {
    val curve = q(Audit2.qs, "q172_band_sweep")
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(curve.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
    curve.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 <= b._2, s"curve not monotone: $a -> $b")
    }
    val full = graft.dedup.Dedup.lshCandidatePairs(
      spark.read.parquet(s"$sfDir/documents.parquet"),
      "doc_id", "text").count()
    assert(curve.last._2 == full,
      s"4-band point ${curve.last._2} != q34 candidate count $full")
  }

  test("q173: KMV estimate recomputes from (k, h_k) and the exact " +
      "count uses the same hash universe") {
    val row = q(Audit2.qs, "q173_kmv_cardinality")
      .as[(Long, Long, Long, Long, Long)].collect().head
    val (nExact, k, hk, nEst, errPpm) = row
    assert(k == 256L)
    assert(nEst == 255L * 4294967296L / hk)
    assert(errPpm == math.abs(nEst - nExact) * 1000000L / nExact)
    // KMV with k=256 has ~1/sqrt(254) ≈ 6.3% std error; 5σ bound
    assert(errPpm < 320000L, s"KMV error implausibly large: $errPpm ppm")
  }

  test("q170: the quality meter's counts obey containment " +
      "(hits ≤ candidates, hits ≤ truth)") {
    val (nc, nt, nh, p, r) = q(Audit.qs, "q170_lsh_quality_audit")
      .as[(Long, Long, Long, Double, Double)].collect().head
    assert(nh <= nc && nh <= nt)
    assert(p == nh.toDouble / nc && r == nh.toDouble / nt)
    // the 4×2 banding is recall-biased at J ≥ 0.5 on this corpus shape
    assert(r > 0.5, s"recall $r implausibly low for 4x2 banding")
  }

  test("q178: padded mass dominates token mass, is a multiple of " +
      "max_len, and token mass is conserved across the grid") {
    val rows = q(Audit3.qs, "q178_padding_waste")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    val tokens = rows.map(_._2).distinct
    assert(tokens.size == 1, "token mass must not depend on max_len")
    rows.foreach { case (l, nt, np, waste) =>
      assert(np >= nt && np % l == 0,
        s"padded mass $np not a multiple of $l at or above $nt")
      assert(waste == (np - nt) * 1000000L / np)
    }
  }

  test("q171: epoch diff conserves digest counts per source") {
    val rows = q(Audit.qs, "q171_epoch_diff")
      .as[(String, Long, Long, Long)].collect()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    import org.apache.spark.sql.functions._
    val a = docs.filter(col("doc_id") % 2 === 0)
      .select(col("source"), md5(col("text"))).distinct()
      .groupBy("source").count().as[(String, Long)].collect().toMap
    val b = docs.filter(col("doc_id") % 2 === 1)
      .select(col("source"), md5(col("text"))).distinct()
      .groupBy("source").count().as[(String, Long)].collect().toMap
    rows.foreach { case (src, added, removed, kept) =>
      assert(removed + kept == a.getOrElse(src, 0L),
        s"$src: A-side digests not conserved")
      assert(added + kept == b.getOrElse(src, 0L),
        s"$src: B-side digests not conserved")
    }
  }
}
