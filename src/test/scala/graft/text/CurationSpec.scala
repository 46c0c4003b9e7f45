package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Curation

/** Referees for the round-6 curation operators (q149–q153): exact
  * driver-side recomputations and planted-frame invariants that the
  * oracle hash-compare can't express (recall of the distributed
  * formulation vs a sequential brute force, precedence semantics,
  * curve monotonicity).
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) =
    Curation.qs.find(_.name == name).get.run(spark, sfDir)

  private def hash32(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 8)
    java.lang.Long.parseLong(hex, 16)
  }

  private lazy val docs: Seq[(Long, String, String, String)] =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "lang", "source")
      .as[(Long, String, String, String)].collect().toSeq

  test("q150 substring dedup: exact sequential brute force agrees") {
    val wins = docs.flatMap { case (id, text, _, _) =>
      val ws = text.split("\\s+")
      ws.sliding(8).filter(_.length == 8).map(w => (id, hash32(w.mkString(" "))))
    }
    val dupHashes = wins.groupBy(_._2)
      .filter(_._2.map(_._1).distinct.size > 1).keySet
    val nDup = wins.filter(w => dupHashes(w._2))
      .groupBy(_._1).map { case (id, xs) => id -> xs.size.toLong }
    val nWin = docs.map { case (id, text, _, _) =>
      id -> (text.split("\\s+").length - 7).toLong
    }.toMap
    val expect = nDup.toSeq.map { case (id, nd) => (id, nWin(id), nd) }
      .sortBy { case (id, _, nd) => (-nd, id) }.take(100)
    val got = q("q150_substring_dedup")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == expect)
  }

  test("q149 DSIR: exact recomputation on the hashed-bucket LMs") {
    val B = 1024
    val tok = docs.flatMap { case (id, text, lang, _) =>
      text.split("\\s+").map(w => (id, lang, hash32("b:" + w) % B))
    }
    val ct = tok.filter(_._2 == "en").groupBy(_._3).map { case (b, xs) => b -> xs.size.toLong }
    val cr = tok.groupBy(_._3).map { case (b, xs) => b -> xs.size.toLong }
    val nt = tok.count(_._2 == "en").toLong
    val nr = tok.size.toLong
    val lr: Map[Long, BigDecimal] = cr.map { case (b, c) =>
      val x = (ct.getOrElse(b, 0L) + 1).toDouble * (nr + B).toDouble /
        ((c + 1).toDouble * (nt + B).toDouble)
      b -> BigDecimal(math.log(x)).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    }
    val expect = tok.groupBy(_._1).map { case (id, xs) =>
      val s = xs.map(x => lr(x._3)).sum
      (id, xs.size.toLong, s.toDouble / xs.size)
    }.toSeq.sortBy { case (id, _, w) => (-w, id) }.take(50)
    val got = q("q149_dsir_weights").as[(Long, Long, Double)].collect().toSeq
    assert(got.map(x => (x._1, x._2)) == expect.map(x => (x._1, x._2)))
    got.zip(expect).foreach { case (g, e) =>
      assert(math.abs(g._3 - e._3) < 1e-12, s"weight mismatch at ${g._1}")
    }
  }

  test("q151 principal projection: exact integer-lattice referee") {
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>"))
      .as[(Long, Int, Seq[Double])].collect().toSeq
    val dims = 64
    // Gram on the 1e-12 lattice, then rescale to 1e-6 exactly as the query
    val g = Array.ofDim[Long](dims, dims)
    for ((_, _, e) <- vecs; i <- 0 until dims; j <- i until dims)
      g(i)(j) += math.round(e(i) * e(j) * 1e12)
    val g2 = Array.tabulate(dims, dims) { (i, j) =>
      val v = if (j >= i) g(i)(j) else g(j)(i)
      math.round(v.toDouble / 1e6)
    }
    val v1 = g2.map(_.sum)
    val v2 = Array.tabulate(dims)(i =>
      (0 until dims).map(j => BigInt(g2(i)(j)) * v1(j)).sum)
    val expect = vecs.map { case (id, label, e) =>
      val p = (0 until dims).map(d => BigInt(math.round(e(d) * 1e6)) * v2(d)).sum
      (id, label, p)
    }.sortBy { case (id, _, p) => (-p.abs, id) }.take(20)
    val got = q("q151_principal_projection")
      .select(col("vec_id"), col("label"), col("proj").cast("string"))
      .as[(Long, Int, String)].collect().toSeq
    assert(got.map(_._1) == expect.map(_._1))
    got.zip(expect).foreach { case (gt, e) =>
      assert(BigInt(gt._3) == e._3, s"projection mismatch at vec ${gt._1}")
    }
  }

  test("q152 precedence dedup: earliest snapshot wins, survivors attributed") {
    val dir = java.nio.file.Files.createTempDirectory("graft-prec").toString
    val planted = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta tail-one", "src2"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta tail-two", "src0"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta tail-three", "src1"),
      (4L, "alpha beta gamma delta epsilon zeta eta theta tail-four", "src1"),
      (5L, "wholly unique words that never collide with anything else at all", "src3")
    ).toDF("doc_id", "text", "source")
    planted.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Curation.qs.find(_.name == "q152_precedence_dedup").get
      .run(spark, dir).as[(String, String, Long)].collect().toSeq
    // digest group = docs 1-4 (shared 8-token prefix); src0 (prio 0) keeps;
    // drops: one src2 copy, two src1 copies. doc 5 is singleton → absent.
    assert(got == Seq(("src0", "src1", 2L), ("src0", "src2", 1L)))
  }

  test("q153 ROC sweep: curve is cumulative, monotone, and totals out") {
    val rows = q("q153_roc_sweep")
      .as[(Long, Long, Long, Double)].collect().toSeq
    val nPos = docs.count(_._3 == "en").toLong
    val nNeg = docs.size - nPos
    // scores strictly descending; cum counts nondecreasing; last row = totals
    assert(rows.map(_._1) == rows.map(_._1).sorted(Ordering[Long].reverse))
    assert(rows.map(_._2) == rows.map(_._2).sorted)
    assert(rows.map(_._3) == rows.map(_._3).sorted)
    assert(rows.last._2 == nPos && rows.last._3 == nNeg)
    rows.foreach { r =>
      assert(r._4 == r._2.toDouble / (r._2 + r._3))
    }
  }
}
