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
    def fp(s: String): Long =
      s.foldLeft(0L)((h, c) => (h * 31 + c.toInt) % 1000000007L)
    val tok = docs.flatMap { case (id, text, lang, _) =>
      text.split("\\s+").map(w => (id, lang, fp(w) % B))
    }
    val ct = tok.filter(_._2 == "en").groupBy(_._3).map { case (b, xs) => b -> xs.size.toLong }
    val cr = tok.groupBy(_._3).map { case (b, xs) => b -> xs.size.toLong }
    val nt = tok.count(_._2 == "en").toLong
    val nr = tok.size.toLong
    // independent BigInt port of the FixedLog.lnLat12 digit algorithm
    // (round-7 semantics: the lattice value is DEFINED, not approximated)
    def lnLatRef(num: Long, den: Long): Long = {
      if (num == den) return 0L
      val (a, b, sgn) = if (num >= den) (num, den, 1L) else (den, num, -1L)
      var d = BigInt(b); var e = 0L
      for (k <- Seq(32, 16, 8, 4, 2, 1))
        if (BigInt(a) / BigInt(2).pow(k) >= d) { d *= BigInt(2).pow(k); e += k }
      var m = BigInt(a) * BigInt("1000000000000000000") / d
      var f = 0L
      val one = BigInt("1000000000000000000")
      for (_ <- 1 to 40) {
        val t = m * m / one
        if (t >= one * 2) { m = t / 2; f = f * 2 + 1 } else { m = t; f = f * 2 }
      }
      val t40 = BigInt(e) * BigInt(2).pow(40) + f
      sgn * ((t40 * BigInt("693147180559945309") +
        BigInt("549755813888000000")) /
        BigInt("1099511627776000000")).toLong
    }
    val lr: Map[Long, Long] = cr.map { case (b, c) =>
      b -> lnLatRef((ct.getOrElse(b, 0L) + 1) * (nr + B),
        (c + 1) * (nt + B))
    }
    val expect = tok.groupBy(_._1).map { case (id, xs) =>
      val s = xs.map(x => BigInt(lr(x._3))).sum
      (id, xs.size.toLong,
        s.toDouble / (xs.size.toLong * 1000000000000L).toDouble)
    }.toSeq.sortBy { case (id, _, w) => (-w, id) }.take(50)
    val got = q("q149_dsir_weights").as[(Long, Long, Double)].collect().toSeq
    assert(got.map(x => (x._1, x._2)) == expect.map(x => (x._1, x._2)))
    got.zip(expect).foreach { case (g, e) =>
      // bit-exact: both sides are the same defined integer-lattice value
      // through the same two correctly-rounded IEEE ops
      assert(g._3 == e._3, s"weight mismatch at ${g._1}")
    }
  }

  test("q151 principal projection: exact integer-lattice referee") {
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>"))
      .as[(Long, Int, Seq[Double])].collect().toSeq
    val dims = 64
    // round-7 semantics: quantize ONCE onto the 1e-6 lattice
    // (half-away-from-zero on the binary double, the latticize
    // contract), then everything downstream is pure integer
    def lat(x: Double): Long =
      (if (x >= 0) math.floor(x * 1e6 + 0.5) else math.ceil(x * 1e6 - 0.5)).toLong
    val els = vecs.map { case (id, label, e) => (id, label, e.map(lat)) }
    val g = Array.ofDim[Long](dims, dims)
    for ((_, _, el) <- els; i <- 0 until dims; j <- i until dims)
      g(i)(j) += el(i) * el(j)
    // exact integer half-away rescale of the 1e-12 lattice to 1e-6
    val g2 = Array.tabulate(dims, dims) { (i, j) =>
      val v = if (j >= i) g(i)(j) else g(j)(i)
      (if (v < 0) -1L else 1L) * ((math.abs(v) + 500000L) / 1000000L)
    }
    val v1 = g2.map(_.sum)
    val v2 = Array.tabulate(dims)(i =>
      (0 until dims).map(j => BigInt(g2(i)(j)) * v1(j)).sum)
    val expect = els.map { case (id, label, el) =>
      val p = (0 until dims).map(d => BigInt(el(d)) * v2(d)).sum
      (id, label, p)
    }.sortBy { case (id, _, p) => (-p.abs, id) }.take(20)
      // round-8 emission contract: selection/order on the exact value,
      // emitted column = sign-split truncating division by 1e6 (BIGINT)
      .map { case (id, label, p) =>
        (id, label, (if (p < 0) BigInt(-1) else BigInt(1)) * (p.abs / 1000000))
      }
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

  test("q153/q155 plan through the generalized RunningTotal operator") {
    // desc key + two parallel sums (q153); two-key ascending order
    // (q155) — both must hit the operator, not a single-task WindowExec
    Seq("q153_roc_sweep", "q155_epoch_shuffle").foreach { name =>
      val df = q(name)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("RunningTotal"), s"$name lost the auto-route")
      assert(!plan.contains("Window "), s"$name fell back to WindowExec")
    }
  }

  test("q154 novelty: exact sequential first-occurrence referee") {
    val wins = docs.flatMap { case (id, text, _, _) =>
      val ws = text.split("\\s+")
      ws.sliding(8).filter(_.length == 8).map(w => (id, hash32(w.mkString(" "))))
    }
    val firstDoc = wins.groupBy(_._2).map { case (wh, xs) =>
      wh -> xs.map(_._1).min }
    val expect = wins.groupBy(_._1).map { case (id, xs) =>
      val novel = xs.count(x => firstDoc(x._2) == id).toLong
      (id, xs.size.toLong, novel, novel.toDouble / xs.size)
    }.toSeq.sortBy(_._1)
    val got = q("q154_novelty_profile")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == expect)
  }

  test("q155 epoch shuffle: epochs permute differently but reproducibly") {
    val a = q("q155_epoch_shuffle").as[(Int, Long, Long, Long)].collect().toSeq
    val b = q("q155_epoch_shuffle").as[(Int, Long, Long, Long)].collect().toSeq
    assert(a == b) // deterministic across runs
    assert(a.forall(_._2 % 500 == 0))
    val ep0 = a.filter(_._1 == 0).map(r => r._2 -> r._3)
    val ep1 = a.filter(_._1 == 1).map(r => r._2 -> r._3)
    // same sampled positions, different docs at them (new permutation)
    assert(ep0.map(_._1) == ep1.map(_._1))
    assert(ep0 != ep1)
  }

  test("q157 gopher gate: each rule attributes its own planted failure") {
    val dir = java.nio.file.Files.createTempDirectory("graft-gopher").toString
    val pass20 = (1 to 19).map(i => s"word$i").mkString("the ", " ", "")
    Seq(
      (1L, pass20, "xx"),                                    // passes all
      (2L, "the alpha beta gamma delta epsil zeta etaa", "xx"), // len only (8)
      (3L, ("the" +: (0 until 14).map(i =>
        s"${('a' + i / 4).toChar}${('a' + i % 4).toChar}"))
        .mkString(" "), "xx"),                               // awl only (<3)
      (4L, (1 to 15).map(i => s"unik$i").mkString(" "), "xx"), // stop only
      (5L, ("the " + Seq.fill(19)("word").mkString(" ")), "xx") // distinct only
    ).toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Curation.qs.find(_.name == "q157_gopher_filter").get
      .run(spark, dir)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("xx", 5L, 1L, 1L, 1L, 1L, 1L)))
  }

  test("q158 arbitration: keeper is the argmax-quality member") {
    def fp(s: String): Long =
      s.foldLeft(0L)((h, c) => (h * 31 + c.toInt) % 1000000007L)
    def score(text: String): Long =
      text.split("\\s+").map(w => fp(w) % 1024 % 201 - 100).sum
    val scores = docs.map { case (id, text, _, _) => id -> score(text) }.toMap
    val rows = q("q158_cluster_quality_keep")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    rows.foreach { case (clusterId, keepId, nMembers, best, worst) =>
      assert(nMembers >= 2)
      assert(worst <= best)
      assert(clusterId <= keepId) // cluster label is the min member id
      assert(scores(keepId) == best, s"keeper $keepId is not the best member")
    }
  }

  test("q159 span removal: exact sequential merge referee") {
    val winsByDoc = docs.map { case (id, text, _, _) =>
      val ws = text.split("\\s+")
      id -> ws.sliding(8).filter(_.length == 8).zipWithIndex
        .map { case (w, i) => (i + 1, hash32(w.mkString(" "))) }.toSeq
    }.toMap
    val dupHashes = winsByDoc.toSeq.flatMap { case (id, ws) =>
      ws.map(w => (id, w._2)) }
      .groupBy(_._2).filter(_._2.map(_._1).distinct.size > 1).keySet
    val nTok = docs.map { case (id, t, _, _) => id -> t.split("\\s+").length }.toMap
    val expect = winsByDoc.toSeq.flatMap { case (id, ws) =>
      val starts = ws.filter(w => dupHashes(w._2)).map(_._1)
      if (starts.isEmpty) None
      else {
        val cov = starts.flatMap(s => s until s + 8).distinct
        val covSet = cov.toSet
        val spans = cov.count(p => !covSet(p - 1))
        Some((id, nTok(id).toLong, cov.size.toLong,
          (nTok(id) - cov.size).toLong, spans.toLong))
      }
    }.sortBy { case (id, _, rm, _, _) => (-rm, id) }.take(100)
    val got = q("q159_span_removal")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == expect)
  }

  test("q160 coverage: exact referee and the RunningTotal route") {
    val counts = docs.flatMap(_._2.split("\\s+")).groupBy(identity)
      .map { case (w, xs) => (w, xs.size.toLong) }.toSeq
    val ordered = counts.sortBy { case (w, c) => (-c, w) }
    val total = counts.map(_._2).sum
    val cums = ordered.scanLeft(0L)(_ + _._2).drop(1)
    def nTypes(bp: Long): Long =
      (cums.indexWhere(c => c * 10000 >= bp * total) + 1).toLong
    val df = q("q160_vocab_coverage")
    val got = df.as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq(5000L, 9000L, 9900L).map(bp => (bp, nTypes(bp), total)))
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("RunningTotal"))
  }

  test("q161 leakage: brute-force shared-window matrix agrees") {
    val sw = docs.flatMap { case (_, text, _, src) =>
      val ws = text.split("\\s+")
      ws.sliding(8).filter(_.length == 8).map(w => (src, hash32(w.mkString(" "))))
    }.distinct
    val byWh = sw.groupBy(_._2).values
    val expect = byWh.flatMap { xs =>
      val srcs = xs.map(_._1).distinct.sorted
      for (a <- srcs; b <- srcs if a < b) yield (a, b)
    }.groupBy(identity).map { case (k, v) => (k._1, k._2, v.size.toLong) }
      .toSeq.sortBy(x => (x._1, x._2))
    val got = q("q161_source_leakage")
      .as[(String, String, Long)].collect().toSeq
    assert(got == expect)
  }

  test("q156 calibration: deciles partition each source, bounds nest") {
    val rows = q("q156_quantile_calibration")
      .as[(String, Int, Long, Double, Double, Double)].collect().toSeq
    val bySource = rows.groupBy(_._1)
    val srcSizes = docs.groupBy(_._4).map { case (s, xs) => s -> xs.size.toLong }
    bySource.foreach { case (src, ds) =>
      assert(ds.map(_._2).sorted == (1 to 10), s"$src missing deciles")
      assert(ds.map(_._3).sum == srcSizes(src), s"$src counts off")
      // consecutive deciles cannot overlap: hi(d) <= lo(d+1)
      ds.sortBy(_._2).sliding(2).foreach {
        case Seq(lo1, hi1) => assert(lo1._5 <= hi1._4 + 1e-15)
        case _ =>
      }
      ds.foreach(d => assert(d._4 <= d._6 && d._6 <= d._5))
    }
  }
}
