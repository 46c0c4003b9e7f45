package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.{Curation2, Curation3}

/** Referees for the round-8 containment production tier (q183 / T93):
  * the capped tier must be a strict SUBSET of the guaranteed-recall
  * tier (a candidate cap can only LOSE pairs, never invent them), and
  * the cap must actually bind at sf0.01 — otherwise the query is just
  * q164 with extra steps and the "mitigation" is untested prose (the
  * VERDICT-r7 complaint this operator exists to close).
  */
class Curation3Spec extends SparkSpec {
  import spark.implicits._

  test("q183 ⊆ q164: the stop-shingle cap never invents a pair, and " +
      "at sf0.01 it loses none") {
    val full = Curation2.qs.find(_.name == "q164_containment_pairs").get
      .run(spark, sfDir).select("a_id", "b_id")
      .as[(Long, Long)].collect().toSet
    val capped = Curation3.qs.find(_.name == "q183_containment_stopdrop")
      .get.run(spark, sfDir).select("a_id", "b_id")
      .as[(Long, Long)].collect().toSet
    assert(capped.subsetOf(full),
      s"capped tier invented pairs: ${(capped -- full).take(5)}")
    // measured property of THIS testdata generation (documented in the
    // query description): τ=4 costs zero output pairs at sf0.01. If a
    // regenerated corpus legitimately loses a pair through the cap,
    // this assert localizes the semantic change (subset above is the
    // invariant; equality is the current measurement).
    assert(capped == full,
      s"recall loss at sf0.01 changed: lost ${(full -- capped).size} " +
        s"of ${full.size} pairs — re-measure and update the q183 docs")
  }

  test("q184 = q164 exactly (positional bounds are recall-lossless) " +
      "while generating strictly fewer candidate pairs") {
    val full = Curation2.qs.find(_.name == "q164_containment_pairs").get
      .run(spark, sfDir)
      .select("a_id", "b_id", "n_inter").as[(Long, Long, Long)]
      .collect().toSet
    val pos = Curation3.qs.find(_.name == "q184_containment_positional")
      .get.run(spark, sfDir)
      .select("a_id", "b_id", "n_inter").as[(Long, Long, Long)]
      .collect().toSet
    assert(pos == full, "positional tier must be recall-exact")
    // candidate-pair counts BEFORE exact verification: the positional
    // bound must prune (this is its entire reason to exist)
    val hashes = graft.dedup.Dedup.shingleFrame(
        spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text")
      .select(col("doc_id"), array_sort(array_distinct(
        transform(col("sh"), x => graft.ops.Hashing.hash32(x)))).as("hs"))
      .localCheckpoint()
    val idx = hashes.select(col("doc_id").as("i_id"),
      size(col("hs")).as("nb"), posexplode(col("hs")).as(Seq("j", "h")))
    val pre = hashes.select(col("doc_id").as("p_id"),
      size(col("hs")).as("na"),
      posexplode(expr("slice(hs, 1, size(hs) div 2 + 1)")).as(Seq("i", "h")))
    val joined = pre.join(idx, "h").filter(col("p_id") =!= col("i_id"))
    def pairs(f: org.apache.spark.sql.DataFrame): Long =
      f.select(least(col("p_id"), col("i_id")),
        greatest(col("p_id"), col("i_id"))).distinct().count()
    val unbounded = pairs(joined)
    val bounded = pairs(joined.filter(
      (lit(1) + least(col("na") - col("i") - 1, col("nb") - col("j") - 1))
        * 2 >= least(col("na"), col("nb"))))
    assert(bounded < unbounded,
      s"positional bound pruned nothing: $bounded vs $unbounded")
    info(s"candidate pairs: $unbounded -> $bounded " +
      f"(${100.0 * (unbounded - bounded) / unbounded}%.1f%% pruned)")
  }

  test("q185 curve on planted excerpts: known containments land in " +
      "deciles 5/7/9 with the right cumulative") {
    // One 60-word base doc and three excerpts from DISJOINT regions
    // (so cross-excerpt pairs share nothing) with hand-computed
    // trigram-shingle containments: 10/13 → decile 7, 8/14 → 5,
    // 10/11 → 9; a fourth doc shares one shingle (1/13 < 0.5,
    // excluded). Exact-integer decile arithmetic makes these
    // assertions instance-independent.
    val a = (1 to 60).map(i => s"a$i")
    val docs = Seq(
      (1L, a.mkString(" "), "en", "s", 0L),
      (2L, (a.slice(0, 12) ++ Seq("u1", "u2", "u3")).mkString(" "),
        "en", "s", 0L),
      (3L, (a.slice(24, 34) ++ (1 to 6).map(i => s"v$i")).mkString(" "),
        "en", "s", 0L),
      (4L, (a.slice(44, 56) :+ "w1").mkString(" "), "en", "s", 0L),
      (5L, (a.slice(4, 7) ++ (1 to 12).map(i => s"z$i")).mkString(" "),
        "en", "s", 0L))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_curve").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Curation3.qs
      .find(_.name == "q185_containment_threshold_curve").get
      .run(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got == Seq((5L, 1L, 3L), (7L, 1L, 2L), (9L, 1L, 1L)), got)
  }

  test("q184 randomized recall referee: on seeded random corpora the " +
      "positional tier equals Scala brute force exactly") {
    // The oracle proves recall on the driver's testdata instances;
    // this referee re-proves it on corpora the oracle never sees —
    // three seeded random corpora with heavy vocabulary reuse (so
    // shared shingles and containment pairs actually occur), compared
    // against an INDEPENDENT brute-force implementation in plain
    // Scala over the same md5 hash family.
    def hash32(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(md.digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8), 16)
    }
    for (seed <- Seq(7, 42, 1337)) {
      val rnd = new scala.util.Random(seed)
      // docs are random SLICES of a master sequence (the excerpt
      // shape containment detection exists for), some with unique
      // noise tails — overlapping slices produce genuine ≥0.5 pairs
      val master = (0 until 200).map(i => s"m${seed}_$i")
      val docs = (0 until 80).map { i =>
        val off = rnd.nextInt(160)
        val len = 6 + rnd.nextInt(30)
        val tail = if (rnd.nextInt(10) < 3)
          Seq.fill(3 + rnd.nextInt(5))(s"u${i}_${rnd.nextInt(99)}")
        else Seq.empty
        (i.toLong, (master.slice(off, off + len) ++ tail).mkString(" "),
          "en", "s", 0L)
      }
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_rr$seed").toString
      docs.toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val got = Curation3.qs.find(_.name == "q184_containment_positional")
        .get.run(spark, dir)
        .select("a_id", "b_id", "n_inter").as[(Long, Long, Long)]
        .collect().toSet
      // independent brute force: trigram shingles → hash sets →
      // all-pairs exact containment
      val hs = docs.map { case (id, text, _, _, _) =>
        val ws = text.split("\\s+").toSeq
        id -> ws.sliding(3).filter(_.size == 3)
          .map(w => hash32(w.mkString(" "))).toSet
      }.toMap
      val want = (for {
        a <- hs.keys; b <- hs.keys; if a < b
        ni = (hs(a) intersect hs(b)).size
        if ni * 2 >= math.min(hs(a).size, hs(b).size)
      } yield (a, b, ni.toLong)).toSet
      assert(got == want,
        s"seed $seed: got ${got.size}, want ${want.size}, " +
          s"missing ${(want -- got).take(3)}, extra ${(got -- want).take(3)}")
      assert(want.nonEmpty, s"seed $seed produced no pairs — referee inert")
    }
  }

  test("q194 router: testdata corpora route to stopdrop; a planted " +
      "hub-shingle corpus flips to positional and stays recall-exact") {
    // testdata: capped mass fits the linear budget → stopdrop
    val t1 = Curation3.qs.find(_.name == "q194_containment_auto").get
      .run(spark, sfDir).select("tier").distinct()
      .as[String].collect().toSeq
    assert(t1 == Seq("stopdrop"), t1.toString)
    // hub corpus: 2500 docs in 250 groups of 10 sharing a group text
    // (df=10 retained under τ = max(4, 2500/250) = 10, per-hash mass
    // ≈ np·c ≈ τ², far above the τ·|hashes| budget's per-hash
    // allowance of τ) → capped mass blows the linear budget → the
    // router must pick the positional tier, whose output equals q164's
    // guaranteed-recall tier on the same corpus
    val docs = (0 until 2500).map { i =>
      val g = i / 10
      val words = (0 until 12).map(w => s"g${g}w$w") :+ s"u$i"
      (i.toLong, words.mkString(" "), "en", "s", 0L)
    }
    val dir = java.nio.file.Files
      .createTempDirectory("graft_router").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val auto = Curation3.qs.find(_.name == "q194_containment_auto").get
      .run(spark, dir)
    val tiers = auto.select("tier").distinct().as[String].collect().toSeq
    assert(tiers == Seq("positional"), tiers.toString)
    val autoPairs = auto.select("a_id", "b_id")
      .as[(Long, Long)].collect().toSet
    val full = Curation2.qs.find(_.name == "q164_containment_pairs").get
      .run(spark, dir).select("a_id", "b_id")
      .as[(Long, Long)].collect().toSet
    assert(autoPairs == full,
      s"router's positional branch diverged: ${autoPairs.size} vs ${full.size}")
    // the within-group clique is fully recovered: C(10,2)·250 pairs
    assert(full.size == 45 * 250, full.size.toString)
  }

  test("q194 τ-derived budget: a df=τ hub lattice where the old " +
      "constant-16 budget and the τ·|hashes| formula disagree — and " +
      "the formula is right") {
    // VERDICT-r8 item 2. 1000 docs in 250 groups of 4: each doc is 12
    // group-shared words + 1 unique word → 10 shared trigram shingles
    // with df exactly 4 and one df=1 tail shingle. τ = max(4,
    // 1000/250) = 4, so EVERY hash survives the cap (drop requires
    // df > τ): the stop set is empty and the stop-drop tier degrades
    // to the unmitigated q164 join with zero mitigation — routing
    // there is simply wrong. The measured capped mass (~22k) sits in
    // the exact disagreement zone: ABOVE the τ-budget 4·|hashes|
    // (~14k) and BELOW the old constant budget 16·|hashes| (~56k —
    // which at τ=4 equals the tier's τ²·|hashes| worst-case ceiling,
    // i.e. the old router could never pick positional on any τ=4
    // corpus). The formula routes positional; this test proves that
    // is the right call: the positional bound prunes candidates the
    // empty stop set cannot, and the routed output stays recall-exact
    // vs the guaranteed-recall tier.
    val docs = (0 until 1000).map { i =>
      val g = i / 4
      val words = (0 until 12).map(w => s"d${g}w$w") :+ s"uq$i"
      (i.toLong, words.mkString(" "), "en", "s", 0L)
    }
    val dir = java.nio.file.Files
      .createTempDirectory("graft_taubudget").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // re-derive the router's measured statistics independently
    val hashes = graft.dedup.Dedup.shingleFrame(
        spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")
      .select(col("doc_id"), array_sort(array_distinct(
        transform(col("sh"), x => graft.ops.Hashing.hash32(x)))).as("hs"))
      .localCheckpoint()
    val tau = math.max(Curation3.StopDfFloor.toLong,
      hashes.count() / Curation3.StopFracDen)
    assert(tau == 4L, s"corpus must sit at the τ floor, got $tau")
    val ex = hashes.select(col("doc_id"), explode(col("hs")).as("h"))
    val dfc = ex.groupBy("h").agg(count(lit(1)).as("c"))
    val prec = hashes.select(col("doc_id"),
        explode(expr("slice(hs, 1, size(hs) div 2 + 1)")).as("h"))
      .groupBy("h").agg(count(lit(1)).as("np"))
    val nHashes = dfc.count()
    val cappedMass = dfc.join(prec, "h").filter(col("c") <= tau)
      .agg(sum(col("np") * col("c"))).head().getLong(0)
    val nStop = dfc.filter(col("c") > tau).count()
    assert(nStop == 0L,
      s"cap must bind NOTHING on the df=τ lattice, dropped $nStop")
    // the disagreement zone: old constant says stopdrop, formula says
    // positional
    assert(cappedMass > tau * nHashes,
      s"mass $cappedMass must exceed the τ budget ${tau * nHashes}")
    assert(cappedMass <= 16 * nHashes,
      s"mass $cappedMass must fit the old constant budget ${16 * nHashes} " +
        "— otherwise this corpus shows no disagreement")
    // the router takes the positional branch…
    val auto = Curation3.qs.find(_.name == "q194_containment_auto").get
      .run(spark, dir)
    val tiers = auto.select("tier").distinct().as[String].collect().toSeq
    assert(tiers == Seq("positional"), tiers.toString)
    // …and that branch is the right one: recall-exact (equals the
    // guaranteed-recall tier — each 4-group yields C(4,2) pairs) while
    // the positional bound prunes real candidate mass where the empty
    // stop set pruned none
    val autoPairs = auto.select("a_id", "b_id")
      .as[(Long, Long)].collect().toSet
    val full = Curation2.qs.find(_.name == "q164_containment_pairs").get
      .run(spark, dir).select("a_id", "b_id")
      .as[(Long, Long)].collect().toSet
    assert(autoPairs == full,
      s"router's positional branch diverged: ${autoPairs.size} vs ${full.size}")
    assert(full.size == 6 * 250, full.size.toString)
    val idx = hashes.select(col("doc_id").as("i_id"),
      size(col("hs")).as("nb"), posexplode(col("hs")).as(Seq("j", "h")))
    val pre = hashes.select(col("doc_id").as("p_id"),
      size(col("hs")).as("na"),
      posexplode(expr("slice(hs, 1, size(hs) div 2 + 1)")).as(Seq("i", "h")))
    val joined = pre.join(idx, "h").filter(col("p_id") =!= col("i_id"))
    val unbounded = joined.count()
    val bounded = joined.filter(
      (lit(1) + least(col("na") - col("i") - 1, col("nb") - col("j") - 1))
        * 2 >= least(col("na"), col("nb"))).count()
    assert(bounded < unbounded,
      s"positional bound pruned nothing here: $bounded vs $unbounded")
    info(f"df=τ lattice: mass $cappedMass (τ·n=${tau * nHashes}, " +
      f"16·n=${16 * nHashes}), candidate rows $unbounded -> $bounded")
  }

  test("q183 cap binds at sf0.01: the stop set is non-empty and the " +
      "candidate multiset shrinks") {
    val hashes = graft.dedup.Dedup.shingleFrame(
        spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text")
      .select(col("doc_id"), array_sort(array_distinct(
        transform(col("sh"), x => graft.ops.Hashing.hash32(x)))).as("hs"))
    val ex = hashes.select(explode(col("hs")).as("h"))
    val df = ex.groupBy("h").agg(count(lit(1)).as("c"))
    val tau = math.max(Curation3.StopDfFloor.toLong,
      hashes.count() / Curation3.StopFracDen)
    val nStop = df.filter(col("c") > tau).count()
    assert(nStop > 0, "stop set empty — the cap does not bind at sf0.01")
    // candidate multiset Σ_h probe(h)·index(h): the quantity VERDICT-r7
    // named as this tier's scale ceiling. Hot hashes own it, so the
    // drop must shrink it even when df_max is single-digit.
    val pre = hashes.select(
        explode(expr("slice(hs, 1, size(hs) div 2 + 1)")).as("h"))
      .groupBy("h").agg(count(lit(1)).as("np"))
    val idx = ex.groupBy("h").agg(count(lit(1)).as("ni"))
    val joined = pre.join(idx, "h").join(df, "h")
    def mass(f: org.apache.spark.sql.DataFrame): Long =
      f.agg(sum(col("np") * col("ni"))).head().getLong(0)
    val mFull = mass(joined)
    val mCap = mass(joined.filter(col("c") <= tau))
    assert(mCap < mFull, s"no candidate-mass reduction: $mCap vs $mFull")
    info(s"candidate multiset: $mFull -> $mCap " +
      f"(${100.0 * (mFull - mCap) / mFull}%.1f%% drop, $nStop stop hashes)")
  }
}
