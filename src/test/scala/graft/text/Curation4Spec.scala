package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Curation4

/** Planted-corpus referees for the round-9 curation wave (T105-T108):
  * hand-computed novelty fractions, spectrum buckets and growth-curve
  * rows on corpora small enough to verify by eye — the oracle proves
  * cross-engine agreement on the driver's instances, these prove the
  * SEMANTICS on inputs where the right answer is arithmetic.
  */
class Curation4Spec extends SparkSpec {
  import spark.implicits._

  private def writeDocs(docs: Seq[(Long, String)], tag: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(tag).toString
    docs.map { case (id, t) => (id, t, "en", "s", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def run(name: String, dir: String) =
    Curation4.qs.find(_.name == name).get.run(spark, dir)

  test("q196 novelty: a verbatim re-crawl scores 0, a half-new doc " +
      "500000 ppm, and shingle-less docs are absent") {
    val dir = writeDocs(Seq(
      0L -> "a b c d",  // shingles {a b c, b c d}: both novel
      1L -> "a b c d",  // verbatim dup: nothing novel
      2L -> "a b c x",  // {a b c (seen), b c x (novel)}: 1/2
      3L -> "tiny doc"  // < 3 words → no shingles → absent
    ), "graft_nov")
    val got = run("q196_novelty_rate", dir)
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got == Seq(
      (0L, 2L, 2L, 1000000L),
      (1L, 2L, 0L, 0L),
      (2L, 2L, 1L, 500000L)), got.toString)
  }

  test("q197 spectrum: planted tf {1, 2, 3} lands in log2 buckets " +
      "{0, 1} with exact integer shares") {
    val dir = writeDocs(Seq(0L -> "x y y z z z"), "graft_spec")
    val got = run("q197_token_spectrum", dir)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    // 3 types, 6 tokens. bucket 0 (tf=1): x. bucket 1 (tf 2-3): y, z.
    assert(got == Seq(
      (0L, 1L, 1L, 333333L, 166666L),
      (1L, 2L, 5L, 666666L, 833333L)), got.toString)
  }

  test("q199 growth curve: per-bucket first occurrences accumulate " +
      "into the vocabulary prefix counts") {
    // doc d carries a shared token plus one token first seen at d:
    // bucket 0 holds doc 0 (2 new types: shared + w0), bucket 1 docs
    // 1-2, bucket 2 docs 3-6
    val dir = writeDocs((0L to 6L).map(d => d -> s"shared w$d"), "graft_heaps")
    val got = run("q199_vocab_growth", dir)
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got == Seq(
      (0L, 1L, 2L, 2L),   // docs {0}: shared + w0
      (1L, 3L, 2L, 4L),   // docs {1,2}: w1, w2
      (2L, 7L, 4L, 8L)),  // docs {3..6}: w3..w6
      got.toString)
  }

  test("q200 scrub semantics: tricky emails matched, near-misses " +
      "left alone, scrub idempotent") {
    val email = "[A-Za-z0-9._]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phone = "\\+1-555-[0-9]{4}"
    def scrub(s: String): String = s
      .replaceAll(email, "<EMAIL>").replaceAll(phone, "<PHONE>")
    // matched: dots/underscores in local part, subdomains, 2-letter TLD
    assert(scrub("hi a.b_c@x.co.uk bye") == "hi <EMAIL> bye")
    assert(scrub("dial +1-555-0042 now") == "dial <PHONE> now")
    // near-misses survive: no TLD, bare @, wrong prefix, short number
    assert(scrub("a@b c @ d") == "a@b c @ d")
    assert(scrub("+1-555-12 and +2-555-1234") == "+1-555-12 and +2-555-1234")
    // idempotence: placeholders contain no matchable material
    val once = scrub("alice9@mail.example.org +1-555-0009")
    assert(scrub(once) == once && once == "<EMAIL> <PHONE>")
    // the engine's own pipeline agrees with plain-Java on a planted doc
    val dir = writeDocs(Seq(
      0L -> "plain words only",
      1L -> "reach me at dev.team_1@sub.host-a.io or +1-555-7777 thanks"),
      "graft_pii")
    val got = run("q200_pii_scrub", dir)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // doc 1 plants one email (id%3=1) and one phone (id%2=1) via the
    // query's own formula ON TOP of the in-text pair
    assert(got(1L) == ((2L, 2L)), got.toString)
    assert(got(0L) == ((0L, 0L)), got.toString)
  }

  test("q201 domain rollup: www stripped, multi-URL docs counted per " +
      "mention, doc counts distinct") {
    val dir = writeDocs(Seq(
      0L -> "a", 4L -> "b", 5L -> "c", 20L -> "d"), "graft_url")
    // planted by the query itself: doc 0 → www.host0.example + mirror0,
    // doc 4 → www.host4.example, doc 5 → host5.example + mirror2,
    // doc 20 → www.host6.example + mirror2
    val got = run("q201_url_domain_mix", dir)
      .as[(String, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got.contains(("host0.example", 1L, 1L)), got.toString)
    assert(got.contains(("mirror2.example", 2L, 2L)), got.toString)
    assert(got.forall { case (d, _, _) => !d.startsWith("www.") }, got)
  }

  private def md5hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }
  private def hash32(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).substring(0, 8), 16)

  /** Independent plain-Scala CDC: same boundary rule as q202. */
  private def cdcDigests(text: String): Seq[String] = {
    val ws = text.split("\\s+").toIndexedSeq
    val gs = ws.map(hash32)
    val bs = (4 to ws.length).filter(i =>
      (gs(i - 4) * 29791L + gs(i - 3) * 961L + gs(i - 2) * 31L +
        gs(i - 1)) % 8 == 0)
    val ss = 1 +: bs.map(_ + 1)
    val es = bs :+ ws.length
    ss.zip(es).filter { case (s, e) => e >= s }
      .map { case (s, e) => md5hex(ws.slice(s - 1, e).mkString(" ")) }
  }

  test("q202 CDC referee: engine output equals an independent " +
      "plain-Scala CDC on a seeded corpus, and a one-word insertion " +
      "re-syncs (most chunks still dedup)") {
    val rnd = new scala.util.Random(31337)
    val master = (0 until 300).map(i => s"c${i}")
    val base = (0 until 40).map { i =>
      val off = rnd.nextInt(250)
      i.toLong -> master.slice(off, off + 12 + rnd.nextInt(30)).mkString(" ")
    }
    // docs 100+: one-word-prefixed copies of docs 0-9 — the shifted-
    // copy case fixed-window chunking cannot dedup
    val shifted = (0 until 10).map(i =>
      (100L + i) -> s"ins$i ${base(i)._2}")
    val docs = base ++ shifted
    val dir = writeDocs(docs, "graft_cdc")
    val got = run("q202_cdc_chunk_dedup", dir)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // referee: replay the corpus in doc order, first-doc per digest
    val first = scala.collection.mutable.Map[String, Long]()
    val want = docs.sortBy(_._1).map { case (id, text) =>
      val dgs = cdcDigests(text)
      dgs.foreach(dg => if (!first.contains(dg)) first(dg) = id)
      id -> ((dgs.size.toLong, dgs.count(dg => first(dg) < id).toLong))
    }.toMap
    assert(got == want,
      s"diverged at ${want.keys.filter(k => got(k) != want(k)).take(3)}")
    // the CDC property: a 1-word insertion perturbs only the chunks
    // overlapping the edit (the rolling window re-syncs w-1 words in)
    // — every shifted copy re-dedups all but ≤ 2 of its chunks
    // (measured: usually all but ONE, the chunk containing the
    // insertion itself)
    val resync = shifted.map(_._1).map(id => got(id))
    assert(resync.forall { case (n, dup) => dup > 0 && dup >= n - 2 },
      s"resync too weak: $resync")
    val (tn, td) = resync.foldLeft((0L, 0L)) {
      case ((an, ad), (n, dup)) => (an + n, ad + dup) }
    assert(td * 2 > tn, s"aggregate resync below half: $td/$tn")
  }

  test("q203 winnowing referee: engine pairs equal plain-Scala " +
      "winnowing; a planted 20-word shared run is detected") {
    def fingerprints(text: String): Set[Long] = {
      val ws = text.split("\\s+").toSeq
      val hs = ws.sliding(3).filter(_.size == 3)
        .map(w => hash32(w.mkString(" "))).toIndexedSeq
      if (hs.size < 4) Set.empty
      else (0 to hs.size - 4).map(i => hs.slice(i, i + 4).min).toSet
    }
    val rnd = new scala.util.Random(777)
    val master = (0 until 200).map(i => s"m$i")
    val docs = (0 until 50).map { i =>
      val off = rnd.nextInt(150)
      i.toLong -> master.slice(off, off + 10 + rnd.nextInt(25)).mkString(" ")
    } ++ Seq(
      // planted: disjoint unique prefixes + one 20-word shared run
      900L -> ((1 to 12).map(i => s"pa$i") ++ master.slice(170, 190))
        .mkString(" "),
      901L -> ((1 to 9).map(i => s"pb$i") ++ master.slice(170, 190))
        .mkString(" "))
    val dir = writeDocs(docs, "graft_winnow")
    val got = run("q203_winnow_fingerprints", dir)
      .as[(Long, Long, Long)].collect().toSet
    // referee mirrors the declared hot-fingerprint cap: df > max(4,
    // docs/250) dropped before pairing
    val fpsRaw = docs.map { case (id, t) => id -> fingerprints(t) }.toMap
    val tau = math.max(4L, docs.size / 250L)
    val df = fpsRaw.values.flatten.groupBy(identity).map {
      case (v, o) => v -> o.size.toLong }
    val fps = fpsRaw.view.mapValues(_.filter(df(_) <= tau)).toMap
    val want = (for {
      a <- fps.keys; b <- fps.keys; if a < b
      n = (fps(a) intersect fps(b)).size if n >= 3
    } yield (a, b, n.toLong)).toSet
    assert(got == want,
      s"got ${got.size}, want ${want.size}, " +
        s"missing ${(want -- got).take(3)}, extra ${(got -- want).take(3)}")
    // the guarantee: a 20-word shared run (18 shingles, 15 windows)
    // must surface the planted pair
    assert(got.exists { case (a, b, _) => a == 900L && b == 901L },
      "planted shared-run pair missed")
    assert(want.nonEmpty)
  }

  test("q205 self-tuning cap: a τ-lattice hub corpus tightens to the " +
      "exact τ* the histogram rule derives (hub pairs dropped, the " +
      "planted excerpt pair survives); a natural corpus keeps τ and " +
      "emits q203's rows — rule and both outcomes refereed in plain " +
      "Scala (VERDICT-r9 item 1)") {
    def fingerprints(text: String): Set[Long] = {
      val ws = text.split("\\s+").toSeq
      val hs = ws.sliding(3).filter(_.size == 3)
        .map(w => hash32(w.mkString(" "))).toIndexedSeq
      if (hs.size < 4) Set.empty
      else (0 to hs.size - 4).map(i => hs.slice(i, i + 4).min).toSet
    }
    // the shipped integer rule, verbatim: capped mass vs τ·|fp|, then
    // τ* = max{c : cum(c) ≤ budget} (floor 1) when over
    def routing(docs: Seq[(Long, String)]): (String, Long) = {
      val tau = math.max(4L, docs.size / 250L)
      val df = docs.flatMap { case (_, t) => fingerprints(t) }
        .groupBy(identity).map { case (_, o) => o.size.toLong }.toSeq
      val nFp = df.size.toLong
      val budget = tau * nFp
      val capped = df.filter(_ <= tau).map(c => c * c).sum
      if (capped <= budget) ("winnow", tau)
      else {
        val cum = df.groupBy(identity).toSeq.sortBy(_._1)
          .scanLeft((0L, 0L)) { case ((_, m), (c, o)) =>
            (c, m + o.size * c * c) }.tail
        val ts = cum.filter(_._2 <= budget).map(_._1)
          .reduceOption(_ max _).getOrElse(1L)
        ("tightened", ts)
      }
    }

    // hub shape: 12 groups × 4 verbatim copies — every hub
    // fingerprint's df is exactly τ=4, so q203's cap drops NOTHING and
    // pair mass is 16·|fp| > budget 4·|fp| (the r16 stress lattice in
    // miniature). Plus one planted excerpt pair (df=2 fingerprints).
    // The rule must tighten to τ*=2: cum(1)+cum(2) ≤ budget but the
    // 16·|hub| step at c=4 blows past it — so the boilerplate lattice
    // drops and ONLY the planted pair survives, which is exactly what
    // MOSS does with over-shared fingerprints
    val hub = (0 until 12).flatMap { g =>
      val words = (0 until 12).map(k => s"g${g}w$k").mkString(" ")
      (0 until 4).map(c => (g * 4 + c).toLong -> words)
    } ++ Seq(
      900L -> ((1 to 8).map(i => s"pa$i") ++ (0 until 20).map(k => s"sh$k"))
        .mkString(" "),
      901L -> ((1 to 5).map(i => s"pb$i") ++ (0 until 20).map(k => s"sh$k"))
        .mkString(" "))
    assert(routing(hub) == ("tightened", 2L))
    val dir2 = writeDocs(hub, "graft_winauto_hub")
    val got2 = run("q205_winnow_auto", dir2)
      .as[(String, Long, Long, Long)].collect().toSet
    // outcome referee: at cap 2, only fingerprints with df ≤ 2 pair —
    // the planted docs' shared-run fingerprints (df=2), of which ≥ 3
    // are shared, so exactly the (900, 901) pair is emitted
    val fpByDoc = hub.map { case (id, t) => id -> fingerprints(t) }.toMap
    val dfAll = hub.flatMap { case (_, t) => fingerprints(t) }
      .groupBy(identity).map { case (v, o) => v -> o.size }
    val survive = (v: Long) => dfAll(v) <= 2
    val want2 = (for {
      a <- fpByDoc.keys; b <- fpByDoc.keys; if a < b
      n = (fpByDoc(a) intersect fpByDoc(b)).count(survive)
      if n >= 3
    } yield ("tightened", a, b, n.toLong)).toSet
    assert(want2.map(r => (r._2, r._3)) == Set((900L, 901L)))
    assert(got2 == want2, s"got $got2, want $want2")

    // natural shape: mostly doc-unique vocabulary (df≈1 fingerprints —
    // the real-corpus profile, where new docs bring new content) plus
    // one planted shared run; sits well inside the τ-linear budget, so
    // the cap stays at τ and the rows are exactly q203's
    val rnd = new scala.util.Random(4242)
    val nat = (0 until 40).map { i =>
      i.toLong -> (0 until 15 + rnd.nextInt(15)).map(k => s"u${i}_$k")
        .mkString(" ")
    } ++ Seq(
      900L -> ((1 to 8).map(i => s"pa$i") ++ (0 until 20).map(k => s"sh$k"))
        .mkString(" "),
      901L -> ((1 to 5).map(i => s"pb$i") ++ (0 until 20).map(k => s"sh$k"))
        .mkString(" "))
    assert(routing(nat) == ("winnow", 4L))
    val dir1 = writeDocs(nat, "graft_winauto_nat")
    val got1 = run("q205_winnow_auto", dir1)
      .as[(String, Long, Long, Long)].collect().toSet
    val want1 = run("q203_winnow_fingerprints", dir1)
      .as[(Long, Long, Long)].collect().toSet
      .map { t: (Long, Long, Long) => ("winnow", t._1, t._2, t._3) }
    assert(got1 == want1, s"got ${got1.size}, want ${want1.size}")
  }

  test("q204 boilerplate: a planted nav line in 10 of 12 same-source " +
      "docs strips; rare lines and small-source lines survive") {
    // source 'big': 12 docs, each = one unique 6-word line + a shared
    // 6-word nav line (df 10 > max(2, 12/4)=3 → boilerplate) + the
    // query's own planted footer (df 12 → boilerplate). Two docs lack
    // the nav line. source 'tiny': 2 docs sharing everything — df 2
    // is NOT > max(2, 0)=2, so nothing strips but the footer isn't
    // boiler either (df 2 ≤ 2): small sources are immune.
    val nav = "home about contact privacy terms sitemap"
    def uniq(i: Int) = (1 to 6).map(k => s"u${i}_$k").mkString(" ")
    val docs =
      (0 until 10).map(i => (i.toLong, s"${uniq(i)} $nav", "en", "big", 0L)) ++
      (10 until 12).map(i => (i.toLong, uniq(i), "en", "big", 0L)) ++
      Seq((20L, "tiny shared line one two three", "en", "tiny", 0L),
        (21L, "tiny shared line one two three", "en", "tiny", 0L))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_boiler").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = run("q204_boilerplate_lines", dir)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    def ld(s: String) = md5hex(s)
    // nav-carrying docs: 3 lines (unique, nav, footer), nav+footer
    // stripped → clean digest = md5 of the unique line's digest
    for (i <- 0L until 10L) {
      val (n, boiler, dg) = got(i)
      assert((n, boiler) == ((3L, 2L)), s"doc $i: $n/$boiler")
      assert(dg == md5hex(ld(uniq(i.toInt))), s"doc $i digest")
    }
    // nav-free docs: 2 lines, only the footer stripped
    for (i <- 10L until 12L)
      assert(got(i)._1 == 2L && got(i)._2 == 1L, s"doc $i")
    // tiny source: nothing is boilerplate (df 2 ≤ max(2, 0)), all
    // 2 lines kept incl. the footer
    for (i <- Seq(20L, 21L)) {
      val (n, boiler, dg) = got(i)
      assert((n, boiler) == ((2L, 0L)), s"doc $i: $n/$boiler")
      assert(dg == md5hex(
        ld("tiny shared line one two three") + "\n" + ld("footer of tiny")),
        s"doc $i digest")
    }
  }

  test("q204 production path: lineExplode on real newlines + the SAME " +
      "shared strip builder — a planted nav line strips on a " +
      "multi-line fixture, unique lines survive (VERDICT-r9 item 5)") {
    val nav = "NAV MENU HOME"
    val docs = (0 until 12).map { i =>
      val lines =
        if (i < 10) Seq(s"unique head $i", nav, s"body text $i")
        else Seq(s"unique head $i", s"body text $i")
      // half the docs end in a trailing newline and doc 3 has a blank
      // interior line: separators, not lines — they must not create
      // phantom md5("") digests (two texts identical modulo a
      // trailing newline must fingerprint identically)
      val t = lines.mkString("\n")
      i.toLong -> (if (i == 3) t.replaceFirst("\n", "\n\n")
        else if (i % 2 == 0) t + "\n" else t)
    }
    val dir = writeDocs(docs, "graft_bp_nl")
    val got = Curation4.boilerplateStrip(Curation4.lineExplode(
        spark.read.parquet(s"$dir/documents.parquet"), "\n"))
      .as[(Long, Long, Long, String)].collect().toSeq.sortBy(_._1)
    // plain-Scala referee: df(nav)=10 > max(2, 12/4)=3 → stripped;
    // every other line is doc-unique (df 1) → kept. clean digest =
    // md5 over the kept lines' md5 digests joined by \n
    val want = docs.map { case (id, t) =>
      val ls = t.split("\n").toSeq.filter(_.nonEmpty) // as the builder
      val kept = ls.filterNot(_ == nav)
      (id, ls.size.toLong, (ls.size - kept.size).toLong,
        md5hex(kept.map(md5hex).mkString("\n")))
    }.sortBy(_._1)
    assert(got == want, got.toString)
  }

  test("q198 synthesis closed form holds for the first cycle ids") {
    // independent re-derivation for ids 0-4 at the unit level: doc id
    // has units (id+k)%5, k < id%40+10 — spot-check the emitted stats
    // against a plain-Scala recount
    val got = run("q198_utf8_audit", sfDir)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    for (id <- 0L to 4L if got.contains(id)) {
      val units = (id % 40 + 10).toInt
      val ts = (0 until units).map(k => ((id + k) % 5).toInt)
      val bytes = ts.map(t => Seq(1, 2, 3, 1, 2)(t)).sum.toLong
      val valid = ts.count(_ <= 2).toLong
      val bad = ts.map(t => Seq(0, 0, 0, 1, 2)(t)).sum.toLong
      val repl = ts.count(_ >= 3).toLong
      val multi = ts.count(t => t == 1 || t == 2).toLong
      assert(got(id) == ((id, bytes, valid, bad, repl, multi)),
        s"id=$id got=${got(id)}")
    }
  }
}
