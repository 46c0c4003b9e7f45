package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Curation2

/** Referees for the round-7 curation wave (q163–q167): invariants the
  * oracle hash-compare can't express — budget conservation, waterline
  * feasibility, recall of the asymmetric-containment formulation on a
  * planted near-superset that Jaccard would miss.
  */
class Curation2Spec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) =
    Curation2.qs.find(_.name == name).get.run(spark, sfDir)

  test("q163: split hashing is the documented md5 digest, cells add up " +
      "to the corpus") {
    val cells = q("q163_stratified_split")
      .select("split", "n_docs").as[(String, Long)].collect()
    val total = cells.map(_._2).sum
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id").as[Long].collect()
    assert(total == docs.length)
    // independent recomputation of the 80/10/10 assignment
    def h(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"sp:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      java.lang.Long.parseLong(hex, 16) % 100
    }
    val expTrain = docs.count(id => h(id) < 80).toLong
    val gotTrain = cells.collect { case ("train", n) => n }.sum
    assert(gotTrain == expTrain)
  }

  test("q164: planted excerpt (doc ⊂ doc) is caught by containment " +
      "where Jaccard stays low") {
    val long = (1 to 60).map(i => s"tok$i").mkString(" ")
    val short = (10 to 20).map(i => s"tok$i").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("graft-cont")
    Seq((1L, long, "en", "src0"), (2L, short, "en", "src0"),
        (3L, "wholly different words that never touch the others at all x y z",
          "en", "src1"))
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Curation2.qs.find(_.name == "q164_containment_pairs").get
      .run(spark, dir.toString)
      .select("a_id", "b_id", "containment").as[(Long, Long, Double)]
      .collect().map { case (a, b, c) => ((a, b), c) }.toMap
    // the excerpt's shingles are a strict subset of the long doc's:
    // containment = 1.0; Jaccard would be ~9/58 ≈ 0.16
    assert(got.get((1L, 2L)).exists(_ == 1.0),
      s"planted excerpt not caught: $got")
    assert(!got.keys.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("q166: largest-remainder allocation conserves the budget exactly") {
    val rows = q("q166_temperature_mix")
      .select("share", "alloc").as[(Double, Long)].collect()
    assert(rows.map(_._2).sum == 1000000L)
    assert(math.abs(rows.map(_._1).sum - 1.0) < 1e-9)
    // alloc tracks share: within 1 of the exact proportional seat
    rows.foreach { case (share, alloc) =>
      assert(math.abs(alloc - share * 1e6) <= 1.0, s"($share, $alloc)")
    }
  }

  test("q167: waterfill allocations are feasible, level, and conserve " +
      "the budget") {
    val rows = q("q167_token_budget")
      .select("avail", "alloc", "capped").as[(Long, Long, Boolean)]
      .collect()
    val b = rows.map(_._1).sum / 3
    assert(rows.map(_._2).sum == b, "Σalloc must equal the budget")
    rows.foreach { case (avail, alloc, capped) =>
      assert(alloc <= avail, "allocation exceeds availability")
      if (capped) assert(alloc == avail, "capped source must take all")
    }
    // the waterline: uncapped allocations differ by at most 1, and
    // every capped availability sits at or below every uncapped alloc
    val un = rows.filter(!_._3).map(_._2)
    if (un.nonEmpty) {
      assert(un.max - un.min <= 1, s"uncapped not level: ${un.toSeq}")
      rows.filter(_._3).foreach { case (avail, _, _) =>
        assert(avail <= un.max, "capped source above the waterline")
      }
    }
  }

  test("q167 edge (ADVICE-r7): avail == lvl with a non-zero remainder " +
      "stays capped — avails {3,19}, B=7 allocates {3,4}, never {4,3}") {
    // Constructed instance hitting the exact boundary the round-7
    // formula got wrong: istar=1 has lvl = 7 DIV 2 = 3 = avail and
    // extra = 1, so the old `avail >= lvl` predicate made the 3-token
    // source uncapped and handed it lvl+1 = 4 > avail. The corrected
    // predicate (avail >= lvl+1 when extra > 0) pushes istar to the
    // 19-token source: allocs {3, 4}, Σ = B = ⌊22/3⌋ = 7.
    val dir = java.nio.file.Files
      .createTempDirectory("graft_wf_edge").toString
    Seq((1L, "a b c", "en", "s1", 5L),
        (2L, (1 to 19).map(i => s"w$i").mkString(" "), "en", "s2", 80L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Curation2.qs.find(_.name == "q167_token_budget").get
      .run(spark, dir)
      .select("source", "avail", "alloc", "capped")
      .as[(String, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(rows.toSeq == Seq(("s1", 3L, 3L, true), ("s2", 19L, 4L, false)),
      rows.toSeq.toString)
  }
}
