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

  test("q198 synthesis closed form holds for the first cycle ids") {
    // independent re-derivation for ids 0-4 at the unit level: doc id
    // has units (id+k)%5, k < id%40+10 — spot-check the emitted stats
    // against a plain-Scala recount
    val dir = s"/root/testdata/sf0.001"
    val got = run("q198_utf8_audit", dir)
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
