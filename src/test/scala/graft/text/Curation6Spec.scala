package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** T190 exact duplicated-substring referee. The headline test is
  * VERDICT-r14 item 6's done-criterion verbatim: a planted 100-token
  * duplicate must report longest_dup EXACTLY 100 (q271's 64-tier
  * covers ~100 positions but quantizes the MATCH LENGTH); plus a
  * brute-force O(n²) token-level referee over the real sf corpus.
  */
class Curation6Spec extends SparkSpec {
  import spark.implicits._

  private def run(dir: String) =
    graft.queries.Curation6.qs.head.run(spark, dir)

  private def toks(prefix: String, n: Int): Seq[String] =
    (0 until n).map(i => s"$prefix$i")

  test("planted duplicates resolve at their EXACT lengths: 100 " +
      "reads 100, 23 reads 23, 150 saturates at the 128 cap") {
    val dir = java.nio.file.Files.createTempDirectory("graft-xd").toString
    val dup100 = toks("d", 100)
    val dup23 = toks("t", 23)
    val dup150 = toks("s", 150)
    Seq(
      (1L, (toks("a", 7) ++ dup100 ++ toks("b", 5)).mkString(" ")),
      (2L, (toks("c", 11) ++ dup100 ++ toks("e", 3)).mkString(" ")),
      (3L, (toks("f", 9) ++ dup23 ++ toks("g", 8)).mkString(" ")),
      (4L, (toks("h", 4) ++ dup23 ++ toks("k", 13)).mkString(" ")),
      (5L, (dup150 ++ toks("m", 6)).mkString(" ")),
      (6L, (toks("n", 2) ++ dup150).mkString(" ")),
      (7L, toks("solo", 60).mkString(" "))
    ).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = run(dir)
      .as[(Long, Long, Long, Int, Long)].collect()
      .map(r => r._1 -> r).toMap
    // (doc_id, n_tokens, longest_dup, saturated, n_pos_ge16)
    assert(got(1L)._3 == 100L && got(1L)._4 == 0, got(1L))
    assert(got(2L)._3 == 100L && got(2L)._4 == 0, got(2L))
    assert(got(3L)._3 == 23L && got(3L)._4 == 0, got(3L))
    assert(got(4L)._3 == 23L && got(4L)._4 == 0, got(4L))
    assert(got(5L)._3 == 128L && got(5L)._4 == 1, got(5L))
    assert(got(6L)._3 == 128L && got(6L)._4 == 1, got(6L))
    assert(got(7L)._3 == 0L && got(7L)._5 == 0L, got(7L))
    // positions with a ≥16-token match: every start of the planted
    // run up to its last 16 tokens, i.e. len-15 positions
    assert(got(1L)._5 == 85L, got(1L))
    assert(got(3L)._5 == 8L, got(3L))
  }

  test("brute-force referee on the real corpus: per-doc longest " +
      "duplicated substring matches exact O(n²) token comparison " +
      "(capped at 128)") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), split(col("text"), "\\s+").as("ws"))
      .filter(size(col("ws")) >= 1)
      .as[(Long, Seq[String])].collect().sortBy(_._1)
    // brute force: for every position pair across the whole corpus,
    // extend while tokens match; cap at 128 (the operator's declared
    // saturation). O(total²·L) — fine at spec scale.
    val flat = docs.flatMap { case (id, ws) =>
      ws.zipWithIndex.map { case (w, i) => (id, i, ws) } }
    val byTok = flat.groupBy { case (id, i, ws) => ws(i) }
    val best = scala.collection.mutable.Map.empty[Long, Int]
    docs.foreach { case (id, _) => best(id) = 0 }
    for ((_, group) <- byTok if group.length >= 2) {
      for (a <- group.indices; b <- (a + 1) until group.length) {
        val (id1, i1, ws1) = group(a)
        val (id2, i2, ws2) = group(b)
        if (id1 != id2 || i1 != i2) {
          var l = 0
          while (l < 128 && i1 + l < ws1.length && i2 + l < ws2.length &&
              ws1(i1 + l) == ws2(i2 + l)) l += 1
          if (l > best(id1)) best(id1) = l
          if (l > best(id2)) best(id2) = l
        }
      }
    }
    val expected = best.toSeq
      .map { case (id, l) => (id, math.min(l, 128)) }
    val gotAll = run(sfDir)
      .as[(Long, Long, Long, Int, Long)].collect()
      .map(r => r._1 -> r._3).toMap
    // the query reports the TOP-100 docs by longest_dup — referee the
    // docs it reports, and that its cut matches the brute-force order
    val top = expected.sortBy { case (id, l) => (-l, id) }.take(100)
    for ((id, l) <- top)
      assert(gotAll.getOrElse(id, -1L) == l.toLong,
        s"doc $id: bruteforce $l vs operator ${gotAll.get(id)}")
  }
}
