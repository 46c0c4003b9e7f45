package graft.text

import java.nio.file.Files

import graft.SparkSpec
import graft.queries.Pipeline

/** Hand-computed goldens for the BPE trainer (q144/q145). The DuckDB
  * oracle mirrors the same fold lambda, so a shared logic bug would
  * pass the hash gate — these expectations are derived on paper, not
  * by running either engine.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Write a planted documents table and run bpeTrain over it. */
  private def train(texts: Seq[String], rounds: Int) = {
    val dir = Files.createTempDirectory("graft-bpe").toString
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Pipeline.bpeTrain(spark, dir, rounds)
  }

  private def winnersOf(ws: Seq[org.apache.spark.sql.DataFrame]) =
    ws.map(_.collect().toSeq.map(r =>
      (r.getString(0), r.getString(1), r.getLong(2))))

  test("merge selection: count-desc then (a,b)-asc tiebreak, greedy-left apply") {
    // corpus word freqs: ab:3, ra:2  (split across docs to prove the
    // wf groupBy spans documents)
    // round 1 pairs: (a,b):3, (r,a):2          -> winner (a,b,3)
    // round 2: [ab] has no pairs; (r,a):2      -> winner (r,a,2)
    val (winners, encoded) = train(Seq("ab ab ra", "ab ra"), rounds = 2)
    assert(winnersOf(winners) ==
      Seq(Seq(("a", "b", 3L)), Seq(("r", "a", 2L))))
    val toks = encoded.collect()
      .map(r => (r.getSeq[String](1).toList, r.getLong(0))).toMap
    assert(toks == Map(List("ab") -> 3L, List("ra") -> 2L))
  }

  test("equal counts break toward the lexicographically smallest pair") {
    // ba:1, ca:1 -> pairs (b,a):1 and (c,a):1 -> (b,a) wins
    val (winners, _) = train(Seq("ba ca"), rounds = 1)
    assert(winnersOf(winners) == Seq(Seq(("b", "a", 1L))))
  }

  test("greedy-left application: aaaa + merge (a,a) becomes [aa, aa]") {
    // round 1 pairs within 'aaaa': (a,a) counted 3 times x freq 1 = 3
    val (winners, encoded) = train(Seq("aaaa"), rounds = 1)
    assert(winnersOf(winners) == Seq(Seq(("a", "a", 3L))))
    val seqs = encoded.collect().map(_.getSeq[String](1).toList).toSet
    assert(seqs == Set(List("aa", "aa")))
  }

  test("merge exhaustion stops cleanly instead of emptying the vocabulary") {
    // round 1 merges (a,b); rounds 2-3 have no pairs left -> empty
    // winner frames, and the trained sequences survive
    val (winners, encoded) = train(Seq("ab ab"), rounds = 3)
    assert(winnersOf(winners) ==
      Seq(Seq(("a", "b", 2L)), Seq(), Seq()))
    val toks = encoded.collect()
      .map(r => (r.getSeq[String](1).toList, r.getLong(0))).toMap
    assert(toks == Map(List("ab") -> 2L))
  }
}
