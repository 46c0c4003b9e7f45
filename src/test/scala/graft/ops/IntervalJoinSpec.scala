package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bin-overlap interval join: the rewrite must be pair-for-pair
  * identical to the naive range predicate, for every relationship of
  * bin width to interval length (≤1 bin, spanning, many-bin tails),
  * and must plan as an equi-join, not a nested loop.
  */
class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def naive(points: org.apache.spark.sql.DataFrame,
      ivs: org.apache.spark.sql.DataFrame) =
    points.join(ivs,
      points("k") === ivs("k") && col("t") >= col("s") && col("t") < col("e"))
      .select(points("k"), col("t"), col("s"), col("e"))

  test("binned == naive for every binWidth regime, including " +
    "boundary-exact timestamps") {
    // deterministic pseudo-random layout; intervals of wildly mixed
    // lengths (1 to 5000) so every explode arity occurs; points planted
    // ON start and end boundaries to pin the [start, end) semantics
    val ivs = spark.range(200)
      .select((col("id") % 7).as("k"),
        (col("id") * 37 % 10000).as("s"),
        (col("id") * 37 % 10000 + col("id") % 11 * 500 + 1).as("e"))
    val pts = spark.range(2000)
      .select((col("id") % 7).as("k"), (col("id") * 13 % 10000).as("t"))
      .union(ivs.select(col("k"), col("s").as("t"))) // on-start: inside
      .union(ivs.select(col("k"), col("e").as("t"))) // on-end: outside
    val expected = naive(pts, ivs).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sorted
    assert(expected.nonEmpty)
    for (w <- Seq(1L, 100L, 499L, 5000L, 100000L)) {
      val got = IntervalJoin.binned(pts, ivs, "t", "s", "e", Seq("k"), w)
        .select(col("k"), col("t"), col("s"), col("e")).collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sorted
      assert(got == expected, s"binWidth=$w diverged")
    }
  }

  test("plans as an equi-join on (keys, bin), never a nested loop") {
    val ivs = spark.range(50).select(col("id").as("k"),
      (col("id") * 100).as("s"), (col("id") * 100 + 250).as("e"))
    val pts = spark.range(500).select((col("id") % 50).as("k"),
      (col("id") * 17 % 5000).as("t"))
    val plan = IntervalJoin.binned(pts, ivs, "t", "s", "e", Seq("k"), 250L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
