package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The two-phase distributed scan must agree with a sequential
  * scanLeft for any input, including layouts with empty/skewed range
  * partitions — and must actually run multi-partition (a single-task
  * plan would pass the value check while proving nothing).
  */
class PrefixSumSpec extends SparkSpec {
  import spark.implicits._

  test("matches a sequential scanLeft across many partitions") {
    val rows = (1L to 10000L).map(i => (i, i % 97))
    val df = rows.toDF("k", "w").repartition(16) // scrambled input order
    val got = PrefixSum.withRunningTotal(df, "k", "w", "cw", numParts = 8)
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(2)))
    val want = rows.map(_._2).scanLeft(0L)(_ + _).tail
      .zip(rows.map(_._1)).map(_.swap)
    assert(got.toSeq == want)
  }

  test("runs genuinely distributed — more than one scan partition") {
    val df = (1L to 1000L).map(i => (i, 1L)).toDF("k", "w")
    val parted = df.repartitionByRange(8, col("k"))
    assert(parted.rdd.getNumPartitions > 1)
    val out = PrefixSum.withRunningTotal(df, "k", "w", "cw", numParts = 8)
    assert(out.agg(max("cw")).as[Long].head() == 1000L)
  }

  test("zero-weight rows advance nothing and duplicates of cw survive") {
    val df = Seq((1L, 5L), (2L, 0L), (3L, 0L), (4L, 7L))
      .toDF("k", "w")
    val got = PrefixSum.withRunningTotal(df, "k", "w", "cw", numParts = 4)
      .orderBy("k").collect().map(_.getLong(2)).toSeq
    assert(got == Seq(5L, 5L, 5L, 12L))
  }

  test("sweep line: ends sort before starts, so touching intervals never overlap") {
    // [0,10), [5,15), [10,20): peak concurrency 2. A tie-break that
    // applied the start at 10 before the end at 10 would report 3.
    val iv = Seq((0L, 10L), (5L, 15L), (10L, 20L)).toDF("s", "e")
    val bounds = iv.select((col("s") * 2 + 1).as("k"), lit(1L).as("delta"))
      .unionAll(iv.select((col("e") * 2).as("k"), lit(-1L).as("delta")))
    val peak = PrefixSum.withRunningTotal(bounds, "k", "delta", "cw", 4)
      .agg(max("cw")).as[Long].head()
    assert(peak == 2L)
  }

  test("auto-route: a global ROWS-frame running sum plans as RunningTotalExec") {
    import org.apache.spark.sql.expressions.Window
    val df = (1L to 500L).map(i => (i, 2L)).toDF("k", "w")
    val win = Window.orderBy("k")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = df.withColumn("cw", sum(col("w")).over(win))
    assert(cum.queryExecution.executedPlan.toString
      .contains("RunningTotal"))
    val got = cum.orderBy("k").collect().map(_.getLong(2)).toSeq
    assert(got == (1L to 500L).map(_ * 2))
  }

  test("auto-route declines RANGE frames — tied rows share the peer-group total") {
    import org.apache.spark.sql.expressions.Window
    val df = Seq((1L, 10L), (1L, 20L), (2L, 5L)).toDF("k", "w")
    // default frame for an ordered window is RANGE: both k=1 rows must
    // see 30 — the built-in path, which the strategy must leave alone
    val cum = df.withColumn("cw", sum(col("w")).over(Window.orderBy("k")))
    assert(!cum.queryExecution.executedPlan.toString
      .contains("RunningTotal"))
    assert(cum.orderBy("k", "w").collect().map(_.getLong(2)).toSeq ==
      Seq(30L, 30L, 35L))
  }

  test("auto-route declines try_sum — TRY overflow semantics (NULL) differ " +
      "from the operator's addExact throw") {
    import org.apache.spark.sql.expressions.Window
    val df = Seq((1L, 10L), (2L, 20L), (3L, 5L)).toDF("k", "w")
    val cum = df.withColumn("cw", expr("try_sum(w)").over(
      Window.orderBy("k").rowsBetween(Window.unboundedPreceding,
        Window.currentRow)))
    assert(!cum.queryExecution.executedPlan.toString
      .contains("RunningTotal"))
    assert(cum.orderBy("k").collect().map(_.getLong(2)).toSeq ==
      Seq(10L, 30L, 35L))
  }

  test("systematic stride selection picks exactly the boundary-crossing rows") {
    // masses 4,4,4,4 with stride 5: cw = 4,8,12,16; crossings at
    // 5 (row 2), 10 (row 3), 15 (row 4)
    val df = (1L to 4L).map(i => (i, 4L)).toDF("k", "w")
    val got = PrefixSum.withRunningTotal(df, "k", "w", "cw", numParts = 2)
      .filter(expr("(cw div 5) > ((cw - w) div 5)"))
      .orderBy("k").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(2L, 3L, 4L))
  }
}
