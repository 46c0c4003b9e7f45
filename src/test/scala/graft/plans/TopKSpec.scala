package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class TopKSpec extends SparkSpec {

  private def li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice")

  private val orderCols = Seq(
    ("l_extendedprice", false), ("l_orderkey", true), ("l_linenumber", true))

  test("TopKPerGroup rows == window row_number rows") {
    val viaOp = TopK.perGroup(li, Seq("l_suppkey"), orderCols, 3)
      .collect().map(_.toSeq).toSet
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    val viaWindow = li.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
      .collect().map(_.toSeq).toSet
    assert(viaOp == viaWindow)
    assert(viaOp.nonEmpty)
  }

  test("physical plan uses the heap operator; the only sort is the " +
    "group-key sort over the reduced candidate set") {
    val p = TopK.perGroup(li, Seq("l_suppkey"), orderCols, 3)
      .queryExecution.executedPlan.toString
    assert(p.contains("TopKPerGroup"), p)
    // the streaming final pass requires a group-key sort ABOVE the
    // partial pass (over ≤ partitions×groups×k candidates); the INPUT
    // (below TopKPerGroupPartial) must never be sorted — that would be
    // the built-in full-sort plan we replaced
    val belowPartial = p.split("TopKPerGroupPartial").last
    assert(!belowPartial.contains("Sort "), p)
  }

  test("partial-pass state bound: passthrough beyond maxPartialGroups " +
    "keeps results exact") {
    spark.conf.set("graft.topk.maxPartialGroups", "4")
    try {
      // l_orderkey ≫ 4 distinct groups → the bound binds hard and most
      // rows take the passthrough branch
      val cols = Seq(("l_extendedprice", false), ("l_linenumber", true))
      val viaOp = TopK.perGroup(li, Seq("l_orderkey"), cols, 2)
        .collect().map(_.toSeq).toSet
      // driver-side referee (a row_number referee would itself
      // auto-route onto the heap operator)
      val referee = li.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
        .groupBy(_._2).toSeq.flatMap { case (_, rows) =>
          rows.sortBy(t => (-t._4, t._3)).take(2)
        }
        .map(t => Seq[Any](t._1, t._2, t._3, t._4)).toSet
      assert(viaOp == referee)
      assert(viaOp.nonEmpty)
    } finally spark.conf.unset("graft.topk.maxPartialGroups")
  }

  test("partial pass bounds shuffle volume to ~partitions × groups × k") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val input = li.repartition(8) // fixed map-side partition count
      val df = TopK.perGroup(input, Seq("l_suppkey"), orderCols, 3)
      df.collect()
      val plan = df.queryExecution.executedPlan
      // plan shape: partial below the exchange, final above it
      val s = plan.toString
      assert(s.contains("TopKPerGroupPartial") && s.contains("TopKPerGroupFinal"), s)
      val nGroups = input.select("l_suppkey").distinct().count()
      val bound = 8 * nGroups * 3
      val shuffled = plan.collect { case e: ShuffleExchangeExec =>
        e.metrics.collect {
          case (k, m) if k.toLowerCase.contains("records") => m.value
        }
      }.flatten
      // the top-k exchange (the one below Final) must carry at most the
      // candidate bound, far below the full input row count
      assert(shuffled.exists(v => v > 0 && v <= bound),
        s"no exchange within candidate bound $bound: $shuffled (input=${input.count()})")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("k larger than any group degrades to identity per group") {
    val small = li.limit(100)
    val all = TopK.perGroup(small, Seq("l_suppkey"), orderCols, 1000000)
    assert(all.count() == 100)
  }

  test("row_number<=k windows auto-route to the heap operator, " +
    "rank stays built-in") {
    import org.apache.spark.sql.expressions.Window
    // no explicit TopK.perGroup call: the strategy plans Spark's own
    // WindowGroupLimit (row_number flavor) as the heap pair
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
        col("l_linenumber"))
    val auto = li.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
    val p = auto.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerGroupPartial") && p.contains("TopKPerGroupFinal"), p)
    assert(!p.contains("WindowGroupLimit"), p)
    // value-level equivalence against a driver-side referee on a total
    // order (the same rows the sort-based plan must produce)
    val got = auto.select(col("l_suppkey").cast("long"),
        col("l_orderkey").cast("long"), col("l_linenumber").cast("long"),
        col("rn").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val referee = li.select(col("l_suppkey").cast("long"),
        col("l_orderkey").cast("long"), col("l_linenumber").cast("long"),
        col("l_extendedprice").cast("double"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1).toSeq.flatMap { case (supp, rows) =>
        rows.sortBy(t => (-t._4, t._2, t._3)).take(3).zipWithIndex
          .map { case (t, i) => (supp, t._2, t._3, (i + 1).toLong) }
      }.toSet
    assert(got == referee)
    // rank() can emit >k rows per group on ties — must NOT reach the heap
    val rk = li.withColumn("rk",
        rank().over(Window.partitionBy(col("l_suppkey"))
          .orderBy(col("l_extendedprice"))))
      .filter(col("rk") <= 3)
    val rp = rk.queryExecution.executedPlan.toString
    assert(!rp.contains("TopKPerGroup"), rp)
  }
}
