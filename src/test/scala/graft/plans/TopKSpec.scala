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

  test("physical plan uses the heap operator, not a full sort") {
    val p = TopK.perGroup(li, Seq("l_suppkey"), orderCols, 3)
      .queryExecution.executedPlan.toString
    assert(p.contains("TopKPerGroup"), p)
    assert(!p.contains("Sort "), p) // window plan would sort every partition
  }

  test("k larger than any group degrades to identity per group") {
    val small = li.limit(100)
    val all = TopK.perGroup(small, Seq("l_suppkey"), orderCols, 1000000)
    assert(all.count() == 100)
  }
}
