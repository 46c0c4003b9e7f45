// Dev tool: 10× scale probe — replicates lineitem to ~6M rows and times
// the headline aggregation/join/window/dedup plans, to check the shapes
// scale linearly rather than degrading (the local stand-in for "would
// this survive 100×").
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.Common._

object ScaleProbe {
  def time(label: String)(f: => Long): Unit = {
    val t0 = System.nanoTime(); val n = f
    println(f"[scale] $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($n rows)")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = sys.env.getOrElse("SPARK_GRAFT_MULT", "10").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val li = table(spark, sfDir, "lineitem")
    val liX = li.crossJoin(spark.range(mult).select(col("id").as("rep")))
    val ord = table(spark, sfDir, "orders")
    liX.count() // warm

    time(s"q01-shape agg @${mult}x") {
      liX.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6),
          count(lit(1))).count()
    }
    time(s"q03-shape join+agg @${mult}x") {
      liX.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(dsum(col("l_extendedprice"), 6), count(lit(1))).count()
    }
    time(s"window rank @${mult}x") {
      val w = Window.partitionBy(col("l_suppkey"), col("rep"))
        .orderBy(col("l_extendedprice").desc)
      liX.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3).count()
    }
    time(s"topk heap op @${mult}x") {
      graft.plans.TopK.perGroup(
        liX.select("l_suppkey", "rep", "l_orderkey", "l_linenumber", "l_extendedprice"),
        Seq("l_suppkey", "rep"),
        Seq(("l_extendedprice", false), ("l_orderkey", true), ("l_linenumber", true)),
        3).count()
    }
    val docs = table(spark, sfDir, "documents")
    val docsX = docs.crossJoin(spark.range(mult).select(col("id").as("rep")))
      .select((col("doc_id") * mult + col("rep")).as("doc_id"), col("text"))
    time(s"minhash signatures @${mult}x") {
      // aggregate over a signature column so column pruning cannot skip
      // the computation (a bare count() would)
      graft.dedup.Dedup.signatureFrame(docsX, "doc_id", "text")
        .agg(min(col("h0")), max(col("h7"))).count()
    }
    spark.stop()
  }
}
