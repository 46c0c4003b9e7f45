// Dev tool (r17): the CDC chunk frame (q202) and the multiscale
// window generator (q271) are checkpoint- or explode-terminated inside
// their queries, so the final `explain` hides their operator shapes.
// This prints the builder subtrees as the plan evidence for plans/r17/
// — run it in BOTH the r16 baseline tree (HOF/flatMap shapes) and at
// HEAD (expression shapes); results are oracle-refereed identical.
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ExplainSubplansR17 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.queries.Common.table(spark, sfDir, "documents")

    println("===== qsub_cdc_chunk_frame =====")
    graft.queries.Curation4.cdcChunkFrame(docs).explain("formatted")

    println("===== qsub_multiscale_wins =====")
    // the q271 generator subtree exactly as the query builds it
    val t = docs
      .select(col("doc_id"), split(col("text"), "\\s+").as("ws"))
      .filter(size(col("ws")) >= 8)
    t.select(col("doc_id"), explode(
        graft.functions.MultiscaleWindows(spark, col("ws"))).as("w"))
      .select(col("doc_id"), col("w.tier").as("tier"),
        col("w.i").as("i"), col("w.wh").as("wh"))
      .explain("formatted")

    spark.stop()
  }
}
