// Dev probe (round 16): phase-split timings for the optimization
// round's hot queries — candidate mass vs verify cost in the PPJoin /
// Ed-Join guaranteed-recall tiers.
// Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
//   sbt "runMain graft.tools.ProbeR16"
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProbeR16 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.local.dir",
        graft.queries.Common.scratchRoot + "/graft_spark_local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe-r16] $tag%-32s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    val docs = graft.queries.Common.table(spark, sfDir, "documents")

    // ---- q106 phase split (warm once, then timed)
    {
      import graft.dedup.Dedup
      val sized = Dedup.setSimilaritySized(docs, "doc_id", "text")
      t("q106 sized count (warm)")(sized.count())
      val n = t("q106 sized count")(sized.count())
      val cand = Dedup.setSimilarityCandidates(sized, 1, 2)
      val nc = t("q106 candidates distinct")(cand.count())
      val full = Dedup.setSimilarityPairs(docs, "doc_id", "text", 1, 2)
      val np = t("q106 full pairs")(full.count())
      println(s"[probe-r16] q106 sized=$n cand=$nc pairs=$np")
    }

    // ---- q105 phase split
    {
      import graft.dedup.Dedup
      val strs = docs.filter(length(col("text")) >= 24)
        .select(col("doc_id").as("id"),
          substring(col("text"), 1, 24).as("p"))
        .withColumn("len", length(col("p")))
      val cand = Dedup.editDistanceCandidates(strs, 2, 3)
      val nc = t("q105 candidates")(cand.count())
      val full = Dedup.editDistancePairs(
        docs.filter(length(col("text")) >= 24)
          .select(col("doc_id"), substring(col("text"), 1, 24).as("p")),
        "doc_id", "p", 2, 3)
      val np = t("q105 full pairs")(full.count())
      println(s"[probe-r16] q105 cand=$nc pairs=$np")
    }

    spark.stop()
  }
}
