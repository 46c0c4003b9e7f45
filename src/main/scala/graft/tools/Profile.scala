// Dev tool: stage-by-stage timing of the minhash-LSH pipeline.
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.queries.Common

object Profile {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Common.table(spark, sfDir, "documents")
    time("warmup")(docs.count())
    val sh = Dedup.withShingles(docs, "doc_id", "text")
    time("shingles")(sh.count())
    val sig = Dedup.withMinhashSignature(sh, "sh", 8)
    time("signature")(sig.count())
    time("signature again")(sig.count())
    val sigR = sig.repartition(col("doc_id"))
    val bands = sigR.select(col("doc_id"),
      posexplode(array(Dedup.bandValues((0 until 8).map(j => col(s"h$j"))): _*)))
      .toDF("doc_id", "bi", "bv")
    time("bands (barrier)")(bands.count())
    time("bands again")(bands.count())
    val joined = bands.as("a").join(bands.as("b"),
      col("a.bi") === col("b.bi") && col("a.bv") === col("b.bv") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
    time("join (barrier)")(joined.count())
    time("join+distinct")(joined.distinct().count())
    time("full q34")(graft.SparkEntry.queries("q34_minhash_lsh_pairs")(spark, sfDir).count())
    time("full q34 again")(graft.SparkEntry.queries("q34_minhash_lsh_pairs")(spark, sfDir).count())
    spark.stop()
  }
}
