// Dev probe: split q281's wall into seed / NN-descent rounds / search.
package graft.tools

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

object ProbeQ281 {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.local.dir",
        graft.queries.Common.scratchRoot + "/graft_spark_local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    import graft.queries.Common
    import graft.similarity.Vectors

    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $tag%-24s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val masks: Seq[Long] = 0L +: (0 until 8).map(p => 1L << p) ++:
      (for (p <- 0 until 8; q <- p + 1 until 8) yield (1L << p) | (1L << q))
    val v = Common.table(s, d, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .withColumn("nrm", Vectors.norm(col("e")))
      .withColumn("bucket", graft.functions.LshBucket(s, col("e")))
      .repartition(col("vec_id"))
    t("v materialize")(v.count())
    val nside = v.toDF("n_id", "ne", "nn", "nbucket")
    val wSrc = Window.partitionBy("src").orderBy(col("cs").desc, col("dst"))
    def topM(sc: org.apache.spark.sql.DataFrame) =
      Common.checkpointSer(sc.withColumn("rn", row_number().over(wSrc))
        .filter(col("rn") <= 16).select("src", "dst"))
    def scorePairs(cand: org.apache.spark.sql.DataFrame) = cand
      .join(v.select(col("vec_id").as("src"), col("e").as("se"),
        col("nrm").as("sn")), "src")
      .join(nside.select(col("n_id").as("dst"), col("ne"), col("nn")),
        "dst")
      .select(col("src"), col("dst"),
        Vectors.cosinePre(Vectors.dot(col("se"), col("ne")),
          col("sn"), col("nn")).as("cs"))
    val probeArr = array(masks.map(m =>
      col("bucket").bitwiseXOR(lit(m))): _*)
    val pairs = v.select(col("vec_id"), col("e"), col("nrm"),
        explode(probeArr).as("pb"))
      .join(nside, col("pb") === col("nbucket") &&
        col("vec_id") =!= col("n_id"))
      .select(col("vec_id").as("src"), col("n_id").as("dst"),
        Vectors.cosinePre(Vectors.dot(col("e"), col("ne")),
          col("nrm"), col("nn")).as("cs"))
    println(s"[probe] seed pairs rows: " + t("seed pairs count")(pairs.count()))
    var knn = t("seed topM")(topM(pairs))
    for (r <- 1 to 2) {
      val sym = knn
        .union(knn.select(col("dst").as("src"), col("src").as("dst")))
        .distinct()
      val cand = sym.toDF("src", "mid")
        .join(sym.toDF("mid2", "dst"), col("mid") === col("mid2"))
        .select(col("src"), col("dst"))
        .filter(col("src") =!= col("dst"))
        .union(sym)
        .distinct()
      println(s"[probe] round $r cand rows: " +
        t(s"round $r cand count")(cand.count()))
      knn = t(s"round $r score+topM")(topM(scorePairs(cand)))
    }
    t("edges")(knn
      .union(knn.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().count())
    s.stop()
  }
}
