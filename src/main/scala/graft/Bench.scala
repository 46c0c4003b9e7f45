package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every declared query at
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Each query gets one untimed warm-up execution (JIT + parquet footer
  * cache — otherwise whichever query runs first absorbs ~6 s of JVM
  * warm-up and the numbers measure iteration order, not plans) and one
  * timed run. Queries run in name order.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // NOTE: forcing small file splits (spark.sql.files.maxPartitionBytes
      // = 2m) to parallelize the single ~20 MB-per-table scans was
      // measured SLOWER here (23.4s vs 19.5s total): per-split scheduling
      // and footer overhead beats scan parallelism at this scale. The
      // default split size stays; on a real cluster the same knob is
      // sized to executor memory, not to core count.
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val names = SparkEntry.queries.keys.toSeq.sorted
    val results = names.map { name =>
      val fn = SparkEntry.queries(name)
      def run(): Unit = fn(spark, sfDir).count()
      try {
        run() // warm-up: JIT, codegen cache, file index
        val t0 = System.nanoTime()
        run()
        name -> (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          // loud failure: a crashed query must read as a regression, not
          // as a faster total
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          name -> -1.0
      }
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":[${failed.mkString(",")}],"sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
