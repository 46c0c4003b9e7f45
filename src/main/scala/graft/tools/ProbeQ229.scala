// Dev probe: split q229's wall into (a) rules dim build, (b) stream
// drain with per-batch durations, (c) post-drain rollup.
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProbeQ229 {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.local.dir",
        graft.queries.Common.scratchRoot + "/graft_spark_local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    import s.implicits._
    import graft.queries.{Common, Crawl}
    import graft.text.Urls

    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $tag%-26s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    // warm-up whole query once (JIT) like Bench
    t("whole q229 (warm-up)") {
      graft.SparkEntry.queries("q229_stream_frontier")(s, d).count()
    }
    t("whole q229 (timed)") {
      graft.SparkEntry.queries("q229_stream_frontier")(s, d).count()
    }

    val docs = graft.queries.Common.table(s, d, "documents")
    val schema = docs.schema
    val rules = t("hostRobots+checkpoint") {
      Crawl.hostRobots(s, docs).localCheckpoint()
    }
    s.conf.set("spark.sql.shuffle.partitions",
      sys.env.getOrElse("PROBE_SHUF", "8"))
    val scratch = Common.scratchDir("probe229", d)
    val q = t("stream build+start") {
      val pages = s.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet").parquet(d)
        .select(col("doc_id")).as[Long]
        .flatMap { id =>
          val g = id % 97
          val raws = (0 until (id % 3 + 1).toInt).flatMap(j => Seq(
            s"HTTP://EX$g.TEST:80/p$id/$j?x=1#frag",
            s"http://ex$g.test./p$id/./$j?x=1")) :+
            s"http://ex$g.test/private/$id"
          raws.flatMap { raw =>
            Urls.canonicalize(raw).flatMap { cu =>
              Urls.parse(cu).map { parts =>
                (parts.host, cu,
                  parts.path + parts.query.map("?" + _).getOrElse(""))
              }
            }
          }
        }
        .toDF("host", "url", "path_q")
      val urls = Crawl.robotsGate(s, pages, rules)
        .withColumn("ts", timestamp_seconds(lit(1700000000L)))
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark("url")
      urls.writeStream
        .format("parquet")
        .option("path", s"$scratch/data")
        .option("checkpointLocation", s"$scratch/chk")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
    }
    t("awaitTermination") { q.awaitTermination() }
    q.recentProgress.foreach { p =>
      println(s"[probe] batch ${p.batchId}: " +
        s"durationMs=${p.durationMs} rows=${p.numInputRows} " +
        s"stateRows=${Option(p.stateOperators).map(_.toSeq.map(o =>
          (o.numRowsTotal, o.commitTimeMs)).mkString(",")).getOrElse("")}")
    }
    t("rollup") {
      s.read.parquet(s"$scratch/data")
        .groupBy("host", "delay_s")
        .agg(count(lit(1)).as("n_urls")).count()
    }
    s.stop()
  }
}
