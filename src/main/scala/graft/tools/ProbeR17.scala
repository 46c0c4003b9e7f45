// Dev probe (round 17): split the remaining drain walls — q134
// stream-stream join, q257 decision frontier, q126 incremental
// clusters — into staging / drain / per-batch phases, printing each
// micro-batch's durationMs breakdown from StreamingQueryProgress.
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProbeR17 {
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
    import graft.queries.Common
    import Common.scratchDir

    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $tag%-30s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    val which = if (args.isEmpty) Seq("q134") else args.toSeq

    if (which.contains("q134")) {
      // warm-up + timed whole query, bench-identical
      t("whole q134 (warm-up)") {
        graft.SparkEntry.queries("q134_stream_stream_join")(s, d).count()
      }
      t("whole q134 (timed)") {
        graft.SparkEntry.queries("q134_stream_stream_join")(s, d).count()
      }
      // phase split: replicate the body with progress capture
      val ev = Common.events(s, d)
      val err = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("err_id"), col("user_id"),
          col("ts").as("err_ts"))
      val clk = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("clk_ts"))
      val errDir = scratchDir("p134_err", d)
      val clkDir = scratchDir("p134_clk", d)
      t("stage err+clk writes") {
        err.repartitionByRange(2, col("err_id"))
          .write.mode("overwrite").parquet(errDir)
        clk.repartitionByRange(2, col("c_user"))
          .write.mode("overwrite").parquet(clkDir)
      }
      val errS = s.readStream.schema(err.schema)
        .option("maxFilesPerTrigger", "1").parquet(errDir)
        .withWatermark("err_ts", "31 days")
      val clkS = s.readStream.schema(clk.schema)
        .option("maxFilesPerTrigger", "1").parquet(clkDir)
        .withWatermark("clk_ts", "31 days")
      val joined = errS.join(clkS,
        col("user_id") === col("c_user") &&
          expr("clk_ts >= err_ts") &&
          expr("clk_ts < err_ts + INTERVAL 30 MINUTES"))
        .select(col("err_id"), col("user_id"), col("clk_ts"))
      val outDir = scratchDir("p134_out", d)
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try {
        val q = t("drain") {
          val q = joined.writeStream.format("parquet")
            .option("path", s"$outDir/data")
            .option("checkpointLocation", s"$outDir/_chk")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
          q
        }
        for (p <- q.recentProgress) {
          println(s"[probe] batch ${p.batchId} rows=${p.numInputRows} " +
            s"durations=${p.durationMs}")
          for ((k, v) <- p.stateOperators.zipWithIndex)
            println(s"[probe]   stateOp $v commit=${k.commitTimeMs} ms " +
              s"rowsTotal=${k.numRowsTotal} updated=${k.numRowsUpdated}")
        }
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
      t("post rollup") {
        val matched = s.read.schema(joined.schema).parquet(s"$outDir/data")
        val counts = matched.groupBy(col("err_id"))
          .agg(count(lit(1)).as("n_clicks"))
        err.join(counts, Seq("err_id"), "left")
          .select(col("err_id"), col("user_id"),
            coalesce(col("n_clicks"), lit(0L)).as("n_clicks"))
          .orderBy("err_id").count()
      }
    }

    if (which.contains("q126")) {
      t("whole q126 (warm-up)") {
        graft.SparkEntry.queries(
          "q126_stream_incremental_clusters")(s, d).count()
      }
      t("whole q126 (timed)") {
        graft.SparkEntry.queries(
          "q126_stream_incremental_clusters")(s, d).count()
      }
      // phase split: replicate the body with per-phase walls
      import org.apache.spark.sql.DataFrame
      import org.apache.spark.sql.streaming.Trigger
      val raw = s.read.parquet(s"$d/documents.parquet")
      def bandsOf(df: DataFrame): DataFrame =
        df.select(col("doc_id"), posexplode(
          graft.functions.GraftFunctions.minhashBands(s,
            graft.functions.GraftFunctions.shingles(s, col("text")))))
          .toDF("doc_id", "bi", "bv")
      def pairsBetween(l: DataFrame, r: DataFrame): DataFrame =
        l.toDF("l_id", "bi", "bv")
          .join(r.toDF("r_id", "bi", "bv"), Seq("bi", "bv"))
          .filter(col("l_id") =!= col("r_id"))
          .select(least(col("l_id"), col("r_id")).as("a_id"),
            greatest(col("l_id"), col("r_id")).as("b_id"))
          .distinct()
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try {
        var index = t("day0 bands+checkpoint") {
          bandsOf(raw.filter(col("doc_id") % 10 =!= 0)).localCheckpoint()
        }
        var forest = t("day0 dupClusters") {
          graft.dedup.Dedup.dupClusters(
            pairsBetween(index, index)).localCheckpoint()
        }
        val inDir = scratchDir("p126_in", d)
        t("stage eval write") {
          raw.filter(col("doc_id") % 10 === 0).select("doc_id", "text")
            .repartitionByRange(2, col("doc_id"))
            .write.mode("overwrite").parquet(inDir)
        }
        val outDir = scratchDir("p126_chk", d)
        val q = s.readStream.schema(raw.select("doc_id", "text").schema)
          .option("maxFilesPerTrigger", "1").parquet(inDir)
          .writeStream
          .option("checkpointLocation", s"$outDir/_chk")
          .foreachBatch { (batch: DataFrame, bid: Long) =>
            t(s"batch $bid bands") {
              val bb = bandsOf(batch).localCheckpoint()
              val newPairs = t(s"batch $bid pairs") {
                pairsBetween(bb, index).union(pairsBetween(bb, bb))
                  .distinct()
              }
              forest = t(s"batch $bid incrementalClusters") {
                graft.dedup.Dedup.incrementalClusters(forest, newPairs)
                  .localCheckpoint()
              }
              index = t(s"batch $bid index union") {
                index.union(bb).localCheckpoint()
              }
            }
          }
          .trigger(Trigger.AvailableNow())
          .start()
        t("drain total") { q.awaitTermination() }
        t("final orderBy count") { forest.orderBy("doc_id").count() }
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
    }

    if (which.contains("tail")) {
      // fixed-cost anatomy of the sub-second tail: split DataFrame
      // CONSTRUCTION (read.parquet schema inference + plan build) from
      // the ACTION for a few representative small queries
      val names = Seq("q25_top_events", "q13_between", "q100_mix_report")
        .map(p => graft.SparkEntry.queries.keys.toSeq.sorted
          .find(_.startsWith(p.split('_').head + "_")).get)
      // session warm-up
      graft.SparkEntry.queries(names.head)(s, d).count()
      for (qn <- names; rep <- 1 to 3) {
        val fn = graft.SparkEntry.queries(qn)
        val t0 = System.nanoTime()
        val df = fn(s, d)
        val t1 = System.nanoTime()
        df.count()
        val t2 = System.nanoTime()
        println(f"[probe] $qn%-28s rep$rep construct=${(t1 - t0) / 1e9}%6.3f" +
          f" action=${(t2 - t1) / 1e9}%6.3f s")
      }
    }

    if (which.contains("q257")) {
      t("whole q257 (warm-up)") {
        graft.SparkEntry.queries(
          "q257_stream_decision_frontier")(s, d).count()
      }
      t("whole q257 (timed)") {
        graft.SparkEntry.queries(
          "q257_stream_decision_frontier")(s, d).count()
      }
    }
    s.stop()
  }
}
