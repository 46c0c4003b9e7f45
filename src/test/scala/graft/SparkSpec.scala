package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM under Test/fork). */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      // local[4, 2]: 4 threads, TWO task attempts — plain local[N]
      // pins maxFailures to 1, which makes task-retry semantics
      // untestable (the QboDataSourceSpec at-least-once-fetch /
      // exactly-once-rows contract needs a real retry). Accepted
      // trade (reviewed round 9): a once-per-run transient task
      // failure in another suite now retries and passes instead of
      // failing loudly — but maxFailures > 1 is also every real
      // cluster's configuration, so suites exercise the production
      // retry regime; a bug that only fails once per run was flaky
      // under local[4] too, just differently.
      .master("local[4, 2]")
      .appName("graft-test")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sfDir = "/root/testdata/sf0.001"
}
