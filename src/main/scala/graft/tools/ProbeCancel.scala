// Dev probe: does job cancellation actually reach AQE-submitted shuffle
// stages, does count() unblock, and do the killed codegen tasks die?
// (Round-16 StallGuard diagnostics.)
package graft.tools

import org.apache.spark.sql.functions.col

object ProbeCancel {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sc = spark.sparkContext
    sc.setJobGroup("g1", "slow", interruptOnCancel = true)
    val t = new Thread(() => {
      Thread.sleep(3000)
      println(s"[probe] active jobs: ${sc.statusTracker.getActiveJobIds.toSeq}")
      println("[probe] cancelJobGroup(g1)")
      sc.cancelJobGroup("g1")
      Thread.sleep(4000)
      println(s"[probe] after group-cancel, active jobs: ${sc.statusTracker.getActiveJobIds.toSeq}")
      println("[probe] cancelAllJobs()")
      sc.cancelAllJobs()
    })
    t.setDaemon(true)
    t.start()
    val t0 = System.nanoTime()
    try {
      spark.range(Long.MaxValue >> 2).filter(col("id") % 7 =!= 3).count()
      println("[probe] count returned?!")
    } catch {
      case e: Throwable =>
        println(f"[probe] count threw after ${(System.nanoTime() - t0) / 1e9}%.1f s: ${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).take(120)}")
    }
    Thread.sleep(3000)
    val mx = java.lang.management.ManagementFactory.getThreadMXBean
    val burning = mx.dumpAllThreads(false, false).count(ti =>
      ti.getThreadName.startsWith("Executor task launch") &&
        ti.getStackTrace.exists(_.toString.contains("GeneratedIterator")))
    println(s"[probe] codegen task threads still burning: $burning")
    spark.stop()
  }
}
