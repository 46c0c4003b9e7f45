package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** Kill-and-resume referee for [[LedgerStore]] (VERDICT-r12 item 1):
  * the q239/q245 ledger-merge topology, torn down mid-drain and
  * restarted against the SAME streaming checkpoint with a FRESH driver
  * (new store object, no in-memory state carried over). Pre-fix, this
  * exact sequence silently lost every pre-restart batch — the source
  * skipped committed batches while the driver-side ledger restarted
  * empty.
  */
class LedgerStoreSpec extends SparkSpec {
  import spark.implicits._

  // the q239 merge shape over a tiny deterministic event set:
  // 40 keys × 6 events, one parquet file per batch
  private val events = (0 until 240).map { i =>
    (i % 40L, i.toLong, if (i % 7 == 0) 500 else 200)
  }

  private def toLedger(df: DataFrame): DataFrame =
    df.groupBy("k").agg(
      count(lit(1)).as("n"),
      sum(when(col("status") >= 500, 1L).otherwise(0L)).as("n_err"),
      min("ts").as("first_ts"),
      max(struct(col("ts"), col("status"))).as("last"))

  private def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.union(b).groupBy("k").agg(
      sum("n").as("n"), sum("n_err").as("n_err"),
      min("first_ts").as("first_ts"), max("last").as("last"))

  private def flat(df: DataFrame): Seq[(Long, Long, Long, Long, Long)] =
    df.select(col("k"), col("n"), col("n_err"), col("first_ts"),
      col("last.ts")).as[(Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1).toSeq

  /** Drain whatever is currently in `inDir` through the ledger merge
    * with a FRESH store handle (simulating a restarted driver), with
    * an optional injected crash before the merge of one batch id.
    */
  private def drain(inDir: String, chkDir: String, storeDir: String,
      crashAtApplied: Option[Long]): Either[Throwable, DataFrame] = {
    val empty = toLedger(Seq.empty[(Long, Long, Int)]
      .toDF("k", "ts", "status"))
    val store = new LedgerStore(spark, storeDir)
    var (ledger, lastApplied) = store.recover(empty)
    val schema = Seq.empty[(Long, Long, Int)]
      .toDF("k", "ts", "status").schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(inDir)
      .writeStream
      .option("checkpointLocation", s"$chkDir/_chk")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (batchId > lastApplied) {
          if (crashAtApplied.contains(lastApplied))
            throw new RuntimeException("injected ledger drain crash")
          ledger = store.commit(merge(ledger, toLedger(batch)), batchId)
          lastApplied = batchId
        }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    try { q.awaitTermination(); Right(ledger) }
    catch { case t: org.apache.spark.sql.streaming
        .StreamingQueryException => Left(t) }
  }

  test("kill-and-resume: drain k of n batches, tear down, restart " +
      "from the SAME checkpoint with a fresh driver — final ledger " +
      "≡ the batch oracle (VERDICT-r12 item 1)") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_ledgerstore").toString
    val inDir = s"$root/in"
    val all = events.toDF("k", "ts", "status")
    val oracle = flat(toLedger(all))
    // wave 1: 3 single-file batches on disk, drained to completion
    (0 until 3).foreach { b =>
      events.slice(b * 40, b * 40 + 40).toDF("k", "ts", "status")
        .coalesce(1).write.mode("append").parquet(inDir)
    }
    val r1 = drain(inDir, root, s"$root/ledger", None)
    assert(r1.isRight)
    assert(new LedgerStore(spark, s"$root/ledger").lastApplied() == 2L)
    // DRIVER DIES. wave 2 arrives; a restarted driver (fresh store
    // object, fresh vars) resumes against the same checkpoint
    (3 until 6).foreach { b =>
      events.slice(b * 40, b * 40 + 40).toDF("k", "ts", "status")
        .coalesce(1).write.mode("append").parquet(inDir)
    }
    val r2 = drain(inDir, root, s"$root/ledger", None)
    assert(r2.isRight)
    assert(flat(r2.toOption.get) == oracle)
    // pre-fix signature this kills: wave-1 events absent (n would be
    // 3 per key, not 6)
    assert(flat(r2.toOption.get).forall(_._2 == 6L))
  }

  test("mid-drain CRASH between batches: the torn run commits a " +
      "prefix; restart re-delivers the uncommitted batch exactly " +
      "once and the drained ledger still matches the oracle") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_ledgerstore_crash").toString
    val inDir = s"$root/in"
    val all = events.toDF("k", "ts", "status")
    val oracle = flat(toLedger(all))
    (0 until 6).foreach { b =>
      events.slice(b * 40, b * 40 + 40).toDF("k", "ts", "status")
        .coalesce(1).write.mode("append").parquet(inDir)
    }
    // crash when 4 batches (ids 0-3) have committed, before batch 4
    // merges: the pointer must still say 3
    val r1 = drain(inDir, root, s"$root/ledger", crashAtApplied = Some(3L))
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8).toSeq
    assert(r1.isLeft && chain(r1.swap.toOption.get)
      .exists(c => Option(c.getMessage).exists(_.contains("injected"))))
    assert(new LedgerStore(spark, s"$root/ledger").lastApplied() == 3L)
    // restart: batches 4-5 re-deliver from the checkpoint; 0-3 are ≤
    // the recovered watermark even if the source re-offers them
    val r2 = drain(inDir, root, s"$root/ledger", None)
    assert(r2.isRight)
    assert(flat(r2.toOption.get) == oracle)
  }

  test("recover on a fresh store returns init at watermark -1; " +
      "commit GC retains only current+previous snapshots") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_ledgerstore_gc").toString
    val store = new LedgerStore(spark, root)
    val init = Seq((1L, 2L)).toDF("k", "v")
    val (rec, wm) = store.recover(init)
    assert(wm == -1L && flat0(rec) == Seq((1L, 2L)))
    (0L to 4L).foreach { b =>
      store.commit(Seq((1L, b)).toDF("k", "v"), b)
    }
    assert(store.lastApplied() == 4L)
    val dirs = java.nio.file.Files.list(java.nio.file.Paths.get(root))
    val names = try {
      import scala.jdk.CollectionConverters._
      dirs.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("ledger_v")).toSet
    } finally dirs.close()
    assert(names == Set("ledger_v3", "ledger_v4"))
    val (rec2, wm2) = new LedgerStore(spark, root).recover(init)
    assert(wm2 == 4L && flat0(rec2) == Seq((1L, 4L)))
  }

  private def flat0(df: DataFrame): Seq[(Long, Long)] =
    df.as[(Long, Long)].collect().sortBy(_._1).toSeq
}
