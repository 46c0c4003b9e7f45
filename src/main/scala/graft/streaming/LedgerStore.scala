package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Restart-safe persistence for foreachBatch ledger merges (T162,
  * VERDICT-r12 item 1 — de-weaking the q239/q245 topologies).
  *
  * The hole this closes: a foreachBatch merge whose accumulated state
  * lives in driver memory (a `var` of localCheckpoint'd frames plus an
  * in-memory applied-batch set) is exactly-once only within ONE run.
  * The streaming CHECKPOINT outlives the driver — on
  * restart-from-checkpoint the source skips every committed batch
  * while the driver-side ledger restarts empty, so the
  * drained-≡-batch guarantee silently inverts into guaranteed data
  * loss. A 100 TB drain restarts as a matter of course; the state must
  * therefore live in storage with the same lifetime as the checkpoint.
  *
  * The mechanism (the q187 standing-index discipline applied to
  * foreachBatch state): after batch `b` merges, the WHOLE ledger is
  * written as a versioned parquet snapshot `ledger_v{b}`, then a
  * one-line `_POINTER` file naming `b` is advanced by an ATOMIC rename
  * — so a crash between the two leaves the pointer at `b−1` and the
  * retried batch simply re-merges onto the recovered `b−1` state
  * (parquet overwrite makes the retried snapshot write idempotent).
  * Recovery reads the pointer, reloads that snapshot, and resumes:
  * the foreachBatch guard becomes `batchId > lastApplied`, which
  * subsumes BOTH the same-run retry guard (a re-delivered committed
  * batch is ≤ the pointer) and cross-restart recovery (batches the
  * checkpoint replays after a crash land exactly once).
  *
  * Scale shape: the ledger is a keyed table bounded by KEYS (URLs),
  * never by fetch history, so each snapshot write is one
  * keys-sized parquet job per micro-batch — the same cost class as
  * the q187 bucketed standing-index rewrite, and the price of
  * restart-safety. Superseded snapshots are garbage-collected
  * (the current and previous versions are retained; older ones are
  * provably unreferenced once the pointer has advanced past them).
  * On a real cluster `dir` is object-store/HDFS; the pointer rename is
  * atomic on HDFS and local file systems, and maps to a
  * conditional/versioned put on object stores — the one
  * deployment-specific seam, isolated here.
  */
final class LedgerStore(spark: SparkSession, dir: String) {

  private val base = java.nio.file.Paths.get(dir)
  java.nio.file.Files.createDirectories(base)
  private val pointer = base.resolve("_POINTER")

  private def verDir(id: Long): String = s"$dir/ledger_v$id"

  /** The last batch id whose merge was durably committed, or -1 when
    * the store is fresh.
    */
  def lastApplied(): Long =
    if (java.nio.file.Files.exists(pointer))
      new String(java.nio.file.Files.readAllBytes(pointer),
        "UTF-8").trim.toLong
    else -1L

  /** Recover the (ledger, lastApplied) pair a restarted drain resumes
    * from: the pointed-at snapshot, or `init` for a fresh store.
    */
  def recover(init: DataFrame): (DataFrame, Long) = {
    val id = lastApplied()
    if (id >= 0L) (spark.read.parquet(verDir(id)), id) else (init, -1L)
  }

  /** Durably commit `ledger` as the post-`batchId` state: snapshot
    * write (idempotent overwrite — a retry after a torn commit
    * rewrites the same version), atomic pointer advance, then GC of
    * snapshots older than the previous version. Returns the ledger
    * RE-READ from the snapshot, so the caller's running frame has
    * bounded lineage and is provably the recovered-on-restart state.
    */
  def commit(ledger: DataFrame, batchId: Long): DataFrame = {
    val out = verDir(batchId)
    ledger.write.mode("overwrite").parquet(out)
    val tmp = base.resolve(s"_POINTER.tmp$batchId")
    java.nio.file.Files.write(tmp,
      batchId.toString.getBytes("UTF-8"))
    java.nio.file.Files.move(tmp, pointer,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    // retain current + previous; anything older is unreferenced now
    // that the pointer names batchId
    val keep = Set(s"ledger_v$batchId")
    val ls = java.nio.file.Files.list(base)
    try {
      ls.forEach { p =>
        val name = p.getFileName.toString
        if (name.startsWith("ledger_v") && !keep.contains(name) &&
            name.stripPrefix("ledger_v").forall(_.isDigit) &&
            name.stripPrefix("ledger_v").toLong < batchId - 1) {
          val walk = java.nio.file.Files.walk(p)
          try walk.sorted(java.util.Comparator.reverseOrder())
            .forEach(q => java.nio.file.Files.deleteIfExists(q))
          finally walk.close()
        }
      }
    } finally ls.close()
    spark.read.parquet(out)
  }
}
