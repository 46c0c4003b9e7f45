package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

/** Distributed global prefix sum (running total) — the two-phase scan.
  *
  * A global running total is the one window shape Spark cannot express
  * scalably with the declarative API: `Window.orderBy(...)` without a
  * `partitionBy` collapses the whole frame into a single task. The
  * classic fix is the textbook parallel scan: range-partition by the
  * ordering key, compute per-partition totals (one bounded row per
  * partition), turn them into exclusive offsets on the driver, and
  * re-walk each partition carrying its offset. Phase 2 is genuine
  * per-partition imperative state with a cross-partition carry — the
  * documented case where `mapPartitions` beats any Expression/Window
  * encoding (the declarative alternative,
  * `Window.partitionBy(spark_partition_id())`, pays a second
  * corpus-sized shuffle to re-group rows that are already grouped).
  *
  * Both passes run over the SAME materialized RDD — the zipWithIndex
  * pattern. One RDD object means one range partitioner (bounds sampled
  * once), and the totals job's shuffle files are reused by the output
  * job (its map stages are skipped), so each input row is shuffled
  * exactly once and nothing corpus-sized is cached. A prior cut
  * pinned the layout with `localCheckpoint` instead: correct, but
  * materializing the frame as stored rows measured 157 s at the 100x
  * probe vs ~40 s for shuffle-file reuse.
  */
object PrefixSum {

  /** Append `cumCol` = running total of `weightCol` in ascending
    * `orderCol` order. `weightCol` must be LONG (cast upstream). Rows
    * tied on `orderCol` get an arbitrary relative order (shuffle
    * arrival); their within-tie cw values can vary between runs, so
    * use a unique key for reproducible output. Per-partition totals
    * are order-independent, so ties never corrupt the carry.
    */
  def withRunningTotal(df: DataFrame, orderCol: String, weightCol: String,
      cumCol: String, numParts: Int = 32): DataFrame = {
    val wIdx = df.schema.fieldIndex(weightCol)
    val parted = df
      .repartitionByRange(numParts, col(orderCol))
      .sortWithinPartitions(orderCol)
      .rdd // evaluated once; both jobs below share lineage + shuffle

    // pass 1: one (pid, total) per partition — a bounded driver
    // artifact at any data scale
    val totals = parted.mapPartitionsWithIndex { (pid, it) =>
      var s = 0L
      it.foreach(r => s += r.getLong(wIdx))
      Iterator((pid, s))
    }.collect()

    val perPid = Array.fill(parted.getNumPartitions)(0L)
    totals.foreach { case (pid, s) => perPid(pid) = s }
    // exclusive scan: offsets(p) = sum of totals of partitions < p
    val offsets = perPid.scanLeft(0L)(_ + _)

    // pass 2: map stage skipped (shuffle reuse); only the in-partition
    // sort re-runs, in parallel, with the carry folded in
    val out = parted.mapPartitionsWithIndex { (pid, it) =>
      var acc = offsets(pid)
      it.map { r => acc += r.getLong(wIdx); Row.fromSeq(r.toSeq :+ acc) }
    }
    val outSchema = StructType(df.schema.fields :+
      org.apache.spark.sql.types.StructField(cumCol, LongType,
        nullable = false))
    df.sparkSession.createDataFrame(out, outSchema)
  }
}
