package graft.ops

import org.apache.spark.sql.DataFrame

/** Distributed global prefix sum (running total) — the two-phase scan.
  *
  * A global running total is the one window shape Spark cannot express
  * scalably with the declarative API: `Window.orderBy(...)` without a
  * `partitionBy` collapses the whole frame into a single task. The
  * implementation lives in [[graft.plans.RunningTotal]], a custom
  * physical operator running the textbook parallel scan (per-partition
  * totals → exclusive offsets → in-partition carry) at InternalRow
  * level; this object is the stable library entry point. Two earlier
  * cuts are documented there with measurements: a localCheckpoint'd
  * Row-RDD (157 s at the 100x probe — corpus-sized caching) and a
  * shared Row-RDD with shuffle reuse (80 s — double Row conversion);
  * the operator removes both costs.
  */
object PrefixSum {

  /** Append `cumCol` = running total of `weightCol` in ascending
    * `orderCol` order. `weightCol` must be LONG (cast upstream); rows
    * tied on `orderCol` get an arbitrary relative order within their
    * tie, so use a unique key for reproducible output.
    */
  def withRunningTotal(df: DataFrame, orderCol: String, weightCol: String,
      cumCol: String, numParts: Int = 32): DataFrame =
    graft.plans.RunningTotals.withRunningTotal(
      df, orderCol, weightCol, cumCol, numParts)
}
