package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Minimal bridge into `private[sql]` plan-construction API (the
  * standard extension-project technique: `private[sql]` members are
  * visible from subpackages of org.apache.spark.sql). Everything else in
  * graft stays on public APIs; only DataFrame-over-custom-LogicalPlan
  * construction needs this.
  */
object Bridge {

  /** Wrap a (resolved) logical plan as a DataFrame. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Release the block-manager storage behind a `localCheckpoint()`ed
    * DataFrame. `Dataset.unpersist` only touches cacheManager entries;
    * a local checkpoint is a persisted RDD inside the plan's
    * `LogicalRDD`, whose blocks otherwise stay pinned until the RDD
    * object is GC'd — in an iterative algorithm that checkpoints per
    * round, the superseded rounds add up to O(rounds × edges) storage
    * held for the whole session.
    *
    * Deliberately matches ONLY a frame whose root plan is the
    * checkpoint (what `df.localCheckpoint()` returns) — a composite
    * frame built over checkpoints is a no-op rather than a release of
    * storage other live frames still read (checkpoints truncate
    * lineage, so a released block cannot be recomputed).
    */
  def unpersistCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
