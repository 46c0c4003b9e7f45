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
}
