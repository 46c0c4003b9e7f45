package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, InterpretedOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Custom whole-operator plan: top-k rows per group WITHOUT sorting each
  * group (SURVEY §2 preference order (c): LogicalPlan + SparkStrategy +
  * SparkPlan).
  *
  * The built-in expression of this pattern —
  * `row_number().over(partitionBy(p).orderBy(o)) <= k` — shuffles on p
  * and then SORTS every partition fully (O(n log n) per partition, full
  * spill surface) only to discard all but k rows. This operator keeps a
  * bounded k-element heap per group instead: O(n log k), no full sort,
  * state proportional to groups×k rather than partition size. At 100 TB
  * that is the difference between sorting every shuffle partition of a
  * fact table and streaming it once through fixed-size heaps.
  *
  * Same shuffle as the window plan (ClusteredDistribution on the group
  * keys) — only the post-shuffle work changes.
  */
case class TopKPerGroup(
    partitionExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(partitionExprs.nonEmpty && k > 0)
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(p, o, k, child) =>
      TopKPerGroupExec(p, o, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(
    partitionExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(partitionExprs) :: Nil

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val partExprs = partitionExprs
    val sortOrder = order
    val limit = k
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(partExprs, childOutput)
      val ord = new InterpretedOrdering(sortOrder, childOutput)
      // max-heap by rank order: head = worst row currently kept
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key = keyProj(row)
        heaps.get(key) match {
          case Some(q) =>
            if (q.size < limit) q.enqueue(row.copy())
            else if (ord.lt(row, q.head)) { q.dequeue(); q.enqueue(row.copy()) }
          case None =>
            val q = mutable.PriorityQueue.empty[InternalRow](ord)
            q.enqueue(row.copy())
            heaps.put(key.copy(), q)
        }
      }
      heaps.valuesIterator.flatMap(_.toSeq.sorted(ord))
    }
  }
}

/** Library surface for the operator. */
object TopK {

  /** Top-k rows per group: `orderCols` are (column, ascending) pairs
    * defining rank order (rank 1 = first by that order). Injects
    * [[TopKStrategy]] through the public
    * `spark.experimental.extraStrategies` hook, so it works on any
    * session.
    */
  def perGroup(df: DataFrame, partitionCols: Seq[String],
      orderCols: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    }
    val analyzed = df.queryExecution.analyzed
    def attr(name: String): Attribute =
      analyzed.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"no column $name"))
    val order = orderCols.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    org.apache.spark.sql.graft.Bridge.ofRows(spark,
      TopKPerGroup(partitionCols.map(attr), order, k, analyzed))
  }
}
