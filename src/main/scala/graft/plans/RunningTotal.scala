package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.LongType

/** Custom whole-operator plan: global running total (prefix sum) as a
  * first-class physical operator (SURVEY §2 preference order (c)).
  *
  * Spark's declarative encoding — `sum(w).over(Window.orderBy(k))` —
  * plans as Exchange SinglePartition + Sort: the whole input through
  * one task, the shape that dies first on a cluster. This operator
  * keeps the two-phase parallel scan entirely at InternalRow level:
  *
  *  - `requiredChildDistribution` = OrderedDistribution(key), so
  *    EnsureRequirements inserts the range exchange (or reuses the
  *    child's existing range partitioning) and the in-partition sort —
  *    the operator never hand-schedules its shuffle;
  *  - phase 1 (a bounded job inside doExecute, the zipWithIndex
  *    pattern): one (pid, total) per partition via a codegen'd
  *    projection of the weight, collected to the driver — fixed-size
  *    at any data scale;
  *  - phase 2: the SAME child RDD object re-walked with the exclusive
  *    offsets as carry, so the exchange's shuffle files are reused and
  *    each input row is shuffled exactly once.
  *
  * vs `graft.ops.PrefixSum`'s former Row-RDD implementation this skips
  * both InternalRow→Row conversions and the output re-encode: phase 2
  * appends the carry through a JoinedRow + one UnsafeProjection.
  * Per-partition totals are order-independent, so ties on the key can
  * never corrupt the carry (only the within-tie cw assignment order).
  */
case class RunningTotal(
    key: Expression,
    weight: Expression,
    cumAttr: Attribute,
    child: LogicalPlan) extends UnaryNode {
  require(weight.dataType == LongType, "running-total weight must be LONG")
  override def output: Seq[Attribute] = child.output :+ cumAttr
  // cumAttr originates HERE, not in the child — without this the
  // analyzer rejects the plan as referencing a missing attribute
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(cumAttr :: Nil)
  override protected def withNewChildInternal(newChild: LogicalPlan): RunningTotal =
    copy(child = newChild)
}

object RunningTotalStrategy extends SparkStrategy {
  import org.apache.spark.sql.catalyst.expressions.{Alias, CurrentRow, RowFrame, SpecifiedWindowFrame, UnboundedPreceding, WindowExpression, WindowSpecDefinition}
  import org.apache.spark.sql.catalyst.expressions.{EvalMode, NumericEvalContext}
  import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Sum}
  import org.apache.spark.sql.catalyst.plans.logical.Window

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case RunningTotal(k, w, a, child) =>
      RunningTotalExec(SortOrder(k, Ascending) :: Nil, w :: Nil, a :: Nil,
        planLater(child)) :: Nil

    // AUTO-ROUTE: global running sums written declaratively —
    //   sum(w).over(Window.orderBy(k...).rowsBetween(unboundedPreceding,
    //   currentRow))
    // — plan by default as Exchange SinglePartition + Sort + Window:
    // the whole input through one task. When every expression in the
    // Window node is exactly a running total over the node's own order
    // we substitute the two-phase scan (N sums ride one pass — the
    // ROC-curve shape). Guards keep the semantics identical: empty
    // partitionSpec, an explicit ROWS frame (the DEFAULT frame for an
    // ordered window is RANGE, whose tied rows all receive the
    // peer-group total — different on ties, so RANGE stays on the
    // built-in), non-nullable LONG inputs (SQL sum skips nulls and
    // yields NULL for an all-null prefix; the operator has no null
    // path), no DISTINCT, no FILTER clause. Any key count/direction is
    // fine — the operator just requires the window's own total order.
    // Overflow matches ANSI ONLY: the operator accumulates via
    // addExact (throws on overflow), so the route is pinned to
    // EvalMode.ANSI sums — a try_sum (TRY mode: NULL on overflow) or a
    // legacy-mode sum (wraps silently) would change overflow semantics
    // if routed here, so both fall back to the built-in WindowExec.
    case Window(aliases, Nil, orderSpec, child, _)
        if aliases.nonEmpty && orderSpec.nonEmpty && aliases.forall {
          case Alias(WindowExpression(
              AggregateExpression(
                Sum(weight, NumericEvalContext(EvalMode.ANSI, _)),
                _, false, None, _),
              WindowSpecDefinition(Nil, os,
                SpecifiedWindowFrame(RowFrame, UnboundedPreceding,
                  CurrentRow))), _) =>
            os == orderSpec && weight.dataType == LongType &&
              !weight.nullable
          case _ => false
        } =>
      val pairs = aliases.collect {
        case a @ Alias(WindowExpression(
            AggregateExpression(Sum(weight, _), _, _, _, _), _), _) =>
          (weight, a.toAttribute)
      }
      RunningTotalExec(orderSpec, pairs.map(_._1), pairs.map(_._2),
        planLater(child)) :: Nil

    case _ => Nil
  }
}

case class RunningTotalExec(
    sortKeys: Seq[SortOrder],
    weights: Seq[Expression],
    cumAttrs: Seq[Attribute],
    child: SparkPlan) extends UnaryExecNode {
  require(weights.nonEmpty && weights.size == cumAttrs.size)

  override def output: Seq[Attribute] = child.output ++ cumAttrs

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(cumAttrs)

  /** Totally-ordered range partitions; EnsureRequirements reuses an
    * existing RangePartitioning on the key (e.g. from an upstream
    * repartitionByRange) instead of inserting a second exchange.
    */
  override def requiredChildDistribution: Seq[Distribution] =
    OrderedDistribution(sortKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    sortKeys :: Nil

  // appending a column invalidates neither the child's partitioning
  // nor its ordering
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering

  override protected def withNewChildInternal(newChild: SparkPlan): RunningTotalExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val weightExprs = weights
    val n = weights.size
    val childRDD = child.execute()

    // Per-partition totals are order-independent, so the totals job
    // reads the exchange output BELOW the sort EnsureRequirements
    // inserted — skipping one full result-stage sort (measured 77 s →
    // 45 s at the 100x probe; the sort was being paid twice). Both
    // RDDs hang off the same ShuffleDependency (the exchange's
    // dependency — and with it the sampled range bounds — is a lazy
    // val created once), so reduce partition i is the same row set in
    // both jobs and the carry lines up.
    val totalsRDD = child match {
      case s: org.apache.spark.sql.execution.SortExec => s.child.execute()
      case _ => childRDD
    }
    val totals = totalsRDD.mapPartitionsWithIndex { (pid, it) =>
      val proj = UnsafeProjection.create(weightExprs, childOutput)
      val s = Array.fill(n)(0L)
      it.foreach { r =>
        val w = proj(r)
        var i = 0
        while (i < n) { s(i) = Math.addExact(s(i), w.getLong(i)); i += 1 }
      }
      Iterator((pid, s))
    }.collect()

    val perPid = Array.fill(childRDD.getNumPartitions)(Array.fill(n)(0L))
    totals.foreach { case (pid, s) => perPid(pid) = s }
    // exclusive per-column offsets: offsets(p)(i) = Σ_{p' < p} totals(p')(i)
    val offsets = perPid.scanLeft(Array.fill(n)(0L)) { (acc, s) =>
      Array.tabulate(n)(i => Math.addExact(acc(i), s(i)))
    }

    val outAttrs = output
    childRDD.mapPartitionsWithIndex { (pid, it) =>
      val wProj = UnsafeProjection.create(weightExprs, childOutput)
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val cumRow = new GenericInternalRow(n)
      val acc = offsets(pid).clone()
      it.map { r =>
        val w = wProj(r)
        var i = 0
        while (i < n) {
          acc(i) = Math.addExact(acc(i), w.getLong(i))
          cumRow.setLong(i, acc(i))
          i += 1
        }
        outProj(joined(r, cumRow))
      }
    }
  }
}

/** Library surface. */
object RunningTotals {

  /** Append `cumCol` = running total of `weightCol` (must be LONG —
    * cast upstream) in ascending `orderCol` order. `numParts` sizes
    * the range exchange via an explicit repartitionByRange, which the
    * operator's required distribution then accepts as-is.
    */
  def withRunningTotal(df: org.apache.spark.sql.DataFrame, orderCol: String,
      weightCol: String, cumCol: String, numParts: Int = 32)
      : org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    RunningTotals.synchronized {
      if (!spark.experimental.extraStrategies.contains(RunningTotalStrategy)) {
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ RunningTotalStrategy
      }
    }
    val parted = df.repartitionByRange(numParts,
      org.apache.spark.sql.functions.col(orderCol))
    val analyzed = parted.queryExecution.analyzed
    def attr(name: String): Attribute = {
      val matches = analyzed.output.filter(_.name == name)
      require(matches.size == 1, s"need exactly one column named $name")
      matches.head
    }
    val cumAttr = AttributeReference(cumCol, LongType, nullable = false)()
    org.apache.spark.sql.graft.Bridge.ofRows(spark,
      RunningTotal(attr(orderCol), attr(weightCol), cumAttr, analyzed))
  }
}
