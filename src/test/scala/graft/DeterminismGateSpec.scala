package graft

import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DecimalType, DoubleType, FloatType}

/** The cross-engine determinism gate (round-7, VERDICT item 3): no query
  * may contain an expression whose result depends on engine-specific
  * rounding of a transcendental or of a double→decimal boundary — the
  * defect class that made q148/q151 builder-green but driver-red (the
  * value flips only on particular testdata instances / DuckDB builds,
  * so the ordinary oracle run cannot catch it).
  *
  * Banned anywhere in a query plan:
  *  - transcendentals (Log/Log2/Log10/Log1p/Logarithm/Exp/Expm1/Pow):
  *    Java and libm implementations differ by 1 ulp on some inputs;
  *    ANY discretization of the result is instance-sensitive. The
  *    engine-exact replacement is [[graft.functions.FixedLog.lnLat12]].
  *  - Round/BRound on a double/float child: Spark rounds the double's
  *    shortest DECIMAL representation (BigDecimal.valueOf) while DuckDB
  *    rounds the BINARY value — they disagree exactly at representation
  *    boundaries. The safe form is floor/ceil half-away on the binary
  *    value ([[graft.similarity.Vectors.latScalar]]/latticize).
  *  - Cast(double→decimal) at any scale other than the documented
  *    Common.dsum/davg money scales (2/4/6/12 over value-lattice data):
  *    same decimal-vs-binary boundary sensitivity as round(). The
  *    money-scale whitelist is deliberate: those inputs live on a
  *    decimal VALUE lattice at least as coarse as the cast scale
  *    (integer quantities at scale 2, cent balances at scale 4+), so
  *    the cast can never land on a rounding boundary, and the pattern
  *    is the SKILL-documented aggregation idiom. Anything else must
  *    justify itself here by name.
  */
class DeterminismGateSpec extends SparkSpec {

  // query-name → reason, for the rare legitimate exception
  private val whitelist: Map[String, String] = Map.empty

  private val transcendental = Set(
    "org.apache.spark.sql.catalyst.expressions.Log",
    "org.apache.spark.sql.catalyst.expressions.Log2",
    "org.apache.spark.sql.catalyst.expressions.Log10",
    "org.apache.spark.sql.catalyst.expressions.Log1p",
    "org.apache.spark.sql.catalyst.expressions.Logarithm",
    "org.apache.spark.sql.catalyst.expressions.Exp",
    "org.apache.spark.sql.catalyst.expressions.Expm1",
    "org.apache.spark.sql.catalyst.expressions.Pow")

  private def offenders(e: Expression): Seq[String] = {
    val self = e.getClass.getName match {
      case n if transcendental.contains(n) =>
        Seq(s"transcendental ${e.getClass.getSimpleName}($e)")
      case n if n.endsWith(".Round") || n.endsWith(".BRound") =>
        e.children.headOption.map(_.dataType) match {
          case Some(DoubleType) | Some(FloatType) =>
            Seq(s"${e.getClass.getSimpleName} on double: $e")
          case _ => Nil
        }
      case _ => e match {
        case c: Cast => (c.child.dataType, c.dataType) match {
          case (DoubleType | FloatType, dt: DecimalType)
              if !Set(2, 4, 6, 12).contains(dt.scale) =>
            Seq(s"cast double→${dt.sql}: $c")
          case _ => Nil
        }
        case _ => Nil
      }
    }
    val sub = e.collect { case sq: SubqueryExpression => sq.plan }
      .flatMap(planOffenders)
    self ++ e.children.flatMap(offenders) ++ sub
  }

  private def planOffenders(plan: LogicalPlan): Seq[String] =
    plan.flatMap(node => node.expressions.flatMap(offenders))

  test("no query contains a transcendental, a round-on-double, or an " +
      "off-pattern double→decimal cast") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, _) if whitelist.contains(name) => Nil
      case (name, fn) =>
        // analysis only — the gate inspects plans, it never executes
        val plan = fn(spark, sfDir).queryExecution.analyzed
        val hits = planOffenders(plan).distinct
        if (hits.isEmpty) Nil
        else Seq(s"$name:\n  ${hits.mkString("\n  ")}")
    }
    assert(bad.isEmpty,
      s"\nboundary-sensitive expressions found (see scaladoc for the " +
        s"safe replacements):\n${bad.mkString("\n")}")
  }
}
