package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The crawl-frontier scalars as SQL session functions (round 11,
  * VERDICT-r10 item 8): q138/q188 proved the SQL-text discipline for
  * the dedup tiers; these let `spark.sql` users compose the FRONTIER
  * too — `graft_canonical_url` (T120), `graft_registrable_domain`
  * (T130), `graft_robots_allowed` (T121). Codegen'd like every graft
  * expression (the generated code is one static call, so the pass
  * stays inside WholeStageCodegen); eval bodies live in the
  * [[graft.text.Urls]]/[[graft.text.PublicSuffix]]/[[graft.text.Robots]]
  * modules the Scala API uses, so SQL and Scala users get the same
  * semantics by construction.
  *
  * Declared trade (the q188 pattern): `graft_robots_allowed` parses
  * its robots.txt argument per ROW. The production frontier parses
  * once per HOST into the rules dimension (`Crawl.hostRobots`) and
  * broadcast-joins the verdict; the SQL scalar is the composable
  * per-row form for ad-hoc analysis, not the 100 TB plan.
  */
private[functions] trait StringArgsCheck { self: Expression =>
  def prettyName: String
  protected def strArgs: Seq[Expression]
  def checkStringInputs(): TypeCheckResult =
    strArgs.find(_.dataType != StringType) match {
      case Some(bad) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string arguments, got ${bad.dataType.sql}")
      case None => TypeCheckResult.TypeCheckSuccess
    }
}

/** `graft_canonical_url(url)` → the T120 canonical form, or NULL for
  * non-hierarchical / malformed URLs (mailto:, data:, bad ports).
  */
case class CanonicalUrlExpr(child: Expression) extends UnaryExpression
    with StringArgsCheck {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override protected def strArgs: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult = checkStringInputs()
  override def prettyName: String = GraftFunctions.CanonicalUrlName

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    ExprHelpers.canonicalUrl(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.ExprHelpers.canonicalUrl($c);
      ${ev.isNull} = ${ev.value} == null;""")
}

/** `graft_registrable_domain(host)` → the T130 eTLD+1, or NULL for
  * IP literals, single labels, and hosts that ARE a public suffix.
  */
case class RegistrableDomainExpr(child: Expression)
    extends UnaryExpression with StringArgsCheck {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override protected def strArgs: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult = checkStringInputs()
  override def prettyName: String = GraftFunctions.RegistrableDomainName

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    ExprHelpers.registrableDomain(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.ExprHelpers.registrableDomain($c);
      ${ev.isNull} = ${ev.value} == null;""")
}

/** `graft_robots_allowed(robots_txt, agent, path_and_query)` → the
  * T121 verdict (RFC 9309 agent selection + longest-match-wins).
  */
case class RobotsAllowedExpr(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression with StringArgsCheck {

  override def dataType: DataType = BooleanType
  override protected def strArgs: Seq[Expression] =
    Seq(first, second, third)
  override def checkInputDataTypes(): TypeCheckResult = checkStringInputs()
  override def prettyName: String = GraftFunctions.RobotsAllowedName

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def nullSafeEval(robots: Any, agent: Any, path: Any): Any =
    ExprHelpers.robotsAllowed(robots.asInstanceOf[UTF8String],
      agent.asInstanceOf[UTF8String], path.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, (r, a, p) =>
      s"${ev.value} = graft.functions.ExprHelpers.robotsAllowed($r, $a, $p);")
}
