package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType}

/** Custom Catalyst expression: nearest-seed (squared-L2 argmin) cluster
  * assignment of a vector against a codebook array — the assignment
  * kernel of q114/q115/q120 and the probe families. The HOF composition
  * (`aggregate` over `sqDist` `zip_with` folds) is semantically
  * identical but interpreted: each seed step allocates an accumulator
  * struct and evaluates k×dim lambda closures per row, which made
  * large-k assignment wall-bound. This expression is one codegen'd
  * imperative pass (k×dim multiply-adds, zero allocation); tie-break
  * (strict `<` over the sid-sorted array) matches the HOF and the
  * oracle's ORDER BY dist, seed_id exactly — equivalence is spec'd in
  * EmbeddingsSpec and hash-checked by the q114/q115/q120 oracles.
  */
case class NearestSeedExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = GraftFunctions.NearestSeedName

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(e: Any, seeds: Any): Any =
    ExprHelpers.nearestSeed(e.asInstanceOf[ArrayData],
      seeds.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ExprHelpers.nearestSeed($a, $b);")
}

object NearestSeed {
  def apply(spark: SparkSession, e: Column, seeds: Column): Column = {
    GraftFunctions.register(spark)
    call_function(GraftFunctions.NearestSeedName, e, seeds)
  }
}
