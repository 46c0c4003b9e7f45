package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expression: distinct k-word shingle set of a document
  * in one imperative pass — text → whitespace split → k-grams joined
  * with a single space → first-occurrence-ordered distinct array.
  *
  * Semantically identical to the HOF composition in
  * [[graft.text.TextFunctions.shingleSet]]
  * (`array_distinct(transform(sequence(...), concat_ws(slice(...))))`),
  * which evaluates ~4 interpreted lambdas per shingle; this is one eval
  * per ROW (bit-equality asserted in TextSpec). Matters because the
  * shingle set feeds every candidate-gated dedup pipeline (q32, q87):
  * with the chain shared behind one exchange, shingling became the
  * dominant per-row cost.
  */
case class ShingleSetExpr(child: Expression, shingleK: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = GraftFunctions.ShinglesName

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    ExprHelpers.shingleSet(input.asInstanceOf[UTF8String], shingleK)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ExprHelpers.shingleSet($c, $shingleK);")
}
