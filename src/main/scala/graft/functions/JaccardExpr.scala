package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expression: Jaccard similarity of two string arrays
  * in one hash-set pass — the imperative twin of
  * `size(array_intersect)/size(array_union)` ([[graft.dedup.Dedup.jaccard]]),
  * which walks both arrays through generic array expressions per pair.
  * Counts are over distinct elements, so the ratio is bit-identical to
  * the built-in composition and the DuckDB oracle.
  */
case class JaccardExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType

  override def prettyName: String = GraftFunctions.JaccardName

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val setA = new java.util.HashSet[UTF8String](a.numElements() * 2)
    var i = 0
    while (i < a.numElements()) { setA.add(a.getUTF8String(i)); i += 1 }
    val setB = new java.util.HashSet[UTF8String](b.numElements() * 2)
    var inter = 0
    i = 0
    while (i < b.numElements()) {
      val e = b.getUTF8String(i)
      if (setB.add(e) && setA.contains(e)) inter += 1
      i += 1
    }
    val union = setA.size() + setB.size() - inter
    if (union == 0) null else inter.toDouble / union
  }
}

object Jaccard {
  def apply(spark: SparkSession, a: Column, b: Column): Column = {
    GraftFunctions.register(spark)
    call_function(GraftFunctions.JaccardName, a, b)
  }
}
