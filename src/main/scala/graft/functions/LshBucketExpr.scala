package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType}

/** Custom Catalyst expression: sign-pattern LSH bucket of a 64-dim
  * double vector over nPlanes LCG-derived hyperplanes — the imperative
  * twin of [[graft.similarity.Vectors.lshBucket]] (which pays ~nPlanes×64
  * interpreted lambda evals per row). Bit-identical coefficients and
  * fold order, asserted in DedupSpec/VectorsSpec.
  */
case class LshBucketExpr(child: Expression, nPlanes: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def prettyName: String = GraftFunctions.LshBucketName

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData].toDoubleArray()
    var bucket = 0L
    var p = 0
    while (p < nPlanes) {
      var acc = 0.0
      var d = 0
      while (d < 64 && d < arr.length) {
        val lcg = ((p.toLong * 64 + d) * 1103515245L + 12345L) % 2147483648L
        acc += arr(d) * (lcg.toDouble / 2147483648.0 - 0.5)
        d += 1
      }
      if (acc > 0) bucket += 1L << p
      p += 1
    }
    bucket
  }
}

object LshBucket {
  /** Registered-function accessor (see GraftFunctions.register). */
  def apply(spark: SparkSession, vec: Column): Column = {
    GraftFunctions.register(spark)
    call_function(GraftFunctions.LshBucketName, vec)
  }
}
