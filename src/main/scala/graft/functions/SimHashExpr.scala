package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expression: 32-bit SimHash of a document in one
  * imperative pass (text → tokens → md5-hash32 per token → per-bit vote
  * → digest). Bit-identical to [[graft.dedup.Dedup.simhash32]] (the HOF
  * composition pays ~32×tokens interpreted lambda evals per row) and to
  * the DuckDB oracle; equivalence asserted in DedupSpec.
  */
case class SimHashExpr(child: Expression) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def prettyName: String = GraftFunctions.SimhashName

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].toString.split("\\s+", -1)
    val md = MessageDigest.getInstance("MD5")
    val votes = new Array[Long](32)
    var i = 0
    while (i < words.length) {
      val d = md.digest(words(i).getBytes("UTF-8"))
      md.reset()
      val h32 = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      var b = 0
      while (b < 32) {
        votes(b) += ((h32 >> b) & 1L) * 2 - 1
        b += 1
      }
      i += 1
    }
    var sim = 0L
    var b = 0
    while (b < 32) { if (votes(b) > 0) sim += 1L << b; b += 1 }
    sim
  }
}

object SimHash {
  def apply(spark: SparkSession, text: Column): Column = {
    GraftFunctions.register(spark)
    call_function(GraftFunctions.SimhashName, text)
  }
}
