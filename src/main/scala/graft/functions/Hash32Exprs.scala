package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions replacing the three hottest interpreted
  * higher-order-function chains left on the r17 board (round-16's
  * standing lesson: every `transform`/`filter` lambda runs through the
  * interpreted expression evaluator PER ELEMENT — an allocation storm
  * that a memory-weaker box amplifies into the VERDICT-r16 "32-core
  * inversion" profile — while a static-call expression JITs and keeps
  * the whole stage in one codegen span).
  *
  * Each is bit-identical to the HOF composition it replaces; the
  * DuckDB oracle SQL is untouched, so the cross-engine hash checks
  * prove the equivalences on every corpus.
  */

/** Elementwise md5-prefix hash32 of a string array in one pass.
  * mode 1 = array_distinct(transform(arr, hash32)) (first-occurrence
  * order); mode 2 = array_sort(transform(arr, hash32)); mode 3 =
  * array_sort(array_distinct(transform(arr, hash32))).
  */
case class Hash32ArrayExpr(child: Expression, mode: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def prettyName: String = mode match {
    case 1 => GraftFunctions.Hash32DistinctName
    case 2 => GraftFunctions.Hash32SortedName
    case _ => GraftFunctions.Hash32SortedDistinctName
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string>, got ${other.sql}")
    }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    ExprHelpers.hash32Array(input.asInstanceOf[ArrayData], mode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ExprHelpers.hash32Array($c, $mode);")
}

/** Stopword-profile language ID (the q40/q177 heuristic) in one
  * tokenization pass — replaces 4 interpreted `filter(ws, isin(...))`
  * lambda walks + an array_max over scoring structs per document.
  */
case class LangIdExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def prettyName: String = GraftFunctions.LangIdName

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string, got ${other.sql}")
    }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    ExprHelpers.langId(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ExprHelpers.langId($c);")
}

/** Content-defined chunk digests (q202's FastCDC-style word chunker)
  * in one pass — replaces the per-word hash transform + boundary
  * filter + per-chunk slice/concat/md5 transform HOF chain.
  */
case class CdcChunksExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = GraftFunctions.CdcChunksName

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string, got ${other.sql}")
    }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    ExprHelpers.cdcChunks(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ExprHelpers.cdcChunks($c);")
}

object Hash32Arr {
  /** array_distinct(transform(arr, hash32)) — first-occurrence order. */
  def distinct(spark: SparkSession, c: Column): Column = {
    GraftFunctions.register(spark)
    call_function(GraftFunctions.Hash32DistinctName, c)
  }
  /** array_sort(transform(arr, hash32)). */
  def sorted(spark: SparkSession, c: Column): Column = {
    GraftFunctions.register(spark)
    call_function(GraftFunctions.Hash32SortedName, c)
  }
  /** array_sort(array_distinct(transform(arr, hash32))). */
  def sortedDistinct(spark: SparkSession, c: Column): Column = {
    GraftFunctions.register(spark)
    call_function(GraftFunctions.Hash32SortedDistinctName, c)
  }
}

object LangId {
  def apply(spark: SparkSession, c: Column): Column = {
    GraftFunctions.register(spark)
    call_function(GraftFunctions.LangIdName, c)
  }
}

object CdcChunks {
  def apply(spark: SparkSession, c: Column): Column = {
    GraftFunctions.register(spark)
    call_function(GraftFunctions.CdcChunksName, c)
  }
}
