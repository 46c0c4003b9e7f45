package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

import graft.ops.Hashing

/** Custom Catalyst expression: full MinHash signature of a document in
  * one imperative pass — text → word shingles → md5-derived hash32 →
  * n affine minima → array<long>.
  *
  * Why an expression and not the higher-order-function composition in
  * [[graft.dedup.Dedup]]: the HOF chain is semantically identical but
  * evaluates one interpreted lambda per array element — measured ~4 s
  * for 5k docs at sf0.1 (~3M lambda invocations), versus one eval per
  * ROW here with a tight Scala loop (the md5 calls become the only real
  * cost). Bit-identical to the HOF version and to the DuckDB oracle SQL
  * (asserted in DedupSpec).
  *
  * CodegenFallback is deliberate: the eval itself is row-level imperative
  * code; codegen would only remove the per-row virtual call, not the md5
  * work that dominates.
  */
case class MinHashSignatureExpr(child: Expression, shingleK: Int, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def prettyName: String = GraftFunctions.MinhashName

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any = {
    // Split semantics match Spark's split(text, '\s+') = String.split(re, -1).
    val words = input.asInstanceOf[UTF8String].toString.split("\\s+", -1)
    if (words.length < shingleK) {
      return new GenericArrayData(Array.fill[Any](numHashes)(null))
    }
    val md = MessageDigest.getInstance("MD5")
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    val sb = new java.lang.StringBuilder
    while (i <= words.length - shingleK) {
      sb.setLength(0)
      var j = 0
      while (j < shingleK) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      val d = md.digest(sb.toString.getBytes("UTF-8"))
      md.reset()
      // first 4 digest bytes as unsigned 32-bit — identical to
      // CAST('0x' || substr(md5(s),1,8) AS BIGINT) / Hashing.hash32
      val h32 = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      val hp = h32 % Hashing.P
      var k = 0
      while (k < numHashes) {
        val v = (hp * Hashing.HashA(k) + Hashing.HashB(k)) % Hashing.P
        if (v < mins(k)) mins(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(Long.box(_): Any))
  }
}

/** Session-level registration for graft's custom expressions (public
  * `functionRegistry` route — works on any session the driver hands us,
  * no SparkSessionExtensions wiring required at session construction).
  */
object GraftFunctions {

  val MinhashName = "graft_minhash_signature"
  val LshBucketName = "graft_lsh_bucket"
  val JaccardName = "graft_jaccard"
  val SimhashName = "graft_simhash"

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      MinhashName,
      exprs => MinHashSignatureExpr(exprs.head, shingleK = 3, numHashes = 8),
      "built-in")
    reg.createOrReplaceTempFunction(
      LshBucketName,
      exprs => LshBucketExpr(exprs.head, nPlanes = 8),
      "built-in")
    reg.createOrReplaceTempFunction(
      JaccardName,
      exprs => JaccardExpr(exprs.head, exprs(1)),
      "built-in")
    reg.createOrReplaceTempFunction(
      SimhashName,
      exprs => SimHashExpr(exprs.head),
      "built-in")
  }

  /** 8-hash/3-shingle MinHash signature column. */
  def minhashSignature(spark: SparkSession, c: Column): Column = {
    register(spark)
    call_function(MinhashName, c)
  }
}
