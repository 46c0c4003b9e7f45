package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expression: full MinHash signature of a document in
  * one imperative pass — text → word shingles → md5-derived hash32 →
  * n affine minima → array<long>.
  *
  * Why an expression and not the higher-order-function composition in
  * [[graft.dedup.Dedup]]: the HOF chain is semantically identical but
  * evaluates one interpreted lambda per array element — measured ~4 s
  * for 5k docs at sf0.1 (~3M lambda invocations), versus one eval per
  * ROW here with a tight Scala loop. Bit-identical to the HOF version
  * and to the DuckDB oracle SQL (asserted in DedupSpec).
  *
  * Codegen emits a static call into [[ExprHelpers]], so surrounding
  * operators keep one WholeStageCodegen span (CodegenFallback would
  * break the stage; asserted in PlanSpec).
  */
case class MinHashSignatureExpr(child: Expression, shingleK: Int, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def prettyName: String = GraftFunctions.MinhashName

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    ExprHelpers.minhash(input.asInstanceOf[UTF8String], shingleK, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ExprHelpers.minhash($c, $shingleK, $numHashes);")
}

/** LSH band values from an existing shingle array (array<string>), one
  * imperative pass — see [[ExprHelpers.minhashBands]]. Used where a
  * query shares one shingle frame between band generation and exact
  * scoring (graft.dedup.Dedup.lshCandidatePairsFromShingles).
  */
case class MinHashBandsExpr(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def prettyName: String = GraftFunctions.MinhashBandsName

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    ExprHelpers.minhashBands(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ExprHelpers.minhashBands($c, $numHashes);")
}

/** Session-level registration for graft's custom expressions (public
  * `functionRegistry` route — works on any session the driver hands us,
  * no SparkSessionExtensions wiring required at session construction).
  */
object GraftFunctions {

  val MinhashName = "graft_minhash_signature"
  val MinhashBandsName = "graft_minhash_bands"
  val ShinglesName = "graft_shingles"
  val ShingleExplodeName = "graft_explode_shingles"
  val LshBucketName = "graft_lsh_bucket"
  val JaccardName = "graft_jaccard"
  val DotName = "graft_dot"
  val SimhashName = "graft_simhash"
  val NfcName = "graft_nfc"
  val NearestSeedName = "graft_nearest_seed"
  val CanonicalUrlName = "graft_canonical_url"
  val RegistrableDomainName = "graft_registrable_domain"
  val RobotsAllowedName = "graft_robots_allowed"
  val NGramHistName = "graft_ngram_hist"
  val InterUnionName = "graft_inter_union"
  val PosCloseName = "graft_pos_close"
  val WinnowFpName = "graft_winnow_fp"
  val Hash32DistinctName = "graft_hash32_distinct"
  val Hash32SortedName = "graft_hash32_sorted"
  val Hash32SortedDistinctName = "graft_hash32_sorted_distinct"
  val LangIdName = "graft_lang_id"
  val CdcChunksName = "graft_cdc_chunks"
  val FingerprintName = "graft_fingerprint"
  val CoverageStatsName = "graft_coverage_stats"
  val MultiscaleWindowsName = "graft_multiscale_windows"
  val HashedBucketsName = "graft_hashed_buckets"
  val HashedScoreName = "graft_hashed_score"

  /** The one hashed-feature width every T42/DSIR consumer uses. */
  val FeatureBuckets = 1024

  /** Arity gate for SQL builders (review-r11): without it, surplus
    * arguments were silently DISCARDED (`exprs.head` ignores a second
    * arg — a user's misplaced argument produced plausible wrong
    * results) and missing ones threw a raw IndexOutOfBounds instead
    * of an analysis-time message.
    */
  private[functions] def checkArity(name: String, n: Int,
      exprs: Seq[Expression]): Seq[Expression] = {
    if (exprs.length != n)
      throw new IllegalArgumentException(
        s"$name expects $n argument(s), got ${exprs.length}")
    exprs
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def one(name: String)(mk: Expression => Expression)
        : Seq[Expression] => Expression =
      exprs => mk(checkArity(name, 1, exprs).head)
    reg.createOrReplaceTempFunction(
      MinhashName,
      one(MinhashName)(MinHashSignatureExpr(_, shingleK = 3, numHashes = 8)),
      "built-in")
    reg.createOrReplaceTempFunction(
      MinhashBandsName,
      one(MinhashBandsName)(MinHashBandsExpr(_, numHashes = 8)),
      "built-in")
    reg.createOrReplaceTempFunction(
      ShinglesName,
      one(ShinglesName)(ShingleSetExpr(_, shingleK = 3)),
      "built-in")
    reg.createOrReplaceTempFunction(
      ShingleExplodeName,
      one(ShingleExplodeName)(ShingleExplodeExpr(_, shingleK = 3)),
      "built-in")
    reg.createOrReplaceTempFunction(
      LshBucketName,
      one(LshBucketName)(LshBucketExpr(_, nPlanes = 8)),
      "built-in")
    reg.createOrReplaceTempFunction(
      JaccardName,
      exprs => { checkArity(JaccardName, 2, exprs)
        JaccardExpr(exprs.head, exprs(1)) },
      "built-in")
    reg.createOrReplaceTempFunction(
      DotName,
      exprs => { checkArity(DotName, 2, exprs)
        DotExpr(exprs.head, exprs(1)) },
      "built-in")
    reg.createOrReplaceTempFunction(
      SimhashName,
      one(SimhashName)(SimHashExpr(_)),
      "built-in")
    reg.createOrReplaceTempFunction(
      NfcName,
      one(NfcName)(NfcNormalizeExpr(_)),
      "built-in")
    reg.createOrReplaceTempFunction(
      NearestSeedName,
      exprs => { checkArity(NearestSeedName, 2, exprs)
        NearestSeedExpr(exprs(0), exprs(1)) },
      "built-in")
    reg.createOrReplaceTempFunction(
      CanonicalUrlName,
      one(CanonicalUrlName)(CanonicalUrlExpr(_)),
      "built-in")
    reg.createOrReplaceTempFunction(
      RegistrableDomainName,
      one(RegistrableDomainName)(RegistrableDomainExpr(_)),
      "built-in")
    reg.createOrReplaceTempFunction(
      RobotsAllowedName,
      exprs => { checkArity(RobotsAllowedName, 3, exprs)
        RobotsAllowedExpr(exprs(0), exprs(1), exprs(2)) },
      "built-in")
    reg.createOrReplaceTempFunction(
      NGramHistName,
      one(NGramHistName)(NGramHistExpr(_,
        buckets = graft.queries.Curation5.NGramB,
        prime = graft.ops.Hashing.P)),
      "built-in")
    reg.createOrReplaceTempFunction(
      InterUnionName,
      exprs => { checkArity(InterUnionName, 2, exprs)
        InterUnionExpr(exprs.head, exprs(1)) },
      "built-in")
    reg.createOrReplaceTempFunction(
      PosCloseName,
      exprs => { checkArity(PosCloseName, 3, exprs)
        PosCloseExpr(exprs(0), exprs(1), exprs(2)) },
      "built-in")
    reg.createOrReplaceTempFunction(
      WinnowFpName,
      one(WinnowFpName)(WinnowFpExpr(_, window = 4)),
      "built-in")
    reg.createOrReplaceTempFunction(
      Hash32DistinctName,
      one(Hash32DistinctName)(Hash32ArrayExpr(_, mode = 1)),
      "built-in")
    reg.createOrReplaceTempFunction(
      Hash32SortedName,
      one(Hash32SortedName)(Hash32ArrayExpr(_, mode = 2)),
      "built-in")
    reg.createOrReplaceTempFunction(
      Hash32SortedDistinctName,
      one(Hash32SortedDistinctName)(Hash32ArrayExpr(_, mode = 3)),
      "built-in")
    reg.createOrReplaceTempFunction(
      LangIdName,
      one(LangIdName)(LangIdExpr(_)),
      "built-in")
    reg.createOrReplaceTempFunction(
      CdcChunksName,
      one(CdcChunksName)(CdcChunksExpr(_)),
      "built-in")
    reg.createOrReplaceTempFunction(
      FingerprintName,
      one(FingerprintName)(FingerprintExpr(_)),
      "built-in")
    reg.createOrReplaceTempFunction(
      CoverageStatsName,
      exprs => { checkArity(CoverageStatsName, 4, exprs)
        CoverageStatsExpr(exprs(0), exprs(1), exprs(2), exprs(3)) },
      "built-in")
    reg.createOrReplaceTempFunction(
      MultiscaleWindowsName,
      one(MultiscaleWindowsName)(MultiscaleWindowsExpr(_,
        tiers = graft.queries.Curation5.Tiers,
        rollB = graft.queries.Curation5.RollB)),
      "built-in")
    reg.createOrReplaceTempFunction(
      HashedBucketsName,
      one(HashedBucketsName)(HashedBucketsExpr(_, buckets = FeatureBuckets)),
      "built-in")
    reg.createOrReplaceTempFunction(
      HashedScoreName,
      one(HashedScoreName)(HashedScoreExpr(_, buckets = FeatureBuckets)),
      "built-in")
  }

  /** 8-hash/3-shingle MinHash signature column. */
  def minhashSignature(spark: SparkSession, c: Column): Column = {
    register(spark)
    call_function(MinhashName, c)
  }

  /** 4 LSH band values (8 hashes × r=2) from a shingle-array column. */
  def minhashBands(spark: SparkSession, c: Column): Column = {
    register(spark)
    call_function(MinhashBandsName, c)
  }

  /** Distinct 3-word shingle set column (imperative expression). */
  def shingles(spark: SparkSession, c: Column): Column = {
    register(spark)
    call_function(ShinglesName, c)
  }

  /** Generator column: one row per distinct 3-word shingle, streamed
    * (no intermediate array) — use in `select(col, explodeShingles(...))`
    * position like any explode.
    */
  def explodeShingles(spark: SparkSession, c: Column): Column = {
    register(spark)
    call_function(ShingleExplodeName, c)
  }
}
