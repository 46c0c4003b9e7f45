package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.{call_function, lit, xxhash64}

/** Bounded-size Bloom membership gate for anti-corpus dedup.
  *
  * The scale problem it solves: deduping an incoming batch against a
  * 100 TB corpus with a plain anti-join shuffles the whole BATCH —
  * payload bytes included — even though almost every row is novel.
  * With the gate, `mightContain` is a narrow codegen'd filter: definite
  * negatives (the bulk) pass with ZERO shuffle, and only bloom-positive
  * suspects (true dups + the FP rate) reach the exact digest anti-join.
  * The result stays exact because positives are verified exactly;
  * Bloom filters have no false negatives.
  *
  * Wraps Spark's own runtime-filter expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the pair
  * behind `InjectRuntimeFilter`) through the session function registry,
  * hashing both sides with `xxhash64` exactly as the injected runtime
  * filters do. The aggregation is map-side combinable (bitwise OR of
  * fixed-size bit arrays), so building the sketch is one narrow pass
  * over the corpus plus a bounded reduce.
  *
  * The sketch lives on the driver but is BOUNDED — numBits/8 bytes
  * regardless of corpus size, the same artifact class as an IVF
  * codebook — and in production is built once and probed by many
  * batches.
  */
object BloomGate {

  val AggName = "graft_bloom_agg"
  val MightContainName = "graft_bloom_might_contain"

  private def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(AggName,
      exprs => new BloomFilterAggregate(exprs(0), exprs(1), exprs(2)),
      "built-in")
    reg.createOrReplaceTempFunction(MightContainName,
      exprs => BloomFilterMightContain(exprs(0), exprs(1)),
      "built-in")
  }

  /** Build the corpus membership sketch over `c` (any comparable
    * column; hashed via xxhash64). One action; returns numBits/8 bytes
    * no matter how large `df` is.
    */
  def sketch(df: DataFrame, c: Column, expectedItems: Long,
      numBits: Long): Array[Byte] = {
    register(df.sparkSession)
    df.select(call_function(AggName, xxhash64(c), lit(expectedItems),
        lit(numBits)))
      .head().getAs[Array[Byte]](0)
  }

  /** Membership probe column: false ⇒ definitely not in the sketched
    * corpus; true ⇒ verify exactly downstream.
    */
  def mightContain(spark: SparkSession, sketch: Array[Byte],
      c: Column): Column = {
    register(spark)
    call_function(MightContainName, lit(sketch), xxhash64(c))
  }
}
