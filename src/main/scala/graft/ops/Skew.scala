package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins (SURVEY build-plan scale notes).
  *
  * When one join key dominates (the classic hot-customer / null-key
  * problem), a hash join puts the whole hot partition on one task. AQE's
  * skew-join split handles sort-merge cases at runtime; this helper is
  * the explicit variant for when the small side fits the classic
  * salt-and-replicate scheme: the large side's rows get a random salt in
  * [0, n); the small side is replicated n times, once per salt value;
  * the join key becomes (key, salt), splitting each hot key across n
  * tasks.
  */
object Skew {

  /** Salted equi-join: `large ⋈ small` on `key`, hot keys split n ways.
    * Output columns = large.* ++ small.* minus small's join key.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, largeKey: String,
      smallKey: String, n: Int): DataFrame = {
    val salted = large.withColumn("__salt", (rand(42) * n).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(n - 1))))
    salted.join(replicated,
        salted(largeKey) === replicated(smallKey) &&
          salted("__salt") === replicated("__salt"))
      .drop("__salt").drop(replicated(smallKey))
  }
}
