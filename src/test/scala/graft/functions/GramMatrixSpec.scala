package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Gram-matrix aggregate: the q142 scale primitive. Exactness is the
  * point — the lattice state must make the result independent of
  * partitioning (IEEE sums are not), and bad inputs must fail loudly
  * (wrong arity, Long overflow), never wrap or skip silently.
  */
class GramMatrixSpec extends SparkSpec {
  import spark.implicits._

  private def gramOf(df: org.apache.spark.sql.DataFrame): Map[(Int, Int), Long] =
    df.agg(GramMatrixAgg.gram(spark, col("e"), 3).as("gm"))
      .select(explode(col("gm.g")).as("x"))
      .select(col("x.di"), col("x.dj"), col("x.s"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap

  test("computes the exact upper-triangle lattice sums") {
    val df = Seq(Seq(1.0, 2.0, 3.0), Seq(0.5, -1.0, 2.0))
      .toDF("e")
    val g = gramOf(df)
    // (0,0): 1 + 0.25 = 1.25; (0,1): 2 - 0.5 = 1.5; (1,2): 6 - 2 = 4
    assert(g((0, 0)) == 1250000000000L)
    assert(g((0, 1)) == 1500000000000L)
    assert(g((1, 2)) == 4000000000000L)
    assert(g.size == 6)
  }

  test("result is invariant under partitioning (associative lattice)") {
    val rows = (1 to 97).map(i =>
      Seq(i * 0.013, math.sin(i), math.cos(i) * 0.7))
    val one = gramOf(rows.toDF("e").repartition(1))
    val many = gramOf(rows.toDF("e").repartition(13))
    assert(one == many)
  }

  test("row count rides the state") {
    val n = Seq(Seq(1.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0), Seq(0.0, 0.0, 1.0))
      .toDF("e")
      .agg(GramMatrixAgg.gram(spark, col("e"), 3).as("gm"))
      .select(col("gm.n")).as[Long].head()
    assert(n == 3L)
  }

  test("wrong arity fails loudly, not silently") {
    val ex = intercept[Exception] {
      Seq(Seq(1.0, 2.0)).toDF("e")
        .agg(GramMatrixAgg.gram(spark, col("e"), 3))
        .collect()
    }
    assert(ex.getMessage != null)
  }

  test("non-array<double> input fails at analysis") {
    val ex = intercept[Exception] {
      Seq("nope").toDF("e")
        .agg(GramMatrixAgg.gram(spark, col("e"), 3))
        .collect()
    }
    assert(ex.getMessage.toLowerCase.contains("array"))
  }

  test("Long overflow throws instead of wrapping") {
    // products of 1e6-scale values land at 1e24 on the 1e-12 lattice —
    // addExact must refuse, not wrap to a plausible-looking number
    val ex = intercept[Exception] {
      Seq.fill(4)(Seq(1e6, 1e6, 1e6)).toDF("e")
        .agg(GramMatrixAgg.gram(spark, col("e"), 3))
        .collect()
    }
    assert(ex.getMessage != null)
  }
}
