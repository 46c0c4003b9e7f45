package graft.load

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property tests for the z-order layout math: the Morton spread must be
  * a bijection whose interleave recovers both inputs exactly — a wrong
  * magic mask silently degrades clustering (and so scan pruning) without
  * failing any row-level correctness check.
  */
class LayoutPropertySpec extends SparkSpec {

  /** Referee: compact every other bit of z back into a 16-bit int. */
  private def unspread(z: Long): Int = {
    var x = 0
    var i = 0
    while (i < 16) {
      x |= (((z >> (2 * i)) & 1L) << i).toInt
      i += 1
    }
    x
  }

  test("morton interleave round-trips both 16-bit inputs") {
    // deterministic pseudo-random coverage of the 16-bit domain,
    // plus the boundary values
    val vals = (0 until 512).map(i => ((i * 2654435761L) & 0xFFFF).toInt) ++
      Seq(0, 1, 0x5555, 0xAAAA, 0x7FFF, 0x8000, 0xFFFF)
    val df = spark.createDataFrame(
      vals.zip(vals.reverse).map { case (a, b) => (a.toLong, b.toLong) })
      .toDF("a", "b")
    val z = Warehouse.spreadBits16(col("a"))
      .bitwiseOR(shiftleft(Warehouse.spreadBits16(col("b")), 1))
    val rows = df.select(col("a"), col("b"), z.as("z")).collect()
    rows.foreach { r =>
      val (a, b, zz) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(zz >= 0 && zz < (1L << 32), s"z out of range: $zz")
      assert(unspread(zz) == a, s"even bits of $zz != $a")
      assert(unspread(zz >> 1) == b, s"odd bits of $zz != $b")
    }
    // bijection on the sampled pairs: distinct inputs → distinct keys
    assert(rows.map(_.getLong(2)).distinct.length == rows.length)
  }

  test("morton key is monotone in each input when the other is fixed") {
    // per-file min-max pruning relies on range(z) shrinking as the
    // inputs cluster; a non-monotone spread would break that silently
    val vals = (0 to 300).map(_.toLong)
    val df = spark.createDataFrame(vals.map(Tuple1(_))).toDF("a")
    val spread = df.select(col("a"),
      Warehouse.spreadBits16(col("a")).as("s")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    spread.sliding(2).foreach { case Array((a1, s1), (a2, s2)) =>
      assert(s1 < s2, s"spread not monotone: f($a1)=$s1 >= f($a2)=$s2")
    }
  }
}
