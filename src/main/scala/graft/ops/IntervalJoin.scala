package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Large×large interval join via bin-overlap equi-join.
  *
  * The naive plan for `point.t BETWEEN interval.start AND interval.end`
  * is a (broadcast) nested loop — quadratic work and a single-node
  * build side, which dies when BOTH sides are large. The standard
  * at-scale rewrite: quantize time into fixed bins, explode each
  * interval to the bins it covers, map each point to its one bin, and
  * equi-join on (keys…, bin) with the exact range predicate as a
  * residual filter. Every (point, interval) pair meets in EXACTLY one
  * bin (the point's), so no dedup pass is needed.
  *
  * Scale properties: shuffle is hash-partitioned on (keys…, bin) like
  * any equi-join; work is pairs-per-bin, not |points|×|intervals|.
  * Choose `binWidth` ≈ the typical interval length: each interval then
  * explodes to ≤ 2 bins (cost `2×|intervals|` shuffle rows), while a
  * too-small width multiplies the interval side and a too-large width
  * degrades toward per-key nested loops inside giant bins. Long-tail
  * intervals explode to `span/binWidth` bins — bound them upstream
  * (split or cap) if the length distribution is heavy-tailed.
  *
  * Times are integer (e.g. epoch micros); interval semantics are
  * `start <= t < end` (end-exclusive). Integer `DIV` keeps the bin
  * math exact where a double division would lose precision on
  * microsecond epochs.
  */
object IntervalJoin {

  /** Join `points` (with integer time column `ptTime`) to `intervals`
    * (integer `[start, end)` columns) on equal `keys` and containment.
    * Returns all columns of both inputs.
    */
  def binned(points: DataFrame, intervals: DataFrame, ptTime: String,
      start: String, end: String, keys: Seq[String],
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val bin = "__graft_bin"
    val ivb = intervals.withColumn(bin,
      explode(sequence(expr(s"$start DIV $binWidth"),
        expr(s"($end - 1) DIV $binWidth"))))
    val ptb = points.withColumn(bin, expr(s"$ptTime DIV $binWidth"))
    ptb.join(ivb, keys :+ bin)
      .filter(col(ptTime) >= col(start) && col(ptTime) < col(end))
      .drop(bin)
  }
}
