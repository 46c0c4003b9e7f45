package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed UDAF: element-wise minimum of MinHash signatures — the
  * signature of the UNION of the grouped documents (minhash's defining
  * property: min over a union = min of mins). Gives constant-size
  * per-group sketches for "how much do these corpus partitions overlap"
  * questions without holding shingle sets.
  *
  * The buffer is a fixed Array[Long]; merge is commutative/associative,
  * so Spark runs map-side partial aggregation then a final merge,
  * exactly like built-in MIN — one shuffle of 64-byte sketches.
  * Callers filter out null signatures (docs below shingle size) first;
  * the DuckDB oracle twin is a plain per-column MIN.
  */
object MinHashUnionAgg extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  private val N = 8

  override def zero: Array[Long] = Array.fill(N)(Long.MaxValue)

  override def reduce(buf: Array[Long], sig: Seq[Long]): Array[Long] = {
    // tolerate null signatures (docs below shingle size) instead of an
    // executor NPE; anything shorter than the sketch is a caller bug —
    // fail with the actual length, not an IndexOutOfBounds deep in codegen
    if (sig == null) return buf
    require(sig.length >= N,
      s"minhash signature has ${sig.length} hashes, expected >= $N")
    var i = 0
    while (i < N) { if (sig(i) < buf(i)) buf(i) = sig(i); i += 1 }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < N) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()

  /** Column form for use in groupBy().agg(...). */
  def minhashUnion(sig: Column): Column = udaf(MinHashUnionAgg).apply(sig)
}
