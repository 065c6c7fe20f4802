package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Exact centroid state of a group of quantized vectors: element-wise
  * integer sums + count. Kept in integer form so downstream arithmetic
  * (centroid values, cosine against the *sum* vector) stays exact and
  * order-independent — the property every oracle-checked result here
  * relies on. |x|≤10⁴ ⇒ 10⁹ vectors/group before overflow.
  */
case class CentroidState(n: Long, sums: Array[Long])

/** Typed `Aggregator[IN, BUF, OUT]` (SURVEY §7.3) computing
  * [[CentroidState]] per group over `(key, quantized-vector)` input —
  * the coarse-quantizer build step of IVF-style ANN (q36/q37): one pass,
  * map-side partial merge, 8·dims+8 bytes of state per group.
  *
  * This is the right tool here precisely because the reduction is a
  * fixed-width *vector* accumulation — k independent scalar `min`s
  * served MinHash better (NearDup.minHashSigs), but element-wise sums
  * over arrays would need `dims` separate agg columns; a typed
  * Aggregator keeps one buffer and one pass.
  */
class QuantizedCentroid(dims: Int)
    extends Aggregator[(Long, Seq[Long]), CentroidState, CentroidState] {

  override def zero: CentroidState = CentroidState(0L, Array.fill(dims)(0L))

  override def reduce(b: CentroidState, in: (Long, Seq[Long])): CentroidState = {
    val v = in._2
    require(v.length == dims,
      s"vector of length ${v.length} in a $dims-dim centroid aggregation" +
        " — truncating or zero-padding would silently corrupt the sums")
    var i = 0
    while (i < dims) { b.sums(i) += v(i); i += 1 }
    CentroidState(b.n + 1, b.sums)
  }

  override def merge(a: CentroidState, b: CentroidState): CentroidState = {
    var i = 0
    while (i < dims) { a.sums(i) += b.sums(i); i += 1 }
    CentroidState(a.n + b.n, a.sums)
  }

  override def finish(r: CentroidState): CentroidState = r

  override def bufferEncoder: Encoder[CentroidState] =
    Encoders.product[CentroidState]
  override def outputEncoder: Encoder[CentroidState] =
    Encoders.product[CentroidState]
}
