package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** Z-order (Morton) interleaving for multi-column data-skipping layout
  * (SURVEY §2.11 E70) — the technique behind `OPTIMIZE ZORDER BY`:
  * interleave the bits of two quantized dimensions so that range
  * sharding on the single z-value co-locates rows that are close in
  * BOTH dimensions, letting min/max file statistics prune scans on
  * either predicate.
  *
  * The interleave is a flat sum of shift/mask terms — pure integer
  * arithmetic inside whole-stage codegen, no HOF, no UDF; at 100 TB
  * this runs scan-local ahead of a `repartitionByRange(zCol)` write.
  */
object ZOrder {

  /** Morton code of two non-negative `bits`-bit integer columns:
    * x's bit i lands at position 2i, y's at 2i+1. Columns must already
    * be quantized to [0, 2^bits) — the caller owns the scaling (the
    * same contract as the engine's vector quantization).
    */
  def zValue(xCol: String, yCol: String, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31]: $bits")
    val terms = (0 until bits).flatMap { i =>
      Seq(s"((($xCol >> ${i}L) & 1L) << ${2 * i}L)",
        s"((($yCol >> ${i}L) & 1L) << ${2 * i + 1}L)")
    }
    expr(terms.mkString("(", " + ", ")"))
  }
}
