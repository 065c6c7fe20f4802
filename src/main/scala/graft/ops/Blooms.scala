package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain,
  Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Explicit Bloom-filter pre-filtering — the approximate-membership
  * sibling of the planner-injected runtime filter (E80): build a
  * filter over a SMALL key set once, then screen a 100 TB scan
  * SCAN-LOCALLY so the expensive exact join only ever sees the
  * (tiny) candidate survivors. The production uses are benchmark-
  * contamination screening and incremental-ingest dedup against a
  * persisted history filter; unlike E80's per-query injected filter,
  * this one is an ARTIFACT — built once, broadcast into any number of
  * later jobs, exactly like a stored sketch.
  *
  * Scale shape: the build is Catalyst's `BloomFilterAggregate` —
  * per-partition filters build map-side and merge by bitwise OR, so
  * the driver receives ONE bit array sized by (expectedItems, fpp),
  * never the keys. The probe is `BloomFilterMightContain` over
  * `xxhash64(key)` — codegen'd, scan-local, zero shuffle. Guarantees:
  * no false negatives ever (structural); false-positive rate ≈ `fpp`
  * (probabilistic — callers MEASURE it, q51 discipline, by exact-
  * verifying the candidates: the verify join costs |candidates|, not
  * |corpus|).
  *
  * Keys are screened through their xxhash64 (the same reduction
  * Spark's own runtime filters use): a 64-bit hash collision is one
  * more false-positive source, folded into the measured rate — false
  * negatives remain impossible.
  */
object Blooms {

  /** Build a Bloom filter over `key` (any hashable type) with ~`fpp`
    * false-positive rate at `expectedItems` distinct keys; returns the
    * serialized filter — broadcast-sized: ~1.2 bytes/key at 1% fpp —
    * for [[mightContain]] probes in this or any later job.
    */
  def build(df: DataFrame, key: Column, expectedItems: Long,
      fpp: Double = 0.01): Array[Byte] = {
    require(expectedItems > 0, s"expectedItems must be positive: $expectedItems")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1): $fpp")
    val numBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(expectedItems, fpp)
    // BloomFilterAggregate CLAMPS both parameters against the session's
    // runtime-bloom-filter caps (defaults: 4M items / 64M bits) with
    // Math.min — silently, which above the cap would build a smaller
    // filter whose real false-positive rate far exceeds the requested
    // fpp while this API still advertised it. Refuse instead, naming
    // the confs to raise.
    val conf = df.sparkSession.conf
    val maxItems = conf
      .get("spark.sql.optimizer.runtime.bloomFilter.maxNumItems", "4000000")
      .toLong
    val maxBits = conf
      .get("spark.sql.optimizer.runtime.bloomFilter.maxNumBits", "67108864")
      .toLong
    require(expectedItems <= maxItems && numBits <= maxBits,
      s"expectedItems=$expectedItems (numBits=$numBits) exceeds the " +
        s"session caps (maxNumItems=$maxItems, maxNumBits=$maxBits); " +
        "BloomFilterAggregate would silently clamp and void the fpp " +
        "guarantee — raise spark.sql.optimizer.runtime.bloomFilter." +
        "maxNumItems / maxNumBits for filters this large")
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(ColumnBridge.expression(key))),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    val row = df.agg(ColumnBridge.column(agg).as("__bloom")).head()
    require(!row.isNullAt(0),
      "Bloom build saw no rows — build from a non-empty key set")
    row.getAs[Array[Byte]](0)
  }

  /** Scan-local membership probe: true iff `key` MIGHT be in the set
    * `bloom` was built over (never false for a present key). Pure
    * codegen'd expression — safe directly above a 100 TB scan.
    */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal.create(bloom, BinaryType),
      new XxHash64(Seq(ColumnBridge.expression(key)))))
}
