package graft.ops

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, LongType, StringType,
  StructField, StructType}
import org.apache.spark.util.sketch.CountMinSketch

/** Count-min-sketch frequency profiling (the frequency sibling of
  * q102's HLL and q104's GK quantile sketch — together the three
  * sketches every corpus profiler carries): "how often does token /
  * URL / n-gram X occur" over a 100 TB corpus, answered from a
  * fixed-size sketch instead of a full groupBy shuffle of every key.
  *
  * Scale shape: `count_min_sketch` is a native Catalyst aggregate, so
  * per-partition sketches build map-side and MERGE (the CMS is a
  * counter matrix; merge = elementwise add) — one scan, no key
  * shuffle, and the driver receives one d×w counter matrix (~tens of
  * KB) regardless of corpus size. Lookups are then O(d) driver-side
  * arithmetic. The exact top-k recount here is the VERIFICATION side
  * (the q51 discipline: an approximation ships with a measured error,
  * not an asserted one); a 100 TB caller keeps only the sketch and the
  * documented (ε, δ) guarantee.
  *
  * Determinism: the sketch's hash family is seeded (`seed`), the input
  * is fixed, and the aggregate's merge is commutative integer addition
  * — the estimate for a given (corpus, ε, δ, seed) is one exact
  * number, reproducible across runs and partitionings.
  */
object FreqSketch {

  /** Exact top-`k` items (ties broken by item ascending) with the CMS
    * estimate and its two verified guarantees per item:
    * `overestimate_ok` — CMS never undercounts (est ≥ exact, a hard
    * structural property); `within_eps` — est ≤ exact + ⌈ε·N⌉ (the
    * probabilistic bound, held with probability `confidence` per item
    * and measured here, not assumed).
    *
    * Output: (rank, item, exact_cnt, est_cnt, overestimate_ok,
    * within_eps) — `est_cnt` stays engine-internal (no portable SQL
    * computes a CMS); oracle-facing callers project it away and match
    * on the exact values plus the verified booleans.
    */
  def heavyHitters(items: DataFrame, itemCol: String, k: Int,
      eps: Double, confidence: Double, seed: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    require(eps > 0 && eps < 1, s"eps must be in (0,1): $eps")
    require(confidence > 0 && confidence < 1,
      s"confidence must be in (0,1): $confidence")
    val spark = items.sparkSession
    // NULL items are excluded by contract: the CMS aggregate skips
    // them, so counting them into N would inflate the ε·N slack, and a
    // null reaching the top-k would have no sketch entry to probe.
    val nonNull = items.filter(col(itemCol).isNotNull)

    // ONE scan builds the sketch and the total count together; the
    // result row is metadata (a serialized counter matrix + a long).
    val one = nonNull.agg(count(lit(1)).as("__n"),
      expr(s"count_min_sketch($itemCol, cast($eps as double), " +
        s"cast($confidence as double), $seed)").as("__sk")).head()
    val total = one.getLong(0)
    val cms =
      if (one.isNullAt(1)) CountMinSketch.create(eps, confidence, seed)
      else CountMinSketch.readFrom(new ByteArrayInputStream(
        one.getAs[Array[Byte]](1)))

    // Exact side: partial-aggregated counts, TakeOrderedAndProject
    // top-k — k result rows to the driver, never the key space.
    val top = nonNull.groupBy(col(itemCol).as("item"))
      .agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("item").asc)
      .limit(k).collect()

    val slack = math.ceil(eps * total).toLong
    val rows = top.toIndexedSeq.zipWithIndex.map { case (r, i) =>
      val item = r.getString(0)
      val exact = r.getLong(1)
      val est = cms.estimateCount(item)
      Row((i + 1).toLong, item, exact, est, est >= exact,
        est <= exact + slack)
    }
    val schema = StructType(Seq(
      StructField("rank", LongType, nullable = false),
      StructField("item", StringType, nullable = true),
      StructField("exact_cnt", LongType, nullable = false),
      StructField("est_cnt", LongType, nullable = false),
      StructField("overestimate_ok", BooleanType, nullable = false),
      StructField("within_eps", BooleanType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
  }
}
