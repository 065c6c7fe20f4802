package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Source-mix rebalancing (SURVEY §2.11 E71) — the "data mixing" step
  * of a pre-training pipeline: downsample every stratum (source,
  * language, quality band …) to a COMMON size derived from the data
  * itself, so no single over-represented source dominates the corpus.
  *
  * Unlike [[Sampling.stratifiedHashSample]] (caller-fixed rates), the
  * per-stratum keep-rates here are computed FROM the stratum counts:
  * every stratum is thinned toward the size of the smallest one. The
  * rate math is pure integer arithmetic — `(minN * 10000) div n_s`
  * basis points — so any engine derives bit-identical thresholds.
  *
  * Scale shape (100 TB): one partial-aggregated count shuffle over
  * stratum keys (bytes, not documents), the resulting threshold table
  * is stratum-cardinality-sized and broadcast; membership is then a
  * scan-local hash test. The corpus itself never shuffles and the
  * documents' bodies never leave their input partitions.
  */
object Mixing {

  /** Columns appended by [[balanceToMin]] describing the decision. */
  val ThresholdCol = "thr_bp"

  /** Per-stratum population and keep-threshold: `(strataCol, n_total,
    * thr_bp)` where `thr_bp = (minN * 10000) div n_stratum` basis
    * points. Stratum-cardinality-sized — the broadcastable decision
    * table, also the audit artifact a pipeline should persist.
    */
  def thresholds(df: DataFrame, strataCol: String): DataFrame = {
    val counts = df.filter(col(strataCol).isNotNull)
      .groupBy(strataCol).agg(count(lit(1)).as("n_total"))
    val minN = counts.agg(min("n_total").as("__minN"))
    // exact long floor-division: `div`, never `/` (double at 2^53 loses
    // integer precision and DuckDB's // would disagree)
    counts.crossJoin(broadcast(minN))
      .select(col(strataCol), col("n_total"),
        expr("(__minN * 10000L) div n_total").as(ThresholdCol))
  }

  /** Thin every stratum to ~min-stratum size: keep a row iff
    * `hash(salt|key) mod 10000 < thr_bp(stratum)` (see [[thresholds]])
    * — the smallest stratum keeps (virtually) everything, a stratum 10×
    * the size keeps ~10%. Bernoulli by hash: counts are expected, not
    * exact, but membership is deterministic and reproducible, and
    * shrinking a stratum only removes rows (hash thresholds are
    * monotone). Rows with a NULL key or NULL stratum are dropped —
    * no hash / no population to balance against.
    *
    * Returns the kept rows with `thr_bp` (the stratum's basis-point
    * threshold) appended.
    */
  def balanceToMin(df: DataFrame, keyCol: String, strataCol: String,
      salt: String): DataFrame =
    balanceWith(df, keyCol, strataCol, salt, thresholds(df, strataCol))

  /** [[balanceToMin]] with a precomputed [[thresholds]] table — for
    * callers that also report the thresholds (q85): compute the stats
    * pass once, use it for both the filter and the audit output.
    */
  def balanceWith(df: DataFrame, keyCol: String, strataCol: String,
      salt: String, thresholdTable: DataFrame): DataFrame =
    df.join(
        broadcast(thresholdTable.select(strataCol, ThresholdCol)),
        Seq(strataCol))
      .filter(Sampling.hashBucket(keyCol, salt) < col(ThresholdCol))
}
