package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Key-based deduplication — the reference's sole aggregation-class
  * operator (reference `etl.py:69,82,116,135`; SURVEY §2.4 A1–A4).
  *
  * Two forms:
  *  - `arbitrary` — strict parity with `dropDuplicates(keys)`: keeps an
  *    arbitrary row per key (a hash-agg `first()`; nondeterministic).
  *  - `latestBy` / `firstBy` — the *intended* semantics (e.g. "latest
  *    level per user", `etl.py:116`), deterministic and oracle-checkable:
  *    `row_number() over (partition by keys order by ord) = 1`.
  *
  * Scale: both forms are a single hash-partition shuffle on the key; the
  * window form adds only a per-partition sort, no extra exchange.
  */
object Dedup {

  /** Keys carried by more than `maxDf` rows of `df` — the E50/maxDf
    * boilerplate discipline's shared core (a hash shared by too many
    * units is non-discriminative and the equi-join skew magnet). Tiny
    * by construction, so callers may broadcast the result. One
    * definition; the video keyframe index, the video cluster pairing,
    * and the landmark takedown blocklist all delegate here.
    */
  def hotKeys(df: DataFrame, key: String, maxDf: Int): DataFrame = {
    require(maxDf >= 1, s"maxDf must be >= 1: $maxDf")
    df.groupBy(key)
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("__df"))
      .filter(org.apache.spark.sql.functions.col("__df") > maxDf)
      .select(key)
  }

  /** Parity form of `dropDuplicates(keys)`. */
  def arbitrary(df: DataFrame, keys: Seq[String]): DataFrame =
    df.dropDuplicates(keys)

  /** One row per key, deterministically: the first row under `orderCols`
    * (ties must be broken by including a unique column in `orderCols`).
    */
  def firstBy(df: DataFrame, keys: Seq[String], orderCols: Seq[org.apache.spark.sql.Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCols: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Latest row per key by a timestamp-ish column, ties broken by `tie`. */
  def latestBy(df: DataFrame, keys: Seq[String], ts: String, tie: String): DataFrame =
    firstBy(df, keys, Seq(col(ts).desc, col(tie).desc))
}
