package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucket-checksum table reconciliation (SURVEY §2.11 E79) — the
  * data-ops primitive for "did replication/backfill/migration change
  * anything, and WHERE": both snapshots reduce to `buckets` rows of
  * (count, order-independent checksum); comparing those finds every
  * differing key bucket without ever joining or shipping row data.
  * At 100 TB each side is one scan + a `buckets`-row aggregate — the
  * compare itself is metadata-scale, and re-sync can then target only
  * the differing buckets (~1/buckets of the table per hit).
  *
  * Determinism contract: row checksum = int64 of md5 over a
  * `'|'`-joined rendering of (key, cols). Callers must pass columns
  * with engine-stable string forms (strings, integers — NOT raw
  * doubles) and coalesce nulls first: `concat_ws` skips nulls, so a
  * null column would alias against a shifted neighbor.
  */
object TableDiff {

  /** 60-bit row checksum over (key, cols) — order-independent when
    * summed, collision odds ~n²/2⁶⁰. One [[Sampling.md5Long]] form.
    */
  def rowChecksum(keyCol: String, cols: Seq[String]): Column = {
    val parts = (keyCol +: cols).map(c => s"cast($c as string)")
      .mkString(", ")
    Sampling.md5Long(s"concat_ws('|', $parts)")
  }

  /** One row per key bucket: row count and DECIMAL(38,0) checksum sum
    * (exact at any bucket size — an int64 sum would wrap under ANSI
    * into an error at scale).
    */
  def summary(df: DataFrame, keyCol: String, cols: Seq[String],
      buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    df.groupBy(
        (Sampling.md5Long(s"cast($keyCol as string)") % buckets)
          .as("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(rowChecksum(keyCol, cols).cast("decimal(38,0)")).as("ck"))
  }

  /** Buckets where the two snapshots disagree (count or content),
    * with both sides' counts; a bucket present in only one snapshot
    * reports 0 for the other. Empty result = tables identical.
    */
  def diff(a: DataFrame, b: DataFrame, keyCol: String, cols: Seq[String],
      buckets: Int): DataFrame = {
    val sa = summary(a, keyCol, cols, buckets)
      .select(col("bucket"), col("n").as("n_a"), col("ck").as("ck_a"))
    val sb = summary(b, keyCol, cols, buckets)
      .select(col("bucket"), col("n").as("n_b"), col("ck").as("ck_b"))
    sa.join(sb, Seq("bucket"), "full_outer")
      .filter(!(col("n_a") <=> col("n_b")) || !(col("ck_a") <=> col("ck_b")))
      .select(col("bucket"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
  }
}
