package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashed-vocabulary distribution drift between two corpus slices
  * (SURVEY §2.11 E225) — the monitoring primitive a continuously-
  * refreshed training corpus needs: did the new crawl / the other
  * language / the re-filtered snapshot SHIFT the token mix, and
  * which parts of the vocabulary moved? The same question data
  * drift monitors ask of feature distributions, answered here in
  * the engine's exact-integer style so any ANSI engine replays the
  * report bit-for-bit.
  *
  * Statistic: project each slice's token stream onto `buckets`
  * hashed vocabulary buckets (the [[Dsir]] count-table discipline —
  * parameter-bounded, never vocabulary-sized), normalize each bucket
  * to integer parts-per-million of its slice (truncating div — no
  * floats), and report every bucket where the two ppm values differ,
  * with |Δppm|. The total-variation distance follows as
  * Σ|Δppm| / 2·10⁶ — derivable from the rows, spec-pinned; per-bucket
  * attribution (WHICH token families drifted) is the operational
  * payload a scalar TV alone would hide.
  *
  * Scale shape: one scan-local hash expansion per slice into a
  * ≤ buckets-group partial agg (the tag column rides the same
  * shuffle — one exchange total, map-side combined); the two scalar
  * totals broadcast back onto the ≤ buckets-row counter table. At
  * 100 TB the report is still ≤ buckets rows and the only data-sized
  * cost is the token scan both slices already pay anywhere.
  */
object Drift {

  /** Per-million scale of the normalized bucket frequencies. */
  val Ppm = 1000000L

  private def tokens(textCol: String): Column =
    expr(s"filter(split($textCol, ' '), t -> t <> '')")

  private def bucketSql(tok: String, buckets: Int): String =
    s"cast(conv(substring(md5($tok), 1, 8), 16, 10) as bigint) % $buckets"

  /** Drift table between slices `a` and `b` of `docs(textCol)`:
    * one row per hashed bucket whose integer-ppm frequency differs
    * across the slices — (bucket, ppm_a, ppm_b, d_ppm), d_ppm > 0,
    * descending d_ppm with ascending-bucket tiebreak. Empty result =
    * identical hashed distributions at ppm resolution.
    */
  def vocabDrift(a: DataFrame, b: DataFrame, textCol: String,
      buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    val tagged = a.select(tokens(textCol).as("__toks"), lit(0L).as("__g"))
      .unionByName(
        b.select(tokens(textCol).as("__toks"), lit(1L).as("__g")))
      .select(explode(col("__toks")).as("__w"), col("__g"))
      .select(expr(bucketSql("__w", buckets)).as("bucket"), col("__g"))
    // one partial-agg shuffle: ≤ buckets groups, both slices' counters
    // in the same pass
    val counts = tagged.groupBy("bucket")
      .agg(sum(when(col("__g") === 0L, 1L).otherwise(0L)).as("__ca"),
        sum(when(col("__g") === 1L, 1L).otherwise(0L)).as("__cb"))
    val totals = counts
      .agg(sum(col("__ca")).as("__na"), sum(col("__cb")).as("__nb"))
    counts.crossJoin(broadcast(totals))
      .select(col("bucket"),
        expr(s"__ca * $Ppm div __na").as("ppm_a"),
        expr(s"__cb * $Ppm div __nb").as("ppm_b"))
      .withColumn("d_ppm", abs(col("ppm_a") - col("ppm_b")))
      .filter(col("d_ppm") > 0L)
      .orderBy(col("d_ppm").desc, col("bucket").asc)
  }
}
