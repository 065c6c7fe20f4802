package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling (SURVEY §7.2.8 curation surface):
  * per-stratum Bernoulli rates decided by a salted hash of the row key —
  * the training-data staple for rebalancing a corpus by language /
  * source / quality band without RNG state.
  *
  * Scale shape: membership is a pure scan-local function of (salt, key,
  * stratum) — no shuffle, no sort, no sampling state, reproducible
  * across runs and engines (md5 is the engine-portable hash; see q46's
  * split, the same mechanism with one global rate). Changing the salt
  * re-draws the sample; changing a stratum's rate only adds/removes rows
  * of that stratum (hash thresholding is monotone).
  */
object Sampling {

  /** THE engine-portable hash idiom: first 15 hex digits of md5 over
    * an arbitrary SQL string expression, as an int64 (60 bits). Every
    * md5-derived integer in the engine ([[hashValue]], the q46 split,
    * [[TableDiff]]'s checksums) goes through this one form so the
    * cross-engine contract (`CAST('0x' || substr(md5(x), 1, 15) AS
    * BIGINT)` in DuckDB) can never fork.
    */
  def md5Long(innerSql: String): Column =
    expr(s"cast(conv(substring(md5($innerSql), 1, 15), 16, 10) as bigint)")

  /** The sampling hash, full width: [[md5Long]] of `salt|key` —
    * collision-free tie order for ranking samplers. NULL keys hash to
    * NULL.
    */
  def hashValue(keyCol: String, salt: String): Column = {
    require(salt.matches("[A-Za-z0-9_]+"), s"salt must be alphanumeric: $salt")
    md5Long(s"concat('$salt|', cast($keyCol as string))")
  }

  /** [[hashValue]] mod 10000 basis points — the threshold form. NULL
    * keys hash to NULL (every comparison against a threshold is then
    * false — no-hash rows never sample in). Shared by every
    * hash-thresholded sampler ([[stratifiedHashSample]],
    * [[Mixing.balanceToMin]], q46's split).
    */
  def hashBucket(keyCol: String, salt: String): Column =
    hashValue(keyCol, salt) % 10000

  /** EXACTLY min(k, |stratum|) rows per stratum — rate-based sampling
    * ([[stratifiedHashSample]]) gives expected counts; this gives exact
    * ones, still deterministic and engine-reproducible: rank rows
    * inside each stratum by `(hashValue, key)` and keep the first k.
    * Returns the kept rows with the 1-based `rk` appended.
    *
    * Scale: one shuffle on the stratum key; each stratum ranks
    * independently (parallelism = stratum count), and only ranks up to
    * its own size — the classic per-group top-k. For strata of
    * billions of rows pair with a bucket pre-filter (keep hash mod M
    * below ~2kM/n first) so the sort input is ~2k rows per stratum.
    */
  def exactKPerStratum(df: DataFrame, keyCol: String, strataCol: String,
      k: Int, salt: String): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val w = Window.partitionBy(strataCol)
      .orderBy(hashValue(keyCol, salt), col(keyCol))
    // NULL keys have no hash -> excluded BEFORE ranking (the module
    // contract); left in, Spark's ASC NULLS FIRST would rank them 1..m
    // while the oracle's NULLS LAST would not — a silent fork
    df.filter(col(keyCol).isNotNull)
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
  }

  /** Systematic probability-proportional-to-size (PPS) sampling: draw
    * `k` sample points per stratum, each row's selection probability
    * proportional to its weight (the survey-sampling classic for
    * "sample documents proportional to token count so the sample's
    * token mass mirrors the corpus"). A virtual axis of length
    * `tot(stratum)` is tiled by the rows (each row owns a
    * `[cum−w, cum)` segment in a hash-shuffled deterministic order)
    * and the k evenly-spaced points `j·tot/k` select whichever row's
    * segment they land in; `n_picks` counts the points landing in a
    * row (>1 when one heavy row spans several points — the standard
    * PPS multiplicity).
    *
    * Every comparison is EXACT integer arithmetic — the point
    * `j·tot/k ∈ [cum−w, cum)` test is cross-multiplied to
    * `⌈k·cum/tot⌉ − ⌈k·(cum−w)/tot⌉ > 0` — so the draw is
    * engine-reproducible with zero transcendental/float ops (the
    * repo's exact-long-division convention; the Efraimidis–Spirakis
    * `u^(1/w)` key form would hang the sample on cross-engine
    * `pow`/`log` last-ulp agreement). Caveat: k·tot must fit int64 —
    * at 100 TB corpora (tot ~ 10¹⁴ tokens) that bounds k ≲ 10⁴ per
    * stratum, the realistic range.
    *
    * Scale shape: the global prefix sum is [[Packing.withRunningSum]]
    * in (stratum, hash, key) order — a range exchange plus two linear
    * passes, NO per-stratum single-task window; per-stratum totals are
    * group-count-sized metadata (one small aggregate, collected and
    * re-broadcast as a literal CASE — the Percentiles discipline), and
    * the selection test is then scan-local.
    *
    * Contract: rows with NULL key/stratum/weight or weight ≤ 0 are
    * excluded (a zero-length segment can never contain a point; a
    * negative weight would corrupt every later prefix sum). Returns
    * selected rows with `n_picks` (≥1) appended.
    */
  def systematicPps(df: DataFrame, keyCol: String, strataCol: String,
      weightCol: String, k: Int, salt: String): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val in = df.filter(col(keyCol).isNotNull && col(strataCol).isNotNull &&
      col(weightCol).isNotNull && col(weightCol) > 0)
    // Pinned: the metadata aggregate below and the final selection both
    // consume it — without the checkpoint each action would re-run the
    // range-exchange prefix sum.
    val withCum = Packing.withRunningSum(in, "__cum", weightCol,
      col(strataCol), hashValue(keyCol, salt), col(keyCol))
      .localCheckpoint()

    // Stratum → (segment offset, stratum total), derived FROM the
    // running sum itself: the stratum's first row in the global
    // (stratum-major) order has __cum − w equal to the mass of all
    // earlier strata, so offset = min(__cum − w) and total =
    // max(__cum) − offset. Group-count-sized metadata (the Percentiles
    // discipline), and — unlike an independently-sorted prefix over
    // per-stratum totals — with no assumption that a driver-side sort
    // reproduces Spark's sort order for the stratum type.
    val cases = withCum.groupBy(strataCol)
      .agg(min(col("__cum") - col(weightCol)).as("__off"),
        max(col("__cum")).as("__hi"))
      .collect()
      .map(r => (r.get(0), r.getLong(1), r.getLong(2) - r.getLong(1)))
    val offset = cases.foldLeft(lit(null).cast("bigint")) {
      case (e, (s, o, _)) => when(col(strataCol) === lit(s), lit(o)).otherwise(e)
    }
    val tot = cases.foldLeft(lit(null).cast("bigint")) {
      case (e, (s, _, t)) => when(col(strataCol) === lit(s), lit(t)).otherwise(e)
    }

    // `div` (not `/`): Spark's `/` on bigints is DOUBLE division; the
    // cross-multiplied ceiling must stay in exact int64.
    withCum
      .withColumn("__ci", col("__cum") - offset)
      .withColumn("__tot", tot)
      .withColumn("n_picks",
        expr(s"(__ci * $k + __tot - 1) div __tot") -
          expr(s"((__ci - $weightCol) * $k + __tot - 1) div __tot"))
      .filter(col("n_picks") > 0)
      .drop("__cum", "__ci", "__tot")
  }

  /** Keep a row iff hash(salt|key) mod 10000 < ratesBp(stratum) basis
    * points (defaultBp for unlisted strata). Rows with a NULL key are
    * excluded regardless of rate — no hash exists for them, and
    * admitting them would make the sample depend on which stratum's
    * rate happened to apply; callers sampling null-keyed data must
    * assign keys first. (Null strata are fine: they draw defaultBp.)
    */
  def stratifiedHashSample(df: DataFrame, keyCol: String, strataCol: String,
      ratesBp: Map[String, Int], defaultBp: Int,
      salt: String): DataFrame = {
    val bucket = hashBucket(keyCol, salt)
    val rate = ratesBp.foldLeft(lit(defaultBp)) { case (acc, (s, bp)) =>
      when(col(strataCol) === s, lit(bp)).otherwise(acc)
    }
    df.filter(bucket < rate)
  }
}
