package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** The engine-portable sampling hash: md5 of `salt|key`, first 15 hex
    * digits as an integer, mod 10000 basis points. NULL keys hash to
    * NULL (every comparison against a threshold is then false — no-hash
    * rows never sample in). Shared by every hash-thresholded sampler
    * ([[stratifiedHashSample]], [[Mixing.balanceToMin]], q46's split).
    */
  def hashBucket(keyCol: String, salt: String): Column = {
    require(salt.matches("[A-Za-z0-9_]+"), s"salt must be alphanumeric: $salt")
    expr(
      s"""cast(conv(substring(md5(concat('$salt|',
         |  cast($keyCol as string))), 1, 15), 16, 10) as bigint) % 10000"""
        .stripMargin)
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
