package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-string (edit-distance) self-join via the symmetric
  * deletion neighborhood (SURVEY §2.11 E145) — the entity-resolution /
  * vocabulary-normalization primitive: find every pair of strings
  * within Levenshtein distance 1 WITHOUT an all-pairs product.
  *
  * The symmetric-delete theorem (the SymSpell construction, public
  * algorithm): lev(a, b) ≤ 1 ⟺ D(a) ∩ D(b) ≠ ∅, where
  * D(s) = {s} ∪ {s with one char deleted}.
  *   - substitution at i: deleting position i from both sides collides;
  *   - insertion/deletion: the shorter string is itself a member of the
  *     longer one's delete set (and of its own);
  *   - conversely a shared variant implies each side is ≤ 1 delete from
  *     it, so lev ≤ 2 — candidates need one exact `levenshtein` verify.
  *
  * 100 TB shape: the candidate set comes from ONE equi-join on the
  * exploded variant keys — (len+1) short keys per string, hash-shuffled
  * like any dedup fingerprint — never a cartesian. Verification reads
  * only the candidate pair's own two strings (codegen'd `levenshtein`),
  * and the duplicate variant collisions between the same pair collapse
  * in a pre-verify `dropDuplicates` so the distance evaluates once per
  * pair. Key skew (a variant shared by many strings, e.g. a common
  * prefix family) bounds candidate fan-out by the true near-duplicate
  * density — the same argument as the E4 fingerprint groupBy.
  */
object FuzzyJoin {

  /** `array_distinct({s} ∪ one-char deletions of s)` as a Column. */
  def deletionVariants(c: String): Column = expr(
    s"""array_distinct(concat(array($c),
       |  transform(sequence(1, length($c)),
       |    i -> concat(substring($c, 1, i - 1),
       |                substring($c, i + 1, length($c) - i)))))"""
      .stripMargin)

  /** All unordered pairs of distinct `df.strCol` values with
    * Levenshtein distance ≤ `maxDist` (must be 1 — the delete depth the
    * variant set covers). Output: (name_a, name_b, dist), one row per
    * distinct VALUE pair.
    */
  def selfPairs(df: DataFrame, strCol: String,
      maxDist: Int = 1): DataFrame = {
    require(maxDist == 1,
      s"deletion depth 1 covers lev<=1 only, asked for $maxDist")
    val v = df.select(col(strCol))
      .distinct()
      .withColumn("__var", explode(deletionVariants(strCol)))
    val cand = v.as("a").join(v.as("b"), Seq("__var"))
      .filter(col(s"a.$strCol") < col(s"b.$strCol"))
      .select(col(s"a.$strCol").as("name_a"), col(s"b.$strCol").as("name_b"))
      .dropDuplicates("name_a", "name_b")
    cand
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= maxDist)
  }
}
