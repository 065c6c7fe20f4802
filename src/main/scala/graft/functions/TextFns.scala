package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders for the training-data pipeline surface
  * (SURVEY §7.2.8): tokenization, n-gram shingling, quality scoring,
  * language-ID, and document fingerprinting over `documents.text`.
  *
  * Everything here is a *portable, deterministic* expression built from
  * codegen'd built-ins (no UDFs, no Python workers): the same math is
  * expressible in ANSI SQL, which is what makes these operators
  * oracle-checkable, and the expressions stay inside whole-stage codegen,
  * which is what makes them cheap at 100 TB — a scan-local map with no
  * shuffle.
  *
  * Hashing convention: `md5(...)` hex strings. md5 is bit-identical in
  * every engine (unlike murmur/xxhash whose seeds differ), so MinHash /
  * SimHash / fingerprints built on it verify across engines. Seeded
  * hash families are derived as `md5(seed || '|' || value)`.
  */
object TextFns {

  /** Whitespace tokens (the corpus is single-space separated). */
  def tokens(textCol: String): Column = split(col(textCol), " ")

  /** Distinct character n-gram shingles — the unit of near-dup detection.
    * For texts shorter than n, the whole text is the single shingle.
    */
  def shingles(textCol: String, n: Int): Column = expr(
    s"""array_distinct(transform(
       |  sequence(1, greatest(length($textCol) - ${n - 1}, 1)),
       |  i -> substring($textCol, i, $n)))""".stripMargin)

  /** Stopword profiles used by both quality scoring and language-ID.
    * Tiny by design: the point is the mechanism (token-set membership
    * scoring), which at scale would load real per-language profiles.
    */
  val stopwordProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "los", "las", "y", "es"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "zh" -> Seq("的", "是", "了", "在", "和"))

  private def inList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("(", ",", ")")

  /** Count of tokens belonging to `words` (a profile hit count). */
  def profileHits(tokensCol: String, words: Seq[String]): Column =
    expr(s"size(filter($tokensCol, t -> t in ${inList(words)}))")

  /** Heuristic language-ID: argmax of per-language stopword-profile hits,
    * ties broken by language-code order (deterministic). At 100 TB this
    * stays a narrow scan-local projection: O(tokens × profiles) per row,
    * no shuffle, no state.
    */
  def languageId(tokensCol: String): Column = {
    val scores = stopwordProfiles.map { case (lang, words) =>
      lang -> s"size(filter($tokensCol, t -> t in ${inList(words)}))"
    }
    val best = scores.map(_._2).mkString("greatest(", ", ", ")")
    val cases = scores
      .map { case (lang, s) => s"when $s = __best then '$lang'" }
      .mkString(" ")
    expr(
      s"""case when __best <= 0 then 'und' $cases else 'und' end"""
        .replace("__best", best))
  }

  /** Length/stopword/word-shape quality score in [0,1] — the standard
    * pre-training heuristic filter family, as one deterministic double
    * expression (identical arithmetic in any IEEE-754 engine).
    */
  def qualityScore(textCol: String, tokensCol: String): Column = {
    val nTok = s"cast(size($tokensCol) as double)"
    val stop =
      s"cast(size(filter($tokensCol, t -> t in ${inList(stopwordProfiles(1)._2)})) as double)"
    val avgLen = s"(cast(length($textCol) as double) - ($nTok - 1.0d)) / $nTok"
    expr(
      s"""0.5d * least($nTok / 100.0d, 1.0d)
         | + 0.3d * (1.0d - $stop / $nTok)
         | + 0.2d * least(($avgLen) / 8.0d, 1.0d)""".stripMargin)
  }

  /** Canonical-form fingerprint: md5 of the whitespace-normalized,
    * lower-cased text. Exact-dedup key (group-by on this column is a
    * single hash shuffle of 32-byte keys, not of document bodies).
    */
  def fingerprint(textCol: String): Column =
    md5(regexp_replace(lower(trim(col(textCol))), "\\s+", " ")
      .cast("binary"))

  /** Winnowing-style content fingerprint: the minimum shingle hash —
    * stable under small edits away from the minimizing shingle.
    */
  def minShingleHash(textCol: String, n: Int): Column = expr(
    s"""array_min(transform(
       |  array_distinct(transform(
       |    sequence(1, greatest(length($textCol) - ${n - 1}, 1)),
       |    i -> substring($textCol, i, $n))),
       |  s -> md5(s)))""".stripMargin)
}
