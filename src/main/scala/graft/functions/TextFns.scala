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

  /** Keyed profile lookup — callers must not rely on Seq position. */
  def profile(lang: String): Seq[String] =
    stopwordProfiles.toMap.apply(lang)

  /** SQL string literal with backslash-then-quote escaping — the one
    * escaping discipline for every expr() that embeds caller-supplied
    * words (a backslash escaped after the quote pass would re-break
    * the quote escape, so order matters and lives in one place).
    */
  private[graft] def sqlLit(w: String): String =
    "'" + w.replace("\\", "\\\\").replace("'", "\\'") + "'"

  private def inList(words: Seq[String]): String =
    words.map(sqlLit).mkString("(", ",", ")")

  /** Count of tokens belonging to `words` (a profile hit count). */
  def profileHits(tokensCol: String, words: Seq[String]): Column =
    expr(s"size(filter($tokensCol, t -> t in ${inList(words)}))")

  /** The per-language score vector over caller-supplied profiles, in
    * the given profile order.
    */
  private def scoresExprFrom(profiles: Seq[(String, Seq[String])],
      tokensCol: String): String =
    profiles
      .map { case (_, words) =>
        s"size(filter($tokensCol, t -> t in ${inList(words)}))"
      }
      .mkString("array(", ", ", ")")

  /** The per-language score vector, in [[stopwordProfiles]] order. */
  private def scoresExpr(tokensCol: String): String =
    scoresExprFrom(stopwordProfiles, tokensCol)

  /** Argmax over a precomputed score array: first max in profile order
    * (deterministic tiebreak), 'und' when nothing scores.
    */
  private def pickExprFrom(profiles: Seq[(String, Seq[String])],
      scoresCol: String): String = {
    val langs = profiles.map(p => sqlLit(p._1)).mkString(", ")
    s"""case when array_max($scoresCol) <= 0 then 'und'
       |else element_at(array($langs), cast(
       |  array_position($scoresCol, array_max($scoresCol)) as int))
       |end""".stripMargin
  }

  private def pickExpr(scoresCol: String): String =
    pickExprFrom(stopwordProfiles, scoresCol)

  /** Heuristic language-ID: argmax of per-language stopword-profile hits,
    * ties broken by profile order (deterministic). At 100 TB this stays
    * a narrow scan-local projection: O(tokens × profiles) per row, no
    * shuffle, no state. Prefer [[withLanguageId]] on the hot path — it
    * evaluates the profile filters exactly once per row, where this
    * single-Column form re-evaluates the score array per reference
    * (higher-order filters are interpreted; codegen CSE can't dedupe
    * them).
    */
  def languageId(tokensCol: String): Column =
    expr(pickExpr(scoresExpr(tokensCol)))

  /** Efficient language-ID: materializes the score array in its own
    * projection (referenced more than once downstream, so Catalyst's
    * CollapseProject keeps it — each profile filter runs once per row)
    * before the argmax pick.
    */
  def withLanguageId(df: org.apache.spark.sql.DataFrame, tokensCol: String,
      out: String): org.apache.spark.sql.DataFrame =
    withLanguageIdFrom(df, stopwordProfiles, tokensCol, out)

  /** [[withLanguageId]] over CALLER-SUPPLIED profiles — the
    * stored-model scoring path (q278): profiles are TRAINED from the
    * corpus (the q250 high-df discovery), persisted via
    * `ModelStore.saveTokenProfiles`, loaded (metadata-sized), and
    * folded in here as plan literals — scan-local scoring, the
    * train-once / score-many discipline. The hardcoded
    * [[stopwordProfiles]] remain only as the bootstrap for corpora
    * with no trained model yet. Argmax ties break by profile order
    * (pass languages sorted for determinism); a document hitting no
    * profile — an UNSEEN language — falls back to 'und'
    * (spec-asserted in `StoredLangIdSpec`).
    */
  def withLanguageIdFrom(df: org.apache.spark.sql.DataFrame,
      profiles: Seq[(String, Seq[String])], tokensCol: String,
      out: String): org.apache.spark.sql.DataFrame = {
    require(profiles.nonEmpty, "empty language profiles")
    df.withColumn("__lang_scores", expr(scoresExprFrom(profiles, tokensCol)))
      .withColumn(out, expr(pickExprFrom(profiles, "__lang_scores")))
      .drop("__lang_scores")
  }

  /** Length/stopword/word-shape quality score in [0,1] — the standard
    * pre-training heuristic filter family, as one deterministic double
    * expression (identical arithmetic in any IEEE-754 engine).
    */
  def qualityScore(textCol: String, tokensCol: String): Column = {
    val nTok = s"cast(size($tokensCol) as double)"
    val stop =
      s"cast(size(filter($tokensCol, t -> t in ${inList(profile("en"))})) as double)"
    val avgLen = s"(cast(length($textCol) as double) - ($nTok - 1.0d)) / $nTok"
    expr(
      s"""0.5d * least($nTok / 100.0d, 1.0d)
         | + 0.3d * (1.0d - $stop / $nTok)
         | + 0.2d * least(($avgLen) / 8.0d, 1.0d)""".stripMargin)
  }

  /** Canonical-form fingerprint: md5 of the NFC-normalized,
    * whitespace-normalized, lower-cased text. Exact-dedup key
    * (group-by on this column is a single hash shuffle of 32-byte
    * keys, not of document bodies). NFC first
    * ([[graft.expressions.UnicodeNormalize]]): real crawls carry the
    * same text precomposed and decomposed (é as U+00E9 or
    * e + U+0301), which evades a byte-level md5 — canonical
    * equivalence is exactly the class that is safe to collapse
    * unconditionally. The oracle side replays with DuckDB's
    * `nfc_normalize`. (NFKC — full-width/ligature folding — is a
    * lossy per-corpus choice, exposed as [[UnicodeNormalize.nfkc]]
    * but deliberately NOT in the default chain.)
    */
  def fingerprint(textCol: String): Column =
    md5(regexp_replace(
      lower(trim(graft.expressions.UnicodeNormalize.nfc(col(textCol)))),
      "\\s+", " ").cast("binary"))

  /** Winnowing-style content fingerprint: the minimum shingle hash —
    * stable under small edits away from the minimizing shingle.
    */
  def minShingleHash(textCol: String, n: Int): Column = expr(
    s"""array_min(transform(
       |  array_distinct(transform(
       |    sequence(1, greatest(length($textCol) - ${n - 1}, 1)),
       |    i -> substring($textCol, i, $n))),
       |  s -> md5(s)))""".stripMargin)

  /** Repeated-token ratio: 1 − |distinct tokens| / |tokens| — the
    * Gopher-family repetition signal (Rae et al. 2021 §A1.1 publishes
    * the filter family; this is the token-level member that applies to
    * single-line text). Scan-local; the division shape must match the
    * oracle's for bit-identical doubles.
    */
  def dupTokenRatio(toksCol: String): Column = expr(
    s"""1.0d - cast(size(array_distinct($toksCol)) as double)
       |     / cast(size($toksCol) as double)""".stripMargin)

  /** Word bigrams in order (length n−1; empty for a single token —
    * guarded because `sequence(1, 0)` is the DESCENDING [1, 0] in
    * Spark, which would index element 0 and crash). Callers should
    * bind this to a named column referenced more than once so
    * CollapseProject keeps it a single per-row computation (SURVEY
    * §7.3 — used-once aliases get inlined into consuming lambdas and
    * recomputed).
    */
  def wordBigrams(toksCol: String): Column = expr(
    s"""case when size($toksCol) >= 2 then
       |  transform(sequence(1, size($toksCol) - 1),
       |    i -> concat(element_at($toksCol, i), ' ',
       |                element_at($toksCol, i + 1)))
       |else cast(array() as array<string>) end""".stripMargin)

  /** Share of all grams held by the most frequent one — the "top n-gram
    * share" repetition signal. O(distinct·n) per document via list
    * lambdas; bounded by document length, embarrassingly scan-local.
    */
  def topGramShare(gramsCol: String): Column = expr(
    s"""cast(array_max(transform(array_distinct($gramsCol),
       |    x -> size(filter($gramsCol, b -> b = x)))) as double)
       |  / cast(size($gramsCol) as double)""".stripMargin)

  /** Luhn checksum validity of a digit string (the mod-10 check every
    * real payment-card number passes): from the RIGHT, double every
    * second digit (subtracting 9 on overflow), sum, and test total
    * mod 10 = 0. The verification layer a PII screen runs AFTER digit
    * runs are found — a random 16-digit run passes with p = 1/10, so
    * Luhn cuts card-number false positives 10× before redaction or
    * escalation. One scan-local integer fold per candidate (codegen
    * HOF, no UDF); any ANSI engine replays it bit-exactly. The
    * reversed string is materialized ONCE as a lambda binding (the
    * transform(array(...)) scalar-let trick — the first form
    * re-reversed the input per digit), each digit is read once into a
    * struct, and the empty string is explicitly false (a zero-length
    * candidate is not a valid card number, not an unknown).
    */
  def luhnValid(digitsCol: String): Column = {
    val d = digitsCol
    expr(
      s"""length($d) > 0 and element_at(
         |  transform(array(reverse($d)), r ->
         |    aggregate(
         |      transform(sequence(1, length(r)), i ->
         |        named_struct('odd', i % 2 = 1,
         |          'v', cast(substring(r, i, 1) as long))),
         |      0L,
         |      (a, s) -> a + if(s.odd, s.v,
         |        if(s.v * 2 > 9, s.v * 2 - 9, s.v * 2))) % 10 = 0),
         |  1)""".stripMargin)
  }

  /** Digit masking for identifier-bearing fields (account ids, ticket
    * numbers): every digit replaced, shape preserved. Scan-local,
    * dialect-portable (plain character class, no lookaround).
    */
  def maskDigits(c: Column, repl: String = "#"): Column =
    regexp_replace(c, "[0-9]", repl)

  /** PII redaction for free text: emails then phone-number runs are
    * replaced with typed placeholders. Patterns are deliberately
    * lookaround-free so the same regex runs identically under Java
    * (Spark) and RE2-class engines. Conservative by design — a
    * production pipeline would chain locale-specific patterns; the
    * mechanism (ordered scan-local regexp_replace chain, no UDF) is
    * what carries to 100 TB.
    */
  def redactPii(c: Column): Column = {
    val email = regexp_replace(c,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    regexp_replace(email, "\\+?[0-9][0-9()\\-\\s.]{6,}[0-9]", "<PHONE>")
  }

  /** Markup extraction — the crawl→text step (the Common Crawl
    * WARC→WET shape): strip comments, the whole head block, script and
    * style elements WITH their content (tag-stripping alone would leak
    * JS/CSS into training text), then every remaining tag; decode the
    * core character entities; collapse whitespace runs. An ordered
    * scan-local `regexp_replace` chain, fully inside whole-stage
    * codegen (no UDF, no parser state) — patterns are lookaround-free
    * and use inline `(?s)` so the same regex runs identically under
    * Java (Spark) and RE2-class engines (the oracle replays the chain
    * verbatim). Entity decode order matters: `&amp;` is decoded LAST,
    * the classic rule that keeps `&amp;#32;` from double-decoding.
    */
  def stripMarkup(html: Column): Column = {
    val noComment = regexp_replace(html, "(?s)<!--.*?-->", "")
    val noHead = regexp_replace(noComment, "(?s)<head>.*?</head>", "")
    val noScript = regexp_replace(noHead,
      "(?s)<script[^>]*>.*?</script>", "")
    val noStyle = regexp_replace(noScript,
      "(?s)<style[^>]*>.*?</style>", "")
    val noTags = regexp_replace(noStyle, "<[^>]*>", " ")
    val sp32 = regexp_replace(noTags, "&#32;", " ")
    val lt = regexp_replace(sp32, "&lt;", "<")
    val gt = regexp_replace(lt, "&gt;", ">")
    val amp = regexp_replace(gt, "&amp;", "&")
    trim(regexp_replace(amp, "\\s+", " "))
  }
}
