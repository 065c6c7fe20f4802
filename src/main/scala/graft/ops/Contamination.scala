package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection (SURVEY §7.2.8 curation surface):
  * find corpus documents sharing word n-grams with a held-out
  * evaluation set — the standard pre-training hygiene check (n-gram
  * overlap against eval benchmarks) run as a join, not a scan-per-eval-
  * doc loop.
  *
  * Scale shape: the eval set is small by construction (benchmarks are
  * KBs against a 100 TB corpus), so its exploded gram index is
  * BROADCAST — the corpus side generates grams scan-locally, hash-joins
  * against the in-memory index, and only (corpus_id, eval_id) hits flow
  * into the final count aggregation. The corpus never shuffles its text
  * or grams; the single exchange is the per-pair partial-count agg.
  * Grams travel as md5 hashes (32 bytes), never as strings.
  */
object Contamination {

  /** Distinct word n-grams over an ALREADY-TOKENIZED column. Taking
    * tokens (not raw text) matters: a `split(text)` written inline
    * would be inlined by CollapseProject into the per-position lambda
    * and re-split the whole document once per gram (SURVEY §7.3) —
    * binding tokens to a column referenced by both the sequence bound
    * and the lambda keeps it one split per row. Texts shorter than n
    * words contribute their whole token run as one gram (mirrors the
    * shingle edge case).
    */
  def wordGrams(toksCol: String, n: Int): Column = expr(
    s"""array_distinct(transform(
       |  sequence(1, greatest(size($toksCol) - ${n - 1}, 1)),
       |  i -> array_join(slice($toksCol, i, $n), ' ')))""".stripMargin)

  /** Per-(corpus doc, eval doc) count of shared distinct word n-grams.
    * `evalSet` rows must be a subset of the id space disjoint from
    * `corpus` (callers split one table by a predicate).
    */
  def sharedGramCounts(corpus: DataFrame, evalSet: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame = {
    def gramHashes(df: DataFrame, as: String) = df
      .select(col(idCol).as(as), split(col(textCol), " ").as("__toks"))
      .select(col(as), explode(wordGrams("__toks", n)).as("__gram"))
      .select(col(as), md5(col("__gram")).as("__gh"))
    gramHashes(corpus, "corpus_id")
      .join(broadcast(gramHashes(evalSet, "eval_id")), "__gh")
      .groupBy("corpus_id", "eval_id")
      .agg(count(lit(1)).as("n_shared"))
  }
}
