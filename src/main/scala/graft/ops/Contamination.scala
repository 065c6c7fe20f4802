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

  /** Distinct word n-grams of a whitespace-tokenized text column. Texts
    * shorter than n words contribute their whole token run as one gram
    * (mirrors the shingle edge case).
    */
  def wordGrams(textCol: String, n: Int): Column = expr(
    s"""array_distinct(transform(
       |  sequence(1, greatest(size(split($textCol, ' ')) - ${n - 1}, 1)),
       |  i -> array_join(slice(split($textCol, ' '), i, $n), ' ')))"""
      .stripMargin)

  /** Per-(corpus doc, eval doc) count of shared distinct word n-grams.
    * `evalSet` rows must be a subset of the id space disjoint from
    * `corpus` (callers split one table by a predicate).
    */
  def sharedGramCounts(corpus: DataFrame, evalSet: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame = {
    def gramHashes(df: DataFrame, as: String) = df
      .select(col(idCol).as(as),
        explode(wordGrams(textCol, n)).as("__gram"))
      .select(col(as), md5(col("__gram")).as("__gh"))
    gramHashes(corpus, "corpus_id")
      .join(broadcast(gramHashes(evalSet, "eval_id")), "__gh")
      .groupBy("corpus_id", "eval_id")
      .agg(count(lit(1)).as("n_shared"))
  }
}
