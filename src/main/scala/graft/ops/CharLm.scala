package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Character-bigram language-model quality scoring (SURVEY §7.2.8
  * extension) — the STATISTICAL member of the quality family: E1's
  * heuristics score surface shape (lengths, ratios); this scores how
  * corpus-typical a document's character stream is under a model
  * TRAINED on the corpus — the KenLM-perplexity-filter shape every
  * large pretraining pipeline runs, in its exact-integer core.
  *
  * Scoring uses scaled conditional probabilities, not log-perplexity:
  * each bigram c1c2 contributes (cnt(c1c2) · 2^20) div Σ_c cnt(c1·) —
  * truncating integer division, so any ANSI engine replays identical
  * longs (logs are transcendental; the ratio form keeps the ORDERING
  * perplexity consumers act on while staying bit-exact). A document's
  * score is the truncating mean contribution; improbable character
  * sequences drag it down exactly as they would log-prob.
  *
  * Scale shape: TRAINING is one scan-local bigram expansion (the
  * q177 skip-gram discipline — transform over the char positions,
  * zero joins) into ONE (c1, c2) partial-agg shuffle; the model is
  * alphabet² rows — metadata. SCORING broadcasts the model onto the
  * bigram stream and reduces per doc — one doc-keyed shuffle of
  * (id, counters), text never leaves the scan.
  */
object CharLm {

  /** 2^20 — the probability quantization (ppm-of-a-million-ish). */
  val Scale = 1048576L

  private def bigramsExpr(textCol: String) =
    expr(s"""case when length($textCol) < 2
            |  then cast(array() as array<string>)
            |  else transform(sequence(1, length($textCol) - 1),
            |    i -> substring($textCol, i, 2)) end""".stripMargin)

  /** Train: the (c1, c2, cnt) bigram count table over `textCol`. */
  def trainBigrams(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(bigramsExpr(textCol)).as("bg"))
      .select(substring(col("bg"), 1, 1).as("c1"),
        substring(col("bg"), 2, 1).as("c2"))
      .groupBy("c1", "c2")
      .agg(count(lit(1)).as("cnt"))

  /** Score every document under a stored bigram model: per doc the
    * bigram count, the exact integer sum of scaled conditional
    * probabilities, and their truncating mean. Documents shorter than
    * 2 chars (no bigrams) are absent — they have no defined score.
    * Scoring the training corpus itself has no OOV bigrams by
    * construction; for foreign corpora unseen bigrams contribute 0
    * (the harshest penalty) via the left join.
    */
  def score(docs: DataFrame, idCol: String, textCol: String,
      model: DataFrame): DataFrame = {
    val totals = model.groupBy("c1").agg(sum("cnt").as("tot"))
    docs
      .select(col(idCol), explode(bigramsExpr(textCol)).as("bg"))
      .select(col(idCol), substring(col("bg"), 1, 1).as("c1"),
        substring(col("bg"), 2, 1).as("c2"))
      .join(broadcast(model), Seq("c1", "c2"), "left")
      .join(broadcast(totals), Seq("c1"), "left")
      .select(col(idCol),
        expr(s"coalesce((cnt * ${Scale}L) div tot, 0L)").as("__q"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum("__q").as("sum_q"))
      .withColumn("avg_q", expr("sum_q div n_bigrams"))
  }
}
