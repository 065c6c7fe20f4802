package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Trained quality classifier — the CCNet/fastText-class component: a
  * linear text classifier trained on labeled seed documents (reference
  * quality vs spam), stored as a model table, scoring the corpus at
  * scan speed. This is THE standard LLM-corpus quality filter (GPT-3's
  * WebText-reference classifier, CCNet's wiki-reference perplexity
  * bucketing, LLaMA's fastText gate).
  *
  * The model is an exact-integer Naive-Bayes TOKEN-VOTE form: per token
  * the Laplace-smoothed class-conditional relative frequencies are
  * compared cross-multiplied (pure int64 — no logs, no doubles, no
  * engine divergence), and a token votes ±1 only when one class is at
  * least `margin`× likelier — tokens with near-equal rates (the entire
  * shared vocabulary) vote 0 and are DROPPED from the model, which is
  * what keeps the artifact metadata-sized and the votes dominated by
  * genuinely discriminative features. A document's score is the sum of
  * its occurrences' votes; verdict = score > 0 (ties reject — the
  * conservative curation default).
  *
  * Scale posture: training is one token-occurrence scan + one
  * (token)-keyed partial agg; the stored model BROADCASTS onto the
  * scoring scan (fastText models are MBs — the broadcast-join shape,
  * never a shuffle of the corpus side); scoring is explode + broadcast
  * lookup + one doc-keyed partial agg. Int64 cross-products hold to
  * ~10^9 training tokens per class; past that the counts column moves
  * to DECIMAL(38,0) unchanged in structure.
  */
object Classifier {

  /** The model's SUFFICIENT STATISTICS: per-token class-conditional
    * occurrence counts. Additive by construction — which is what makes
    * the classifier incrementally maintainable: an arriving labeled
    * batch's counts MERGE into the stored table by plain summation
    * (`mergeCounts`), and the refreshed votes are identical to a full
    * retrain, without ever re-scanning the base corpus.
    */
  def tokenCounts(labeled: DataFrame, toksCol: String,
      labelCol: String): DataFrame =
    labeled.select(col(labelCol).as("__pos"),
        explode(col(toksCol)).as("token"))
      .groupBy("token")
      .agg(sum(when(col("__pos"), 1L).otherwise(0L)).as("cnt_p"),
        sum(when(col("__pos"), 0L).otherwise(1L)).as("cnt_n"))

  /** Merge two counts tables (stored + arriving batch): one union +
    * one token-keyed partial agg over batch-sized + model-sized rows.
    */
  def mergeCounts(stored: DataFrame, batch: DataFrame): DataFrame =
    stored.select("token", "cnt_p", "cnt_n")
      .union(batch.select("token", "cnt_p", "cnt_n"))
      .groupBy("token")
      .agg(sum("cnt_p").as("cnt_p"), sum("cnt_n").as("cnt_n"))

  /** Derive the vote model from a counts table. */
  def votesFromCounts(counts: DataFrame, margin: Int = 2): DataFrame = {
    require(margin >= 1, s"margin must be >= 1: $margin")
    // class totals + vocabulary size: one metadata-sized row, folded in
    // as literals (the model-store discipline — no driver-side loops)
    val t = counts.agg(sum("cnt_p").as("np"), sum("cnt_n").as("nn"),
      count(lit(1)).as("v")).head()
    val (np, nn, v) = (t.getLong(0), t.getLong(1), t.getLong(2))
    counts
      .withColumn("vote",
        when((col("cnt_p") + 1) * lit(nn + v) >
          lit(margin.toLong) * (col("cnt_n") + 1) * lit(np + v), 1)
        .when((col("cnt_n") + 1) * lit(np + v) >
          lit(margin.toLong) * (col("cnt_p") + 1) * lit(nn + v), -1)
        .otherwise(0))
      .filter(col("vote") =!= 0)
      .select(col("token"), col("vote").cast("long").as("vote"))
  }

  /** Train the token-vote model: `labeled` needs (`docIdCol`, tokens
    * array column `toksCol`, boolean `labelCol` — true = positive
    * class). Returns (token, vote) rows, vote ∈ {+1, −1}, zero-vote
    * tokens dropped.
    */
  def trainTokenVotes(labeled: DataFrame, toksCol: String,
      labelCol: String, margin: Int = 2): DataFrame =
    votesFromCounts(tokenCounts(labeled, toksCol, labelCol), margin)

  /** Score documents against a stored vote model: per doc the sum of
    * its token OCCURRENCES' votes (a repeated spam token votes each
    * time — the multinomial form), verdict = score > 0. The model side
    * broadcasts; the corpus side sees one explode + one doc-keyed
    * partial agg.
    */
  def scoreTokenVotes(docs: DataFrame, votes: DataFrame, docIdCol: String,
      toksCol: String): DataFrame = {
    val occ = docs.select(col(docIdCol), explode(col(toksCol)).as("token"))
    val scored = occ.join(broadcast(votes), Seq("token"), "left")
      .groupBy(docIdCol)
      .agg(sum(coalesce(col("vote"), lit(0L))).as("score"))
    // explode emits no rows for an empty token array, so a blank doc
    // would vanish from `scored` — left-join back onto the doc keys and
    // score it 0 (ties reject), keeping the one-verdict-per-doc contract.
    docs.select(col(docIdCol)).distinct()
      .join(scored, Seq(docIdCol), "left")
      .withColumn("score", coalesce(col("score"), lit(0L)))
      .withColumn("pred_pos", col("score") > 0)
  }

  /** Choose the gate's OPERATING POINT from a calibration sweep (the
    * q291 table: threshold, n_tp, n_fp, n_fn, precision_bp,
    * recall_bp): among thresholds meeting `minPrecisionBp`, maximize
    * F1 = 2·tp / (2·tp + fp + fn), ties to the SMALLEST threshold
    * (the recall-friendly side of equal F1). The F1 comparison runs
    * in double but stays exact: counts are small integers, division
    * is correctly rounded, and equal rationals round identically —
    * the oracle replays the identical rule in SQL. The sweep table is
    * metadata-sized (a handful of thresholds), so the collect is the
    * range-partitioner-boundaries class, not a data collect. Returns
    * (threshold, precision_bp, recall_bp).
    */
  def chooseOperatingPoint(calib: DataFrame,
      minPrecisionBp: Long): (Long, Long, Long) = {
    val rows = calib
      .filter(col("precision_bp").isNotNull &&
        col("precision_bp") >= minPrecisionBp)
      .select(col("threshold"), col("n_tp"), col("n_fp"), col("n_fn"),
        col("precision_bp"), col("recall_bp"))
      .collect()
    require(rows.nonEmpty,
      s"no calibration row meets precision >= $minPrecisionBp bp")
    val best = rows.map { r =>
      val (tp, fp, fn) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val f1 = if (2 * tp + fp + fn == 0) 0.0
        else 2.0 * tp / (2 * tp + fp + fn)
      (f1, -r.getLong(0), r) // max F1, then min threshold
    }.maxBy(t => (t._1, t._2))._3
    (best.getLong(0), best.getLong(4), best.getLong(5))
  }
}
