package graft.ops

import org.apache.spark.sql.{DataFrame, Observation, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Pipeline data-quality gates via `Dataset.observe` (SURVEY §2.11
  * E64) — the production pattern for "compute corpus metrics WHILE the
  * pipeline runs, abort if they breach": [[observed]] attaches metric
  * accumulators to a DataFrame the caller is going to run ANYWAY (the
  * sink write, the next stage), so at 100 TB the metrics genuinely
  * cost no extra scan. [[textCorpusGate]] is the standalone form for
  * when the metrics row IS the product (a gate report): it pays one
  * metrics-only pass, which is what any engine needs to produce the
  * report — the observe machinery there demonstrates the same wiring
  * the piggybacked form uses.
  */
object QualityGate {

  /** The four text-corpus gate metrics. */
  private def metricExprs(textCol: String, charsCol: String, minChars: Long) =
    Seq(count(lit(1)).as("n_rows"),
      count(when(col(textCol).isNull, 1)).as("n_null_text"),
      count(when(col(charsCol) < minChars, 1)).as("n_short"),
      coalesce(sum(col(charsCol)), lit(0L)).as("sum_chars"))

  /** Attach gate metrics to `df` WITHOUT forcing a pass: returns the
    * pass-through DataFrame (run it through your sink as usual) and the
    * Observation whose `.get` blocks until that action completes. This
    * is the no-extra-scan production form.
    */
  def observed(df: DataFrame, textCol: String, charsCol: String,
      minChars: Long = 10L): (DataFrame, Observation) = {
    val obs = Observation()
    val es = metricExprs(textCol, charsCol, minChars)
    (df.observe(obs, es.head, es.tail: _*), obs)
  }

  /** Standalone gate report: one metrics pass over the corpus, threshold
    * checks on the driver, metrics returned as a one-row DataFrame.
    * Throws if the corpus is empty or the null-text fraction exceeds
    * `maxNullFrac`.
    */
  def textCorpusGate(df: DataFrame, textCol: String, charsCol: String,
      minChars: Long = 10L, maxNullFrac: Double = 0.5): DataFrame = {
    val spark = df.sparkSession
    val (observedDf, obs) = observed(df, textCol, charsCol, minChars)
    // the action a pipeline would run anyway; here the report is the
    // product, so this metrics pass is the query's one scan
    observedDf.foreach(_ => ())
    val m = obs.get
    val nRows = m("n_rows").asInstanceOf[Long]
    val nNull = m("n_null_text").asInstanceOf[Long]
    if (nRows == 0L)
      throw new IllegalStateException("quality gate: empty corpus")
    if (nNull.toDouble / nRows.toDouble > maxNullFrac)
      throw new IllegalStateException(
        s"quality gate: null-text fraction ${nNull.toDouble / nRows} " +
          s"exceeds $maxNullFrac")
    val schema = StructType(Seq(
      StructField("n_rows", LongType, nullable = false),
      StructField("n_null_text", LongType, nullable = false),
      StructField("n_short", LongType, nullable = false),
      StructField("sum_chars", LongType, nullable = false)))
    spark.createDataFrame(
      java.util.Arrays.asList(Row(nRows, nNull,
        m("n_short").asInstanceOf[Long],
        m("sum_chars").asInstanceOf[Long])),
      schema)
  }
}
