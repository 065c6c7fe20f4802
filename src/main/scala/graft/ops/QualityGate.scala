package graft.ops

import org.apache.spark.sql.{DataFrame, Observation, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Pipeline data-quality gates via `Dataset.observe` (SURVEY §2.11
  * E64) — the production pattern for "compute corpus metrics WHILE the
  * pipeline runs, abort if they breach": metrics accumulate on the
  * executors during the one pass the job already makes (no second
  * scan), and the driver checks thresholds after the action.
  *
  * At 100 TB this is the difference between monitoring for free and a
  * second full-corpus aggregation job.
  */
object QualityGate {

  /** One observed pass over the documents-shaped `df`: row count, null
    * texts, short texts (< `minChars`), total chars. Throws if the
    * corpus is empty or the null-text fraction exceeds `maxNullFrac`;
    * otherwise returns the metrics as a one-row DataFrame (the gate
    * report a pipeline would persist).
    */
  def textCorpusGate(df: DataFrame, textCol: String, charsCol: String,
      minChars: Long = 10L, maxNullFrac: Double = 0.5): DataFrame = {
    val spark = df.sparkSession
    val obs = Observation()
    val observed = df.observe(obs,
      count(lit(1)).as("n_rows"),
      count(when(col(textCol).isNull, 1)).as("n_null_text"),
      count(when(col(charsCol) < minChars, 1)).as("n_short"),
      coalesce(sum(col(charsCol)), lit(0L)).as("sum_chars"))
    observed.foreach(_ => ()) // the single pass that feeds the metrics
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
