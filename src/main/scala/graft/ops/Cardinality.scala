package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sketch-based distinct counting (SURVEY §7.3's HLL surface):
  * corpus-cardinality profiling — unique URLs, vocab size, user counts
  * — is a routine curation question, and at 100 TB an EXACT distinct
  * on a high-cardinality column is a full shuffle of every key while
  * the HyperLogLog++ sketch is one scan with a fixed-size (kilobytes)
  * partial-aggregate state per partition.
  *
  * The estimate is MEASURED against the exact count (the q51
  * discipline: an approximation without an error number is
  * untrustworthy), so the profile reports both plus the relative
  * error. At profiling scale the exact side is affordable; at 100 TB a
  * caller keeps only the sketch column and the documented rsd bound.
  */
object Cardinality {

  /** One row per profiled column: (column_name, n_rows, exact_distinct,
    * approx_distinct, rel_error). Each column is one scan for the
    * sketch (map-side partial HLL) plus one distinct shuffle for the
    * exact baseline; `rsd` is the HLL++ target relative standard
    * deviation (Spark default 0.05).
    */
  def profile(df: DataFrame, cols: Seq[String], rsd: Double = 0.05,
      scope: String = ""): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val prefix = if (scope.isEmpty) "" else s"$scope."
    cols.map { c =>
      df.agg(
          count(lit(1)).as("n_rows"),
          countDistinct(col(c)).as("exact_distinct"),
          approx_count_distinct(col(c), rsd).as("approx_distinct"))
        .select(lit(prefix + c).as("column_name"),
          col("n_rows"), col("exact_distinct"), col("approx_distinct"),
          (abs(col("approx_distinct") - col("exact_distinct"))
            .cast("double") / col("exact_distinct").cast("double"))
            .as("rel_error"))
    }.reduce(_ union _)
  }
}
