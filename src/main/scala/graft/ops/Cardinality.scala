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
    * approx_distinct, rel_error). ONE aggregation over one scan for
    * all columns (the q79 profiler discipline — Spark plans the
    * multi-distinct via Expand), pivoted to rows with `stack` on the
    * single result row; `rsd` is the HLL++ target relative standard
    * deviation (Spark default 0.05).
    */
  def profile(df: DataFrame, cols: Seq[String], rsd: Double = 0.05,
      scope: String = ""): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val prefix = if (scope.isEmpty) "" else s"$scope."
    val aggs = count(lit(1)).as("n_rows") +: cols.zipWithIndex.flatMap {
      case (c, i) => Seq(countDistinct(col(c)).as(s"__ex_$i"),
        approx_count_distinct(col(c), rsd).as(s"__ap_$i"))
    }
    val stacked = cols.zipWithIndex
      .map { case (c, i) => s"'${prefix + c}', __ex_$i, __ap_$i" }
      .mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .select(col("n_rows"), expr(s"stack(${cols.length}, $stacked)")
        .as(Seq("column_name", "exact_distinct", "approx_distinct")))
      .select(col("column_name"), col("n_rows"),
        col("exact_distinct"), col("approx_distinct"),
        (abs(col("approx_distinct") - col("exact_distinct"))
          .cast("double") / col("exact_distinct").cast("double"))
          .as("rel_error"))
  }
}
