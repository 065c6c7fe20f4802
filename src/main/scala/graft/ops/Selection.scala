package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Budgeted corpus selection (SURVEY §2.11 E72): take the best
  * documents — in a caller-chosen total order, typically quality
  * descending — until a token budget is exhausted. The standard "train
  * on the top-B tokens" curation step.
  *
  * The cumulative token count comes from [[Packing.withRunningSum]]
  * (sort → per-partition sums → broadcast offsets), so the global
  * prefix sum never funnels through a single task; the budget test is
  * then a scan-local filter. Two linear passes at 100 TB, no
  * single-task stage, no window over an unpartitioned ORDER BY.
  */
object Selection {

  /** Keep the maximal `orderCols`-prefix of rows whose STARTING token
    * offset is below `budget` — i.e. the greedy fill that admits the
    * straddling document (cum − n < budget), mirroring how packing
    * cuts a final partially-filled bin. A row exactly at the boundary
    * (previous rows sum to `budget`) is excluded. Rows with a NULL
    * `valueCol` never consume budget and are dropped (their running
    * sum is undefined until the first non-null row).
    *
    * Returns the selected rows with inclusive `cum_tok` appended.
    */
  def underTokenBudget(df: DataFrame, valueCol: String, budget: Long,
      orderCols: Column*): DataFrame = {
    require(budget > 0L, s"budget must be positive: $budget")
    Packing.withRunningSum(df, "cum_tok", valueCol, orderCols: _*)
      .filter(col("cum_tok").isNotNull &&
        col("cum_tok") - col(valueCol) < budget)
  }
}
