package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (Type 2) build (SURVEY §2.11 E75) — the
  * warehouse operator that turns an update/event log into validity
  * intervals: one row per (key, attribute-run) with `[valid_from,
  * valid_to)` bounds and an `is_current` flag. The no-table-format
  * complement to the snapshot upsert (E63/q77): q77 keeps only the
  * latest version, this keeps the full history queryable by time.
  *
  * Scale shape: two windows, both partitioned by the dimension key —
  * parallelism is the key cardinality, state per partition is one
  * key's history (dimension-scale, not fact-scale). No global sort,
  * no self-join of the log against itself.
  */
object Scd {

  /** Collapse consecutive same-value runs of `attrCol` per `keyCol`
    * (ordered by `(tsCol, tieCol)` — the caller owns making that a
    * total order) and emit one row per run: `(key, attr, valid_from,
    * valid_to, is_current)`. `valid_to` is the NEXT run's start
    * (half-open interval, the SCD2 convention) and NULL on the open
    * run, which is also the `is_current` definition. A NULL attribute
    * is a real value: runs are split with null-safe comparison, so
    * null→X→null yields three runs.
    */
  def type2(df: DataFrame, keyCol: String, attrCol: String,
      tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    df.withColumn("__prev", lag(col(attrCol), 1).over(w))
      .withColumn("__first", lag(col(tsCol), 1).over(w).isNull)
      .filter(col("__first") || !(col("__prev") <=> col(attrCol)))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .select(col(keyCol), col(attrCol), col(tsCol).as("valid_from"),
        col("valid_to"), col("valid_to").isNull.as("is_current"))
  }
}
