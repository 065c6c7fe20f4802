package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization of an event stream (SURVEY §7.2.8): a new
  * session starts when the gap to the user's previous event exceeds the
  * timeout. The batch mirror of a session window.
  *
  * Scale posture: one hash shuffle on the user key, then per-partition
  * sorts for the lag/running-sum windows — both windows share the same
  * (partition, order) spec so Catalyst plans a single sort. User keys are
  * high-cardinality and well-distributed, so no skew handling is needed;
  * a pathological single-user firehose would call for splitting that
  * user's timeline by coarse time range first.
  */
object Sessionize {

  /** Assign 1-based session indexes per user. `tieCol` breaks ordering
    * ties among equal timestamps (must make the order total).
    */
  def withSessionIndex(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, gapMillis: Long): DataFrame = {
    val order = Seq(col(tsCol).asc, col(tieCol).asc)
    val w = Window.partitionBy(userCol).orderBy(order: _*)
    events
      .withColumn("__prev_ms",
        lag(unix_millis(col(tsCol)), 1).over(w))
      .withColumn("__new_session",
        when(col("__prev_ms").isNull ||
          unix_millis(col(tsCol)) - col("__prev_ms") > gapMillis, 1L)
          .otherwise(0L))
      .withColumn("session_idx",
        sum(col("__new_session"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__prev_ms", "__new_session")
  }

  /** Per-session summary: event count + start/end epoch millis. */
  def sessionSummary(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, gapMillis: Long): DataFrame =
    withSessionIndex(events, userCol, tsCol, tieCol, gapMillis)
      .groupBy(col(userCol), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(unix_millis(col(tsCol))).as("session_start_ms"),
        max(unix_millis(col(tsCol))).as("session_end_ms"))
}
