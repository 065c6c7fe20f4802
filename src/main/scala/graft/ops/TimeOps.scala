package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Timestamp derivation — replaces the reference's Python scalar UDF
  * (`etl.py:124`, SURVEY §2.7 U1) with built-in, codegen'd expressions.
  *
  * Semantics preserved exactly: epoch **milliseconds** → UTC timestamp
  * with sub-second precision (`timestamp_millis`), then calendar fields
  * (`etl.py:128–133`, SURVEY §2.6 X2–X7). Spark `dayofweek` is
  * 1=Sunday…7=Saturday.
  */
object TimeOps {

  /** Epoch-millis long → timestamp, millisecond precision preserved. */
  def fromEpochMillis(ms: Column): Column = timestamp_millis(ms)

  /** Timestamp → epoch millis (truncating sub-ms). */
  def toEpochMillis(ts: Column): Column = unix_millis(ts)

  /** The reference's time-dimension derivations (`etl.py:128–135`):
    * hour/day/week/month/year/weekday off a timestamp column. All cast to
    * long so downstream comparisons are type-stable across engines.
    */
  def withCalendarFields(df: DataFrame, tsCol: String): DataFrame =
    df.withColumn("hour", hour(col(tsCol)).cast("long"))
      .withColumn("day", dayofmonth(col(tsCol)).cast("long"))
      .withColumn("week", weekofyear(col(tsCol)).cast("long"))
      .withColumn("month", month(col(tsCol)).cast("long"))
      .withColumn("year", year(col(tsCol)).cast("long"))
      .withColumn("weekday", dayofweek(col(tsCol)).cast("long"))
}
