package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling with gap fill (SURVEY §2.11 extension) —
  * the feature-engineering staple behind per-entity activity
  * features: densify each key's observations onto a fixed-step
  * integer grid, carrying known values across gaps by LINEAR
  * interpolation and forward-filling the tail after the last
  * observation. The output distinguishes observed / interpolated /
  * forward-filled rows so a downstream consumer can weight them.
  *
  * Scale shape: each key's grid runs from its OWN first observation
  * to the corpus-wide last bucket (one broadcast scalar) — the common
  * grid END is what aligns every key's features into one matrix, and
  * it is exactly what makes the forward-filled tail reachable (a
  * per-key max would make the last grid point an observation by
  * construction and `ffill` dead code). Rows ∝ Σ per-key spans via
  * `sequence` + explode; the join back to observations is a
  * co-partitioned equi-join on (key, bucket), and both fill
  * directions are per-key windows — partitioned by key, so the sort
  * is per-key-sized and shuffles once on the key. No global window,
  * no driver loop.
  *
  * Arithmetic contract: observations quantize to integer milli-units
  * via DECIMAL (the q121 discipline); interpolation is
  * v0 + (v1 − v0) · (g − h0) / (h1 − h0) evaluated in IEEE doubles
  * over integer-valued operands — the same expression any ANSI engine
  * replays bit-identically (one multiply, one divide, one add, same
  * order).
  */
object GapFill {

  /** Densify `df` per `keyCol` onto the integer grid `bucketCol`
    * (already computed by the caller, e.g. hours since epoch), with
    * `valueCol` a LONG milli-quantized measure. Duplicate buckets per
    * key must be pre-aggregated by the caller (the operator requires
    * (key, bucket) unique). Returns (key, bucket, value_milli double,
    * fill ∈ {observed, interp, ffill}).
    */
  def fill(df: DataFrame, keyCol: String, bucketCol: String,
      valueCol: String): DataFrame = {
    val obs = df.select(col(keyCol).as("__k"),
      col(bucketCol).cast("long").as("__h"),
      col(valueCol).cast("long").as("__v"))
    val grid = obs.groupBy("__k")
      .agg(min("__h").as("__h0"))
      .crossJoin(broadcast(obs.agg(max("__h").as("__g1"))))
      .select(col("__k"),
        explode(sequence(col("__h0"), col("__g1"))).as("__h"))
    val w = Window.partitionBy("__k").orderBy("__h")
    val back = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    grid.join(obs, Seq("__k", "__h"), "left")
      .withColumn("__pv", last(col("__v"), ignoreNulls = true).over(back))
      .withColumn("__ph", last(when(col("__v").isNotNull, col("__h")),
        ignoreNulls = true).over(back))
      .withColumn("__nv", first(col("__v"), ignoreNulls = true).over(fwd))
      .withColumn("__nh", first(when(col("__v").isNotNull, col("__h")),
        ignoreNulls = true).over(fwd))
      .select(col("__k").as(keyCol), col("__h").as(bucketCol),
        when(col("__v").isNotNull, col("__v").cast("double"))
          .when(col("__nh").isNull, col("__pv").cast("double"))
          .otherwise(col("__pv") +
            (col("__nv") - col("__pv")) * (col("__h") - col("__ph")) /
              (col("__nh") - col("__ph")))
          .as("value_milli"),
        when(col("__v").isNotNull, lit("observed"))
          .when(col("__nh").isNull, lit("ffill"))
          .otherwise(lit("interp")).as("fill"))
  }
}
