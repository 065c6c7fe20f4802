package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed EXACT percentiles with O(1) aggregation state per group
  * (SURVEY §7.2.8 profiling surface).
  *
  * Spark's `percentile()` materializes every value of a group in the
  * aggregation buffer (ObjectHashAggregate) — a 100 TB group OOMs the
  * executor. This is the equivalent that doesn't:
  *   1. one hash shuffle on the group key; inside each partition a sort
  *      by value gives every row its rank (`row_number`), and the group
  *      count rides the SAME exchange as an unordered window count —
  *      one pass, no second scan, no count join;
  *   2. only the ≤ 2 probe rows per requested percentile survive the
  *      rank filter; a plain hash aggregate pivots them to columns and
  *      applies the interpolation.
  * State per group after the window is a handful of scalars — never a
  * value buffer. The per-group sort is inherent to exact percentiles
  * (any engine must order the values) and distributes across groups.
  *
  * Interpolation is type-7 (R default / NumPy "linear" / DuckDB
  * `quantile_cont`): pos = (n−1)·p zero-based, result =
  * v_lo + frac·(v_hi − v_lo). The formula shape matches the DuckDB
  * oracle's so doubles agree bit-for-bit on interpolation-exact data.
  */
object Percentiles {

  /** Exact per-group percentiles of `valueCol` (read as double).
    *
    * @param ps (output column name, percentile in [0,1]) pairs
    */
  def exact(df: DataFrame, groupCols: Seq[String], valueCol: String,
      ps: Seq[(String, Double)]): DataFrame = {
    require(ps.nonEmpty && ps.forall { case (_, p) => p >= 0.0 && p <= 1.0 },
      s"percentiles must be in [0,1]: $ps")
    val g = groupCols.map(col)
    val wRank = Window.partitionBy(g: _*).orderBy(col("__v").asc)
    val wAll = Window.partitionBy(g: _*)
    // ties in __v need no tiebreak: equal values make every rank
    // assignment among them produce the same probe value
    val ranked = df
      .select(g :+ col(valueCol).cast("double").as("__v"): _*)
      .withColumn("__rn", row_number().over(wRank).cast("long"))
      .withColumn("__n", count(lit(1)).over(wAll))
    // 0-based probe position of percentile p inside the sorted group;
    // (n−1)·p is exact in double arithmetic for any realistic n
    def pos(p: Double): Column = (col("__n") - 1).cast("double") * lit(p)
    def lo(p: Double): Column = floor(pos(p)).cast("long") + 1L
    val probed = ranked.filter(
      ps.map { case (_, p) =>
        col("__rn") === lo(p) || col("__rn") === lo(p) + 1L
      }.reduce(_ || _))
    val aggs = ps.zipWithIndex.flatMap { case ((_, p), i) =>
      Seq(
        max(when(col("__rn") === lo(p), col("__v"))).as(s"__vlo$i"),
        max(when(col("__rn") === lo(p) + 1L, col("__v"))).as(s"__vhi$i"),
        // constant within a group; min() is just a deterministic pick
        min(pos(p) - floor(pos(p))).as(s"__frac$i"))
    }
    probed.groupBy(g: _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(g ++ ps.zipWithIndex.map { case ((name, _), i) =>
        // v_hi is absent when the probe sits exactly on the last rank
        // (frac = 0) — interpolation degenerates to v_lo
        (col(s"__vlo$i") + col(s"__frac$i") *
          (coalesce(col(s"__vhi$i"), col(s"__vlo$i")) - col(s"__vlo$i")))
          .as(name)
      }: _*)
  }
}
