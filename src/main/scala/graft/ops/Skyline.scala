package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D Pareto skyline (SURVEY §2.11 extension) — the maximal
  * frontier of points under coordinate-wise dominance: p dominates q
  * iff p.x ≥ q.x ∧ p.y ≥ q.y with at least one strict. The curation
  * query behind "best documents per cost": no doc on the frontier is
  * beaten on BOTH axes (e.g. length AND lexical diversity) by any
  * other doc, so the frontier is exactly the set a Pareto-optimal
  * selection pass may keep without a weighting function.
  *
  * Two-phase distributed shape (the classic partition-skyline /
  * merge-skyline split): phase 1 computes each partition's LOCAL
  * skyline with one in-memory sort + prefix-max sweep — a scan-local
  * `mapPartitions` that cuts n points to frontier-sized candidates
  * with zero shuffle, sound because global-skyline membership implies
  * local-skyline membership (dominance is checked against a SUBSET on
  * the partition, so survivors are a superset of the truth). Phase 2
  * re-runs the same sweep over the union of local skylines as a
  * prefix-max window — a single-task sort, deliberately so: the
  * candidate set is bounded by frontier-size × partitions (≤ distinct
  * x values), metadata-sized at any corpus scale, the same "window
  * over the small side" license q13 documents. Exact integer
  * arithmetic throughout; the sweep keeps a point iff its y strictly
  * exceeds the running max over points sorted by (x desc, y desc),
  * which handles x-ties (lower-y twin is dominated) and drops
  * y-ties at smaller x (dominated via strict x).
  */
object Skyline {

  /** Maximal (x, y) pairs of `points` under maximize-both dominance.
    * Duplicate coordinate pairs collapse to one frontier point; join
    * back on (x, y) to recover members.
    */
  def skyline2d(points: DataFrame, xCol: String, yCol: String): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    val p = points
      .select(col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
      .distinct()
    val local = p.as[(Long, Long)].mapPartitions { it =>
      val pts = it.toArray.sortBy(t => (-t._1, -t._2))
      var best = Long.MinValue
      val out = Array.newBuilder[(Long, Long)]
      for ((x, y) <- pts) if (y > best) { out += ((x, y)); best = y }
      out.result().iterator
    }.toDF("x", "y")
    val w = Window.orderBy(col("x").desc, col("y").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    local.withColumn("__m", max("y").over(w))
      .filter(col("__m").isNull || col("y") > col("__m"))
      .select("x", "y")
  }
}
