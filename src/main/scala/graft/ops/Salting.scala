package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-salting for skewed shuffle joins (SURVEY §7.4.5).
  *
  * A shuffle equi-join sends every row of a key to one reducer; a
  * pathological hot key (one user producing 10% of a 100 TB event
  * stream) serializes that reducer. Salting spreads the hot key over
  * `factor` reducers: the probe (large, skewed) side gets a
  * deterministic salt in [0, factor), the build side is exploded into
  * `factor` copies — one per salt — and the join key becomes
  * (keys, salt). Build-side cost is ×factor rows, probe-side skew is
  * ÷factor. AQE's skew-join split solves the same problem adaptively
  * for sort-merge joins; explicit salting remains the portable,
  * planner-independent form (and the only option for aggregations).
  */
object Salting {

  /** Equi-join `probe ⋈ build` on `keys`, salted by `saltSrc` (any
    * well-distributed probe-side column, e.g. an event id). `build`
    * rows are duplicated `factor` times; results are identical to the
    * unsalted join.
    */
  def saltedEquiJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
      saltSrc: Column, factor: Int): DataFrame = {
    require(factor > 0, s"salt factor must be positive, got $factor")
    // null saltSrc maps to salt 0 (not null) — a null salt would never
    // equi-join and silently drop the row, breaking the identical-to-
    // unsalted contract
    val salted = probe.withColumn("__salt",
      pmod(coalesce(saltSrc, lit(0)), lit(factor)).cast("int"))
    val buildX = build.withColumn("__salt",
      explode(expr(s"sequence(0, ${factor - 1})")))
    salted.join(buildX, keys :+ "__salt").drop("__salt")
  }
}
