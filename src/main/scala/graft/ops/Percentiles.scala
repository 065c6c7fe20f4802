package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

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
    * Null values are ignored — the `percentile()` / `quantile_cont`
    * convention; a group of only nulls is absent from the result.
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
      .filter(col("__v").isNotNull)
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
    interpolate(probed, groupCols, ps)
  }

  /** The shared tail: probe rows (`__v`, `__rn`, `__n` per group) →
    * one percentile column per requested p, type-7 interpolated.
    */
  private def interpolate(probed: DataFrame, groupCols: Seq[String],
      ps: Seq[(String, Double)]): DataFrame = {
    val g = groupCols.map(col)
    def pos(p: Double): Column = (col("__n") - 1).cast("double") * lit(p)
    def lo(p: Double): Column = floor(pos(p)).cast("long") + 1L
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

  /** Exact per-group percentiles for FEW groups (groups ≪ cores), where
    * [[exact]]'s per-group window sort degenerates: `Window.partitionBy`
    * parallelism equals the group count, so 3 groups over 100 TB means
    * 3 single-threaded spill-sorts. This form keeps every core busy
    * regardless of group count:
    *   1. tiny count aggregate → per-group probe RANKS, computed on the
    *      driver (metadata-scale by the few-groups contract: groups ×
    *      percentiles × 2 longs — the documented reason this variant is
    *      for few groups);
    *   2. `repartitionByRange` on (group, value) + in-partition sort —
    *      the SAME exchange a global sort uses, splitting large groups
    *      across many partitions;
    *   3. one pass counting rows per (partition, group) → cumulative
    *      offsets (metadata-scale), then a second pass over the SAME
    *      shuffle output emits only rows whose offset+local rank is a
    *      probe rank (≤ 2·|ps| rows per group survive).
    * Ranks among tied values depend on partitioning, but the VALUE at
    * any rank doesn't — ties are interchangeable — so the result is
    * deterministic and identical to [[exact]].
    */
  def exactFewGroups(df: DataFrame, groupCols: Seq[String], valueCol: String,
      ps: Seq[(String, Double)]): DataFrame =
    interpolate(fewGroupsProbes(df, groupCols, valueCol, ps),
      groupCols, ps)

  /** Exact per-group LOWER order statistics at rank floor((n−1)·p)+1 —
    * the interpolation-free sibling of [[exactFewGroups]]: the result
    * is always an ELEMENT of the data, never a blend, so integer
    * inputs stay exactly representable and no interpolation
    * arithmetic crosses an engine boundary (the q254 lesson: type-7
    * blends agree with `quantile_cont` at p ∈ {.25, .5, .75} on the
    * gated fixtures but diverge in the last ulp at p = .1/.9 — two
    * algebraically-equal formulas, different rounding). Same two-pass
    * probe machinery; the rank arithmetic (floor of one IEEE double
    * multiply) is engine-portable.
    */
  def exactFewGroupsLowerRank(df: DataFrame, groupCols: Seq[String],
      valueCol: String, ps: Seq[(String, Double)]): DataFrame = {
    val probed = fewGroupsProbes(df, groupCols, valueCol, ps)
    def lo(p: Double): Column =
      floor((col("__n") - 1).cast("double") * lit(p)).cast("long") + 1L
    probed.groupBy(groupCols.map(col): _*)
      .agg(
        max(when(col("__rn") === lo(ps.head._2), col("__v")))
          .as(ps.head._1),
        ps.tail.map { case (name, p) =>
          max(when(col("__rn") === lo(p), col("__v"))).as(name)
        }: _*)
  }

  private def fewGroupsProbes(df: DataFrame, groupCols: Seq[String],
      valueCol: String, ps: Seq[(String, Double)]): DataFrame = {
    require(ps.nonEmpty && ps.forall { case (_, p) => p >= 0.0 && p <= 1.0 },
      s"percentiles must be in [0,1]: $ps")
    val spark = df.sparkSession
    val g = groupCols.map(col)
    val gl = groupCols.length
    val data = df.select(g :+ col(valueCol).cast("double").as("__v"): _*)
      .filter(col("__v").isNotNull) // percentile()/quantile_cont ignore nulls
    // per-group size AND probe ranks as one broadcast map — carrying
    // __n in the probe rows (instead of a join back to the counts)
    // keeps null GROUP KEYS intact: an equi-join on a null key would
    // silently drop that group
    val groupMeta: Map[Seq[Any], (Long, Set[Long])] =
      data.groupBy(g: _*).agg(count(lit(1)).as("__n")).collect().map { r =>
        val n = r.getLong(gl)
        val ranks = ps.flatMap { case (_, p) =>
          val lo = math.floor((n - 1).toDouble * p).toLong + 1L
          Seq(lo, lo + 1L)
        }.toSet
        (0 until gl).map(r.get) -> ((n, ranks))
      }.toMap
    val bcMeta = spark.sparkContext.broadcast(groupMeta)
    val sortCols = g :+ col("__v")
    val sorted = data.repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    // INVARIANT: both passes below must iterate the SAME RDD instance —
    // Dataset.rdd is a lazy val, so the shuffle stage is planned once and
    // reused, giving both jobs identical range-partition assignments
    // (ties at partition boundaries land identically). A refactor that
    // re-derives .rdd (or rebuilds the plan) per pass would silently
    // break the offset arithmetic under boundary ties.
    val sortedRdd = sorted.rdd
    val perPart: Array[(Int, Seq[Any], Long)] = sortedRdd
      .mapPartitionsWithIndex { (pid, it) =>
        val m = scala.collection.mutable.LinkedHashMap[Seq[Any], Long]()
        it.foreach { r =>
          val k = (0 until gl).map(r.get)
          m.update(k, m.getOrElse(k, 0L) + 1L)
        }
        m.iterator.map { case (k, c) => (pid, k, c) }
      }.collect()
    val offsets: Map[(Int, Seq[Any]), Long] = perPart.groupBy(_._2)
      .flatMap { case (k, arr) =>
        var acc = 0L
        arr.sortBy(_._1).map { case (pid, _, c) =>
          val o = acc; acc += c; ((pid, k), o)
        }
      }
    val bcOff = spark.sparkContext.broadcast(offsets)
    val probeRows = sortedRdd.mapPartitionsWithIndex { (pid, it) =>
      val local = scala.collection.mutable.HashMap[Seq[Any], Long]()
      it.flatMap { r =>
        val k = (0 until gl).map(r.get)
        val i = local.getOrElse(k, 0L) + 1L
        local.update(k, i)
        val rank = bcOff.value.getOrElse((pid, k), 0L) + i
        bcMeta.value.get(k) match {
          case Some((n, ranks)) if ranks.contains(rank) =>
            Some(Row.fromSeq(k :+ rank :+ r.getDouble(gl) :+ n))
          case _ => None
        }
      }
    }
    val probeSchema = StructType(
      data.schema.fields.dropRight(1).toSeq :+
        StructField("__rn", LongType, nullable = false) :+
        StructField("__v", DoubleType, nullable = false) :+
        StructField("__n", LongType, nullable = false))
    spark.createDataFrame(probeRows, probeSchema)
  }
}
