package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.ZOrder

/** The write-side half of E70: `repartitionByRange(z)` + parquet gives
  * files whose z ranges are disjoint and whose per-column min/max
  * footer stats are tight in BOTH source dimensions — the property
  * `OPTIMIZE ZORDER BY` exists to create. A row-major control write of
  * the same grid shows the difference: its y stats span the full
  * domain in every file, so a y predicate can never skip a file.
  */
class ZOrderLayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._

  // 64x64 grid; x = id / 64 (row-major arrival order)
  private def grid = spark.range(64L * 64L)
    .select((col("id") / 64L).cast("bigint").as("x"),
      (col("id") % 64L).as("y"))

  private def fileStats(dir: String) = spark.read.parquet(dir)
    .groupBy(input_file_name().as("f"))
    .agg(min("x").as("xmin"), max("x").as("xmax"),
      min("y").as("ymin"), max("y").as("ymax"))
    .collect()

  // files parquet stat-pruning would keep for predicate `c <= 15`
  private def hits(stats: Array[org.apache.spark.sql.Row], c: String) =
    stats.count(_.getAs[Long](c + "min") <= 15L)

  test("z-ordered files prune on BOTH dimensions; row-major control can't") {
    val app = spark.sparkContext.applicationId
    val zDir = Scratch.register(s"/tmp/graft_zorder_layout_$app")
    val cDir = Scratch.register(s"/tmp/graft_rowmajor_layout_$app")

    val z = grid.withColumn("z", ZOrder.zValue("x", "y", 6))
    z.repartitionByRange(16, col("z")).write.mode("overwrite").parquet(zDir)
    // control: same data, same file count, arrival (row-major) order
    grid.repartitionByRange(16, col("x"), col("y"))
      .write.mode("overwrite").parquet(cDir)

    // z ranges are strictly disjoint file-to-file (z is unique and
    // range partitioning keeps equal keys together), so footer stats
    // on z are usable as a coarse index
    val zRanges = spark.read.parquet(zDir)
      .groupBy(input_file_name()).agg(min("z").as("lo"), max("z").as("hi"))
      .collect().map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi")))
      .sortBy(_._1)
    zRanges.sliding(2).foreach {
      case Array((_, aMax), (bMin, _)) => assert(aMax < bMin)
      case _ =>
    }

    val zStats = fileStats(zDir)
    val cStats = fileStats(cDir)
    assert(zStats.length === 16 && cStats.length === 16)

    // row-major: x stats prune perfectly, y stats prune NOTHING
    assert(hits(cStats, "x") <= 8)
    assert(hits(cStats, "y") === 16)

    // z-order: a quarter-domain predicate on EITHER dimension skips at
    // least half the files (exact tile alignment would give 4/16; the
    // slack allows for sampled range boundaries straddling tiles)
    assert(hits(zStats, "x") <= 8, s"x pruning: ${hits(zStats, "x")}/16")
    assert(hits(zStats, "y") <= 8, s"y pruning: ${hits(zStats, "y")}/16")
  }
}
