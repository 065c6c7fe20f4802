package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.{LandmarkTuning, ModelStore}

/** Landmark operating-point tuning (q314, [[LandmarkTuning]]): the
  * measured table's shape, the choice rule, the stored artifact, and
  * the proof that the q302 gate actually READS the artifact (a
  * different stored point changes clusters).
  */
class LandmarkTuningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("choice rule: smallest viable level, equal-margin threshold, " +
      "loud failure when nothing separates") {
    assert(LandmarkTuning.choose(Seq((0L, 9L, 0L), (2L, 9L, 1L)))
      === ((0L, 5L)))
    // level 0 unseparable -> falls to level 2
    assert(LandmarkTuning.choose(Seq((0L, 3L, 4L), (2L, 10L, 2L)))
      === ((2L, 7L)))
    val ex = intercept[IllegalArgumentException] {
      LandmarkTuning.choose(Seq((0L, 2L, 5L)))
    }
    assert(ex.getMessage.contains("no delta-quantization level"))
  }

  test("measured table + stats: exact deltas separate with full " +
      "margin, the coarsest level floods, the stored point is the " +
      "rule applied to the measurements") {
    val (pos, neg) = LandmarkTuning.labeledShared(spark)
    val st = LandmarkTuning.stats(pos, neg).collect()
      .map(r => (r.getInt(0).toLong, r.getLong(1), r.getLong(2)))
      .toSeq.sortBy(_._1)
    val at0 = st.find(_._1 == 0L).get
    // measured over the 256-group sample: twin floor 9, chance
    // ceiling 1 (one cross-pair shares a single hash even at exact
    // deltas) -> the equal-margin point is 6 (was hardcoded 3)
    assert(at0._2 === 9L && at0._3 === 1L)
    assert(LandmarkTuning.choose(st) === ((0L, 6L)))
    val tbl = LandmarkTuning.table(spark).collect()
    assert(tbl.length === LandmarkTuning.qLevels.length *
      LandmarkTuning.tMax)
    val row = (q: Long, t: Long) => tbl.find(r =>
      r.getLong(0) == q && r.getLong(1) == t).get
    // full recall at exact deltas up to the twin floor, zero beyond
    // the max twin overlap's reach at the chosen cell
    assert(row(0L, 6L).getAs[Long]("recall_bp") === 10000L)
    assert(row(0L, 6L).getAs[Long]("neg_admitted") === 0L)
    assert(row(0L, 10L).getAs[Long]("recall_bp") < 10000L)
    // the coarsest quantization measurably floods the candidate join
    assert(row(6L, 1L).getAs[Long]("neg_admitted") > 0L,
      "q=6 must show the measured precision cliff")
  }

  test("df-cap choice rule: smallest grid cap at 16x the sample max " +
      "df, loud failure on no recall floor, off-grid headroom, or " +
      "contradicting measurements") {
    val full = LandmarkTuning.capGrid.map(c =>
      (c.toLong, if (c >= 4) 768L else 100L, 0L))
    // floor 4, 16 x 6 = 96 -> next grid point 128
    assert(LandmarkTuning.chooseCap(full, 6L) === 128L)
    assert(LandmarkTuning.chooseCap(full, 4L) === 64L)
    val noFloor = LandmarkTuning.capGrid.map(c => (c.toLong, 100L, 0L))
    assert(intercept[IllegalArgumentException] {
      LandmarkTuning.chooseCap(noFloor, 6L)
    }.getMessage.contains("no swept df cap"))
    assert(intercept[IllegalArgumentException] {
      LandmarkTuning.chooseCap(full, 1000L)
    }.getMessage.contains("off the swept grid"))
    val lateFloor = LandmarkTuning.capGrid.map(c =>
      (c.toLong, if (c >= 256) 768L else 100L, 0L))
    assert(intercept[IllegalArgumentException] {
      LandmarkTuning.chooseCap(lateFloor, 1L)
    }.getMessage.contains("contradict"))
  }

  test("measured df-cap table: recall collapses below the floor, is " +
      "full from the floor up, and the chosen cap is the headroom " +
      "rule applied to the measured sample max df") {
    val tbl = LandmarkTuning.capTable(spark, 0L, 6L).collect()
    assert(tbl.length === LandmarkTuning.capGrid.length)
    assert(tbl.filter(_.getAs[Long]("cap") == 1L)
      .head.getAs[Long]("recall_bp") === 0L,
      "cap 1 excludes every shared hash by definition")
    val maxDf = tbl.head.getAs[Long]("sample_max_df")
    assert(maxDf >= 3L, "twin-shared hashes alone reach df 3")
    val chosen = tbl.filter(_.getAs[Boolean]("chosen"))
    assert(chosen.length === 1)
    val cap = chosen.head.getAs[Long]("cap")
    assert(cap === LandmarkTuning.capGrid.map(_.toLong)
      .filter(_ >= 16L * maxDf).min)
    assert(chosen.head.getAs[Long]("recall_bp") === 10000L)
    assert(chosen.head.getAs[Long]("neg_admitted") === 0L)
    // the stored artifact carries the same choice (q302 triggers the
    // operating-point store; q321 publishes the table it chose from)
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries("q321_df_cap_tuning")(spark, dir).count()
    SparkEntry.queries("q302_landmark_clusters")(spark, dir).count()
    val tag = (spark.sparkContext.applicationId + "_" + dir)
      .replaceAll("[^a-zA-Z0-9]", "_")
    val path =
      s"${System.getProperty("java.io.tmpdir")}/graft_lmop_$tag"
    val (_, _, m, _, _) = ModelStore.loadLandmarkPoint(spark, path)
    assert(m === cap)
  }

  test("a corrupt max_df fails loudly at load") {
    val path = s"${System.getProperty("java.io.tmpdir")}" +
      "/graft_lmop_corrupt_test"
    ModelStore.saveLandmarkPoint(spark, path, 6L, 0L, 0L, 10000L,
      10000L)
    assert(intercept[IllegalArgumentException] {
      ModelStore.loadLandmarkPoint(spark, path)
    }.getMessage.contains("max_df"))
  }

  test("q302 admits at the STORED point: a bogus artifact changes " +
      "clusters, the true artifact restores them") {
    val dir = "/root/testdata/sf0.001"
    val normal = SparkEntry.queries("q302_landmark_clusters")(
      spark, dir).count()
    val tag = (spark.sparkContext.applicationId + "_" + dir)
      .replaceAll("[^a-zA-Z0-9]", "_")
    val path =
      s"${System.getProperty("java.io.tmpdir")}/graft_lmop_$tag"
    val (t0, q0, m0, p0, r0) = ModelStore.loadLandmarkPoint(spark, path)
    try {
      ModelStore.saveLandmarkPoint(spark, path, 50L, q0, m0, p0, r0)
      val broken = SparkEntry.queries("q302_landmark_clusters")(
        spark, dir).count()
      assert(broken > normal,
        "an unreachable vote threshold must split every twin out")
    } finally
      ModelStore.saveLandmarkPoint(spark, path, t0, q0, m0, p0, r0)
    assert(SparkEntry.queries("q302_landmark_clusters")(
      spark, dir).count() === normal)
  }
}
