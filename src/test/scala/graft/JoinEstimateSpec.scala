package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.ops.JoinEstimate

/** [[JoinEstimate]] on hand-checkable key sets: the exact side, the
  * structural overestimate guarantee, a collision-free regime where
  * the estimate IS exact, and counter-merge linearity (the q228
  * algebra).
  */
class JoinEstimateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df(keys: Seq[Int]) = keys.toDF("k")

  test("exact side: sum of per-key frequency products, nulls excluded") {
    // A: 1,1,2,3,null  B: 1,2,2,null  ->  2*1 + 1*2 = 4
    val a = Seq(Some(1), Some(1), Some(2), Some(3), None).toDF("k")
    val b = Seq(Some(1), Some(2), Some(2), None).toDF("k")
    val row = JoinEstimate.joinSize(a, col("k"), b, col("k"), 3, 64)
      .head()
    assert(row.getAs[Long]("exact_pairs") === 4L)
    assert(row.getAs[Boolean]("overestimate_ok"))
  }

  test("wide matrix (no collisions expected): estimate equals exact") {
    val a = df(1 to 50)
    val b = df((26 to 75) ++ (26 to 40)) // overlap 26..50, some twice
    val row = JoinEstimate.joinSize(a, col("k"), b, col("k"),
      4, 1 << 22).head()
    // exact: keys 26..40 appear twice in b (2 each), 41..50 once
    assert(row.getAs[Long]("exact_pairs") === (15 * 2 + 10).toLong)
    assert(row.getAs[Long]("est_pairs") === row.getAs[Long]("exact_pairs"))
    assert(row.getAs[Long]("err_bp") === 0L)
  }

  test("narrow matrix: estimate overestimates but never underestimates") {
    val a = df(1 to 200)
    val b = df(101 to 300)
    val row = JoinEstimate.joinSize(a, col("k"), b, col("k"), 3, 8)
      .head()
    assert(row.getAs[Long]("exact_pairs") === 100L)
    assert(row.getAs[Long]("est_pairs") >= 100L)
    assert(row.getAs[Boolean]("overestimate_ok"))
  }

  test("disjoint keys across a narrow matrix: exact 0, est honest") {
    val row = JoinEstimate.joinSize(df(1 to 10), col("k"),
      df(11 to 20), col("k"), 2, 4).head()
    assert(row.getAs[Long]("exact_pairs") === 0L)
    // buckets collide at w=4, so est may exceed 0 — but err_bp is
    // pinned to 0 by the exact=0 guard, never a division blowup
    assert(row.getAs[Long]("err_bp") === 0L)
  }

  test("counter linearity: merge(counters(h), counters(d)) equals " +
      "counters(h union d) row-for-row") {
    val h = df(Seq(1, 1, 2, 5, 9))
    val d = df(Seq(2, 3, 9, 9))
    val merged = JoinEstimate.mergeCounters(
      JoinEstimate.cmsCounters(h, col("k"), 3, 32),
      JoinEstimate.cmsCounters(d, col("k"), 3, 32))
    val scratch = JoinEstimate.cmsCounters(
      h.unionByName(d), col("k"), 3, 32)
    assert(merged.exceptAll(scratch).isEmpty &&
      scratch.exceptAll(merged).isEmpty)
  }
}
