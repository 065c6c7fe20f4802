package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Scd

class ScdSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def intervals(rows: Seq[(Long, String, Long, Long)]) = {
    import spark.implicits._
    Scd.type2(rows.toDF("k", "attr", "ts", "tie"), "k", "attr", "ts", "tie")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4)))
      .sortBy(t => (t._1, t._3))
  }

  test("consecutive same-value updates collapse into one run") {
    // A A B A -> three runs: A[10,30) B[30,40) A[40,∞)
    val got = intervals(Seq((1L, "A", 10L, 0L), (1L, "A", 20L, 1L),
      (1L, "B", 30L, 2L), (1L, "A", 40L, 3L)))
    assert(got === Seq(
      (1L, "A", 10L, 30L, false),
      (1L, "B", 30L, 40L, false),
      (1L, "A", 40L, -1L, true)))
  }

  test("intervals are half-open and contiguous; exactly one current row per key") {
    val got = intervals(Seq(
      (1L, "x", 1L, 0L), (1L, "y", 5L, 1L),
      (2L, "x", 3L, 2L)))
    assert(got.count(t => t._1 == 1L && t._5) === 1)
    assert(got.count(t => t._1 == 2L && t._5) === 1)
    // key 1: x's valid_to == y's valid_from
    assert(got.filter(_._1 == 1L).map(t => (t._2, t._3, t._4)) ===
      Seq(("x", 1L, 5L), ("y", 5L, -1L)))
  }

  test("null attributes are real values: null→X→null is three runs") {
    import spark.implicits._
    val df = Seq[(Long, Option[String], Long, Long)](
      (1L, None, 10L, 0L), (1L, Some("X"), 20L, 1L), (1L, None, 30L, 2L))
      .toDF("k", "attr", "ts", "tie")
    val got = Scd.type2(df, "k", "attr", "ts", "tie").collect()
    assert(got.length === 3)
    assert(got.count(_.getBoolean(4)) === 1)
  }

  test("same-timestamp updates order by the tiebreak column") {
    // tie 1 (B) precedes tie 2 (A): B[10,10) closed, A[10,∞) current
    val got = intervals(Seq((1L, "A", 10L, 2L), (1L, "B", 10L, 1L))).toSet
    assert(got === Set(
      (1L, "B", 10L, 10L, false),
      (1L, "A", 10L, -1L, true)))
  }
}
