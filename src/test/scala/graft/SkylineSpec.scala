package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Skyline

/** 2-D Pareto frontier on hand-checkable point sets, exercising the
  * cases the sweep's tie rules exist for (x-ties, y-ties, duplicate
  * points) and the two-phase split (domination across partitions).
  */
class SkylineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def run(pts: Seq[(Long, Long)],
      parts: Int = 4): Set[(Long, Long)] = {
    import spark.implicits._
    Skyline.skyline2d(pts.toDF("x", "y").repartition(parts), "x", "y")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("a descending staircase is entirely on the frontier") {
    val stair = Seq((5L, 1L), (4L, 2L), (3L, 3L), (2L, 4L), (1L, 5L))
    assert(run(stair) === stair.toSet)
  }

  test("an interior point is dominated") {
    assert(run(Seq((5L, 1L), (1L, 5L), (2L, 2L), (3L, 3L))) ===
      Set((5L, 1L), (1L, 5L), (3L, 3L)))
  }

  test("a single maximal point dominates everything") {
    assert(run(Seq((9L, 9L), (5L, 1L), (1L, 5L), (3L, 3L))) ===
      Set((9L, 9L)))
  }

  test("x-tie: only the higher y survives") {
    assert(run(Seq((5L, 1L), (5L, 3L), (1L, 9L))) ===
      Set((5L, 3L), (1L, 9L)))
  }

  test("y-tie: only the higher x survives") {
    assert(run(Seq((5L, 3L), (2L, 3L), (1L, 9L))) ===
      Set((5L, 3L), (1L, 9L)))
  }

  test("duplicate points collapse to one frontier point") {
    assert(run(Seq((5L, 5L), (5L, 5L), (1L, 1L))) === Set((5L, 5L)))
  }

  test("domination across partitions: phase 2 removes local survivors") {
    // with many partitions each tiny partition's local skyline keeps
    // its own points; the merge sweep must still drop every dominated
    // one globally
    val pts = (1L to 50L).map(i => (i, i)) :+ ((60L, 60L))
    assert(run(pts, parts = 16) === Set((60L, 60L)))
  }

  test("negative and mixed coordinates follow the same dominance") {
    assert(run(Seq((-1L, 4L), (-2L, 9L), (3L, -5L), (0L, 0L),
        (-3L, 2L))) ===
      Set((-2L, 9L), (-1L, 4L), (0L, 0L), (3L, -5L)))
  }
}
