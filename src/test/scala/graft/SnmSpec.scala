package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Snm

/** Sorted-neighborhood candidate generation: exact candidate count,
  * window-adjacency semantics under the (key, id) sort, id tiebreaks
  * on equal keys, and w ≥ n degeneracy (all pairs).
  */
class SnmSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def run(rows: Seq[(Long, String)],
      w: Int): Set[(Long, Long)] = {
    import spark.implicits._
    Snm.candidates(rows.toDF("id", "k"), "id", "k", w)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
  }

  test("w=1 pairs each record with its sort successor only") {
    val out = run(Seq((1L, "a"), (2L, "b"), (3L, "c")), 1)
    assert(out === Set((1L, 2L), (2L, 3L)))
  }

  test("w=2 adds the successor's successor") {
    val out = run(Seq((1L, "a"), (2L, "b"), (3L, "c")), 2)
    assert(out === Set((1L, 2L), (2L, 3L), (1L, 3L)))
  }

  test("sort is by key, not id") {
    val out = run(Seq((10L, "z"), (20L, "a")), 1)
    assert(out === Set((20L, 10L)))
  }

  test("equal keys order by id") {
    val out = run(Seq((2L, "same"), (1L, "same")), 1)
    assert(out === Set((1L, 2L)))
  }

  test("candidate count is exactly n*w - w(w+1)/2") {
    val n = 20
    val rows = (1 to n).map(i => (i.toLong, f"k$i%03d"))
    val w = 3
    assert(run(rows, w).size === n * w - w * (w + 1) / 2)
  }

  test("w >= n degenerates to all ordered pairs") {
    val out = run(Seq((1L, "a"), (2L, "b"), (3L, "c")), 10)
    assert(out === Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }
}
