package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Bfs

/** Multi-source BFS levels on hand-checkable graphs: paths, forks
  * where two frontiers meet (min level must win), multiple seeds,
  * depth caps, early exhaustion, and seeds absent from the edge list.
  */
class BfsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def run(edges: Seq[(Long, Long)], seeds: Seq[Long],
      depth: Int): Map[Long, Long] = {
    import spark.implicits._
    Bfs.levels(edges.toDF("s", "d"), "s", "d",
        seeds.toDF("n"), "n", depth)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("a directed path labels hop counts in order") {
    val out = run(Seq((1L, 2L), (2L, 3L), (3L, 4L)), Seq(1L), 3)
    assert(out === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("depth cap stops expansion") {
    val out = run(Seq((1L, 2L), (2L, 3L), (3L, 4L)), Seq(1L), 2)
    assert(out === Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  test("a node reachable two ways gets its MINIMAL level") {
    // 1→2→3→4 and the shortcut 1→4: 4 must be level 1, and its
    // level must not be relabeled when the long route arrives later
    val out = run(Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)),
      Seq(1L), 3)
    assert(out === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  test("multiple seeds expand as one frontier; seed dupes collapse") {
    val out = run(Seq((1L, 2L), (5L, 4L), (2L, 3L), (4L, 3L)),
      Seq(1L, 5L, 5L), 3)
    assert(out === Map(1L -> 0L, 5L -> 0L, 2L -> 1L, 4L -> 1L,
      3L -> 2L))
  }

  test("early exhaustion: frontier empties before the cap") {
    val out = run(Seq((1L, 2L)), Seq(1L), 10)
    assert(out === Map(1L -> 0L, 2L -> 1L))
  }

  test("a seed absent from the edge list stays at level 0") {
    val out = run(Seq((1L, 2L)), Seq(1L, 99L), 2)
    assert(out === Map(1L -> 0L, 2L -> 1L, 99L -> 0L))
  }

  test("cycles terminate: the anti-join never revisits a node") {
    val out = run(Seq((1L, 2L), (2L, 3L), (3L, 1L)), Seq(1L), 5)
    assert(out === Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  test("maxDepth 0 returns only the seeds") {
    val out = run(Seq((1L, 2L)), Seq(1L), 0)
    assert(out === Map(1L -> 0L))
  }
}
