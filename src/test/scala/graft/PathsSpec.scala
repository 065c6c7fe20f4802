package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Paths

/** Bounded-hop weighted shortest distances on hand-checkable graphs:
  * the cheap-long-route-beats-expensive-direct-edge case (the
  * semantics [[graft.ops.Bfs]] hop levels CANNOT express), round caps
  * as path-length bounds, delta-relaxation improvement propagation,
  * early exhaustion, and multi-seed min semantics.
  */
class PathsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def run(edges: Seq[(Long, Long, Long)], seeds: Seq[Long],
      rounds: Int): Map[Long, Long] = {
    import spark.implicits._
    Paths.boundedDistances(edges.toDF("s", "d", "w"), "s", "d", "w",
        seeds.toDF("n"), "n", rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("a cheap 3-edge route beats an expensive direct edge") {
    // 1→4 direct costs 100; 1→2→3→4 costs 3. BFS would answer 1 hop;
    // min-plus must answer 3 once enough rounds run.
    val e = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L),
      (1L, 4L, 100L))
    assert(run(e, Seq(1L), 1) ===
      Map(1L -> 0L, 2L -> 1L, 4L -> 100L))
    assert(run(e, Seq(1L), 3) ===
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("round cap bounds PATH LENGTH, not reach: improvements " +
      "propagate even after a node is first labeled") {
    // 4's label must improve round by round as longer-but-cheaper
    // prefixes arrive — the delta frontier re-emits improved nodes.
    val e = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L),
      (1L, 4L, 100L), (2L, 4L, 50L))
    assert(run(e, Seq(1L), 2) ===
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 51L))
    assert(run(e, Seq(1L), 3)(4L) === 3L)
  }

  test("multiple seeds: a node takes the cheapest seed's route") {
    val e = Seq((1L, 3L, 10L), (2L, 3L, 4L))
    assert(run(e, Seq(1L, 2L), 2) ===
      Map(1L -> 0L, 2L -> 0L, 3L -> 4L))
  }

  test("early exhaustion: no improvements before the cap") {
    val e = Seq((1L, 2L, 5L))
    assert(run(e, Seq(1L), 10) === Map(1L -> 0L, 2L -> 5L))
  }

  test("zero-weight edges are legal; seeds absent from the graph " +
      "keep dist 0") {
    val e = Seq((1L, 2L, 0L), (2L, 3L, 7L))
    assert(run(e, Seq(1L, 99L), 3) ===
      Map(1L -> 0L, 99L -> 0L, 2L -> 0L, 3L -> 7L))
  }

  test("a cycle does not loop forever or lower costs") {
    val e = Seq((1L, 2L, 1L), (2L, 1L, 1L), (2L, 3L, 1L))
    assert(run(e, Seq(1L), 8) ===
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }
}
