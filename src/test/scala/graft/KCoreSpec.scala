package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.KCore

/** k-core peeling against hand-checked graphs: cliques survive, chains
  * cascade away from both ends, pendants strip without harming the
  * core, and the fixpoint is reached in the expected round count.
  */
class KCoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def core(edges: Seq[(Long, Long)], k: Int,
      maxRounds: Int = 20): (Set[(Long, Long)], Int) = {
    import spark.implicits._
    val r = KCore.coreNodes(edges.toDF("a", "b"), "a", "b", k, maxRounds)
    (r.nodes.collect().map(x => (x.getLong(0), x.getLong(1))).toSet,
      r.rounds)
  }

  test("triangle with a pendant: 2-core keeps the triangle, one round") {
    val (c, rounds) = core(
      Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)), k = 2)
    assert(c === Set((1L, 2L), (2L, 2L), (3L, 2L)))
    assert(rounds === 1)
  }

  test("pure path cascades to empty from both ends") {
    // path 1-2-3-4-5-6: ends peel each round, ~len/2 rounds
    val (c, rounds) = core(
      Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L)), k = 2)
    assert(c === Set.empty)
    assert(rounds === 3)
  }

  test("chain INTO a clique peels the chain, keeps the clique intact " +
      "with within-core degrees") {
    // K4 {1,2,3,4} + chain 4-5-6-7
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L))
    val (c, _) = core(k4 ++ Seq((4L, 5L), (5L, 6L), (6L, 7L)), k = 2)
    // node 4's core_degree is its degree INSIDE the core (3, not 4)
    assert(c === Set((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)))
  }

  test("k=3 separates a K4 from a cycle; k above everything empties") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L))
    val cycle = Seq((10L, 11L), (11L, 12L), (12L, 10L))
    val (c3, _) = core(k4 ++ cycle, k = 3)
    assert(c3.map(_._1) === Set(1L, 2L, 3L, 4L))
    val (c4, _) = core(k4 ++ cycle, k = 4)
    assert(c4 === Set.empty)
  }

  test("already-a-core input converges in zero rounds; dirty edges " +
      "(self-loops, duplicates, reversals) are canonicalized") {
    val (c, rounds) = core(
      Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (2L, 2L), (1L, 2L)),
      k = 2)
    assert(c === Set((1L, 2L), (2L, 2L), (3L, 2L)))
    assert(rounds === 0)
  }

  test("insufficient maxRounds fails loudly, never silently") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    val ex = intercept[IllegalStateException] {
      core(path, k = 2, maxRounds = 2)
    }
    assert(ex.getMessage.contains("did not converge"))
  }
}
