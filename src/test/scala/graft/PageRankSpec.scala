package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.PageRank

class PageRankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Driver-side exact replay of the op's integer contract. */
  private def reference(edges: Seq[(Long, Long)], iters: Int,
      total: Long): Map[Long, Long] = {
    val out = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nodes = out.keySet
    val n = nodes.size
    var r = nodes.map(v => v -> total / n).toMap
    val base = (15L * (total / n)) / 100
    for (_ <- 1 to iters) {
      val in = edges
        .filter(e => nodes.contains(e._1))
        .groupBy(_._2).view
        .mapValues(_.map(e => r(e._1) / out(e._1)).sum).toMap
      r = nodes.map(v => v -> (base + (85L * in.getOrElse(v, 0L)) / 100)).toMap
    }
    r
  }

  test("matches the exact integer reference on an asymmetric graph") {
    import spark.implicits._
    // 1→2, 2→{1,3}, 3→2, 4→1: node 4 has no inbound edge (keeps base
    // mass via the left join), node 2 is the hub.
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (4L, 1L))
    val got = PageRank.ranks(edges.toDF("src", "dst"), "src", "dst", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got === reference(edges, 3, 1000000000000L))
  }

  test("hub ordering on a star graph and mass conservation bound") {
    import spark.implicits._
    // star: leaves 2..6 ↔ hub 1; the hub must outrank every leaf and
    // truncation must only ever LOSE mass (Σr ≤ total).
    val half = (2L to 6L).map(v => (1L, v))
    val edges = half ++ half.map(_.swap)
    val rows = PageRank.ranks(edges.toDF("src", "dst"), "src", "dst", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byNode = rows.map(r => r._1 -> r._3).toMap
    assert((2L to 6L).forall(v => byNode(1L) > byNode(v)))
    assert(rows.map(_._3).sum <= 1000000000000L)
    assert(rows.map(r => r._1 -> r._2).toMap === Map(1L -> 5L) ++
      (2L to 6L).map(_ -> 1L).toMap)
  }

  test("adaptive run matches the fixed-round run at its stop count") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (4L, 1L))
    val ar = PageRank.ranksAdaptive(edges.toDF("src", "dst"),
      "src", "dst", maxIters = 60, tol = 0L)
    val adaptive = ar.ranks.collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    // per-round arithmetic is identical, so stopping after `rounds`
    // must equal running exactly `rounds` fixed iterations
    assert(adaptive === reference(edges, ar.rounds, 1000000000000L))
  }

  test("adaptive stops at the integer fixpoint, well before maxIters, " +
      "and one more round would not change the ranks") {
    import spark.implicits._
    // the asymmetric graph reaches an EXACT integer fixpoint (residual
    // 0 at round 3, driver-replay-verified) — unlike the star graph,
    // which settles into a 9-unit limit cycle (covered below)
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (4L, 1L))
    val ar = PageRank.ranksAdaptive(edges.toDF("src", "dst"),
      "src", "dst", maxIters = 200, tol = 0L)
    assert(ar.residual === 0L)
    assert(ar.rounds < 200, s"did not converge early: ${ar.rounds}")
    val atStop = ar.ranks.collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    // stationarity: the fixed-round run one past the stop is identical
    assert(atStop === reference(edges, ar.rounds + 1, 1000000000000L))
  }

  test("a small positive tol terminates a limit-cycling graph early") {
    import spark.implicits._
    // star: truncation never reaches residual 0 (a persistent 9-unit
    // cycle); tol above the cycle amplitude stops once the geometric
    // decay (~0.85/round from ~1.1e12) crosses it, well before the
    // maxIters backstop
    val half = (2L to 6L).map(v => (1L, v))
    val edges = half ++ half.map(_.swap)
    val ar = PageRank.ranksAdaptive(edges.toDF("src", "dst"),
      "src", "dst", maxIters = 200, tol = 16L)
    assert(ar.residual <= 16L)
    assert(ar.rounds < 200, s"did not converge early: ${ar.rounds}")
    assert(ar.ranks.collect().map(r => r.getLong(0) -> r.getLong(2))
      .toMap === reference(edges, ar.rounds, 1000000000000L))
  }

  /** Driver-side exact replay of the SEEDED integer contract. */
  private def seededReference(edges: Seq[(Long, Long)], seeds: Set[Long],
      iters: Int, total: Long): Map[Long, Long] = {
    val out = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nodes = out.keySet
    val inSeeds = nodes.intersect(seeds)
    val base = total / inSeeds.size
    var r = nodes.map(v => v -> (if (inSeeds(v)) base else 0L)).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).view
        .mapValues(_.map(e => r(e._1) / out(e._1)).sum).toMap
      r = nodes.map(v => v ->
        ((if (inSeeds(v)) (15L * base) / 100 else 0L) +
          (85L * in.getOrElse(v, 0L)) / 100)).toMap
    }
    r
  }

  test("seeded ranks match the exact reference; unreachable nodes " +
      "score zero; seeds outside the graph are ignored") {
    import spark.implicits._
    // component A: 1↔2↔3 (seed 1); component B: 10↔11 (no seed,
    // unreachable from the trusted set → must stay at exactly 0);
    // seed 99 is not a graph node and must not dilute the mass split
    val half = Seq((1L, 2L), (2L, 3L), (10L, 11L))
    val edges = half ++ half.map(_.swap)
    val got = PageRank.seededRanks(edges.toDF("src", "dst"),
        "src", "dst", Seq(1L, 99L).toDF("node"), "node", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got === seededReference(edges, Set(1L, 99L), 3,
      1000000000000L))
    assert(got(10L) === 0L && got(11L) === 0L)
    assert(got(1L) > 0L && got(2L) > 0L && got(3L) > 0L)
  }

  test("with every node a seed, seeded ranks equal global ranks " +
      "(the teleport degenerates to uniform)") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (4L, 1L))
    val all = Seq(1L, 2L, 3L, 4L).toDF("node")
    val seeded = PageRank.seededRanks(edges.toDF("src", "dst"),
        "src", "dst", all, "node", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val global = PageRank.ranks(edges.toDF("src", "dst"),
        "src", "dst", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(seeded === global)
  }

  test("tol bounds rounds: a loose tolerance stops earlier than exact") {
    import spark.implicits._
    // residuals on this graph: 6.375e11, 1.80625e11, 0 — so tol=2e11
    // stops after round 2, tol=0 after round 3
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (4L, 1L))
    val exact = PageRank.ranksAdaptive(edges.toDF("src", "dst"),
      "src", "dst", maxIters = 200, tol = 0L)
    val loose = PageRank.ranksAdaptive(edges.toDF("src", "dst"),
      "src", "dst", maxIters = 200, tol = 200000000000L)
    assert(loose.rounds < exact.rounds)
    assert(loose.residual <= 200000000000L)
  }
}
