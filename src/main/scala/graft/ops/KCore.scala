package graft.ops

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** k-core decomposition by parallel peeling — the DENSITY member of
  * the graph family: [[DedupClusters]]' components answer "what is
  * connected", [[Triangles]] answers "how clique-like are the
  * neighborhoods", the k-core answers "which part survives when the
  * sparse fringe is stripped". On a near-dup pair graph that is the
  * merge-safety question itself: the 2-core keeps the densely
  * interlinked duplicate clusters while shedding the pendant chains
  * and lone bridges that make transitive closure over-merge (the
  * failure mode E128's exactness note calls out) — so "cluster only
  * inside the core, review the fringe" is a production dedup policy,
  * and this operator is its planner.
  *
  * Algorithm: simultaneous-removal peeling. Each round computes
  * within-subgraph degrees (one partial-aggregated shuffle over the
  * surviving edge list) and drops EVERY node below `k` at once; the
  * edge list shrinks monotonically, and the fixpoint — the maximal
  * subgraph where every node keeps ≥ k neighbors — is unique and
  * order-independent (Matula–Beck), which is what lets an ANSI oracle
  * replay the peel as unrolled rounds. Convergence detection is free:
  * each round's edge set is materialized once (`localCheckpoint`) with
  * its row count riding THAT materializing aggregate — the
  * [[DedupClusters]] snap discipline, one job per round — and an
  * unchanged count IS the fixpoint proof (peeling only ever removes).
  *
  * Rounds are bounded by the longest peeling cascade (a chain peels
  * from both ends), not graph diameter; dense near-dup graphs finish
  * in a handful. Per-round state is the surviving edge list — at
  * 100 TB a node-key shuffle, never adjacency lists in memory.
  */
object KCore {

  /** Result of [[coreNodes]]: the core members (node, core_degree)
    * with core_degree ≥ k their degree INSIDE the core, plus how many
    * peel rounds ran (0 = the input already was its own k-core).
    */
  final case class Core(nodes: DataFrame, rounds: Int)

  /** The k-core of the undirected graph `edges` (self-loops dropped,
    * duplicate/reversed edges collapsed). Throws if `maxRounds` peel
    * rounds don't reach the fixpoint — callers pin the bound their
    * oracle unrolls.
    */
  def coreNodes(edges: DataFrame, aCol: String, bCol: String, k: Int,
      maxRounds: Int = 20): Core = {
    require(k >= 1, s"k must be >= 1: $k")
    require(maxRounds >= 1, s"maxRounds must be >= 1: $maxRounds")
    var cur = snap(edges
      .select(least(col(aCol), col(bCol)).as("lo"),
        greatest(col(aCol), col(bCol)).as("hi"))
      .filter(col("lo") =!= col("hi"))
      .distinct())
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      // all nodes below k in the CURRENT subgraph leave together —
      // metadata-sized (ids only), so both anti-join probes broadcast
      val doomed = degrees(cur.df)
        .filter(col("__deg") < k).select("node")
      val next = snap(cur.df
        .join(doomed.select(col("node").as("lo")), Seq("lo"),
          "left_anti")
        .join(doomed.select(col("node").as("hi")), Seq("hi"),
          "left_anti")
        .select("lo", "hi"))
      if (next.count == cur.count) {
        next.rdd.unpersist(blocking = false)
        converged = true
      } else {
        cur.rdd.unpersist(blocking = false)
        cur = next
        rounds += 1
      }
    }
    if (!converged)
      throw new IllegalStateException(
        s"$k-core peeling did not converge in $maxRounds rounds")
    Core(degrees(cur.df)
      .select(col("node"), col("__deg").as("core_degree")), rounds)
  }

  /** Within-subgraph degrees over a canonical (lo, hi) edge list. */
  private def degrees(e: DataFrame): DataFrame =
    e.select(col("lo").as("node"))
      .unionAll(e.select(col("hi").as("node")))
      .groupBy("node").agg(count(lit(1)).as("__deg"))

  /** Materialize a round's edge set in ONE job, its row count riding
    * the materializing aggregate (an exact aggregate, not an
    * accumulator, so retries cannot distort the convergence signal).
    */
  private final case class EdgeSnap(df: DataFrame, rdd: RDD[Row],
      count: Long)

  private def snap(edges: DataFrame): EdgeSnap = {
    val spark = edges.sparkSession
    val rdd = edges.rdd
    rdd.localCheckpoint()
    val back = spark.createDataFrame(rdd, edges.schema)
    EdgeSnap(back, rdd, back.count())
  }
}
