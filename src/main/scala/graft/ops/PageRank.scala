package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Damped PageRank in EXACT integer arithmetic (SURVEY §2.11
  * extension) — the weighted ITERATIVE graph op complementing
  * [[DedupClusters]]' connected components: label propagation has no
  * per-edge mass, PageRank is the Pregel-pattern fixture every graph
  * engine is judged on.
  *
  * Arithmetic contract: total mass `total` (default 10^12) is spread
  * as `total div N` per node; each round every node ships
  * `r div outdeg` along each out-edge and re-seeds from
  * `(15·(total div N)) div 100 + (85·Σ inbound) div 100` — damping
  * d = 85/100 with truncating `div` throughout, transcendental- and
  * float-free so any ANSI engine replays the identical longs (DuckDB
  * `//` ≡ Spark `div` on non-negatives). Truncation loses mass (the
  * usual 1/N float dust, made deterministic); ORDERING is what
  * PageRank consumers use and ordering is exact.
  *
  * Scale shape: each round = one edge⋈rank equi-join + one
  * partial-aggregated dst-key shuffle; rank state is node-sized and
  * never leaves the cluster; the edge list is pinned once with
  * `localCheckpoint` so the `iters+1` reuses (degree pass + each
  * round) rescan nothing upstream. Rounds are a fixed constant
  * (PageRank converges geometrically; production runs 10–30 rounds),
  * not data-dependent like CC's diameter.
  *
  * Contract: every node must appear as a `src` (no dangling nodes —
  * symmetrize or add self-loops upstream if the input graph has
  * sinks; a sink would silently leak its mass each round).
  */
object PageRank {

  /** Ranks after `iters` damped rounds over directed `edges`
    * (`srcCol`, `dstCol`): (node, outdeg, r) with r the integer-scaled
    * rank. Nodes = distinct sources (see the no-dangling contract).
    */
  def ranks(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, total: Long = 1000000000000L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    require(total > 0, s"total mass must be positive: $total")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint()
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    var ranks = deg.select(col("src").as("node"), col("outdeg"))
      .crossJoin(broadcast(deg.agg(count(lit(1)).as("__n"))))
      .withColumn("r", expr(s"${total}L div __n"))
    for (_ <- 1 to iters) {
      val contrib = e
        .join(ranks.select(col("node").as("src"),
          col("outdeg").as("__d"), col("r").as("__r")), "src")
        .groupBy("dst").agg(sum(expr("__r div __d")).as("__s"))
      // left join: a node with no inbound edges keeps the base mass
      // (the symmetric graphs q118 builds always have inbound edges;
      // a directed source node must not vanish from the rank table)
      ranks = ranks
        .join(contrib.select(col("dst").as("node"), col("__s")),
          Seq("node"), "left")
        .withColumn("__s", coalesce(col("__s"), lit(0L)))
        .withColumn("r", expr(
          s"(15L * (${total}L div __n)) div 100 + (85L * __s) div 100"))
        .select("node", "outdeg", "__n", "r")
    }
    ranks.select("node", "outdeg", "r")
  }
}
