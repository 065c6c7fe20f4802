package graft.ops

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row}
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
    // per-round state is pinned with the exact-RDD-handle discipline
    // ([[Snap]]): without it the lineage grows iters-deep (a 100 TB
    // run's rounds are expensive — a lost executor would replay the
    // whole chain) and superseded round state is never actually freed
    var cur = Snap.pin(deg.select(col("src").as("node"), col("outdeg"))
      .crossJoin(broadcast(deg.agg(count(lit(1)).as("__n"))))
      .withColumn("r", expr(s"${total}L div __n")))
    for (_ <- 1 to iters) {
      val next = Snap.pinEager(roundNext(e, cur._1, total))
      Snap.release(cur._2)
      cur = next
    }
    cur._1.select("node", "outdeg", "r")
  }

  /** One [[ranks]] round over pinned edges and the current node state
    * — package-visible so PlanSpec asserts the ROUND's plan shape
    * (equi-join + partial-aggregated shuffle) directly: the per-round
    * snap means the final query plan starts at the last checkpoint
    * and no longer shows the round structure.
    */
  private[graft] def roundNext(e: DataFrame, cur: DataFrame,
      total: Long): DataFrame = {
    val contrib = e
      .join(cur.select(col("node").as("src"),
        col("outdeg").as("__d"), col("r").as("__r")), "src")
      .groupBy("dst").agg(sum(expr("__r div __d")).as("__s"))
    // left join: a node with no inbound edges keeps the base mass
    // (the symmetric graphs q118 builds always have inbound edges;
    // a directed source node must not vanish from the rank table)
    cur
      .join(contrib.select(col("dst").as("node"), col("__s")),
        Seq("node"), "left")
      .withColumn("__s", coalesce(col("__s"), lit(0L)))
      .withColumn("r", expr(
        s"(15L * (${total}L div __n)) div 100 + (85L * __s) div 100"))
      .select("node", "outdeg", "__n", "r")
  }

  /** Seed-personalized PageRank (TrustRank shape) in the same exact
    * integer arithmetic as [[ranks]]: total mass is spread only over
    * the `seeds` (`total div nSeeds` each) and ONLY seeds re-seed —
    * every other node holds propagated mass alone, so scores measure
    * proximity to the trusted set, not global centrality. This is the
    * trust/quality-propagation pass a curation pipeline runs from a
    * hand-vetted whitelist: mass flows from curated seed documents
    * through the similarity/link graph and scores the unvetted rest.
    * Per round: r = seed·(15·(total div nSeeds)) div 100 +
    * (85·Σ inbound) div 100 — truncating `div` throughout, so any ANSI
    * engine replays identical longs.
    *
    * Same plan shape and no-dangling contract as [[ranks]]; the seed
    * set is metadata-sized and broadcast onto the node table once.
    * Seeds not appearing as a `src` are ignored (they are not graph
    * nodes); callers own seed hygiene.
    */
  def seededRanks(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String, iters: Int,
      total: Long = 1000000000000L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    require(total > 0, s"total mass must be positive: $total")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint()
    val nodes = seedNodes(e, seeds, seedCol)
    // same per-round [[Snap]] discipline as [[ranks]]: lineage stays
    // one round deep and superseded round state is actually freed
    var cur = Snap.pin(nodes
      .crossJoin(broadcast(nodes.agg(sum("__seed").as("__ns"))))
      .withColumn("r", expr(s"__seed * (${total}L div __ns)")))
    for (_ <- 1 to iters) {
      val next = Snap.pinEager(seededRoundNext(e, cur._1, total))
      Snap.release(cur._2)
      cur = next
    }
    cur._1.select(col("node"), col("outdeg"),
      col("__seed").as("is_seed"), col("r"))
  }

  /** The seeded node table: outdegrees with the metadata-sized seed
    * set BROADCAST on — package-visible so PlanSpec asserts the
    * broadcast (the per-round snap hides it from the final plan).
    */
  private[graft] def seedNodes(e: DataFrame, seeds: DataFrame,
      seedCol: String): DataFrame = {
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val sd = seeds.select(col(seedCol).as("node")).distinct()
      .withColumn("__sd", lit(1L))
    deg.select(col("src").as("node"), col("outdeg"))
      .join(broadcast(sd), Seq("node"), "left")
      .withColumn("__seed", coalesce(col("__sd"), lit(0L)))
      .drop("__sd")
  }

  /** One [[seededRanks]] round — package-visible for the same
    * PlanSpec reason as [[roundNext]].
    */
  private[graft] def seededRoundNext(e: DataFrame, cur: DataFrame,
      total: Long): DataFrame = {
    val contrib = e
      .join(cur.select(col("node").as("src"),
        col("outdeg").as("__d"), col("r").as("__r")), "src")
      .groupBy("dst").agg(sum(expr("__r div __d")).as("__s"))
    cur
      .join(contrib.select(col("dst").as("node"), col("__s")),
        Seq("node"), "left")
      .withColumn("__s", coalesce(col("__s"), lit(0L)))
      .withColumn("r", expr(
        s"__seed * ((15L * (${total}L div __ns)) div 100)" +
          " + (85L * __s) div 100"))
      .select("node", "outdeg", "__ns", "__seed", "r")
  }

  /** Result of [[ranksAdaptive]]: the final ranks (node, outdeg, r),
    * how many rounds actually ran, and the last residual mass
    * Σ|r_t − r_{t−1}| (0 means an exact integer fixpoint — truncation
    * often reaches one, but can instead settle into a limit cycle a
    * few units wide, so callers should pass a small positive `tol`
    * rather than demanding 0; see [[ranksAdaptive]]).
    */
  final case class AdaptiveRanks(ranks: DataFrame, rounds: Int,
      residual: Long)

  /** Convergence-stopped PageRank — the at-scale form of [[ranks]]:
    * identical per-round arithmetic, but each round's node-sized state
    * is materialized (`localCheckpoint`, truncating the otherwise
    * iters-deep join lineage) and the residual mass Σ|r_t − r_{t−1}|
    * rides THAT materializing aggregate — the [[DedupClusters]] snap
    * discipline, so convergence detection costs zero extra jobs per
    * round. Stops when the residual falls to `tol` (damping contracts
    * the residual by ~d per round, so rounds ≈ log_{1/d}(total/tol) —
    * data-independent) or at `maxIters`. An exact aggregate, not an
    * accumulator, so task retries cannot distort it; Σ|Δ| ≤ 2·total
    * cannot overflow int64. Truncating `div` means the iteration may
    * land in a limit cycle a few units wide instead of an exact
    * fixpoint, so `tol` = 0 is a request, not a guarantee — pass a
    * small positive `tol` (anything ≥ ~node count dwarfs the cycle
    * amplitude and is far below any ordering-relevant mass) and keep
    * `maxIters` as the backstop.
    *
    * Fixed-round [[ranks]] stays the oracle surface (an ANSI engine
    * replays N rounds verbatim; replaying "until converged" would need
    * the oracle to re-implement the stop rule); this variant is what a
    * 100 TB run calls, where a round is expensive and the needed count
    * is not known up front. Same no-dangling contract as [[ranks]].
    */
  def ranksAdaptive(edges: DataFrame, srcCol: String, dstCol: String,
      maxIters: Int, tol: Long = 0L,
      total: Long = 1000000000000L): AdaptiveRanks = {
    require(maxIters >= 1, s"maxIters must be >= 1: $maxIters")
    require(tol >= 0, s"tol must be >= 0: $tol")
    require(total > 0, s"total mass must be positive: $total")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint()
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    var cur = snapCount(deg.select(col("src").as("node"), col("outdeg"))
      .crossJoin(broadcast(deg.agg(count(lit(1)).as("__n"))))
      .withColumn("r", expr(s"${total}L div __n")))
    var rounds = 0
    var residual = Long.MaxValue
    while (rounds < maxIters && residual > tol) {
      val contrib = e
        .join(cur._1.select(col("node").as("src"),
          col("outdeg").as("__d"), col("r").as("__r")), "src")
        .groupBy("dst").agg(sum(expr("__r div __d")).as("__s"))
      val next = cur._1
        .join(contrib.select(col("dst").as("node"), col("__s")),
          Seq("node"), "left")
        .withColumn("__s", coalesce(col("__s"), lit(0L)))
        .withColumn("__rprev", col("r"))
        .withColumn("r", expr(
          s"(15L * (${total}L div __n)) div 100 + (85L * __s) div 100"))
        .select("node", "outdeg", "__n", "r", "__rprev")
      val (snapped, rdd, res) = snapResidual(next)
      // superseded round state — release eagerly (we hold the exact
      // RDD reference: Dataset.rdd on a checkpointed frame would be a
      // fresh, unpinned lineage)
      cur._2.unpersist(blocking = false)
      cur = (snapped.select("node", "outdeg", "__n", "r"), rdd)
      residual = res
      rounds += 1
    }
    AdaptiveRanks(cur._1.select("node", "outdeg", "r"), rounds, residual)
  }

  /** Materialize node-sized rank state in one job, counting as the
    * action (the initial state has no predecessor to diff against).
    */
  private def snapCount(df: DataFrame): (DataFrame, RDD[Row]) = {
    val rdd = df.rdd
    rdd.localCheckpoint()
    val back = df.sparkSession.createDataFrame(rdd, df.schema)
    back.count()
    (back, rdd)
  }

  /** Materialize a round's state with the residual-mass aggregate as
    * the materializing action: ONE job yields both the pinned state
    * and the convergence signal.
    */
  private def snapResidual(df: DataFrame): (DataFrame, RDD[Row], Long) = {
    val rdd = df.rdd
    rdd.localCheckpoint()
    val back = df.sparkSession.createDataFrame(rdd, df.schema)
    val sig = back.agg(sum(expr("abs(r - __rprev)")).as("res")).head()
    (back, rdd, if (sig.isNullAt(0)) 0L else sig.getLong(0))
  }
}
