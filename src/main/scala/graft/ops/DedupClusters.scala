package graft.ops

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Duplicate-cluster resolution: connected components over a near-dup
  * pair list (SURVEY §2.11 E57) — the step that turns pairwise edges
  * (MinHash q25 / SimHash q27 / exact Jaccard q64) into "keep one
  * representative per duplicate group", i.e. an actually deduplicated
  * corpus.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) —
  * O(log n) rounds instead of the O(graph-diameter) rounds of naive
  * min-label propagation, so adversarial long-chain components
  * (A~B~C~… across template families) converge in a handful of rounds
  * rather than diameter-many. Each round is two id-only equi-joins +
  * partial-aggregated mins — hash shuffles on ids, never text.
  *
  * Per-round cost discipline: exactly ONE job per round. The edge set
  * is marked for RDD `localCheckpoint` (truncating lineage) and the
  * materializing action IS the convergence-signature aggregate —
  * (edge count, bit_xor of per-edge xxhash64) — so there is no
  * separate per-round comparison job, and the signature is an exact
  * retry-safe aggregate rather than an accumulator. Superseded
  * checkpoint blocks are unpersisted as soon as the next round
  * materializes. A final structural check (a star forest has disjoint
  * parent and child sets) guards the signature-based early exit: a
  * false "stable" signal fails the check and throws instead of
  * returning wrong labels.
  *
  * At 100 TB: rounds are data-parallel, the edge list for near-dup
  * graphs is ≪ corpus size, and the round count is bounded by
  * O(log n) regardless of component shape — no diameter-length chains
  * can stretch the job, and no per-round driver action doubles the job
  * count.
  */
object DedupClusters {

  /** (node, cluster_rep) for every node in `edges`, where cluster_rep
    * is the minimum node id of its connected component — deterministic
    * regardless of partitioning or iteration order.
    *
    * @throws IllegalStateException if the edge set has not contracted
    *         to a star forest within `maxIter` rounds (duplicate
    *         graphs converge in O(log n) ≈ a handful; hitting the cap
    *         means the input is not a near-dup pair list)
    */
  def connectedComponents(edges: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 20): DataFrame =
    connectedComponentsWithRounds(edges, aCol, bCol, maxIter)._1

  /** [[connectedComponents]] plus the number of rounds after which the
    * edge set was already at its fixpoint (the spec surface for the
    * O(log n) bound — a path of n nodes must converge in ≤ ⌈log₂ n⌉
    * rounds, not n rounds).
    */
  def connectedComponentsWithRounds(edges: DataFrame, aCol: String,
      bCol: String, maxIter: Int = 20): (DataFrame, Int) = {
    // Materialize the raw pair list ONCE — `edges` is typically the
    // output of an expensive candidate-pair computation (q64's inverted
    // index, q25's band join), and both the node inventory and the
    // oriented edge set below read it.
    val raw = edges
      .select(col(aCol).as("u"), col(bCol).as("v"))
      .localCheckpoint()
    val nodes = raw.select(col("u").as("node"))
      .union(raw.select(col("v").as("node")))
      .distinct()

    // Orient every edge larger→smaller and drop self-loops; both star
    // operations below preserve this orientation and the connectivity
    // of the edge set, so component identity is invariant throughout.
    var cur = snap(raw
      .select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct())

    var prevCount = cur.count
    var prevHash = cur.hashSum
    var stable = cur.count == 0L
    var rounds = 0
    while (!stable && rounds < maxIter) {
      // Large-star: every node v strictly larger than a neighbor u is
      // re-attached to m(u) = min(Γ(u) ∪ {u}).
      val sym = cur.df
        .union(cur.df.select(col("v").as("u"), col("u").as("v")))
      val lsMin = sym.groupBy("u").agg(min("v").as("nm"))
        .select(col("u"), least(col("u"), col("nm")).as("m"))
      val ls = sym.join(lsMin, "u")
        .where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .distinct()
      // Small-star: every node's smaller neighbors (and itself) are
      // attached to the minimum of that smaller-neighborhood.
      val ssMin = ls.groupBy("u").agg(min("v").as("m"))
      val ss = ls.join(ssMin, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .union(ssMin.select(col("u"), col("m").as("v")))
        .where(col("u") =!= col("v"))
        .distinct()

      val next = snap(ss)
      cur.rdd.unpersist(blocking = false)
      rounds += 1
      stable = next.count == prevCount && next.hashSum == prevHash
      prevCount = next.count
      prevHash = next.hashSum
      cur = next
    }
    // `rounds` counts star applications executed; when stability was
    // detected, the final round merely re-produced the fixpoint the
    // previous round had already reached.
    val convergedAt = if (stable && rounds > 0) rounds - 1 else rounds

    // Structural verification (two small jobs, end only): a star
    // forest has (a) no node on both the child (u) and parent (v)
    // side AND (b) exactly one parent per child — disjointness alone
    // admits a multi-parent terminal state (e.g. {(3,1),(5,1),(3,2),
    // (6,2)} after one round on a path-ish graph with maxIter=1),
    // which would return two labels for one component instead of
    // throwing. Together they make the signature-based early exit
    // safe: any premature or hash-collided "stable" that is not a
    // genuine fixpoint fails here.
    val nonStar = cur.df.select(col("u").as("x"))
      .intersect(cur.df.select(col("v").as("x")))
      .limit(1).count()
    val multiParent = cur.df.groupBy("u")
      .agg(countDistinct("v").as("__np"))
      .filter(col("__np") > 1).limit(1).count()
    if (nonStar > 0 || multiParent > 0)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds")

    val reps = cur.df.groupBy("u").agg(min("v").as("__rep"))
      .withColumnRenamed("u", "node")
    val labels = nodes.join(reps, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("__rep"), col("node")).as("cluster_rep"))
    (labels, convergedAt)
  }

  /** Materialize an oriented edge set once and capture its convergence
    * signature, all in ONE job: the RDD is marked for localCheckpoint
    * and the (count, bit_xor of per-edge xxhash64) aggregate over the
    * re-wrapped DataFrame is the action that materializes it. The
    * signature is an exact aggregate — not an accumulator — so task
    * retries and speculative execution cannot distort it (accumulator
    * updates in transformations are not exactly-once); bit_xor is
    * order-independent and cannot overflow under ANSI.
    */
  private final case class EdgeSnap(df: DataFrame, rdd: RDD[Row],
      count: Long, hashSum: Long)

  private def snap(edges: DataFrame): EdgeSnap = {
    val spark = edges.sparkSession
    val rdd = edges.rdd
    rdd.localCheckpoint()
    val back = spark.createDataFrame(rdd, edges.schema)
    val sig = back.agg(count(lit(1)).as("c"),
      expr("bit_xor(xxhash64(u, v))").as("h")).head()
    val h = if (sig.isNullAt(1)) 0L else sig.getLong(1)
    EdgeSnap(back, rdd, sig.getLong(0), h)
  }

  /** Incremental connected components — the E53/E89/E93/E99/E108
    * incremental axis at component granularity, E57's missing member:
    * fold a BATCH of new edges into an existing canonical labeling
    * WITHOUT re-running CC over the history graph. New edges map
    * their endpoints onto existing cluster reps (unlabeled endpoints
    * stay themselves), CC runs only on that QUOTIENT graph — sized by
    * the batch and the components it touches, independent of corpus
    * size — and the result remaps history labels whose rep merged.
    *
    * Canonical-label composition is what makes this exact: history
    * labels are component-min ids, the quotient CC takes mins over
    * {merged component mins ∪ new node ids}, and min composes — so
    * the output is bit-identical to a full recompute over
    * history ∪ batch (the q128 oracle verifies precisely that).
    */
  def incrementalComponents(labels: DataFrame, batchEdges: DataFrame,
      aCol: String, bCol: String, maxIter: Int = 20): DataFrame = {
    val lab = labels.select(col("node").as("__n"), col("cluster_rep").as("__r"))
    // node inventory comes from the UNFILTERED edges — a node whose
    // only batch edge is a self-loop is still a (singleton) node in a
    // full recompute, and the bit-identical contract must cover it
    val eaRaw = batchEdges.select(col(aCol).as("__a"), col(bCol).as("__b"))
    val ea = eaRaw.filter(col("__a") =!= col("__b"))
    // pinned once: the emptiness test AND the quotient CC both read
    // the materialized blocks, so the corpus-sized label joins run
    // exactly once per ingest (the quotient itself is batch-sized)
    val mapped = ea
      .join(lab.select(col("__n").as("__a"), col("__r").as("__ra")),
        Seq("__a"), "left")
      .join(lab.select(col("__n").as("__b"), col("__r").as("__rb")),
        Seq("__b"), "left")
      .select(coalesce(col("__ra"), col("__a")).as("qa"),
        coalesce(col("__rb"), col("__b")).as("qb"))
      .filter(col("qa") =!= col("qb"))
      .localCheckpoint()
    // all batch edges may collapse inside existing components — the
    // quotient is then empty and the labeling passes through
    val qcc =
      if (mapped.isEmpty)
        lab.sparkSession.range(0)
          .select(col("id").as("__q"), col("id").as("__qr"))
      else
        connectedComponents(mapped, "qa", "qb", maxIter)
          .select(col("node").as("__q"), col("cluster_rep").as("__qr"))
    val updatedHist = lab
      .join(qcc, col("__r") === col("__q"), "left")
      .select(col("__n").as("node"),
        coalesce(col("__qr"), col("__r")).as("cluster_rep"))
    val batchNodes = eaRaw.select(col("__a").as("__n"))
      .union(eaRaw.select(col("__b").as("__n"))).distinct()
      .join(lab, Seq("__n"), "left")
      .select(col("__n"), coalesce(col("__r"), col("__n")).as("__q0"))
      .join(qcc, col("__q0") === col("__q"), "left")
      .select(col("__n").as("node"),
        coalesce(col("__qr"), col("__q0")).as("cluster_rep"))
    updatedHist.union(batchNodes).distinct()
  }

  /** Convenience: cluster membership with component sizes, ordered —
    * the review surface ("which documents collapse together").
    */
  def clusters(edges: DataFrame, aCol: String, bCol: String): DataFrame =
    withSizes(connectedComponents(edges, aCol, bCol))

  /** The cluster review surface over any (node, cluster_rep) labeling
    * — full ([[connectedComponents]]) or incremental
    * ([[incrementalComponents]]): membership with component sizes,
    * one shape for q71 and q128.
    */
  def withSizes(labelled: DataFrame): DataFrame = {
    val sizes = labelled.groupBy("cluster_rep")
      .agg(count(lit(1)).as("n_members"))
    labelled.join(sizes, "cluster_rep")
      .select(col("node").as("doc_id"), col("cluster_rep"), col("n_members"))
  }
}
