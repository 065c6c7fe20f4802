package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expressions.LongDot

/** Deterministic distributed k-means (Lloyd's algorithm) over quantized
  * embeddings (SURVEY §2.11 E73) — the clustering primitive behind
  * semantic dedup, corpus topic balancing, and IVF coarse quantizers
  * (q36/q37 build one non-iterative cell map; this refines it).
  *
  * Everything is exact integer arithmetic, so any engine reproduces the
  * trajectory bit-for-bit:
  *  - seeding: the k lowest-id vectors (no RNG state);
  *  - distance: ‖q − c‖² = qn − 2·(q·c) + ‖c‖², all int64 via the
  *    codegen'd [[LongDot]]; ties pick the smaller cluster index;
  *  - update: per-dimension TRUNCATING integer division of the exact
  *    sums (matches DuckDB `//` and Java `/` — floor would disagree on
  *    negative sums); an emptied cluster keeps its previous centroid.
  *
  * Scale shape — the same as MLlib's k-means: centroids are
  * metadata-sized (k·dims longs), folded into each pass as plan
  * literals, so ASSIGNMENT IS SCAN-LOCAL (no join, no shuffle of
  * vectors); the update is one partial-aggregated shuffle of
  * (cluster, dim) keys — k·dims rows out, never the vectors
  * themselves. `iters` passes over an input pinned with
  * `localCheckpoint` (a genuine multi-job fan-out: each update round
  * is a separate job).
  */
object KMeans {

  /** Run `iters` Lloyd rounds and return the final assignment:
    * `(idCol, cluster, dist)` — one row per input vector, `dist` the
    * exact squared distance to its final centroid. `prepared` needs
    * the [[Similarity.prepare]] columns (`qv`, `qn`).
    */
  def fit(prepared: DataFrame, idCol: String, k: Int, iters: Int): DataFrame =
    fitFull(prepared, idCol, k, iters)
      .select(col(idCol), col("cluster"), col("dist"))

  /** [[fit]] keeping the quantized vector columns (`qv`, `qn`) on each
    * assignment row — for consumers that do per-cluster vector work
    * next (cluster-blocked semantic dedup, re-ranking) without a join
    * back to the corpus.
    */
  def fitFull(prepared: DataFrame, idCol: String, k: Int,
      iters: Int): DataFrame = {
    validate(k, iters) // before the eager checkpoint materializes anything
    // iters update jobs + the final assignment all rescan the input —
    // a genuine fan-out, so pin it once (re-materialized per run,
    // cache-manager-safe across bench trials)
    val vecs = prepared.select(col(idCol).as("__id"), col("qv"), col("qn"))
      .localCheckpoint()
    assign(vecs, lloyd(vecs, k, iters))
      .select(col("__id").as(idCol), col("cluster"), col("dist"),
        col("qv"), col("qn"))
  }

  /** The fitted centroids alone — the stored model for the incremental
    * paths (q103): a later batch is assigned to these cells as plan
    * literals WITHOUT re-clustering the corpus.
    */
  def fitCentroids(prepared: DataFrame, idCol: String, k: Int,
      iters: Int): Array[Array[Long]] = {
    validate(k, iters)
    val vecs = prepared.select(col(idCol).as("__id"), col("qv"), col("qn"))
      .localCheckpoint()
    lloyd(vecs, k, iters)
  }

  private def validate(k: Int, iters: Int): Unit = {
    require(k >= 1, s"k must be positive: $k")
    require(iters >= 0, s"iters must be non-negative: $iters")
  }

  /** Scan-local assignment of `prepared` vectors to FIXED centroids
    * (no Lloyd rounds, no shuffle, no join — the centroids fold into
    * the plan as literals): `(idCol, cluster, dist, qv, qn)`.
    */
  def assignTo(prepared: DataFrame, idCol: String,
      cs: Array[Array[Long]]): DataFrame =
    assign(prepared.select(col(idCol).as("__id"), col("qv"), col("qn")), cs)
      .select(col("__id").as(idCol), col("cluster"), col("dist"),
        col("qv"), col("qn"))

  /** `iters` Lloyd rounds from the deterministic lowest-id seeding. */
  private def lloyd(vecs: DataFrame, k: Int, iters: Int): Array[Array[Long]] = {
    val init: Array[Array[Long]] = vecs.orderBy("__id").limit(k)
      .select("qv").collect()
      .map(_.getSeq[Long](0).toArray)
    require(init.length == k,
      s"need at least k=$k vectors, found ${init.length}")
    var centroids = init
    for (_ <- 1 to iters)
      centroids = update(assign(vecs, centroids), centroids)
    centroids
  }

  /** Scan-local nearest-centroid assignment: k codegen'd integer dots
    * against constant arrays, argmin via `least` over (dist, index)
    * structs — lexicographic struct ordering IS the tie-break.
    */
  private def assign(vecs: DataFrame, cs: Array[Array[Long]]): DataFrame = {
    val cands: Seq[Column] = cs.zipWithIndex.map { case (c, j) =>
      val cn = c.map(x => x * x).sum
      struct(
        (col("qn") - lit(2L) * LongDot.dot(typedLit(c.toSeq), col("qv"))
          + lit(cn)).as("d"),
        lit(j.toLong).as("c"))
    }.toSeq
    val best = if (cands.length == 1) cands.head else least(cands: _*)
    vecs.withColumn("__best", best)
      .select(col("__id"), col("qv"), col("qn"),
        col("__best.c").as("cluster"), col("__best.d").as("dist"))
  }

  /** One shuffle of (cluster, dim) keys → exact sums and counts →
    * driver-side truncating division (the collected table is k·dims
    * rows — metadata, like a range partitioner's boundaries).
    */
  private def update(assigned: DataFrame,
      prev: Array[Array[Long]]): Array[Array[Long]] = {
    val next = prev.map(_.clone())
    assigned
      .select(col("cluster"), posexplode(col("qv")).as(Seq("pos", "x")))
      .groupBy("cluster", "pos")
      .agg(sum("x").as("s"), count(lit(1)).as("n"))
      .collect()
      .foreach { r =>
        next(r.getAs[Long]("cluster").toInt)(r.getAs[Int]("pos")) =
          r.getAs[Long]("s") / r.getAs[Long]("n")
      }
    next
  }
}
