package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale discipline for keyframe-hash near-dup candidate generation
  * (q300 clusters; the q307/q311 gate probes share the stop-hash
  * half) — the audio chain's exact-before-near rule (q294 collapses
  * identical envelope fingerprints FIRST and band-joins DISTINCT fps
  * only) lifted to the video axis, where a doc's fingerprint is a
  * MULTISET of keyframe hashes rather than one long.
  *
  * Why it matters at 100 TB: the naive chain pairs doc-level keyframe
  * rows directly on `kf_hash`, so (a) a giant duplicate group — a
  * million re-uploads of one clip, the COMMON case in crawl data —
  * makes the candidate join quadratic in group size, and (b) one
  * degenerate keyframe hash (a black frame, a station ident card)
  * shared by unrelated videos is a skew magnet that explodes the
  * equi-join output. Two remedies, both semantics-preserving at every
  * gated scale:
  *
  *  1. '''Exact-before-near collapse''': docs with IDENTICAL keyframe
  *     hash multisets (re-encodes/upscales preserve blockhashes
  *     bit-for-bit, so whole dup groups land here) collapse to one
  *     min-doc representative before pairing. Exactly equivalent to
  *     pairing every doc: two docs with the same multiset of size
  *     ≥ 2 share all of it, so the ≥ 2 vote is guaranteed — they are
  *     ALWAYS one cluster. Identical SINGLETON multisets are NOT
  *     collapsed (one shared hash between two single-keyframe docs is
  *     vote 1, not a dup) but they STAY in the pairing individually:
  *     a single-keyframe doc still out-votes against a doc carrying
  *     that hash at multiplicity ≥ 2, exactly as in the uncollapsed
  *     rule. Candidate volume becomes linear in the number of
  *     DISTINCT fingerprints, not docs.
  *  2. '''df cap (the E50/maxDf discipline)''': a hash carried by
  *     more than `maxDf` distinct representatives identifies
  *     boilerplate, not content — it is dropped from PAIRING (never
  *     from reporting). The fixture's hashes carry 64 iid mixed bits,
  *     so at every gated scale the in-data df maximum is 2 (master ∪
  *     upscale vs trim) and the cap provably never fires — the oracle
  *     stays verbatim; `VideoScaleSpec` plants the degenerate hash and
  *     the giant dup group the cap and the collapse exist for and
  *     measures the candidate volume staying group-linear.
  */
object VideoNearDup {

  /** Collapse identical per-doc keyframe-hash multisets: returns
    * (repKfs, docRep) where `repKfs` carries one (rep, kf_hash) row
    * per multiset element — one representative per size-≥ 2 multiset
    * group, each singleton-multiset doc individually (uncollapsed,
    * still pair-eligible) — and `docRep` maps EVERY input doc to its
    * representative (itself when its multiset is singleton or
    * unique).
    */
  def collapse(kfs: DataFrame): (DataFrame, DataFrame) = {
    // one aggregation + one window: group identity is the sorted
    // multiset itself (exact — no fingerprint collision question),
    // the min-doc representative comes from the window, and both
    // outputs are projections of ONE checkpointed frame
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("kf_set")
    val sets = Snap.tracked(kfs.groupBy("doc_id")
      .agg(sort_array(collect_list(col("kf_hash"))).as("kf_set"))
      .withColumn("__multi", size(col("kf_set")) >= 2)
      .withColumn("rep", when(col("__multi"),
        min("doc_id").over(w)).otherwise(col("doc_id"))))
    val docRep = sets.select(col("doc_id"), col("rep"))
    val repKfs = sets.filter(col("doc_id") === col("rep"))
      .select(col("rep"), explode(col("kf_set")).as("kf_hash"))
    (repKfs, docRep)
  }

  /** Hashes carried by more than `maxDf` pairing rows — the row
    * count, not a distinct-doc count, because join output per hash is
    * exactly cnt² and rows are what the cap must bound. Tiny by
    * construction (only degenerate/boilerplate hashes qualify).
    */
  def hotHashes(repKfs: DataFrame, maxDf: Int): DataFrame =
    Dedup.hotKeys(repKfs, "kf_hash", maxDf)

  /** Candidate pairs between representatives with their shared-hash
    * vote counts, hot hashes excluded from pairing. The cap is ONE
    * window filter (count over the kf_hash partition — the shuffle
    * the self-join needs anyway), not a separate aggregate+anti-join
    * pass. Public so `VideoScaleSpec` can measure the candidate
    * volume directly.
    */
  def pairVotes(repKfs: DataFrame, maxDf: Int): DataFrame = {
    require(maxDf >= 1, s"maxDf must be >= 1: $maxDf")
    val wh = org.apache.spark.sql.expressions.Window
      .partitionBy("kf_hash")
    val safe = repKfs
      .withColumn("__df", count(lit(1)).over(wh))
      .filter(col("__df") <= maxDf)
    val a = safe.select(col("rep").as("id_a"), col("kf_hash"))
    val b = safe.select(col("rep").as("id_b"), col("kf_hash"))
    a.join(b, Seq("kf_hash"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("votes"))
  }

  /** Full chain: collapse → df-capped candidate pairs → ≥ 2 vote →
    * connected components over representatives → doc-level labels.
    * Returns (doc_id, cluster_rep) for every doc in `kfs`, cluster_rep
    * being the component's minimum doc_id. While no hash exceeds
    * `maxDf` among representatives, the output is bit-identical to
    * running the vote over raw doc-level rows (the equivalence
    * argument in the object doc) at group-linear candidate cost; when
    * a hash DOES exceed the cap it is deliberately excluded from
    * pairing — the semantics change is the cap's purpose.
    */
  def clusterLabels(kfs: DataFrame, maxDf: Int = 64): DataFrame = {
    val (repKfs, docRep) = collapse(kfs)
    val edges = pairVotes(repKfs, maxDf)
      .filter(col("votes") >= 2)
      .select("id_a", "id_b")
    val lab = DedupClusters.connectedComponents(edges, "id_a", "id_b")
      .withColumnRenamed("node", "rep")
    docRep.join(lab, Seq("rep"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_rep"), col("rep")).as("cluster_rep"))
  }
}
