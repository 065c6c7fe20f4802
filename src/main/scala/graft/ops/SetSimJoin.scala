package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT set-similarity self-join with prefix-filter candidate pruning
  * (the AllPairs / PPJoin family) — the lossless counterpart of
  * [[NearDup.ngramJaccardPairs]]'s df-cap: that operator keeps the
  * inverted index bounded by DROPPING high-frequency shingles (pairs
  * similar only through stop-grams are silently excluded by POLICY);
  * this one returns every pair with true Jaccard ≥ t, provably.
  *
  * The pruning theorem: order each document's shingles by ascending
  * global document frequency (rarest first, ties by value); if two
  * sets of sizes n_a, n_b have Jaccard ≥ t, their intersection exceeds
  * t/(1+t)·(n_a+n_b), so EACH must hit the other inside its first
  * n − ⌈t·n⌉ + 1 shingles — the prefix. Indexing ONLY prefixes keeps
  * every qualifying pair reachable (zero false negatives) while the
  * candidate stream shrinks to collisions on the RAREST tokens: the
  * stop-gram posting lists that make the naive inverted-index join
  * quadratic sit at the END of every ordering and never enter the
  * index. Verification then reads just the two candidates' own shingle
  * arrays (scan-local `array_intersect` — doc-bounded, no shuffle), so
  * the exact answer costs one prefix equi-join plus one candidate-
  * sized lookup join instead of the full posting-list blowup.
  *
  * Shingle identity is the xxhash64 of the word n-gram (8 bytes on
  * the wire, the house rule: text never shuffles), shared in spirit
  * with the MinHash and df-capped paths so all three operators answer
  * about the same sets; verification counts overlaps with the native
  * [[graft.expressions.SortedIntersectCount]] merge walk (codegen'd —
  * the interpreted `array_intersect` form cost ~190 s on q192's
  * sf0.1 ground-truth fixture alone).
  */
object SetSimJoin {

  /** All pairs with exact n-gram Jaccard ≥ `minJaccard`, via prefix
    * filtering. Output: (id_a, id_b, n_shared, jaccard), id_a < id_b.
    */
  def prefixJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, minJaccard: Double): DataFrame = {
    require(n >= 1, s"n must be >= 1: $n")
    require(minJaccard > 0.0 && minJaccard <= 1.0,
      s"minJaccard must be in (0,1]: $minJaccard")
    prefixJaccardPairsFromGrams(
      shingleHashes(docs, idCol, textCol, n), minJaccard)
  }

  /** The prefix-filter join over a CALLER-SUPPLIED element table —
    * the set-identity-agnostic core of [[prefixJaccardPairs]]: `grams`
    * must be one (`__id`, `__gh`) row per DISTINCT set element per
    * document, already pinned (it fans out into the df count, the
    * prefix index, and the verification arrays). This is the form a
    * caller uses when its sets are NOT word n-grams — e.g. q192's
    * ground truth, whose sets are the 5-char shingles its MinHash
    * signatures sketch: truth and sketch must measure the SAME sets
    * or the recall table tunes the wrong space (the sf1 scale gate
    * caught exactly that divergence — word-gram truth and char-
    * shingle truth coincide on small corpora and split at 10×).
    */
  def prefixJaccardPairsFromGrams(grams: DataFrame,
      minJaccard: Double): DataFrame = {
    require(minJaccard > 0.0 && minJaccard <= 1.0,
      s"minJaccard must be in (0,1]: $minJaccard")
    val df = grams.groupBy("__gh").agg(count(lit(1)).as("__df"))
    // per-doc ascending (df, hash) order; the window partitions by doc
    // so its frame is doc-bounded — never corpus-sized
    val w = Window.partitionBy("__id")
      .orderBy(col("__df").asc, col("__gh").asc)
    val prefix = grams
      .join(df, "__gh")
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy("__id")))
      .filter(col("__rn") <=
        col("__n") - ceil(lit(minJaccard) * col("__n")) + 1)
      .select("__id", "__gh")
    val cand = prefix.select(col("__id").as("id_a"), col("__gh"))
      .join(prefix.select(col("__id").as("id_b"), col("__gh")), "__gh")
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    // verification: each candidate reads only its two members' shingle
    // arrays; sort_array gives a deterministic layout (contents are
    // sets, so order carries no meaning)
    val sets = grams.groupBy("__id")
      .agg(sort_array(collect_list(col("__gh"))).as("__set"),
        count(lit(1)).as("__n"))
    cand
      .join(sets.select(col("__id").as("id_a"), col("__set").as("__sa"),
        col("__n").as("__na")), "id_a")
      .join(sets.select(col("__id").as("id_b"), col("__set").as("__sb"),
        col("__n").as("__nb")), "id_b")
      .withColumn("n_shared",
        graft.expressions.SortedIntersectCount.count(
          col("__sa"), col("__sb")))
      .withColumn("jaccard",
        col("n_shared").cast("double") /
          (col("__na") + col("__nb") - col("n_shared")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "n_shared", "jaccard")
  }

  /** EXACT cross-corpus set-similarity screen — the R⋈S form of
    * [[prefixJaccardPairs]], the lossless counterpart of the BANDED
    * cross-corpus screen (`NearDup` band probing can miss true pairs
    * by signature chance; this provably returns every (arriving,
    * history) pair with Jaccard ≥ t). The prefix theorem is
    * side-agnostic: order ALL shingles (both sides together) by
    * ascending global df, index each document's first n − ⌈t·n⌉ + 1,
    * and any qualifying cross pair must collide inside both prefixes —
    * so candidates are prefix-on-prefix collisions on the rarest
    * tokens, never the full posting-list product, and verification
    * reads just the two candidates' own arrays. The df ordering is
    * computed over the UNION so both sides prune against the same
    * total order (a per-side ordering would break the theorem when
    * a gram is rare on one side but common on the other).
    *
    * Output: (id_r, id_s, n_shared, jaccard) — one row per qualifying
    * cross pair; ids may coincide numerically (the sides are distinct
    * corpora).
    */
  def crossJaccardPairs(r: DataFrame, s: DataFrame, idCol: String,
      textCol: String, n: Int, minJaccard: Double): DataFrame = {
    require(n >= 1, s"n must be >= 1: $n")
    require(minJaccard > 0.0 && minJaccard <= 1.0,
      s"minJaccard must be in (0,1]: $minJaccard")
    val gr = shingleHashes(r, idCol, textCol, n)
    val gs = shingleHashes(s, idCol, textCol, n)
    val df = gr.unionByName(gs)
      .groupBy("__gh").agg(count(lit(1)).as("__df"))
    def prefixOf(g: DataFrame): DataFrame = {
      val w = Window.partitionBy("__id")
        .orderBy(col("__df").asc, col("__gh").asc)
      g.join(df, "__gh")
        .withColumn("__rn", row_number().over(w))
        .withColumn("__n", count(lit(1)).over(Window.partitionBy("__id")))
        .filter(col("__rn") <=
          col("__n") - ceil(lit(minJaccard) * col("__n")) + 1)
        .select("__id", "__gh")
    }
    val cand = prefixOf(gr).select(col("__id").as("id_r"), col("__gh"))
      .join(prefixOf(gs).select(col("__id").as("id_s"), col("__gh")),
        "__gh")
      .select("id_r", "id_s")
      .distinct()
    def setsOf(g: DataFrame): DataFrame =
      g.groupBy("__id")
        .agg(sort_array(collect_list(col("__gh"))).as("__set"),
          count(lit(1)).as("__n"))
    cand
      .join(setsOf(gr).select(col("__id").as("id_r"),
        col("__set").as("__sr"), col("__n").as("__nr")), "id_r")
      .join(setsOf(gs).select(col("__id").as("id_s"),
        col("__set").as("__ss"), col("__n").as("__ns")), "id_s")
      .withColumn("n_shared",
        graft.expressions.SortedIntersectCount.count(
          col("__sr"), col("__ss")))
      .withColumn("jaccard",
        col("n_shared").cast("double") /
          (col("__nr") + col("__ns") - col("n_shared")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select("id_r", "id_s", "n_shared", "jaccard")
  }

  /** Distinct shingle hashes per doc (xxhash64 of the word n-gram —
    * 8 bytes on the wire, text never shuffles; 64-bit identity is the
    * NearDup.xs discipline, collision-free at any realistic gram
    * vocabulary); pinned, since every caller fans it into df counts,
    * prefix index, and verify arrays.
    */
  private def shingleHashes(docs: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame =
    docs
      .select(col(idCol).as("__id"), split(col(textCol), " ").as("__toks"))
      .select(col("__id"),
        explode(Contamination.wordGrams("__toks", n)).as("__gram"))
      .select(col("__id"), xxhash64(col("__gram")).as("__gh"))
      .localCheckpoint()
}
