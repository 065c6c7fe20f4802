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
  * Shingle identity is the md5 of the word n-gram (32 bytes on the
  * wire, the house rule: text never shuffles), shared with the MinHash
  * and df-capped paths so all three operators answer about the same
  * sets.
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
    // distinct shingle hashes per doc; pinned — fans out into the df
    // count, the prefix index, and the verification arrays
    val grams = docs
      .select(col(idCol).as("__id"), split(col(textCol), " ").as("__toks"))
      .select(col("__id"),
        explode(Contamination.wordGrams("__toks", n)).as("__gram"))
      .select(col("__id"), md5(col("__gram")).as("__gh"))
      .localCheckpoint()
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
        size(array_intersect(col("__sa"), col("__sb"))).cast("long"))
      .withColumn("jaccard",
        col("n_shared").cast("double") /
          (col("__na") + col("__nb") - col("n_shared")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "n_shared", "jaccard")
  }
}
