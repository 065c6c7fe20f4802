package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Near-duplicate detection for training-data curation (SURVEY §7.2.8):
  * MinHash + LSH banding, n-gram Jaccard verification, and SimHash with
  * Hamming-distance search.
  *
  * Scale posture (the whole point of these operators):
  *  - Pairwise-all-pairs is O(n²) and never materialized. Candidate pairs
  *    come from LSH band buckets: a self-equi-join on (band, band_key),
  *    i.e. one hash shuffle on a 32-byte key; only documents agreeing on
  *    an entire band collide. With b bands of r rows, a pair of Jaccard
  *    similarity j collides with probability 1-(1-j^r)^b — the classic
  *    S-curve — so the join output is ~(true near-dups + noise), not n².
  *  - Signatures are computed scan-locally with codegen'd higher-order
  *    functions (no UDF, no shuffle): k seeded md5 min-hashes over the
  *    distinct shingle set.
  *  - Exact Jaccard runs only on the surviving candidates.
  *  - SimHash is one 128-bit signature per document (one pass over
  *    tokens); block-matching on signature quarters gives the same
  *    banding trick for Hamming space.
  *
  * Hashing is md5-based (see [[graft.functions.TextFns]]) so every number
  * here is reproducible in any engine — that is what the DuckDB oracle
  * checks.
  */
object NearDup {

  /** Mersenne prime modulus of the min-hash family (2^31 − 1). */
  val HashP: Long = 2147483647L

  private def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** The (a_i, b_i) coefficients of the k-member universal hash family
    * h_i(x) = (a_i·x + b_i) mod 2^31−1. Derived deterministically
    * (splitmix64 of i) and shared with the oracle SQL as plain literals
    * — the family must be the same in every engine. a_i ∈ [1, p−1],
    * b_i ∈ [0, p−1]; a_i·x + b_i < 2^62, overflow-free in int64.
    *
    * NOT h1 + i·h2 with mismatched scales: if one term dominates, the
    * argmin shingle is the same for every i and the k "independent"
    * min-hashes collapse into one — band collisions then explode to
    * near-quadratic candidate counts (observed 1.3M pairs on 5k docs).
    */
  def hashCoeffs(k: Int): Seq[(Long, Long)] =
    (0 until k).map { i =>
      (Math.floorMod(splitmix64(2L * i), HashP - 1) + 1,
        Math.floorMod(splitmix64(2L * i + 1), HashP))
    }

  /** MinHash signatures: one row of k min-hashes per document id.
    * sig[i] = min over shingles of h_i(x) where x is the top-60-bit
    * md5 of the shingle reduced mod p.
    *
    * Shape: explode(shingles) → codegen'd (md5, x) projection → k
    * map-side-partial `min` aggregates → array signature. Deliberately
    * NOT a higher-order-function fold: HOF lambdas evaluate interpreted
    * and Catalyst's CollapseProject inlines per-shingle hash columns
    * into a k-iteration lambda (k× the md5 work), whereas the exploded
    * form hashes each shingle exactly once inside whole-stage codegen
    * and the shuffle carries only k longs per doc.
    */
  def minHashSigs(df: DataFrame, idCol: String, shinglesCol: String,
      k: Int, out: String): DataFrame = {
    val hashed = df
      .select(col(idCol), explode(col(shinglesCol)).as("__s"))
      .select(col(idCol),
        expr(s"""cast(conv(substring(md5(__s), 1, 15), 16, 10) as bigint)
                | % $HashP""".stripMargin).as("__x"))
    val mins = hashCoeffs(k).zipWithIndex.map { case ((a, b), i) =>
      min((lit(a) * col("__x") + lit(b)) % HashP).as(s"__m$i")
    }
    hashed.groupBy(col(idCol))
      .agg(mins.head, mins.tail: _*)
      .select(col(idCol),
        array((0 until k).map(i => col(s"__m$i")): _*).as(out))
  }

  /** Explode a signature into (band, band_key) rows: band_key is the md5
    * of the band's concatenated min-hashes. The LSH join key.
    */
  def bandRows(df: DataFrame, idCol: String, sigCol: String, bands: Int,
      rowsPerBand: Int, sigLen: Int): DataFrame = {
    require(bands * rowsPerBand <= sigLen,
      s"bands ($bands) × rowsPerBand ($rowsPerBand) exceeds the signature " +
        s"length ($sigLen): out-of-range element_at would yield null, " +
        "concat_ws would collapse those bands to md5('') and every " +
        "document would collide there (quadratic candidate blowup)")
    val bandStructs = (0 until bands).map { b =>
      val parts = (1 to rowsPerBand)
        .map(r => s"cast(element_at($sigCol, ${b * rowsPerBand + r}) as string)")
        .mkString("concat_ws(',', ", ", ", ")")
      s"struct($b as band, md5($parts) as band_key)"
    }.mkString("array(", ", ", ")")
    df.select(col(idCol), explode(expr(bandStructs)).as("bb"))
      .select(col(idCol), col("bb.band").as("band"),
        col("bb.band_key").as("band_key"))
  }

  /** Candidate pairs (a < b) from LSH band collisions — the only join in
    * the pipeline, a self-equi-join on (band, band_key).
    */
  def candidatePairs(bandDf: DataFrame, idCol: String): DataFrame = {
    val a = bandDf.select(col(idCol).as("id_a"), col("band"), col("band_key"))
    val b = bandDf.select(col(idCol).as("id_b"), col("band"), col("band_key"))
    a.join(b, Seq("band", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  /** MinHash estimate of Jaccard: the fraction of agreeing signature
    * positions (an unbiased estimator). At corpus scale this is the
    * verification workhorse — signatures are k longs regardless of
    * document size, where exact set intersection ships whole shingle
    * sets per candidate pair; exact Jaccard is then reserved for
    * borderline estimates.
    */
  def estimatedJaccardExpr(sigA: String, sigB: String, k: Int): String =
    s"""cast(size(filter(zip_with($sigA, $sigB, (a, b) -> a = b),
       |  x -> x)) as double) / ${k}.0d""".stripMargin

  /** Exact Jaccard over distinct shingle sets for candidate pairs.
    * |A∩B| / (|A| + |B| − |A∩B|): integer set sizes, one final double
    * division — deterministic in any engine.
    */
  def jaccard(pairs: DataFrame, docShingles: DataFrame, idCol: String,
      shinglesCol: String): DataFrame = {
    val a = docShingles.select(col(idCol).as("id_a"),
      col(shinglesCol).as("__sh_a"))
    val b = docShingles.select(col(idCol).as("id_b"),
      col(shinglesCol).as("__sh_b"))
    pairs.join(a, "id_a").join(b, "id_b")
      // at 100 TB-corpus scale, run estimatedJaccardExpr on the k-long
      // signatures first and reserve this exact set intersection for
      // borderline pairs — see estimatedJaccardExpr
      .withColumn("__inter", expr("size(array_intersect(__sh_a, __sh_b))"))
      .withColumn("jaccard", expr(
        """cast(__inter as double) /
          |cast(size(__sh_a) + size(__sh_b) - __inter as double)"""
          .stripMargin))
      .select("id_a", "id_b", "jaccard")
  }

  /** 128-bit SimHash over a token-array column, as 32 lowercase hex
    * chars. Standard construction: for each of the 128 bit positions of
    * md5(token), sum +1/−1 over all tokens (frequency-weighted), take the
    * sign. One codegen'd pass per row; ties (sum == 0) resolve to 0.
    */
  def withSimHash(df: DataFrame, tokensCol: String, out: String): DataFrame = {
    val acc =
      s"""aggregate($tokensCol, array_repeat(0, 128),
         |  (acc, t) -> zip_with(acc,
         |    transform(sequence(0, 127),
         |      k -> (shiftright(cast(conv(substring(md5(t),
         |             cast(k / 4 as int) + 1, 1), 16, 10) as int),
         |             k % 4) & 1) * 2 - 1),
         |    (x, y) -> x + y))""".stripMargin
    val nib = (b: Int) =>
      s"(case when element_at(__acc, p * 4 + ${b + 1}) > 0 then ${1 << b} else 0 end)"
    df.withColumn("__acc", expr(acc))
      .withColumn(out, expr(
        s"""concat_ws('', transform(sequence(0, 31),
           |  p -> substring('0123456789abcdef',
           |    1 + ${nib(0)} + ${nib(1)} + ${nib(2)} + ${nib(3)}, 1)))"""
          .stripMargin))
      .drop("__acc")
  }

  /** Pack a 32-hex-char SimHash into four 32-bit chunks so Hamming
    * distance is four xor+popcount ops instead of 32 string parses.
    */
  def packedChunks(sigCol: String): org.apache.spark.sql.Column =
    expr(
      s"""transform(sequence(0, 3),
         |  b -> cast(conv(substring($sigCol, b * 8 + 1, 8), 16, 10)
         |            as bigint))""".stripMargin)

  /** Nearest neighbor per document in SimHash Hamming space (min
    * distance, ties to the smallest id). Exact within the given frame —
    * at corpus scale this runs over block-LSH candidates from
    * [[simhashBlockRows]], not all pairs. The per-query minimum is a
    * map-side partial `min(struct(hamming, id))` aggregation, so the
    * pair stream is reduced before any shuffle (no n²-row exchange).
    */
  def hammingNN(sigs: DataFrame, idCol: String, sigCol: String): DataFrame = {
    val packed = sigs.select(col(idCol), packedChunks(sigCol).as("__ch"))
    val a = packed.select(col(idCol).as("id_a"), col("__ch").as("__ca"))
    val b = packed.select(col(idCol).as("id_b"), col("__ch").as("__cb"))
    a.crossJoin(b).filter(col("id_a") =!= col("id_b"))
      .withColumn("hamming", expr(
        """aggregate(zip_with(__ca, __cb,
          |  (x, y) -> cast(bit_count(x ^ y) as bigint)),
          |  cast(0 as bigint), (a, v) -> a + v)""".stripMargin))
      .groupBy("id_a")
      .agg(min(struct(col("hamming"), col("id_b"))).as("__m"))
      .select(col("id_a"), col("__m.id_b").as("id_b"),
        col("__m.hamming").as("hamming"))
  }

  /** Scale path for SimHash search: split the 32-hex signature into 4
    * blocks of 8; any pair within Hamming distance ≤ 3 of a *bit* block
    * boundary shares at least one block exactly (pigeonhole), so a
    * self-join on (block_idx, block) yields the candidates — the same
    * one-shuffle shape as MinHash banding.
    */
  def simhashBlockRows(sigs: DataFrame, idCol: String,
      sigCol: String): DataFrame =
    sigs.select(col(idCol), explode(expr(
      s"""transform(sequence(0, 3),
         |  b -> struct(b as block_idx,
         |              substring($sigCol, b * 8 + 1, 8) as block))"""
        .stripMargin)).as("bb"))
      .select(col(idCol), col("bb.block_idx").as("block_idx"),
        col("bb.block").as("block"))
}
