package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join-size estimation from count-min frequency sketches — the
  * shuffle-planning stat a 100 TB engine computes BEFORE paying for a
  * join (SURVEY §2.11 E219). |A ⋈_k B| = Σ_k f_A(k)·f_B(k), so a join
  * that looks innocent on row counts can explode on key skew
  * (self-joins quadratically: Σ f²); estimating it from two tiny
  * sketches costs one scan per side, no key shuffle, and decides
  * broadcast-vs-salt-vs-abort while the real join would still be
  * provisioning executors.
  *
  * Estimator (Cormode–Muthukrishnan): hash each side's keys into a
  * d×w counter matrix; for each depth row r the bucket-wise inner
  * product Σ_j cms_A[r][j]·cms_B[r][j] OVERESTIMATES the true join
  * size (collisions only add non-negative products), so the estimate
  * is the MIN over the d rows — est ≥ exact always, and
  * est ≤ exact + (n_A·n_B)/w with probability 1−(1/2)^d per the CMS
  * analysis.
  *
  * Unlike q109's `count_min_sketch` (whose seeded hash family is
  * engine-internal), the sketch here is built IN THE DATAFRAME with
  * the repo's portable md5 bucket hash, so the ENTIRE estimate — not
  * just the exact side — replays in any ANSI engine and the oracle
  * gates the estimator itself, not merely its verification columns.
  *
  * Scale shape: each side is one scan; the d per-key hash rows
  * partial-agg map-side into ≤ d·w groups per partition, so only
  * counter matrices (d·w rows of three ints) ever shuffle — key
  * cardinality never matters. The EXACT join size recomputed here is
  * the verification side (the q51/q109 discipline: approximations
  * ship with measured error, not asserted error); a 100 TB caller
  * keeps only the sketch pass.
  *
  * Exact-integer bound (the q215 rebase discipline): per-depth inner
  * products are ≤ n_A·n_B, so int64 holds to ~3·10⁹ rows per side;
  * beyond that, rebase counts to thousands or widen to decimal(38).
  */
object JoinEstimate {

  /** d×w count-min counter matrix of `key` occurrences in `df`, as
    * rows (r, bucket, cnt). The bucket hash is the repo's portable
    * md5 slice — `conv(substring(md5(r || ':' || key), 1, 8), 16, 10)
    * % w` — identical in any engine with md5. Null keys are excluded
    * by contract (a null joins nothing, so it contributes no pairs).
    */
  def cmsCounters(df: DataFrame, key: Column, d: Int, w: Int): DataFrame = {
    require(d > 0 && w > 0, s"d and w must be positive: d=$d w=$w")
    df.filter(key.isNotNull)
      .select(key.cast("string").as("__k"))
      .select(explode(sequence(lit(0), lit(d - 1))).as("r"), col("__k"))
      .select(col("r"), expr(
        s"""cast(conv(substring(md5(concat(cast(r as string), ':', __k)),
           |1, 8), 16, 10) as bigint) % $w""".stripMargin).as("bucket"))
      .groupBy(col("r"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** The estimate from two prebuilt counter matrices: MIN over depth
    * rows of the bucket-wise inner product. Exposed separately so
    * incrementally-MAINTAINED counters (sketch linearity: counters of
    * a union = elementwise sum of counters — exact, not approximate)
    * reuse the identical estimation path (q228).
    */
  def estimateFromCounters(ca: DataFrame, cb: DataFrame,
      d: Int): DataFrame = {
    // depth spine: a depth row with NO shared bucket has inner product
    // 0 (and forces exact = 0); an inner-join groupBy would silently
    // drop it from the MIN
    val spine = ca.sparkSession.range(d)
      .select(col("id").cast("int").as("r"))
    val perDepth = ca.join(cb, Seq("r", "bucket"))
      .groupBy(col("r"))
      .agg(sum(ca("cnt") * cb("cnt")).as("ip"))
    spine.join(perDepth, Seq("r"), "left")
      .select(coalesce(col("ip"), lit(0L)).as("ip"))
      .agg(min(col("ip")).as("est_pairs"))
  }

  /** Elementwise sum of counter matrices — the sketch-linearity merge
    * (q228): counters(history ∪ delta) = merge(counters(history),
    * counters(delta)), an O(d·w) operation independent of history
    * size.
    */
  def mergeCounters(parts: DataFrame*): DataFrame =
    parts.reduce(_ unionByName _)
      .groupBy(col("r"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))

  /** One report row for the equi-join of `a.aKey` against `b.bKey`:
    * (est_pairs, exact_pairs, overestimate_ok, err_bp). err_bp is the
    * truncated-integer relative overestimate in basis points,
    * (est−exact)·10000 div exact (0 when exact is 0 — then est is
    * provably 0 too). `overestimate_ok` restates est ≥ exact, the
    * structural CMS property, measured per run rather than assumed.
    */
  def joinSize(a: DataFrame, aKey: Column, b: DataFrame, bKey: Column,
      d: Int, w: Int): DataFrame = {
    val ca = cmsCounters(a, aKey, d, w)
    val cb = cmsCounters(b, bKey, d, w)
    val est = estimateFromCounters(ca, cb, d)
    val fa = a.filter(aKey.isNotNull).groupBy(aKey.cast("string").as("__k"))
      .agg(count(lit(1)).as("fa"))
    val fb = b.filter(bKey.isNotNull).groupBy(bKey.cast("string").as("__k"))
      .agg(count(lit(1)).as("fb"))
    val exact = fa.join(fb, "__k")
      .agg(coalesce(sum(col("fa") * col("fb")), lit(0L)).as("exact_pairs"))
    est.crossJoin(exact).select(
      col("est_pairs"), col("exact_pairs"),
      (col("est_pairs") >= col("exact_pairs")).as("overestimate_ok"),
      when(col("exact_pairs") === 0L, 0L)
        .otherwise(expr(
          "(est_pairs - exact_pairs) * 10000L div exact_pairs"))
        .as("err_bp"))
  }
}
