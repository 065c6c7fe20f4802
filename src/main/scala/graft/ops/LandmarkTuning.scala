package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measured operating-point tuning for the landmark-vote dedup rule
  * (q314; the q192 LSH-(b,r) discipline on the landmark axis). The
  * q302 cluster gate admitted at a hardcoded ≥ 3 shared hashes while
  * its own sf1 run measured a real false-positive tail (one 4-doc
  * chance cluster at 1.25×10⁹ pairs) — the knob had no measured table
  * and no stored artifact. This builds the
  * (delta-quantization, vote threshold) → {trim recall, chance merges}
  * table over a fixed LABELED CALIBRATION SAMPLE — 256 groups of the
  * exact q302 fixture legs (master, silence-pad, content-trim,
  * control), generated from the group index so the sample (and hence
  * the chosen point) is IDENTICAL at every corpus scale — and chooses
  * the operating point by rule:
  *
  *  - a delta-quantization level q is VIABLE iff
  *    maxNeg(q) + 2 ≤ minPos(q) (a separating threshold exists with
  *    full measured recall and zero chance admissions);
  *  - q* = the smallest viable level (exact deltas preferred — the
  *    codec's measured delta jitter is zero, so coarsening buys
  *    nothing and only erodes specificity; the table SHOWS the
  *    erosion);
  *  - t* = (maxNeg(q*) + 2 + minPos(q*)) / 2 — the EQUAL-MARGIN
  *    point: as far above the measured chance ceiling as below the
  *    measured twin floor, the max-F1-with-slack analogue of q303's
  *    choice rule.
  *
  * The choice is persisted via [[ModelStore.saveLandmarkPoint]] and
  * the live cluster gates (q302, q306's landmark leg) READ it — a
  * different stored point provably changes clusters
  * (`LandmarkTuningSpec`). The oracle replays sample, sweep, choice,
  * and gate in SQL, so green means the cross-engine choice agrees.
  *
  * Scale posture: the sample is fixed-size (1,024 docs, ~20 hashes
  * each), so the whole sweep — including the coarsest level's
  * deliberately flooded candidate join — costs the same at sf0.01 and
  * at 100 TB; production tunes on a labeled sample, never by sweeping
  * the corpus.
  */
object LandmarkTuning {

  /** Delta-coarsening levels swept (bit shifts on both delta fields). */
  val qLevels: Seq[Int] = Seq(0, 2, 4, 6)

  /** Calibration sample size in groups (4 legs each). */
  val nGroups: Int = 256

  /** Vote thresholds swept: 1..tMax. */
  val tMax: Int = 16

  /** Df caps swept (powers of two): the candidate values for the
    * boilerplate cap that every media pairing join applies.
    */
  val capGrid: Seq[Int] = Seq(1, 2, 4, 8, 16, 32, 64, 128, 256)

  /** Headroom multiplier between the sample's measured max df and the
    * stored cap. The fixed 1,024-doc calibration sample UNDERESTIMATES
    * corpus chance df — collisions accumulate with corpus size
    * (measured on the landmark axis: sample max df 6 vs 18 at the
    * 50k-doc sf1 corpus, ×3; the envelope band axis, whose key space
    * is only 2¹² per band, reaches 33, ×5.5) — while true boilerplate
    * (a metronome click shared by 10⁶ clips, a black video frame) sits
    * ORDERS OF MAGNITUDE above any chance df. 16× covers the measured
    * corpus inflation twice over in log space and still bites ~10³
    * below the first real magnet; the published sweep proves every
    * grid value at or above the recall floor is recall-free on
    * labeled data, so widening the margin costs nothing.
    */
  val capHeadroom: Int = 16

  /** Per-doc DISTINCT landmark hash sets of the calibration sample at
    * every quantization level: doc 4g+r is the q302 fixture leg r of
    * group g (0 = master, 1 = n/3 silence pad, 2 = trim at
    * first-onset+5, 3 = unrelated control), all through the real
    * codec.
    */
  def sampleHashes(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.range(0L, 4L * nGroups).as[Long].flatMap { id =>
      val g = id / 4
      val r = id % 4
      val n = (4000 + (g % 7) * 500 + g % 53).toInt
      val sk = if (r == 3) 2 * g + 1 else 2 * g
      // the control (r = 3) is the MASTER form of the odd seed
      val wav = Audio.encodeWavSamples(
        Audio.clickRendition(sk, n, if (r == 3) 0L else r), 16000)
      qLevels.flatMap(q =>
        Audio.landmarkHashes(id, wav, 256, q).distinct
          .map(h => (q, id, h)))
    }.toDF("q", "doc_id", "h")
  }

  /** Candidate pairs per level with shared-hash counts (docs pair iff
    * they share ≥ 1 hash at that level).
    */
  private def pairShared(hashes: DataFrame): DataFrame = {
    val a = hashes.select(col("q"), col("doc_id").as("da"),
      col("h"))
    val b = hashes.select(col("q").as("qb"), col("doc_id").as("db"),
      col("h").as("hb"))
    a.join(b, col("q") === col("qb") && col("h") === col("hb") &&
        col("da") < col("db"))
      .groupBy("q", "da", "db")
      .agg(count(lit(1)).as("shared"))
  }

  /** Labeled shared counts: every positive pair (within-group,
    * non-control: (m,pad), (m,trim), (pad,trim)) with its shared
    * count COALESCED to 0 when the candidate join never surfaced it,
    * and every surfaced negative. Snapped once; everything downstream
    * reads it.
    */
  def labeledShared(spark: SparkSession): (DataFrame, DataFrame) = {
    import spark.implicits._
    // ONE checkpoint of the candidate join (it contains the q=6
    // deliberately-flooded level — materializing it once is the
    // dominant cost of the sweep); pos/neg are cheap projections
    val cand = Snap.tracked(pairShared(sampleHashes(spark)))
    val posKeys = spark.range(0L, nGroups.toLong).as[Long]
      .flatMap(g => Seq((4 * g, 4 * g + 1), (4 * g, 4 * g + 2),
        (4 * g + 1, 4 * g + 2)))
      .toDF("da", "db")
      .crossJoin(broadcast(qLevels.toDF("q")))
    val pos = posKeys
      .join(cand, Seq("q", "da", "db"), "left")
      .select(col("q"), coalesce(col("shared"), lit(0L)).as("shared"))
    val neg = cand
      .filter(!(expr("da div 4") === expr("db div 4") &&
        col("da") % 4 < 3 && col("db") % 4 < 3))
      .select(col("q"), col("shared"))
    (pos, neg)
  }

  /** Per-level measured stats: (q, min_pos, max_neg). */
  def stats(pos: DataFrame, neg: DataFrame): DataFrame = {
    val mp = pos.groupBy("q").agg(min("shared").as("min_pos"))
    val mn = neg.groupBy("q").agg(max("shared").as("max_neg"))
    mp.join(mn, Seq("q"), "left")
      .select(col("q"), col("min_pos"),
        coalesce(col("max_neg"), lit(0L)).as("max_neg"))
  }

  /** The full measured table: one row per (delta_qbits, vote_t) with
    * admitted counts and exact truncated-bp recall/precision.
    */
  def table(spark: SparkSession): DataFrame = {
    val (pos, neg) = labeledShared(spark)
    tableFrom(spark, pos, neg)
  }

  /** [[table]] over an already-materialized labeled sweep — callers
    * that also derive the stored operating point (q314 +
    * `landmarkOpPath`) share ONE candidate-join checkpoint per
    * session instead of re-running the deliberately-flooded q=6
    * sweep twice.
    */
  def tableFrom(spark: SparkSession, pos: DataFrame,
      neg: DataFrame): DataFrame = {
    import spark.implicits._
    val ts = (1 to tMax).map(_.toLong).toDF("vote_t")
    val grid = qLevels.map(_.toLong).toDF("delta_qbits")
      .crossJoin(broadcast(ts))
    val nPos = 3L * nGroups
    val cp = pos.crossJoin(broadcast(ts))
      .groupBy(col("q").cast("long").as("delta_qbits"), col("vote_t"))
      .agg(sum(when(col("shared") >= col("vote_t"), 1L)
        .otherwise(0L)).as("pos_admitted"))
    val cn = neg.crossJoin(broadcast(ts))
      .groupBy(col("q").cast("long").as("delta_qbits"), col("vote_t"))
      .agg(sum(when(col("shared") >= col("vote_t"), 1L)
        .otherwise(0L)).as("neg_admitted"))
    grid.join(cp, Seq("delta_qbits", "vote_t"), "left")
      .join(cn, Seq("delta_qbits", "vote_t"), "left")
      .select(col("delta_qbits"), col("vote_t"),
        coalesce(col("pos_admitted"), lit(0L)).as("pos_admitted"),
        coalesce(col("neg_admitted"), lit(0L)).as("neg_admitted"))
      .withColumn("recall_bp",
        expr(s"pos_admitted * 10000 div $nPos"))
      .withColumn("precision_bp",
        expr("CASE WHEN pos_admitted + neg_admitted = 0 THEN 10000 " +
          "ELSE pos_admitted * 10000 div " +
          "(pos_admitted + neg_admitted) END"))
      .orderBy("delta_qbits", "vote_t")
  }

  /** The measured df-cap sweep (q321) over the calibration sample at
    * the CHOSEN (q*, t*) operating point: one row per grid cap with
    * the hash count the cap would exclude, the positive/negative
    * pairs still admitted by the t* vote after exclusion, exact
    * truncated-bp recall, the sample's measured max df, and the
    * chosen flag. The sweep publishes the evidence the stored cap
    * stands on: recall is FULL from the floor up (excluding a
    * high-df hash only removes votes the t* margin never needed),
    * so the [[chooseCap]] headroom rule can only widen safety.
    */
  def capTable(spark: SparkSession, qStar: Long,
      tStar: Long): DataFrame = {
    import spark.implicits._
    // pinned once: the sample frame feeds four jobs below (df table,
    // both join sides, the max-df scalar) and would otherwise re-run
    // the WAV codec per job
    val hs = sampleHashes(spark).filter(col("q") === qStar.toInt)
      .select(col("doc_id"), col("h"))
      .localCheckpoint()
    val dfh = hs.groupBy("h").agg(count(lit(1)).as("dfh"))
    val grid = capGrid.map(_.toLong).toDF("cap")
    val occ = hs.join(dfh, "h")
      .select(col("doc_id").as("da"), col("h"), col("dfh"))
      .join(hs.select(col("doc_id").as("db"), col("h")), Seq("h"))
      .filter(col("da") < col("db"))
    val shared = occ.crossJoin(broadcast(grid))
      .filter(col("dfh") <= col("cap"))
      .groupBy("cap", "da", "db")
      .agg(count(lit(1)).as("shared"))
    val nPos = 3L * nGroups
    val posAdm = spark.range(0L, nGroups.toLong).as[Long]
      .flatMap(g => Seq((4 * g, 4 * g + 1), (4 * g, 4 * g + 2),
        (4 * g + 1, 4 * g + 2)))
      .toDF("da", "db")
      .crossJoin(broadcast(grid))
      .join(shared, Seq("cap", "da", "db"), "left")
      .groupBy("cap")
      .agg(sum(when(coalesce(col("shared"), lit(0L)) >= tStar, 1L)
        .otherwise(0L)).as("pos_admitted"))
    val negAdm = shared
      .filter(!(expr("da div 4") === expr("db div 4") &&
        col("da") % 4 < 3 && col("db") % 4 < 3))
      .groupBy("cap")
      .agg(sum(when(col("shared") >= tStar, 1L).otherwise(0L))
        .as("neg_admitted"))
    val nHot = dfh.crossJoin(broadcast(grid))
      .filter(col("dfh") > col("cap"))
      .groupBy("cap").agg(count(lit(1)).as("n_hot_hashes"))
    val maxDfSample = dfh.agg(max("dfh")).head().getLong(0)
    val base = grid
      .join(nHot, Seq("cap"), "left")
      .join(posAdm, Seq("cap"), "left")
      .join(negAdm, Seq("cap"), "left")
      .select(col("cap"),
        coalesce(col("n_hot_hashes"), lit(0L)).as("n_hot_hashes"),
        coalesce(col("pos_admitted"), lit(0L)).as("pos_admitted"),
        coalesce(col("neg_admitted"), lit(0L)).as("neg_admitted"))
      .withColumn("recall_bp",
        expr(s"pos_admitted * 10000 div $nPos"))
      .withColumn("sample_max_df", lit(maxDfSample))
    val capStar = chooseCap(
      base.select("cap", "pos_admitted", "neg_admitted").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq,
      maxDfSample)
    base.withColumn("chosen", col("cap") === capStar)
      .orderBy("cap")
  }

  /** The df-cap choice rule over the collected sweep (metadata-sized:
    * one row per grid cap). Fails LOUDLY when no cap keeps full
    * measured recall with zero chance admissions, when the headroom
    * rule runs off the swept grid, or when the two measured inputs
    * contradict (headroom below the recall floor) — a cap must never
    * silently fall back to a constant.
    */
  def chooseCap(sweep: Seq[(Long, Long, Long)],
      sampleMaxDf: Long): Long = {
    val nPos = 3L * nGroups
    val floors = sweep.filter { case (_, pos, neg) =>
      pos == nPos && neg == 0L }
    require(floors.nonEmpty,
      s"no swept df cap keeps full recall with zero chance " +
        s"admissions: ${sweep.mkString(", ")}")
    val capFloor = floors.map(_._1).min
    val above = capGrid.map(_.toLong)
      .filter(_ >= capHeadroom * sampleMaxDf)
    require(above.nonEmpty,
      s"headroom rule runs off the swept grid: " +
        s"$capHeadroom x sampleMaxDf=$sampleMaxDf > ${capGrid.max}")
    val capStar = above.min
    require(capStar >= capFloor,
      s"measured inputs contradict: headroom cap $capStar below " +
        s"recall floor $capFloor")
    capStar
  }

  /** The choice rule over collected per-level stats (metadata-sized:
    * one row per quantization level). Fails LOUDLY when no level
    * separates — an unseparable fixture must never silently fall back
    * to a default vote count.
    */
  def choose(stats: Seq[(Long, Long, Long)]): (Long, Long) = {
    val viable = stats.filter { case (_, minPos, maxNeg) =>
      maxNeg + 2 <= minPos }
    require(viable.nonEmpty,
      s"no delta-quantization level separates twins from chance: " +
        stats.mkString(", "))
    val (q, minPos, maxNeg) = viable.minBy(_._1)
    val t = (maxNeg + 2 + minPos) / 2
    // the stored point must be a cell the published table SHOWS —
    // if the fixture ever grows minPos past the swept grid, widen
    // tMax rather than persisting an off-table choice
    require(t <= tMax,
      s"chosen threshold $t exceeds the swept grid (tMax=$tMax)")
    (q, t)
  }
}
