package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.expressions.LongDot

/** Greedy k-center (farthest-point) diversity selection (SURVEY §2.11
  * extension) — the coreset/exemplar-selection primitive beside the
  * engine's similarity-DEDUP family: SemDeDup (q97) asks "which
  * near-duplicates may I drop?"; this asks "which k exemplars COVER
  * the corpus most evenly?" — the shape behind diverse few-shot
  * pools, eval-set seeding, and cluster-initialization that a random
  * sample gets wrong on long-tailed corpora. Gonzalez's greedy
  * farthest-point sweep is a 2-approximation of the optimal k-center
  * radius — the strongest guarantee any polynomial method offers.
  *
  * Exact integer geometry on the [[Similarity.prepare]] quantized
  * vectors (d² = qn − 2·⟨c,qv⟩ + cn in int64, the [[KMeans]] algebra),
  * so every argmax is deterministic under the (distance, −id) struct
  * order and any engine replays the identical selection.
  *
  * Scale shape: the base is pinned once and NEVER shuffled or
  * self-joined — each of the k rounds is one scan-local running-min
  * update against the newest center (shipped as a plan literal, the
  * q97 stored-cell discipline) plus ONE max(struct) partial-agg —
  * so total cost is k linear scans with one codegen'd [[LongDot]]
  * dot each, not k·n distance recomputations against the whole
  * selected set, and certainly not n². Selected state is k rows on
  * the driver — metadata, like a range partitioner's boundaries.
  */
object KCenter {

  /** Greedy selection of `k` centers over `prepared` (must carry
    * `idCol`, `qv`, `qn` — see [[Similarity.prepare]]). Returns up to
    * k+1 rows (sel_round, vec_id, d2): round 0 is the max-norm seed
    * (ties → min id), round r picks the point farthest (squared L2)
    * from the selected set, and the FINAL row is the coverage
    * reporter — the next would-be pick, whose d2 IS the 2-approximate
    * coverage radius of the selected centers. Normally that is row
    * sel_round = k (k centers selected); if the farthest remaining
    * distance hits 0 earlier — fewer distinct points than k — the
    * sweep STOPS at that round (selecting on would only re-pick
    * already-chosen centers), so the zero-distance row is the
    * reporter (radius 0, and its vec_id may repeat an earlier
    * center's — it reports, it does not select). Input must be
    * non-empty.
    */
  def select(prepared: DataFrame, idCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val spark = prepared.sparkSession
    val (vecs, vecsRdd) = Snap.pin(prepared
      .select(col(idCol).cast("long").as("__id"), col("qv"), col("qn")))
    // Seed: max squared norm, min id on ties. qv rides the struct so
    // one job returns both the winner and its coordinates; (qn, −id)
    // is already a total order, so qv never drives the comparison.
    val s0Row = vecs
      .agg(max(struct(col("qn").as("d"), (-col("__id")).as("ni"),
        col("qv").as("v"))).as("m"))
      .head()
    require(!s0Row.isNullAt(0),
      "KCenter.select: input has no rows — nothing to select from")
    val s0 = s0Row.getStruct(0)
    var centerQv: Seq[Long] = s0.getSeq[Long](2)
    val picks = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)](
      (0L, -s0.getLong(1), 0L))
    var cur = vecs.withColumn("dmin", lit(Long.MaxValue))
    var pinnedRdd: org.apache.spark.rdd.RDD[Row] = vecsRdd
    var r = 1
    var covered = false
    while (r <= k && !covered) {
      val cn = centerQv.map(x => x * x).sum
      val (next, nextRdd) = Snap.pin(cur
        .withColumn("dmin",
          least(col("dmin"),
            col("qn") - lit(2L) * LongDot.dot(typedLit(centerQv), col("qv"))
              + lit(cn))))
      // the argmax job below materializes `next`'s checkpoint; only
      // then is the superseded round's handle released
      val m = next
        .agg(max(struct(col("dmin").as("d"), (-col("__id")).as("ni"),
          col("qv").as("v"))).as("m"))
        .head().getStruct(0)
      Snap.release(pinnedRdd)
      pinnedRdd = nextRdd
      cur = next
      picks += ((r.toLong, -m.getLong(1), m.getLong(0)))
      centerQv = m.getSeq[Long](2)
      covered = m.getLong(0) == 0L
      r += 1
    }
    Snap.release(pinnedRdd)
    fromPicks(spark, picks.toSeq)
  }

  private def fromPicks(spark: SparkSession,
      picks: Seq[(Long, Long, Long)]): DataFrame = {
    val schema = StructType(Seq(
      StructField("sel_round", LongType, nullable = false),
      StructField("vec_id", LongType, nullable = false),
      StructField("d2", LongType, nullable = false)))
    val rows = picks.map(p => Row(p._1, p._2, p._3))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
  }
}
