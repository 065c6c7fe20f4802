package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.{Video, VideoNearDup}
import graft.streaming.VideoDedupGate

/** The video dedup chain's scale discipline ([[VideoNearDup]], q300 +
  * the q307/q311 gate probes): exact-before-near collapse keeps the
  * candidate volume GROUP-LINEAR under a giant duplicate group, the
  * df cap disarms a degenerate (black-frame-style) keyframe hash, and
  * both are semantics-preserving — including the subtle
  * multiplicity-vs-singleton vote case.
  */
class VideoScaleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("giant dup group: candidate volume is group-linear, " +
      "clusters unchanged") {
    // 300 re-uploads with the identical 3-keyframe multiset, one
    // trimmed copy sharing 2 of them, two unrelated controls
    val kfs = ((0L until 300L).flatMap(d =>
        Seq((d, 101L), (d, 102L), (d, 103L))) ++
      Seq((300L, 102L), (300L, 103L)) ++
      Seq((400L, 900L), (400L, 901L), (401L, 910L), (401L, 911L)))
      .toDF("doc_id", "kf_hash")
    val (repKfs, docRep) = VideoNearDup.collapse(kfs)
    // 300 identical multisets -> ONE representative
    assert(repKfs.select("rep").distinct().count() === 4L)
    val pairs = VideoNearDup.pairVotes(repKfs, maxDf = 64).collect()
    // the whole 301-doc dup group costs ONE candidate pair (the
    // uncollapsed join would cost 300*299/2 + 300*2 row pairs)
    assert(pairs.length === 1)
    assert(pairs.head.getAs[Long]("votes") === 2L)
    val lab = VideoNearDup.clusterLabels(kfs, maxDf = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L to 300L).forall(lab(_) == 0L), "all 301 in one cluster")
    assert(lab(400L) === 400L && lab(401L) === 401L)
  }

  test("degenerate shared keyframe: the df cap bounds the join that " +
      "would otherwise be quadratic in df") {
    // 500 unrelated docs that all share one black-frame hash
    val kfs = (0L until 500L).flatMap(d =>
        Seq((d, 7L), (d, 1000L + d)))
      .toDF("doc_id", "kf_hash")
    val (repKfs, _) = VideoNearDup.collapse(kfs)
    assert(VideoNearDup.hotHashes(repKfs, 64).as[Long].collect()
      .toSeq === Seq(7L))
    assert(VideoNearDup.pairVotes(repKfs, maxDf = 64).count() === 0L)
    // without the cap the SAME data costs C(500,2) candidate rows
    assert(VideoNearDup.pairVotes(repKfs, maxDf = 1000000).count()
      === 500L * 499L / 2L)
    val lab = VideoNearDup.clusterLabels(kfs, maxDf = 64)
    assert(lab.filter(col("doc_id") =!= col("cluster_rep")).count()
      === 0L, "one shared boilerplate hash is never a dup")
  }

  test("multiplicity vote equivalence: a single-keyframe doc still " +
      "out-votes a doc carrying its hash twice") {
    // doc 0 = [h, h] (two scenes, same hash), doc 1 = [h]: the
    // uncollapsed rule counts 2 row pairs -> an edge; the collapse
    // must preserve it (singletons stay in the pairing)
    val kfs = Seq((0L, 5L), (0L, 5L), (1L, 5L), (2L, 6L))
      .toDF("doc_id", "kf_hash")
    val lab = VideoNearDup.clusterLabels(kfs, maxDf = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lab(0L) === 0L && lab(1L) === 0L,
      "multiplicity-2 vs singleton is vote 2 = an edge")
    assert(lab(2L) === 2L)
  }

  test("gate: build-time df cap drops the degenerate hash from the " +
      "index; true matches survive on their remaining scenes") {
    // history: one 5-scene master; arrival: its first-scene trim
    // (shares scenes 1-4). Pollute ONE shared hash with 200 fake
    // history carriers -> buildIndex must drop that hash entirely,
    // and the trim still matches the master on the other 3 shared.
    val master = Video.sceneKeyframeHashes(9L,
      Video.encodeY4mBlockScenes(18L, 16, 8, 5, 4, 0L), 48)
    val shared = master.map(_.kf_hash)
    val hist = master.map(k => (9L, k.kf_hash)) ++
      (0L until 200L).map(j => (10000L + j, shared(1)))
    val index = VideoDedupGate.buildIndex(
      hist.toDF("hist_id", "kf_hash"), maxDf = 64)
    assert(index.filter(col("kf_hash") === shared(1)).count() === 0L,
      "hot hash never enters the index")
    val batch = Seq((77L,
      Video.encodeY4mBlockScenes(18L, 16, 8, 4, 4, 1L)))
      .toDF("doc_id", "payload")
    val m = VideoDedupGate.batchMatches(spark, batch, index).collect()
    assert(m.length === 1 && m.head.getLong(1) === 9L &&
      m.head.getLong(2) === 3L,
      s"trim must still match on its 3 unpolluted scenes: " +
        m.mkString(","))
    // the maintenance-time stop artifact finds a hash that went hot
    // through appends, and the probe excludes it BEFORE the join —
    // the true match survives on the remaining scenes
    val appended = index.unionAll(
      (0L until 200L).map(j => (20000L + j, shared(2)))
        .toDF("hist_id", "kf_hash"))
    val stop = VideoDedupGate.stopHashes(appended, maxDf = 64)
    assert(stop.as[Long].collect().toSeq === Seq(shared(2)))
    val m2 = VideoDedupGate.batchMatches(spark, batch, appended,
      stop = Some(stop)).collect()
    assert(m2.length === 1 && m2.head.getLong(1) === 9L &&
      m2.head.getLong(2) === 2L,
      "stopped hash is excluded from the probe before the join")
  }
}
