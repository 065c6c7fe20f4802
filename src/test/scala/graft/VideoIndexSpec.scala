package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.Video
import graft.streaming.VideoDedupGate

/** Incremental keyframe-index maintenance (q311): the bucketed-probe
  * scale claim (no Exchange above the index scan) and the maintenance
  * guarantees (append preserves layout, re-probe matches everything,
  * only novel clips add hash vocabulary).
  */
class VideoIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("probe joins read the kf_hash-bucketed index exchange-free; " +
      "only the arriving clips shuffle") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    import spark.implicits._
    def flatten(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case q: QueryStageExec => flatten(q.plan)
      case r: ReusedExchangeExec => flatten(r.child)
      case _ => p.children.flatMap(flatten)
    })
    val tbl = "graft_vidx_spec"
    (0L until 40L).flatMap { g =>
      Video.sceneKeyframeHashes(g,
          Video.encodeY4mBlockScenes(2 * g, 16, 8, 4, 4, 0L), 48)
        .map(k => (g, k.kf_hash))
    }.toDF("hist_id", "kf_hash")
      .write.mode("overwrite").format("parquet")
      .bucketBy(8, "kf_hash").sortBy("kf_hash").saveAsTable(tbl)
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // at production scale the index is never broadcastable — force
      // the shuffle-join planner so the bucket layout is what's tested
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val batch = (0L until 5L).map { g =>
        (1000L + g, Video.encodeY4mBlockScenes(2 * g, 16, 8, 3, 4, 1L))
      }.toDF("doc_id", "payload")
      val df = VideoDedupGate.batchMatches(spark, batch,
        spark.table(tbl))
      assert(df.count() === 5L) // every trim matches its master
      val all = flatten(df.queryExecution.executedPlan)
      val joins = all.collect { case j: SortMergeJoinExec => j }
      assert(joins.nonEmpty, "probe must be a sort-merge join here")
      val idxSide = flatten(joins.head.right)
      assert(idxSide.collect { case e: ShuffleExchangeLike => e }.isEmpty,
        s"index side must carry no Exchange:\n" +
          joins.head.right.toString.take(1200))
      assert(idxSide.collect { case f: FileSourceScanExec => f }
          .exists(_.relation.bucketSpec.exists(b =>
            b.numBuckets == 8 &&
              b.bucketColumnNames == Seq("kf_hash"))),
        "index side must read the kf_hash-bucketed layout in place")
      assert(flatten(joins.head.left).collect {
          case e: ShuffleExchangeLike => e }.nonEmpty,
        "the arriving clips are the side that shuffles into the bucketing")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
  }

  test("end-to-end q311 at sf0.001: append preserves counts, only " +
      "novel clips add hash vocabulary, the re-probe matches every " +
      "admitted clip") {
    val rows = SparkEntry.queries("q311_incr_keyframe_index")(
      spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows("recheck_unmatched") === 0L)
    assert(rows("after_entries") ===
      rows("before_entries") + rows("added_entries"))
    // the fixture's iid hashes keep every df at 2-3: the refreshed
    // maintenance stop-list must be empty
    assert(rows("stop_hashes") === 0L)
    // novel vocabulary = exactly the novel clips' scenes (g % 5 == 0)
    val wantNovel = (0 until 167).filter(_ % 5 == 0)
      .map(g => 3 + g % 3).sum.toLong
    assert(rows("novel_hashes") === wantNovel)
  }
}
