package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.Audio
import graft.streaming.{AudioDedupGate, LandmarkTakedownGate,
  Staging, VersionedStore}

/** Incremental audio index maintenance (q323 envelope bands, q324
  * landmark blocklist): the bucketed-probe scale claim (no Exchange
  * above the index scan, broadcast planner disabled), the stop-key
  * suppression on a grown index, and restart-resume through the
  * streaming gate with the refreshed stop artifact — the
  * `VideoIndexSpec` discipline on both audio axes.
  */
class AudioIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
  import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
  import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
  import org.apache.spark.sql.execution.joins.SortMergeJoinExec

  private def flatten(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
    case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
    case q: QueryStageExec => flatten(q.plan)
    case r: ReusedExchangeExec => flatten(r.child)
    case _ => p.children.flatMap(flatten)
  })

  private def wav(seed: Long, n: Int): Array[Byte] =
    Audio.encodeWavSamples(Audio.clickTrain(seed, n), 16000)

  private def assertBucketedProbe(df: org.apache.spark.sql.DataFrame,
      bucketCol: String): Unit = {
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
            b.bucketColumnNames == Seq(bucketCol))),
      s"index side must read the $bucketCol-bucketed layout in place")
    assert(flatten(joins.head.left).collect {
        case e: ShuffleExchangeLike => e }.nonEmpty,
      "the arrivals are the side that shuffles into the bucketing")
  }

  test("envelope band probe reads the bk-bucketed index " +
      "exchange-free with the broadcast planner disabled") {
    import spark.implicits._
    val tbl = "graft_bandidx_spec"
    AudioDedupGate.buildIndex(
        (0L until 40L).map(g => (g, Audio.envelopeHash(g,
          wav(2 * g, 4000)))).toDF("hist_id", "fp"))
      .write.mode("overwrite").format("parquet")
      .bucketBy(8, "bk").sortBy("bk").saveAsTable(tbl)
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val batch = (0L until 5L).map(g =>
        (1000L + g, wav(2 * g, 4000))).toDF("doc_id", "payload")
      val df = AudioDedupGate.batchMatches(spark, batch,
        spark.table(tbl), maxHamming = 4)
      assert(df.count() === 5L) // every re-upload matches its master
      assertBucketedProbe(df, "bk")
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
  }

  test("landmark blocklist probe reads the h-bucketed index " +
      "exchange-free with the broadcast planner disabled") {
    import spark.implicits._
    val tbl = "graft_lmidx_spec"
    LandmarkTakedownGate.buildIndex(
        (0L until 40L).flatMap(g =>
          Audio.landmarkHashes(g, wav(2 * g, 4000), 256, 0)
            .distinct.map(h => (g, h)))
          .toDF("takedown_id", "h"))
      .write.mode("overwrite").format("parquet")
      .bucketBy(8, "h").sortBy("h").saveAsTable(tbl)
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val batch = (0L until 5L).map(g =>
        (1000L + g, wav(2 * g, 4000))).toDF("doc_id", "payload")
      val df = LandmarkTakedownGate.batchMatches(spark, batch,
        spark.table(tbl), voteT = 6L, deltaQ = 0)
      assert(df.count() === 5L)
      assertBucketedProbe(df, "h")
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
  }

  test("a degenerate band value is excluded from the envelope index " +
      "at BUILD time; each reference keeps its distinctive bands") {
    import spark.implicits._
    // 300 references share the same value in four of five bands
    // (zeros — the silent-stretch degenerate) and differ only in
    // band 1: the four hot band keys (df 300 each) never enter the
    // index, the distinctive band does. 70 further references are
    // FULLY silent (fp = 0): their fifth band is the shared zero
    // value too (df 70 > cap), so they lose every entry — the
    // unfindable-reference count q323 surfaces as `unindexed_refs`.
    val fps = ((0L until 300L).map(g => (g, (g + 1) << 12)) ++
      (1000L until 1070L).map(g => (g, 0L)))
      .toDF("hist_id", "fp")
    val idx = AudioDedupGate.buildIndex(fps, 64)
    assert(idx.count() === 300L,
      "only the distinctive band per reference may enter")
    assert(idx.filter(col("bk") % 5 =!= 1).count() === 0L,
      "every surviving entry is a band-1 key")
    assert(idx.select("bk").distinct().count() === 300L)
    assert(fps.count() - idx.select("hist_id").distinct().count()
      === 70L, "exactly the fully-degenerate references are unindexed")
  }

  test("a hash pushed past the cap by APPENDS is refreshed into the " +
      "stop artifact and suppressed; genuine votes still block; " +
      "restart-resume holds with the stop threaded") {
    import spark.implicits._
    // every reference carries its OWN recording's hashes plus the
    // hashes of one shared metronome recording — a real audio beat an
    // arrival can also emit. Within each 3-reference wave the beat df
    // is 3 <= cap 4 (survives the build cap); the APPEND pushes the
    // combined df to 6 > 4, exactly the hole the refreshed stop
    // artifact closes.
    val metro = Audio.landmarkHashes(0L, wav(7777L, 4800), 256, 0)
      .distinct
    def refWave(ids: Range) = ids.map(_.toLong)
      .flatMap(g =>
        (Audio.landmarkHashes(g, wav(100 + g, 4800), 256, 0)
          .distinct.take(8) ++ metro).map(h => (g, h)))
      .toDF("takedown_id", "h")
    val w0 = LandmarkTakedownGate.buildIndex(refWave(0 until 3), 4)
    val w1 = LandmarkTakedownGate.buildIndex(refWave(3 until 6), 4)
    assert(w0.filter(col("h").isin(metro: _*)).count()
      === 3L * metro.length,
      "within-wave beat df 3 must survive the build cap 4")
    val grown = w0.unionAll(w1).localCheckpoint()
    val stop = LandmarkTakedownGate.stopHashes(grown, 4)
      .localCheckpoint()
    assert(stop.collect().map(_.getLong(0)).toSet === metro.toSet,
      "exactly the appended-past-cap beat hashes are stop hashes")
    // restart-resume through the gate WITH the stop artifact
    val root = new java.io.File(Scratch.register(
      Files.createTempDirectory("graft_aidx_spec").toString))
    val src = new java.io.File(root, "src"); src.mkdirs()
    val state = s"${root.getAbsolutePath}/state"
    val ck = s"${root.getAbsolutePath}/ck"
    def writeRows(name: String,
        df: org.apache.spark.sql.DataFrame): Unit = {
      val tmp = new java.io.File(root, s"__stage_$name")
      df.coalesce(1).write.mode("overwrite")
        .parquet(tmp.getAbsolutePath)
      val part = tmp.listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.copy(part.toPath, new java.io.File(src, name).toPath)
    }
    def runOnce(): Unit =
      Staging.withStreamShufflePartitions(spark, "4") {
        val media = spark.readStream
          .schema("doc_id BIGINT, payload BINARY")
          .option("maxFilesPerTrigger", "1")
          .parquet(src.getAbsolutePath)
        LandmarkTakedownGate.runInto(spark, media, grown, state, ck,
          voteT = 6L, deltaQ = 0, stop = Some(stop))
      }
    def blocked(): Set[(Long, Long)] =
      VersionedStore.readAllBelow(spark, s"$state/matches",
          Long.MaxValue)
        .map(_.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
        .getOrElse(Set.empty)
    // arrival 11 = wave-1 ref 4's recording (genuine >= 6 votes);
    // arrival 12 IS the metronome recording — it shares every beat
    // hash with every reference (>= voteT without the stop, a false
    // block against all six), but the stop suppresses them all and
    // 12 passes
    writeRows("f1.parquet",
      Seq((11L, wav(104L, 4800)), (12L, wav(7777L, 4800)))
        .toDF("doc_id", "payload"))
    runOnce()
    assert(LandmarkTakedownGate.batchMatches(spark,
        Seq((12L, wav(7777L, 4800))).toDF("doc_id", "payload"),
        grown, voteT = 6L, deltaQ = 0, stop = None)
      .count() === 6L,
      "without the stop the metronome false-blocks against all six")
    assert(blocked() === Set((11L, 4L)))
    // post-restart arrivals probe the same grown index + stop
    writeRows("f2.parquet",
      Seq((13L, wav(101L, 4800))).toDF("doc_id", "payload"))
    runOnce()
    assert(blocked() === Set((11L, 4L), (13L, 1L)))
  }

  test("end-to-end q323/q324 at sf0.001: append preserves counts, " +
      "every protected arrival blocks through the grown index, the " +
      "in-data stop lists are empty") {
    for (q <- Seq("q323_incr_band_index", "q324_incr_landmark_index")) {
      val rows = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(rows("recheck_unmatched") === 0L, q)
      assert(rows("after_entries") ===
        rows("before_entries") + rows("added_entries"), q)
      assert(rows(if (q.contains("band")) "stop_bands"
        else "stop_hashes") === 0L, q)
      assert(rows("added_entries") > 0L, q)
      assert(rows("blocked_arrivals") > 0L, q)
      if (q.contains("band"))
        assert(rows("unindexed_refs") === 0L, q)
    }
  }
}
