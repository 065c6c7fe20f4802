package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Audio
import graft.streaming.{AudioDedupGate, LandmarkTakedownGate, Staging,
  VersionedStore}

/** Landmark takedown screen (q319): the trimmed re-upload blocks here
  * and provably does NOT block through the envelope screen (the
  * cross-family blindness as a measured assertion), restart-resume,
  * and end-to-end coverage at sf0.001.
  */
class LandmarkTakedownSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def trimmed(seed: Long, n: Int): Array[Int] = {
    val master = Audio.clickTrain(seed, n)
    val mw = Audio.encodeWavSamples(master, 16000)
    master.drop(Audio.onsets(0L, mw, 256).head.pos.toInt + 5)
  }

  test("the trimmed re-upload blocks at the landmark gate and is " +
      "invisible to the envelope gate") {
    import spark.implicits._
    val n = 5200
    val master = Audio.clickTrain(30L, n)
    val mw = Audio.encodeWavSamples(master, 16000)
    val tw = Audio.encodeWavSamples(trimmed(30L, n), 16000)
    // the envelope screen's own verdict on the trim: miss (> 8 bits,
    // past even the dedup gate, let alone the <= 4 compliance bound)
    val envIdx = AudioDedupGate.buildIndex(Seq(
        (9L, Audio.envelopeHash(9L, mw))).toDF("hist_id", "fp"))
      .localCheckpoint()
    val envBlocked = AudioDedupGate.batchMatches(spark,
      Seq((1L, tw)).toDF("doc_id", "payload"), envIdx, maxHamming = 4)
    assert(envBlocked.isEmpty,
      "the envelope screen must miss the content trim")
    assert(java.lang.Long.bitCount(Audio.envelopeHash(0L, mw)
      ^ Audio.envelopeHash(0L, tw)) > 8)
    // the landmark screen at the stored-point defaults catches it
    val refs = LandmarkTakedownGate.buildIndex(
      Audio.landmarkHashes(9L, mw, 256, 0).distinct
        .map(h => (9L, h)).toDF("takedown_id", "h")).localCheckpoint()
    val blocked = LandmarkTakedownGate.batchMatches(spark,
        Seq((1L, tw)).toDF("doc_id", "payload"), refs,
        voteT = 6L, deltaQ = 0)
      .collect()
    assert(blocked.length === 1 && blocked.head.getLong(1) === 9L &&
      blocked.head.getLong(2) >= 6L)
  }

  test("build-time df cap: a beat-pattern hash shared by 200 " +
      "references never enters the blocklist; discriminative hashes " +
      "still block") {
    import spark.implicits._
    val n = 5200
    val mw = Audio.encodeWavSamples(Audio.clickTrain(30L, n), 16000)
    val real = Audio.landmarkHashes(9L, mw, 256, 0).distinct
    // 200 unrelated takedown requests all carrying one shared
    // metronome hash, plus the genuine reference
    val beat = 42L
    val refs = real.map(h => (9L, h)) ++
      (0L until 200L).map(j => (1000L + j, beat))
    val index = LandmarkTakedownGate.buildIndex(
      refs.toDF("takedown_id", "h"), maxDf = 64).localCheckpoint()
    assert(index.filter(org.apache.spark.sql.functions
      .col("h") === beat).count() === 0L,
      "the non-discriminative hash never enters the index")
    val blocked = LandmarkTakedownGate.batchMatches(spark,
        Seq((1L, mw)).toDF("doc_id", "payload"), index,
        voteT = 6L, deltaQ = 0)
      .collect()
    assert(blocked.length === 1 && blocked.head.getLong(1) === 9L)
  }

  test("restart: committed blocks keep, post-restart arrivals still " +
      "probe the same blocklist") {
    import spark.implicits._
    val root = new java.io.File(Scratch.register(
      Files.createTempDirectory("graft_lmtd_spec").toString))
    val src = new java.io.File(root, "src"); src.mkdirs()
    val state = s"${root.getAbsolutePath}/state"
    val ck = s"${root.getAbsolutePath}/ck"
    val n = 5200
    val mw = Audio.encodeWavSamples(Audio.clickTrain(30L, n), 16000)
    val refs = LandmarkTakedownGate.buildIndex(
      Audio.landmarkHashes(9L, mw, 256, 0).distinct
        .map(h => (9L, h)).toDF("takedown_id", "h")).localCheckpoint()
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
        LandmarkTakedownGate.runInto(spark, media, refs, state, ck,
          voteT = 6L, deltaQ = 0)
      }
    def blocked(): Set[(Long, Long)] =
      VersionedStore.readAllBelow(spark, s"$state/matches",
          Long.MaxValue)
        .map(_.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
        .getOrElse(Set.empty)
    writeRows("f1.parquet", Seq(
        (1L, Audio.encodeWavSamples(trimmed(30L, n), 16000)),
        (2L, Audio.encodeWavSamples(Audio.clickTrain(777L, n), 16000)))
      .toDF("doc_id", "payload"))
    runOnce()
    assert(blocked() === Set((1L, 9L)))
    writeRows("f2.parquet", Seq((3L, Audio.encodeWavSamples(
        Array.fill(1000)(0) ++ Audio.clickTrain(30L, n), 16000)))
      .toDF("doc_id", "payload"))
    runOnce()
    assert(blocked() === Set((1L, 9L), (3L, 9L)))
  }

  test("end-to-end at sf0.001: master, pad AND trim renditions of " +
      "every protected group block; nothing else does") {
    val rows = SparkEntry.queries("q319_landmark_takedown")(
      spark, "/root/testdata/sf0.001").collect()
    val expected = (0 until 500).count(id => (id / 3) % 9 == 0)
    assert(rows.length === expected)
    assert(rows.forall { r =>
      r.getLong(0) / 3 == r.getLong(1) && r.getLong(1) % 9 == 0 &&
        r.getLong(2) >= 6L
    })
  }
}
