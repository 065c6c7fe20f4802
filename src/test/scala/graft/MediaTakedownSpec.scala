package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Audio
import graft.streaming.{AudioDedupGate, Staging, VersionedStore}

/** Media takedown screens (q315/q316): the ≤ 4 compliance gate is the
  * guaranteed pigeonhole bound (a band-lucky 5–8-bit pair that the
  * dedup ≤ 8 gate admits must NOT block), restart-resume on the
  * takedown blocklist, and the end-to-end verdicts at sf0.001.
  */
class MediaTakedownSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def recording(seed: Long, n: Int, step: Int): Array[Byte] =
    Audio.encodeWavSamples(Array.tabulate(n / step)(k =>
      Audio.modulatedSample(seed, (step * k).toLong, n.toLong)),
      16000 / step)

  test("compliance gate is <= 4, not the band-lucky dedup 8") {
    import spark.implicits._
    val n = 2400
    val wav = recording(10L, n, 1)
    val fp = Audio.envelopeHash(1L, wav)
    // two synthetic takedown fingerprints: 6 flips inside ONE band
    // (band-lucky: 4 intact bands -> candidate at hamming 6) and 4
    // flips (inside the guaranteed bound)
    val index = AudioDedupGate.buildIndex(Seq(
        (100L, fp ^ 0x3FL), (200L, fp ^ 0xFL))
      .toDF("hist_id", "fp")).localCheckpoint()
    val batch = Seq((1L, wav)).toDF("doc_id", "payload")
    val dedup = AudioDedupGate.batchMatches(spark, batch, index)
      .collect().map(_.getLong(1)).toSet
    assert(dedup === Set(100L, 200L),
      "the dedup gate admits the band-lucky 6-bit pair")
    val takedown = AudioDedupGate
      .batchMatches(spark, batch, index, maxHamming = 4)
      .collect().map(_.getLong(1)).toSet
    assert(takedown === Set(200L),
      "the compliance gate must not depend on band luck")
  }

  test("takedown restart: committed blocks keep, post-restart " +
      "arrivals still probe the same blocklist") {
    import spark.implicits._
    val root = new java.io.File(Scratch.register(
      Files.createTempDirectory("graft_takedown_spec").toString))
    val src = new java.io.File(root, "src"); src.mkdirs()
    val state = s"${root.getAbsolutePath}/state"
    val ck = s"${root.getAbsolutePath}/ck"
    val n = 2400
    val index = AudioDedupGate.buildIndex(Seq(
        (9L, Audio.envelopeHash(9L, recording(18L, n, 1))))
      .toDF("hist_id", "fp")).localCheckpoint()
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
        AudioDedupGate.runInto(spark, media, index, state, ck,
          maxHamming = 4)
      }
    def blocked(): Set[(Long, Long)] =
      VersionedStore.readAllBelow(spark, s"$state/matches",
          Long.MaxValue)
        .map(_.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
        .getOrElse(Set.empty)
    writeRows("f1.parquet", Seq(
        (1L, recording(18L, n, 2)), (2L, recording(777L, n, 1)))
      .toDF("doc_id", "payload"))
    runOnce()
    assert(blocked() === Set((1L, 9L)))
    writeRows("f2.parquet",
      Seq((3L, recording(18L, n, 1))).toDF("doc_id", "payload"))
    runOnce()
    assert(blocked() === Set((1L, 9L), (3L, 9L)))
  }

  test("end-to-end verdicts at sf0.001: exactly the protected " +
      "groups' renditions block, on both axes") {
    val audio = SparkEntry.queries("q315_audio_takedown")(
      spark, "/root/testdata/sf0.001").collect()
    assert(audio.nonEmpty)
    assert(audio.forall { r =>
      r.getLong(0) / 3 == r.getLong(1) && r.getLong(1) % 9 == 0 &&
        r.getLong(2) <= 1L
    }, "audio: every block is the arrival's own protected group")
    val video = SparkEntry.queries("q316_video_takedown")(
      spark, "/root/testdata/sf0.001").collect()
    assert(video.nonEmpty)
    assert(video.forall { r =>
      r.getLong(0) / 3 == r.getLong(1) && r.getLong(1) % 9 == 0 &&
        r.getLong(2) >= 2L
    }, "video: every block is the arrival's own protected group")
    // every protected group's rendition blocks, none is missed
    val expected = (0 until 500).count(id => (id / 3) % 9 == 0)
    assert(audio.length === expected)
    assert(video.length === expected)
  }
}
