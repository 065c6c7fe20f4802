package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Audio
import graft.streaming.{AudioDedupGate, Staging, VersionedStore}

/** Streaming audio-dedup gate (q304): restart semantics (committed
  * batches never re-probe, post-restart arrivals still probe the same
  * stored index, idle restarts append nothing), streamed ≡ batch
  * probing, and the novel-arrival miss.
  */
class AudioDedupGateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def writeRows(dir: java.io.File, name: String,
      df: org.apache.spark.sql.DataFrame): Unit = {
    val tmp = new java.io.File(dir.getParentFile, s"__stage_$name")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.getAbsolutePath)
    val part = tmp.listFiles().filter(_.getName.endsWith(".parquet")).head
    Files.copy(part.toPath, new java.io.File(dir, name).toPath)
  }

  private def versionDirs(dir: String): Seq[String] = {
    val f = new java.io.File(dir)
    if (!f.exists()) Seq.empty
    else f.listFiles().filter(_.isDirectory).map(_.getName).sorted.toSeq
  }

  private def recording(seed: Long, n: Int, step: Int): Array[Byte] =
    Audio.encodeWavSamples(Array.tabulate(n / step)(k =>
      Audio.modulatedSample(seed, (step * k).toLong, n.toLong)),
      16000 / step)

  test("audio gate restart: committed matches keep, new arrivals probe " +
      "the same stored index, idle restarts add nothing") {
    import spark.implicits._
    val root = new java.io.File(Scratch.register(
      Files.createTempDirectory("graft_audiogate_spec").toString))
    val src = new java.io.File(root, "src"); src.mkdirs()
    val state = s"${root.getAbsolutePath}/state"
    val ck = s"${root.getAbsolutePath}/ck"
    val n = 2400
    // stored index: two history recordings (seeds 10, 20), full rate
    val index = AudioDedupGate.buildIndex(Seq(
        (100L, Audio.envelopeHash(100L, recording(10L, n, 1))),
        (200L, Audio.envelopeHash(200L, recording(20L, n, 1))))
      .toDF("hist_id", "fp")).localCheckpoint()

    def runOnce(): Unit = Staging.withStreamShufflePartitions(spark, "4") {
      val media = spark.readStream
        .schema("doc_id BIGINT, payload BINARY")
        .option("maxFilesPerTrigger", "1")
        .parquet(src.getAbsolutePath)
      AudioDedupGate.runInto(spark, media, index, state, ck)
    }

    def matches(): Set[(Long, Long, Long)] =
      VersionedStore.readAllBelow(spark, s"$state/matches", Long.MaxValue)
        .map(_.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet)
        .getOrElse(Set.empty)

    // batch 1: a 2x resample of seed 10 (hits hist 100 at hamming 0)
    // and a novel seed (no hit)
    writeRows(src, "f1.parquet", Seq(
        (1L, recording(10L, n, 2)), (2L, recording(999L, n, 1)))
      .toDF("doc_id", "payload"))
    runOnce()
    assert(matches() === Set((1L, 100L, 0L)))

    // restart with a new arrival: a re-fetch of seed 20
    writeRows(src, "f2.parquet",
      Seq((3L, recording(20L, n, 2))).toDF("doc_id", "payload"))
    runOnce()
    assert(matches() === Set((1L, 100L, 0L), (3L, 200L, 0L)))

    // idle restart: no new files -> no new versions
    val before = versionDirs(s"$state/matches")
    runOnce()
    assert(versionDirs(s"$state/matches") === before)

    // streamed == batch probing over the same arrivals
    val batchAll = AudioDedupGate.batchMatches(spark, Seq(
        (1L, recording(10L, n, 2)), (2L, recording(999L, n, 1)),
        (3L, recording(20L, n, 2))).toDF("doc_id", "payload"), index)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(batchAll === matches())
  }
}
