package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Video
import graft.streaming.{Staging, VersionedStore, VideoDedupGate}

/** Streaming video-dedup gate (q307): restart semantics, streamed ≡
  * batch probing, and the novel-arrival miss.
  */
class VideoDedupGateSpec extends AnyFunSuite {
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

  private def kfsOf(id: Long, clip: Array[Byte]) =
    Video.sceneKeyframeHashes(id, clip, 48).map(_.kf_hash)

  test("video gate restart: committed matches keep, new arrivals probe " +
      "the same stored index, idle restarts add nothing") {
    import spark.implicits._
    val root = new java.io.File(Scratch.register(
      Files.createTempDirectory("graft_videogate_spec").toString))
    val src = new java.io.File(root, "src"); src.mkdirs()
    val state = s"${root.getAbsolutePath}/state"
    val ck = s"${root.getAbsolutePath}/ck"
    // history: clip A (seedKey 10, 4 scenes) and its 2x upscale
    val histA = Video.encodeY4mBlockScenes(10L, 16, 8, 4, 4, 0L)
    val histA2 = Video.encodeY4mBlockScenes(10L, 32, 16, 4, 4, 0L)
    val index = VideoDedupGate.buildIndex(
      (kfsOf(100L, histA).map((100L, _)) ++
        kfsOf(200L, histA2).map((200L, _)))
        .toDF("hist_id", "kf_hash")).localCheckpoint()

    def runOnce(): Unit = Staging.withStreamShufflePartitions(spark, "4") {
      val media = spark.readStream
        .schema("doc_id BIGINT, payload BINARY")
        .option("maxFilesPerTrigger", "1")
        .parquet(src.getAbsolutePath)
      VideoDedupGate.runInto(spark, media, index, state, ck)
    }

    def matches(): Set[(Long, Long, Long)] =
      VersionedStore.readAllBelow(spark, s"$state/matches", Long.MaxValue)
        .map(_.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet)
        .getOrElse(Set.empty)

    // batch 1: a trimmed copy of A (3 shared scenes) + a novel clip
    writeRows(src, "f1.parquet", Seq(
        (1L, Video.encodeY4mBlockScenes(10L, 16, 8, 3, 4, 1L)),
        (2L, Video.encodeY4mBlockScenes(99L, 16, 8, 4, 4, 0L)))
      .toDF("doc_id", "payload"))
    runOnce()
    assert(matches() === Set((1L, 100L, 3L), (1L, 200L, 3L)))

    // restart with the full re-encode arriving
    writeRows(src, "f2.parquet",
      Seq((3L, Video.encodeY4mBlockScenes(10L, 32, 16, 4, 4, 0L)))
        .toDF("doc_id", "payload"))
    runOnce()
    assert(matches() === Set((1L, 100L, 3L), (1L, 200L, 3L),
      (3L, 100L, 4L), (3L, 200L, 4L)))

    val before = versionDirs(s"$state/matches")
    runOnce()
    assert(versionDirs(s"$state/matches") === before)

    val batchAll = VideoDedupGate.batchMatches(spark, Seq(
        (1L, Video.encodeY4mBlockScenes(10L, 16, 8, 3, 4, 1L)),
        (2L, Video.encodeY4mBlockScenes(99L, 16, 8, 4, 4, 0L)),
        (3L, Video.encodeY4mBlockScenes(10L, 32, 16, 4, 4, 0L)))
      .toDF("doc_id", "payload"), index)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(batchAll === matches())
  }
}
