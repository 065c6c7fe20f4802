package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Multimodal
import graft.streaming.{MediaScreen, Staging, VersionedStore}

/** The streaming media gate (q267's machinery): a restarted run must
  * not re-screen committed batches, the blocklist must keep blocking
  * after the stop, and — the property that distinguishes this gate
  * from a byte-level one — a blocklisted image RE-ENCODED through a
  * different codec (JPEG of the same raster) must still be blocked,
  * because fingerprints are computed on decoded pixels.
  */
class MediaScreenSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def writeMedia(dir: java.io.File, name: String,
      rows: Seq[(Long, Array[Byte])]): Unit = {
    import spark.implicits._
    val tmp = s"${dir.getAbsolutePath}/__stage_$name"
    rows.toDF("doc_id", "payload").coalesce(1).write.parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Files.move(part.toPath, new java.io.File(dir, name).toPath)
  }

  private def rates(root: String): Map[Long, (Long, Long)] =
    VersionedStore.readAllBelow(spark, s"$root/rates", Long.MaxValue)
      .map(_.collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap)
      .getOrElse(Map.empty)

  test("restart resumes; a JPEG re-encode of blocklisted media is " +
      "still blocked (raster-side fingerprints)") {
    import spark.implicits._
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    val root = new java.io.File(Scratch.register(
      Files.createTempDirectory("graft_media_spec").toString))
    val src = new java.io.File(root, "src"); src.mkdirs()
    val state = s"${root.getAbsolutePath}/state"
    val ck = s"${root.getAbsolutePath}/ck"

    // blocklist: doc 7's raster, fingerprinted from its PNG form
    val blockedMedia = Seq(
      Multimodal.MediaRecord(7L, Multimodal.encodeGradientPng(7L, 24, 24),
        "png")).toDS()
    val blockedFps = Multimodal.blockHash(Multimodal.toRaster(blockedMedia))
      .toDF().select(org.apache.spark.sql.functions.col("fp"))
      .localCheckpoint()

    def runOnce(): Unit = Staging.withStreamShufflePartitions(spark, "4") {
      val media = spark.readStream
        .schema("doc_id BIGINT, payload BINARY")
        .option("maxFilesPerTrigger", "1")
        .parquet(src.getAbsolutePath)
      MediaScreen.runInto(spark, media, blockedFps, state, ck)
    }

    // batch 0: the blocklisted image arrives as a PNG + one clean image
    writeMedia(src, "f1.parquet", Seq(
      1L -> Multimodal.encodeGradientPng(7L, 24, 24),
      2L -> Multimodal.encodeGradientPng(100L, 16, 16)))
    runOnce()
    assert(rates(state) === Map(0L -> ((2L, 1L))))

    // restart: the SAME blocklisted raster arrives RE-ENCODED as JPEG
    // (container bytes share nothing with the blocklist's PNG) — the
    // decoded-pixel fingerprint must still match; committed batches
    // must not re-screen
    writeMedia(src, "f2.parquet", Seq(
      3L -> Multimodal.encodeJpeg(7L, 24, 24),
      4L -> Multimodal.encodeGradientPng(200L, 16, 16)))
    runOnce()
    assert(rates(state) ===
      Map(0L -> ((2L, 1L)), 1L -> ((2L, 1L))),
      "the JPEG re-encode of blocklisted media must be blocked")
  }
}
