package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.ops.{Audio, Classifier, Multimodal}
import graft.streaming.{ClassifierGate, MediaRouterGate, Staging, VersionedStore}

/** Restart semantics for the two continuation gates (the
  * LmScreenSpec/ContaminationScreenSpec discipline): committed batches
  * never re-process, post-restart arrivals are still gated against the
  * same stored artifacts, idle restarts write nothing.
  */
class ClassifierGateSpec extends AnyFunSuite {
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

  test("classifier gate restart: committed verdicts keep, new arrivals " +
      "score against the stored model, idle restarts add nothing") {
    import spark.implicits._
    val root = new java.io.File(Scratch.register(
      Files.createTempDirectory("graft_clfgate_spec").toString))
    val src = new java.io.File(root, "src"); src.mkdirs()
    val state = s"${root.getAbsolutePath}/state"
    val ck = s"${root.getAbsolutePath}/ck"
    val votes = Classifier.trainTokenVotes(Seq(
        (1L, true, Seq("citation", "summary")),
        (2L, true, Seq("citation", "reference")),
        (3L, false, Seq("cheap", "pills")),
        (4L, false, Seq("cheap", "click")))
        .toDF("doc_id", "label_good", "toks"),
      "toks", "label_good").localCheckpoint()

    def runOnce(): Unit = Staging.withStreamShufflePartitions(spark, "4") {
      val docs = spark.readStream
        .schema("doc_id BIGINT, text STRING")
        .option("maxFilesPerTrigger", "1")
        .parquet(src.getAbsolutePath)
      ClassifierGate.runInto(spark, docs, votes, state, ck)
    }

    def verdicts(): Set[(Long, Long, Boolean)] =
      VersionedStore.readAllBelow(spark, s"$state/verdicts", Long.MaxValue)
        .map(_.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet)
        .getOrElse(Set.empty)

    // in this 4-doc corpus only "citation" (2 pos occurrences) and
    // "cheap" (2 neg) clear the 2x margin; single-occurrence markers
    // sit exactly AT it and earn no vote — so doc 12 below lands on a
    // 0 score and demonstrates tie-reject at the live gate
    writeRows(src, "f1.parquet",
      Seq((10L, "citation summary x"), (11L, "cheap cheap citation"))
        .toDF("doc_id", "text"))
    runOnce()
    assert(verdicts() === Set((10L, 1L, true), (11L, -1L, false)))

    writeRows(src, "f2.parquet",
      Seq((12L, "reference y")).toDF("doc_id", "text"))
    runOnce()
    assert(verdicts() === Set((10L, 1L, true), (11L, -1L, false),
      (12L, 0L, false)))

    val before = versionDirs(s"$state/verdicts")
    runOnce() // idle restart
    assert(versionDirs(s"$state/verdicts") === before)
  }

  test("media router gate restart: committed batches keep their " +
      "inventory, post-restart rot still alerts, idle adds nothing") {
    import spark.implicits._
    val root = new java.io.File(Scratch.register(
      Files.createTempDirectory("graft_mrouter_spec").toString))
    val src = new java.io.File(root, "src"); src.mkdirs()
    val state = s"${root.getAbsolutePath}/state"
    val ck = s"${root.getAbsolutePath}/ck"

    def runOnce(): Unit = Staging.withStreamShufflePartitions(spark, "4") {
      val media = spark.readStream
        .schema("doc_id BIGINT, payload BINARY")
        .option("maxFilesPerTrigger", "1")
        .parquet(src.getAbsolutePath)
      MediaRouterGate.runInto(spark, media, alertUnknownBp = 100L,
        state, ck)
    }

    def routes(): Set[(Long, String, Long, Boolean)] =
      VersionedStore.readAllBelow(spark, s"$state/routes", Long.MaxValue)
        .map(_.collect().map(r => (r.getLong(0), r.getString(1),
          r.getLong(2), r.getBoolean(5))).toSet)
        .getOrElse(Set.empty)

    writeRows(src, "f1.parquet",
      Seq((1L, Audio.encodeWav(1L, 10, 8000)),
        (2L, Multimodal.encodePpm(2L, 2, 2))).toDF("doc_id", "payload"))
    runOnce()
    assert(routes() === Set((0L, "wav", 1L, false), (0L, "ppm", 1L, false)))

    // restart with a rotten arrival: new batch alerts, batch 0 keeps
    val bad = Audio.encodeWav(3L, 10, 8000)
    bad(0) = (bad(0) ^ 0x01).toByte
    writeRows(src, "f2.parquet",
      Seq((3L, bad)).toDF("doc_id", "payload"))
    runOnce()
    assert(routes() === Set((0L, "wav", 1L, false), (0L, "ppm", 1L, false),
      (1L, "unknown", 1L, true)))

    val before = versionDirs(s"$state/routes")
    runOnce() // idle restart
    assert(versionDirs(s"$state/routes") === before)
  }
}
