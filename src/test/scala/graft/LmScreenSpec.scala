package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.ops.CharLm
import graft.streaming.{LmScreen, Staging, VersionedStore}

/** [[graft.streaming.LmScreen]] restart semantics (the
  * ContaminationScreenSpec discipline): committed batches never
  * re-score, post-restart arrivals are still gated against the STORED
  * model, idle restarts write nothing.
  */
class LmScreenSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def writeDocs(dir: java.io.File, name: String,
      rows: Seq[(Long, String, String)]): Unit = {
    import spark.implicits._
    val tmp = new java.io.File(dir.getParentFile, s"__stage_$name")
    rows.toDF("doc_id", "source", "text").coalesce(1)
      .write.mode("overwrite").parquet(tmp.getAbsolutePath)
    val part = tmp.listFiles().filter(_.getName.endsWith(".parquet")).head
    Files.copy(part.toPath, new java.io.File(dir, name).toPath)
  }

  private def verdicts(root: String): Set[(Long, Long)] =
    VersionedStore.readAllBelow(spark, s"$root/verdicts", Long.MaxValue)
      .map(_.collect().map(r => (r.getLong(0), r.getLong(4))).toSet)
      .getOrElse(Set.empty)

  test("restart resumes: committed batches keep their verdicts, new " +
      "arrivals are gated by the stored model, idle restarts add nothing") {
    import spark.implicits._
    val root = new java.io.File(Scratch.register(
      Files.createTempDirectory("graft_lmscreen_spec").toString))
    val src = new java.io.File(root, "src"); src.mkdirs()
    val state = s"${root.getAbsolutePath}/state"
    val ck = s"${root.getAbsolutePath}/ck"

    // model trained on a corpus where "ab" chains dominate: docs made
    // of 'ab' repeats score high; 'zq' text is OOV → score 0
    val model = CharLm.trainBigrams(
      Seq("ababab ababab", "abab abab").toDF("text"), "text")
      .localCheckpoint()

    def runOnce(): Unit = Staging.withStreamShufflePartitions(spark, "4") {
      val docs = spark.readStream
        .schema("doc_id BIGINT, source STRING, text STRING")
        .option("maxFilesPerTrigger", "1")
        .parquet(src.getAbsolutePath)
      LmScreen.runInto(spark, docs, model, minAvgQ = 100000L, state, ck)
    }

    writeDocs(src, "f1.parquet", Seq(
      (1L, "s0", "ababab"), (2L, "s0", "zqzqzq")))
    runOnce()
    assert(verdicts(state) === Set((1L, 1L), (2L, 0L)))

    // restart with one new arrival: old verdicts must not duplicate
    writeDocs(src, "f2.parquet", Seq((3L, "s1", "abab")))
    runOnce()
    assert(verdicts(state) === Set((1L, 1L), (2L, 0L), (3L, 1L)))

    // idle restart: nothing new appended
    val before = new java.io.File(s"$state/verdicts").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted.toSeq
    runOnce()
    val after = new java.io.File(s"$state/verdicts").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted.toSeq
    assert(after === before)
  }
}
