package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Blooms
import graft.streaming.{ContaminationScreen, Staging, VersionedStore}

/** Restart-resume for the streaming contamination screen (q148's
  * machinery): a restarted run must not re-screen committed batches
  * (verdicts would duplicate), must keep catching contamination via
  * the SAME stored artifacts after the stop, and a clean batch must
  * leave no verdict rows at all (the Bloom pre-filter's
  * no-false-negative + exact-confirm contract).
  */
class ContaminationScreenSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def writeDocs(dir: java.io.File, name: String,
      rows: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    val tmp = s"${dir.getAbsolutePath}/__stage_$name"
    rows.toDF("doc_id", "text").coalesce(1).write.parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Files.move(part.toPath, new java.io.File(dir, name).toPath)
  }

  private def verdicts(root: String): Set[(Long, Long)] =
    VersionedStore.readAllBelow(spark, s"$root/verdicts", Long.MaxValue)
      .map(_.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
      .getOrElse(Set.empty)

  private def versions(dir: String): Seq[String] = {
    val f = new java.io.File(dir)
    if (!f.exists()) Seq.empty
    else f.listFiles().filter(_.isDirectory).map(_.getName).sorted.toSeq
  }

  test("restart resumes: no re-screening, stored artifacts keep " +
      "catching hits, clean batches emit nothing") {
    import spark.implicits._
    val root = new java.io.File(Scratch.register(
      Files.createTempDirectory("graft_contam_spec").toString))
    val src = new java.io.File(root, "src"); src.mkdirs()
    val state = s"${root.getAbsolutePath}/state"
    val ck = s"${root.getAbsolutePath}/ck"

    // the benchmark: two 2-token "paragraphs" — their md5s are the
    // stored table + bloom (parLen = 2 keeps fixtures readable)
    val eval = Seq("secret alpha", "secret beta").toDF("para")
      .select(md5(col("para")).as("fp")).localCheckpoint()
    val evalPath = s"${root.getAbsolutePath}/eval"
    eval.write.parquet(evalPath)
    val bloom = Blooms.build(eval, col("fp"), 2L, 0.01)

    def runOnce(): Unit = Staging.withStreamShufflePartitions(spark, "4") {
      val docs = spark.readStream
        .schema("doc_id BIGINT, text STRING")
        .option("maxFilesPerTrigger", "1")
        .parquet(src.getAbsolutePath)
      ContaminationScreen.runInto(spark, docs, evalPath, bloom, state,
        ck, parLen = 2)
    }

    // run 1: doc 1 hits both benchmark paragraphs, doc 2 is clean,
    // doc 3 (own batch) hits one
    writeDocs(src, "f1.parquet", Seq(
      1L -> "secret alpha secret beta", 2L -> "all clean here ok"))
    writeDocs(src, "f2.parquet", Seq(3L -> "secret beta plus more"))
    runOnce()
    assert(verdicts(state) === Set((1L, 2L), (3L, 1L)))
    val versions1 = versions(s"$state/verdicts")
    assert(versions1.size === 2, s"got $versions1")

    // run 2 (restart): a post-restart arrival must still be screened
    // against the stored artifacts; committed batches must not
    // re-screen (doc 1 would double to two rows)
    writeDocs(src, "f3.parquet", Seq(
      4L -> "secret alpha only once", 5L -> "nothing to see"))
    runOnce()
    assert(verdicts(state) === Set((1L, 2L), (3L, 1L), (4L, 1L)))
    val versions2 = versions(s"$state/verdicts")
    assert(versions2.size === 3, s"got $versions2")
    assert(versions2.take(2) === versions1)

    // run 3: nothing new — no versions, no verdicts
    runOnce()
    assert(versions(s"$state/verdicts") === versions2)
    assert(verdicts(state).size === 3)
  }
}
