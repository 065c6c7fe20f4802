package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{Leaderboard, Staging, VersionedStore}

/** Restart-resume for the streaming exact top-k leaderboard (q185's
  * machinery): a stopped run restarted against the same checkpoint +
  * state root must not re-fold committed batches, and the final board
  * must equal the one-shot ranking over everything ever seen — both
  * when a later batch DISPLACES stored rows and when it changes
  * nothing (the all-lower batch still commits a version, proving the
  * fold ran without disturbing the board).
  */
class LeaderboardSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** One parquet file per micro-batch: (event_id, user_id, value). */
  private def writeEvents(dir: java.io.File, name: String,
      rows: Seq[(Long, Long, Double)]): Unit = {
    import spark.implicits._
    val tmp = s"${dir.getAbsolutePath}/__stage_$name"
    rows.toDF("event_id", "user_id", "value")
      .coalesce(1).write.parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Files.move(part.toPath, new java.io.File(dir, name).toPath)
  }

  private def board(root: String): Seq[(Long, Long)] =
    VersionedStore.latestBelow(spark, s"$root/top", Long.MaxValue)
      .map(p => spark.read.parquet(p)
        .orderBy(org.apache.spark.sql.functions.col("cents").desc,
          org.apache.spark.sql.functions.col("event_id"))
        .collect().map(r => (r.getAs[Long]("event_id"),
          r.getAs[Long]("cents"))).toSeq)
      .getOrElse(Seq.empty)

  private def versions(dir: String): Seq[String] = {
    val f = new java.io.File(dir)
    if (!f.exists()) Seq.empty
    else f.listFiles().filter(_.isDirectory).map(_.getName).sorted.toSeq
  }

  test("restart resumes the board: displacement folds in, all-lower " +
      "batches leave it unchanged, committed batches never re-fold") {
    val root = new java.io.File(Scratch.register(
      Files.createTempDirectory("graft_lb_spec").toString))
    val src = new java.io.File(root, "src"); src.mkdirs()
    val state = s"${root.getAbsolutePath}/state"
    val ck = s"${root.getAbsolutePath}/ck"

    def runOnce(): Unit = Staging.withStreamShufflePartitions(spark, "4") {
      val events = spark.readStream
        .schema("event_id BIGINT, user_id BIGINT, value DOUBLE")
        .option("maxFilesPerTrigger", "1")
        .parquet(src.getAbsolutePath)
      Leaderboard.runInto(spark, events, state, ck, k = 3)
    }

    // run 1: batch 1 fills the board, batch 2 displaces the bottom
    writeEvents(src, "f1.parquet",
      Seq((1L, 10L, 5.00), (2L, 10L, 3.00), (3L, 11L, 1.00)))
    writeEvents(src, "f2.parquet",
      Seq((4L, 12L, 4.00), (5L, 12L, 0.50)))
    runOnce()
    assert(board(state) === Seq((1L, 500L), (4L, 400L), (2L, 300L)))
    assert(versions(s"$state/top").size === 2)

    // run 2 (restart): an all-lower batch must commit a version but
    // not disturb the board; then a new maximum displaces the bottom
    writeEvents(src, "f3.parquet", Seq((6L, 13L, 0.25)))
    writeEvents(src, "f4.parquet", Seq((7L, 13L, 9.00)))
    runOnce()
    assert(board(state) === Seq((7L, 900L), (1L, 500L), (4L, 400L)))
    val vs = versions(s"$state/top")
    assert(vs.size === 4,
      s"each folded batch commits exactly one version, got $vs")

    // run 3: nothing new → no re-fold, no new version
    runOnce()
    assert(versions(s"$state/top").size === 4)
    assert(board(state) === Seq((7L, 900L), (1L, 500L), (4L, 400L)))
  }

  test("ties on cents rank by minimal event_id") {
    val root = new java.io.File(Scratch.register(
      Files.createTempDirectory("graft_lb_tie").toString))
    val src = new java.io.File(root, "src"); src.mkdirs()
    val state = s"${root.getAbsolutePath}/state"
    val ck = s"${root.getAbsolutePath}/ck"
    writeEvents(src, "f1.parquet",
      Seq((9L, 1L, 2.00), (4L, 1L, 2.00), (6L, 1L, 2.00), (2L, 1L, 1.0)))
    Staging.withStreamShufflePartitions(spark, "4") {
      val events = spark.readStream
        .schema("event_id BIGINT, user_id BIGINT, value DOUBLE")
        .option("maxFilesPerTrigger", "1")
        .parquet(src.getAbsolutePath)
      Leaderboard.runInto(spark, events, state, ck, k = 3)
    }
    assert(board(state) === Seq((4L, 200L), (6L, 200L), (9L, 200L)))
  }
}
