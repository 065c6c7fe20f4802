package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{FuzzyNameIndex, Staging}

/** Restart-resume for the streaming fuzzy-name screen (q172's
  * machinery, the NearDupIndexSpec discipline): a restarted run must
  * not re-judge committed batches, must keep catching matches via the
  * STORED deletion-variant index, and the index must cover
  * insert/delete edits the fixture corpus (all-substitution supplier
  * names) never exercises.
  */
class FuzzyNameIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def writeNames(dir: java.io.File, name: String,
      rows: Seq[String]): Unit = {
    import spark.implicits._
    val tmp = s"${dir.getAbsolutePath}/__stage_$name"
    rows.toDF("name").coalesce(1).write.parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Files.move(part.toPath, new java.io.File(dir, name).toPath)
  }

  private def matches(root: String): Set[(String, String, Long)] =
    graft.streaming.VersionedStore
      .readAllBelow(spark, s"$root/matches", Long.MaxValue)
      .map(_.collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet)
      .getOrElse(Set.empty)

  private def versions(root: String): Seq[String] = {
    val f = new java.io.File(s"$root/matches")
    if (!f.exists()) Seq.empty
    else f.listFiles().filter(_.isDirectory).map(_.getName).sorted.toSeq
  }

  test("restart keeps probing the stored index; committed batches " +
      "are not re-judged; insert and delete edits are caught") {
    val root = new java.io.File(Scratch.register(
      Files.createTempDirectory("graft_fuzzy_spec").toString))
    val src = new java.io.File(root, "src"); src.mkdirs()
    val state = s"${root.getAbsolutePath}/state"
    val ck = s"${root.getAbsolutePath}/ck"
    val idx = s"${root.getAbsolutePath}/idx"

    import spark.implicits._
    FuzzyNameIndex.writeIndex(
      Seq("graft", "parquet", "shuffle").toDF("n"), "n", idx)

    def runOnce(): Unit = Staging.withStreamShufflePartitions(spark, "4") {
      val rows = spark.readStream
        .schema("name STRING")
        .option("maxFilesPerTrigger", "1")
        .parquet(src.getAbsolutePath)
      FuzzyNameIndex.runInto(spark, rows, "name", idx, state, ck)
    }

    // run 1: substitution (grift), insertion (grafts), unrelated
    writeNames(src, "f1.parquet", Seq("grift", "grafts"))
    writeNames(src, "f2.parquet", Seq("unrelated"))
    runOnce()
    assert(matches(state) === Set(("grift", "graft", 1L),
      ("grafts", "graft", 1L)))
    val v1 = versions(state).size

    // run 2 (restart): deletion edit (raft) still hits the stored
    // index; earlier batches not re-judged
    writeNames(src, "f3.parquet", Seq("raft", "parquets"))
    runOnce()
    assert(matches(state) === Set(("grift", "graft", 1L),
      ("grafts", "graft", 1L), ("raft", "graft", 1L),
      ("parquets", "parquet", 1L)))
    assert(versions(state).size === v1 + 1,
      "exactly one new version: committed batches must not re-judge")

    // run 3: no new files — a no-op resume
    runOnce()
    assert(versions(state).size === v1 + 1)
  }
}
