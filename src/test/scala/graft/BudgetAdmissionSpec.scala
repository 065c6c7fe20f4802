package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{BudgetAdmission, Staging, VersionedStore}

/** Restart-resume for the streaming token-budget admission (q137's
  * machinery, the StreamResumeSpec discipline applied to the scalar
  * counter store): a stopped run restarted against the same checkpoint
  * + state root must (a) not re-fold (and so not double-count) batches
  * it already committed, and (b) CONTINUE the quota from the STORED
  * token total — the admitted set across the restart must equal the
  * one-shot prefix sum over everything ever seen. Also pins the two
  * boundary semantics: a document STRADDLING the budget line is
  * admitted (starts under budget), and the counter advances by every
  * seen token, admitted or not, so post-budget batches stay rejected.
  */
class BudgetAdmissionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** One parquet file per micro-batch: (doc_id, text of n_tok words). */
  private def writeDocs(dir: java.io.File, name: String,
      rows: Seq[(Long, Int)]): Unit = {
    import spark.implicits._
    val tmp = s"${dir.getAbsolutePath}/__stage_$name"
    rows.map { case (id, n) => (id, Seq.fill(n)("w").mkString(" ")) }
      .toDF("doc_id", "text").coalesce(1).write.parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Files.move(part.toPath, new java.io.File(dir, name).toPath)
  }

  private def admitted(root: String): Seq[(Long, Long, Long)] =
    VersionedStore.readAllBelow(spark, s"$root/admitted", Long.MaxValue)
      .map(_.orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq)
      .getOrElse(Seq.empty)

  private def seenTotal(root: String): Long =
    VersionedStore.latestBelow(spark, s"$root/seen", Long.MaxValue)
      .map(p => spark.read.parquet(p).head().getLong(0))
      .getOrElse(0L)

  private def versions(dir: String): Seq[String] = {
    val f = new java.io.File(dir)
    if (!f.exists()) Seq.empty
    else f.listFiles().filter(_.isDirectory).map(_.getName).sorted.toSeq
  }

  test("restart resumes the quota exactly: no double-count, straddler " +
      "admitted, post-budget arrivals rejected but counted") {
    val root = new java.io.File(Scratch.register(
      Files.createTempDirectory("graft_budget_spec").toString))
    val src = new java.io.File(root, "src"); src.mkdirs()
    val state = s"${root.getAbsolutePath}/state"
    val ck = s"${root.getAbsolutePath}/ck"

    def runOnce(): Unit = Staging.withStreamShufflePartitions(spark, "4") {
      val docs = spark.readStream
        .schema("doc_id BIGINT, text STRING")
        .option("maxFilesPerTrigger", "1")
        .parquet(src.getAbsolutePath)
      BudgetAdmission.runInto(spark, docs, state, ck, budget = 100L)
    }

    // run 1, budget 100: batch 1 = docs 1 (40 tok) + 2 (30 tok),
    // batch 2 = docs 3 (20 tok) + 4 (50 tok). Cumulative 40/70/90/140:
    // doc 4 STARTS at 90 < 100 → admitted although it crosses the line.
    writeDocs(src, "f1.parquet", Seq((1L, 40), (2L, 30)))
    writeDocs(src, "f2.parquet", Seq((3L, 20), (4L, 50)))
    runOnce()
    assert(admitted(state) === Seq((1L, 40L, 40L), (2L, 30L, 70L),
      (3L, 20L, 90L), (4L, 50L, 140L)))
    assert(seenTotal(state) === 140L)
    val admVersions1 = versions(s"$state/admitted")
    assert(admVersions1.size === 2, s"got $admVersions1")

    // run 2 (restart, same checkpoint + state): doc 5 starts at the
    // STORED total 140 ≥ 100 → rejected, but the counter still
    // advances — replay and later batches see 150, not 140.
    writeDocs(src, "f3.parquet", Seq((5L, 10)))
    runOnce()
    assert(admitted(state).map(_._1) === Seq(1L, 2L, 3L, 4L))
    assert(seenTotal(state) === 150L)
    // exactly ONE new version pair: run 1's batches were not re-folded
    val admVersions2 = versions(s"$state/admitted")
    assert(admVersions2.size === 3, s"got $admVersions2")
    assert(admVersions2.take(2) === admVersions1)
    assert(versions(s"$state/seen").size === 3)

    // run 3: nothing new — resume is a no-op (no versions, no growth)
    runOnce()
    assert(versions(s"$state/admitted") === admVersions2)
    assert(seenTotal(state) === 150L)
  }
}
