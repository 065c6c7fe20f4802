package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{SemanticDedupScreen, VersionedStore}

/** [[graft.streaming.SemanticDedupScreen]] — the deployable-composition
  * contract the lexical screens already carry, on the semantic axis:
  * (a) stop → arrivals → restart resumes from the checkpoint without
  * re-emitting (and without re-reading) already-verdicted batches;
  * (b) the streamed fold over disjoint micro-batches is row-identical
  * to the batch incremental form (q103 — the shared oracle's claim,
  * asserted engine-side here at sf0.001).
  */
class SemanticDedupScreenSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._

  private def writeVecs(dir: java.io.File, name: String,
      rows: Seq[(Long, Array[Float])]): Unit = {
    import spark.implicits._
    val tmp = s"${dir.getAbsolutePath}/__stage_$name"
    rows.toDF("vec_id", "embedding").coalesce(1).write.parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Files.move(part.toPath, new java.io.File(dir, name).toPath)
  }

  test("restart resumes: new arrivals verdict against the stored " +
      "history, already-verdicted batches are not re-emitted") {
    import spark.implicits._
    val root = new java.io.File(Scratch.register(
      Files.createTempDirectory("graft_semdedup_spec").toString))
    val src = new java.io.File(root, "src"); src.mkdirs()
    val state = s"${root.getAbsolutePath}/state"
    val ck = s"${root.getAbsolutePath}/ck"
    // stored model: two axis-aligned cells (quantized 1e4 scale)
    val cs = Array(Array(10000L, 0L), Array(0L, 10000L))
    // stored history assignments: h1/h3 in cell 0, h2 in cell 1
    val hist = graft.ops.KMeans.assignTo(
        graft.ops.Similarity.prepare(
          Seq((1L, Array(1.0f, 0.05f)), (2L, Array(0.05f, 1.0f)),
            (3L, Array(0.9f, 0.1f))).toDF("vec_id", "embedding"),
          "embedding"), "vec_id", cs)
      .filter(col("qn") > 0)
      .select(col("vec_id").as("hist_id"), col("cluster"), col("qv"),
        col("qn"))
      .localCheckpoint()

    def runOnce(): Unit = graft.streaming.Staging
        .withStreamShufflePartitions(spark, n = "4") {
      val vecs = spark.readStream
        .schema("vec_id BIGINT, embedding ARRAY<FLOAT>")
        .option("maxFilesPerTrigger", "1")
        .parquet(src.getAbsolutePath)
      SemanticDedupScreen.runInto(spark, vecs, cs, hist,
        threshold = 0.3, stateRoot = state, checkpoint = ck)
    }
    def verdicts(): Seq[(Long, Long)] =
      VersionedStore.readAllBelow(spark, s"$state/verdicts", Long.MaxValue)
        .map(_.select("new_id", "hist_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted)
        .getOrElse(Seq.empty)

    // run 1: b10 lands in cell 0 (near h1, h3), b11 in cell 1 (near h2)
    writeVecs(src, "f1.parquet",
      Seq((10L, Array(0.95f, 0.0f)), (11L, Array(0.0f, 0.9f))))
    runOnce()
    assert(verdicts() === Seq((10L, 1L), (10L, 3L), (11L, 2L)))

    // run 2 (restart against the same checkpoint): only the NEW file
    // is read; b12 verdicts against cell 0's history, run-1 pairs stay
    // exactly once
    writeVecs(src, "f2.parquet", Seq((12L, Array(0.8f, 0.2f))))
    runOnce()
    val after = verdicts()
    assert(after === Seq((10L, 1L), (10L, 3L), (12L, 1L), (12L, 3L))
        .patch(2, Seq((11L, 2L)), 0),
      s"got $after")
    // one committed version per non-empty batch, none rewritten away
    assert(VersionedStore
      .allBelow(spark, s"$state/verdicts", Long.MaxValue).size === 2)
  }

  test("per-batch plan shape: the batch side broadcasts — the stored " +
      "history never re-shuffles (no Exchange above the history scan)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val cs = Array(Array(10000L, 0L), Array(0L, 10000L))
    val hist = graft.ops.KMeans.assignTo(
        graft.ops.Similarity.prepare(
          Seq((1L, Array(1.0f, 0.05f)), (2L, Array(0.05f, 1.0f)))
            .toDF("vec_id", "embedding"), "embedding"), "vec_id", cs)
      .filter(col("qn") > 0)
      .select(col("vec_id").as("hist_id"), col("cluster"), col("qv"),
        col("qn"))
    val batch = Seq((10L, Array(0.9f, 0.1f))).toDF("vec_id", "embedding")
    val plan = SemanticDedupScreen
      .batchVerdicts(batch, cs, hist, threshold = 0.3)
    plan.count()
    def flatten(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case q: QueryStageExec => flatten(q.plan)
      case r: ReusedExchangeExec => flatten(r.child)
      case _ => p.children.flatMap(flatten)
    })
    val nodes = flatten(plan.queryExecution.executedPlan)
    val bhj = nodes.collect { case j: BroadcastHashJoinExec => j }
    assert(bhj.nonEmpty, "the in-cell probe must be a broadcast join")
    // the history (streamed) side of the broadcast join carries no
    // shuffle: the corpus-sized store is read in place every batch
    import org.apache.spark.sql.catalyst.optimizer.BuildLeft
    assert(bhj.forall { j =>
      val streamed = if (j.buildSide == BuildLeft) j.right else j.left
      flatten(streamed)
        .collect { case e: ShuffleExchangeLike => e }.isEmpty
    }, "the stored history must never re-shuffle per batch")
  }

  test("growing mode across a restart: a later arrival pairs against " +
      "an EARLIER batch's arrival — the arrivals store survives the " +
      "checkpoint restart and extends the probe side") {
    import spark.implicits._
    val root = new java.io.File(Scratch.register(
      Files.createTempDirectory("graft_semdedupg_spec").toString))
    val src = new java.io.File(root, "src"); src.mkdirs()
    val state = s"${root.getAbsolutePath}/state"
    val ck = s"${root.getAbsolutePath}/ck"
    val cs = Array(Array(10000L, 0L), Array(0L, 10000L))
    val hist = graft.ops.KMeans.assignTo(
        graft.ops.Similarity.prepare(
          Seq((1L, Array(1.0f, 0.05f))).toDF("vec_id", "embedding"),
          "embedding"), "vec_id", cs)
      .filter(col("qn") > 0)
      .select(col("vec_id").as("hist_id"), col("cluster"), col("qv"),
        col("qn"))
      .localCheckpoint()
    def runOnce(): Unit = graft.streaming.Staging
        .withStreamShufflePartitions(spark, n = "4") {
      val vecs = spark.readStream
        .schema("vec_id BIGINT, embedding ARRAY<FLOAT>")
        .option("maxFilesPerTrigger", "1")
        .parquet(src.getAbsolutePath)
      SemanticDedupScreen.runGrowingInto(spark, vecs, cs, hist,
        threshold = 0.3, stateRoot = state, checkpoint = ck)
    }
    def verdicts(): Set[(Long, Long)] =
      VersionedStore.readAllBelow(spark, s"$state/verdicts", Long.MaxValue)
        .map(_.select("new_id", "other_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet)
        .getOrElse(Set.empty)
    // run 1: b10 and b13 CO-ARRIVE near h1 in cell 0 — the intra-batch
    // pair (13, 10) must emit alongside both history pairs (no earlier
    // state could surface two same-batch near-dups); b11 alone in
    // cell 1 — no partner YET
    writeVecs(src, "f1.parquet",
      Seq((10L, Array(0.95f, 0.0f)), (11L, Array(0.0f, 0.9f)),
        (13L, Array(0.9f, 0.05f))))
    runOnce()
    assert(verdicts() === Set((10L, 1L), (13L, 1L), (13L, 10L)))
    // run 2 (restart): b12 near b11 in cell 1 — its only possible
    // partner is the EARLIER ARRIVAL, not history; the pair must
    // emit, proving the arrivals store persisted across the restart
    writeVecs(src, "f2.parquet", Seq((12L, Array(0.0f, 0.85f))))
    runOnce()
    assert(verdicts() === Set((10L, 1L), (13L, 1L), (13L, 10L),
      (12L, 11L)))
    // one verdict + one arrivals version per non-empty batch
    assert(VersionedStore
      .allBelow(spark, s"$state/verdicts", Long.MaxValue).size === 2)
    assert(VersionedStore
      .allBelow(spark, s"$state/arrivals", Long.MaxValue).size === 2)
  }

  test("streamed fold ≡ batch incremental: q276 replays q103's rows " +
      "exactly at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val stream = SparkEntry.queries("q276_stream_semantic_dedup")(
      spark, dir).collect().map(_.toString).toSeq
    val batch = SparkEntry.queries("q103_cross_semantic_dedup")(
      spark, dir).collect().map(_.toString).toSeq
    assert(stream === batch)
  }
}
