package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Compaction

class CompactionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def scatter(n: Int, parts: Int): String = {
    import spark.implicits._
    val dir = Scratch.register(
      Files.createTempDirectory("graft_compact_in").toString)
    (0 until n).map(i => (i.toLong, s"row_$i"))
      .toDF("id", "payload").repartition(parts)
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("compaction reduces file count, preserves every row") {
    val in = scatter(2000, 32)
    val out = Scratch.register(
      Files.createTempDirectory("graft_compact_out").toString)
    val (before, bytes) = Compaction.dirStats(spark, in)
    assert(before === 32L)
    val stats = Compaction.compact(spark, in, out, bytes).head()
    assert(stats.getLong(0) === 32L) // files_before
    assert(stats.getLong(2) <= 2L, // files_after: ~1 at target=all bytes
      s"expected <=2 output files, got ${stats.getLong(2)}")
    assert(stats.getLong(4) === 2000L) // n_rows
    // content, not just counts
    val a = spark.read.parquet(in).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val b = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a === b)
  }

  test("the default rewrite is a narrow coalesce: no exchange in the plan") {
    val in = scatter(500, 16)
    val df = spark.read.parquet(in).coalesce(2)
    df.count()
    val shuffles = df.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeLike => e
    }
    assert(shuffles.isEmpty, "compaction's coalesce must not shuffle")
  }

  test("target sizing: more output files at a smaller target, still " +
      "row-preserving") {
    val in = scatter(2000, 32)
    val out = Scratch.register(
      Files.createTempDirectory("graft_compact_out2").toString)
    val (_, bytes) = Compaction.dirStats(spark, in)
    val stats = Compaction.compact(spark, in, out, math.max(bytes / 4, 1))
      .head()
    assert(stats.getLong(2) >= 3L && stats.getLong(2) <= 8L,
      s"expected ~4 output files, got ${stats.getLong(2)}")
    assert(stats.getLong(4) === 2000L)
  }

  test("compact refuses an empty source directory") {
    val empty = Scratch.register(
      Files.createTempDirectory("graft_compact_empty").toString)
    intercept[IllegalArgumentException] {
      Compaction.compact(spark, empty, empty + "_out", 1024L)
    }
  }
}
