package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row

/** The stored verdict tables behind the report family (q322 +
  * q313/q318/q320): refresh appends a NEW version partition (history
  * is never rewritten), readers serve the latest version, and the
  * reports' rows are invariant across refreshes — the store is a
  * cache of the deterministic chains, not a second source of truth.
  */
class VerdictStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def sorted(rows: Array[Row]) = rows.map(_.toString).sorted

  test("refresh appends a new version; reports read the latest and " +
      "stay row-identical across refreshes") {
    val report0 = SparkEntry.queries("q320_takedown_report")(
      spark, dir).collect()
    val refresh1 = SparkEntry.queries("q322_verdict_refresh")(
      spark, dir).collect()
    assert(refresh1.length === 7)
    val tag = (spark.sparkContext.applicationId + "_" + dir)
      .replaceAll("[^a-zA-Z0-9]", "_")
    val root =
      s"${System.getProperty("java.io.tmpdir")}/graft_verdicts_$tag"
    val td = spark.read.parquet(s"$root/audio_takedown")
    val versions = td.select("version").distinct().count()
    assert(versions >= 2,
      "the report build (version 0) plus one refresh must coexist")
    // a second refresh appends one more version with identical counts
    val refresh2 = SparkEntry.queries("q322_verdict_refresh")(
      spark, dir).collect()
    assert(sorted(refresh1) === sorted(refresh2))
    assert(spark.read.parquet(s"$root/audio_takedown")
      .select("version").distinct().count() === versions + 1)
    // and the dashboards are unchanged — they read the latest version
    assert(sorted(SparkEntry.queries("q320_takedown_report")(
      spark, dir).collect()) === sorted(report0))
    assert(sorted(SparkEntry.queries("q313_media_dedup_report")(
      spark, dir).collect()).nonEmpty)
  }

  test("latest-version reads PRUNE to one version partition on the " +
      "executed scan") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    import org.apache.spark.sql.functions.col
    def flatten(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case q: QueryStageExec => flatten(q.plan)
      case r: ReusedExchangeExec => flatten(r.child)
      case _ => p.children.flatMap(flatten)
    })
    SparkEntry.queries("q320_takedown_report")(spark, dir).count()
    SparkEntry.queries("q322_verdict_refresh")(spark, dir).count()
    val tag = (spark.sparkContext.applicationId + "_" + dir)
      .replaceAll("[^a-zA-Z0-9]", "_")
    val root =
      s"${System.getProperty("java.io.tmpdir")}/graft_verdicts_$tag"
    val td = spark.read.parquet(s"$root/audio_takedown")
    val versions = td.select("version").distinct().count()
    assert(versions >= 2)
    val latest = td.agg(org.apache.spark.sql.functions
      .max(col("version").cast("long"))).head().getLong(0)
    val pruned = td.filter(col("version").cast("long") === latest)
    pruned.count()
    val scans = flatten(pruned.queryExecution.executedPlan)
      .collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty)
    assert(scans.map(_.selectedPartitions.partitionCount).max === 1,
      s"a latest-version read over $versions stored versions must " +
        "scan exactly ONE partition's files")
  }

  test("retention vacuums to the latest version: old partition dirs " +
      "are gone from disk, dashboards stay row-identical, and a " +
      "subsequent refresh keeps version numbering monotonic") {
    import org.apache.spark.sql.functions.col
    val report0 = sorted(SparkEntry.queries("q320_takedown_report")(
      spark, dir).collect())
    SparkEntry.queries("q322_verdict_refresh")(spark, dir).collect()
    val tag = (spark.sparkContext.applicationId + "_" + dir)
      .replaceAll("[^a-zA-Z0-9]", "_")
    val root =
      s"${System.getProperty("java.io.tmpdir")}/graft_verdicts_$tag"
    def versionDirs(name: String): Seq[String] =
      new java.io.File(s"$root/$name").listFiles().toSeq
        .filter(f => f.isDirectory && f.getName.startsWith("version="))
        .map(_.getName).sorted
    assert(versionDirs("audio_takedown").length >= 2)
    val retained = SparkEntry.queries("q325_verdict_retention")(
      spark, dir).collect()
    assert(retained.length === 7)
    val dirs = versionDirs("audio_takedown")
    assert(dirs.length === 1,
      s"only the latest version partition may survive, got $dirs")
    // dashboards unchanged by the vacuum
    assert(sorted(SparkEntry.queries("q320_takedown_report")(
      spark, dir).collect()) === report0)
    // and the next refresh appends max+1, never reusing a dropped
    // version number
    val keptV = dirs.head.stripPrefix("version=").toLong
    SparkEntry.queries("q322_verdict_refresh")(spark, dir).collect()
    val vs = spark.read.parquet(s"$root/audio_takedown")
      .select(col("version").cast("long")).distinct()
      .collect().map(_.getLong(0)).sorted
    assert(vs.toSeq === Seq(keptV, keptV + 1))
  }

  test("stored cluster legs carry exactly the live chains' rows") {
    SparkEntry.queries("q318_corpus_dedup_report")(spark, dir).count()
    val tag = (spark.sparkContext.applicationId + "_" + dir)
      .replaceAll("[^a-zA-Z0-9]", "_")
    val root =
      s"${System.getProperty("java.io.tmpdir")}/graft_verdicts_$tag"
    val stored = spark.read.parquet(s"$root/video_clusters")
    val latest = stored.agg(org.apache.spark.sql.functions
      .max(org.apache.spark.sql.functions.col("version")
        .cast("long"))).head().getLong(0)
    val storedRows = sorted(stored
      .filter(org.apache.spark.sql.functions.col("version")
        .cast("long") === latest)
      .drop("version").collect())
    val liveRows = sorted(SparkEntry.queries("q300_video_clusters")(
      spark, dir).collect())
    assert(storedRows === liveRows)
  }
}
