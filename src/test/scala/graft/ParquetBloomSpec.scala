package graft

import org.scalatest.funsuite.AnyFunSuite

/** Parquet bloom-filter data skipping (SURVEY §2.11 E275) — the
  * third member of the layout family beside Z-order (min/max stat
  * clustering, q84) and bucket pruning (q166): point lookups on a
  * HIGH-CARDINALITY UNSORTED key are exactly where min/max skipping
  * fails — every row group's [min, max] spans ~the full key range, so
  * stats prune nothing (asserted below by the control table) — and
  * where a per-row-group bloom filter shines: a point predicate
  * consults the filter and skips every row group that provably does
  * not contain the key (no false negatives; false positives only
  * cost a read). Z-order/sorting would BUY min/max skipping here, but
  * only for the sort dimensions and only by rewriting the layout;
  * the bloom filter is per-column, order-independent, and composes
  * with any layout — the right tool when the workload is key lookups
  * over an arrival-ordered fact table.
  *
  * The proof is measured on the executed scan, not asserted from
  * config: the reader's row-group filtering happens inside
  * parquet-mr, so the observable is the scan's numOutputRows (rows
  * DECODED from surviving row groups — Spark's record-level parquet
  * filtering is off by default, so undropped groups emit all their
  * rows). Same data, same query: the bloom table's scan emits one
  * row group's worth of rows; the control emits the whole table.
  */
class ParquetBloomSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._

  private def scanOutputRows(df: org.apache.spark.sql.DataFrame): Long = {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    def flatten(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case q: QueryStageExec => flatten(q.plan)
      case r: ReusedExchangeExec => flatten(r.child)
      case _ => p.children.flatMap(flatten)
    })
    val scans = flatten(df.queryExecution.executedPlan)
      .collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty, "no parquet scan in the executed plan")
    scans.map(_.metrics("numOutputRows").value).sum
  }

  test("point lookup on a high-cardinality UNSORTED key: bloom row-" +
      "group skipping works where min/max stats cannot (measured on " +
      "executed-scan metrics, same data with and without the filter)") {
    val n = 200000L
    // arrival-ordered fact rows whose key is a multiplicative shuffle
    // of the row id: high-cardinality, unique, and UNSORTED — every
    // row group's [min, max] spans ~the whole key domain, the
    // adversarial case for stat-based skipping
    val facts = spark.range(n)
      .select(col("id"),
        ((col("id") * 2654435761L) % lit(1000000007L)).as("k"),
        (col("id") % 97).as("v"))
    val root = Scratch.register(java.nio.file.Files
      .createTempDirectory("graft_bloom_spec").toString)
    // small row groups so one table holds MANY (the unit bloom skips)
    val blockSize = 256 * 1024
    facts.coalesce(1).write
      .option("parquet.block.size", blockSize)
      .mode("overwrite").parquet(s"$root/control")
    facts.coalesce(1).write
      .option("parquet.block.size", blockSize)
      .option("parquet.bloom.filter.enabled#k", "true")
      .option("parquet.bloom.filter.expected.ndv#k", n.toString)
      .mode("overwrite").parquet(s"$root/bloomed")
    // the probe key: row 123456's shuffled key, present exactly once
    val probe = (123456L * 2654435761L) % 1000000007L
    def lookup(path: String): (Long, Long) = {
      val q = spark.read.parquet(path).filter(col("k") === probe)
      // collect() executes q's OWN plan — the metric must be read from
      // the plan instance that actually ran (count() would build and
      // run a different one, leaving this one's metrics at zero)
      val hits = q.collect().length.toLong
      (hits, scanOutputRows(q))
    }
    val (hitsControl, scannedControl) = lookup(s"$root/control")
    val (hitsBloom, scannedBloom) = lookup(s"$root/bloomed")
    info(s"scan decoded $scannedControl rows without bloom, " +
      s"$scannedBloom with (of $n)")
    // correctness: both find exactly the one row
    assert(hitsControl === 1L && hitsBloom === 1L)
    // min/max stats prune NOTHING on the unsorted key: the control
    // scan decodes (essentially) the whole table
    assert(scannedControl >= (n * 9) / 10,
      s"control scan decoded only $scannedControl of $n rows — " +
        "min/max unexpectedly pruned an unsorted key (fixture broken)")
    // the bloom filter skips the row groups that provably lack the
    // key: the scan decodes a small fraction (one group + any false
    // positives)
    assert(scannedBloom * 4 <= scannedControl,
      s"bloom scan decoded $scannedBloom vs control $scannedControl — " +
        "row-group bloom skipping did not engage")
  }
}
