package graft

import org.scalatest.funsuite.AnyFunSuite

/** Runtime bloom-filter join pruning — Spark's adaptive row-level
  * filtering: a selective predicate on one join side materializes a
  * bloom filter that is pushed into the OTHER side's scan, so the big
  * side drops non-joining rows before the shuffle. At 100 TB this is
  * the difference between shuffling the full fact table and shuffling
  * the ~matching slice; thresholds default to cluster scale
  * (application side ≥ 10 GB), so the spec lowers them to prove the
  * mechanism on local data.
  */
class RuntimeFilterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._

  test("a selective dim filter injects a bloom filter into the fact scan") {
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // default 10GB — the local fixture is far below it
      conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0")
      // broadcast joins bypass the runtime filter; force shuffle joins
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

      val big = spark.read
        .parquet("/root/testdata/sf0.001/lineitem.parquet")
      val dim = spark.read
        .parquet("/root/testdata/sf0.001/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
      val j = big.join(dim, big("l_orderkey") === dim("o_orderkey"))
      assert(j.collect().nonEmpty)

      val p = j.queryExecution.executedPlan.toString.toLowerCase
      assert(p.contains("bloom"),
        s"no runtime bloom filter in plan:\n${p.take(2000)}")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
