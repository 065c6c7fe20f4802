package graft

import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join handling (the adaptive complement to `ops/Salting`):
  * when one join key dominates a shuffle partition, AQE must split
  * that partition at runtime instead of letting a single task process
  * it. This is the mechanism q34's manual salting predates — both
  * exist because a 100 TB skewed join dies without one of them.
  */
class SkewJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._

  test("AQE splits a skewed sort-merge partition at runtime") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      // thresholds small enough that the local fixture's hot key
      // (100k rows of one key vs ~40 rows of the rest) counts as skew
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      // force a sort-merge join: broadcasting would hide the skew path
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      val probe = spark.range(104000)
        .select(when(col("id") < 100000L, 0L).otherwise(col("id") % 40L)
          .as("k"), col("id").as("v"))
      val build = spark.range(40).select(col("id").as("k"),
        (col("id") * 10L).as("w"))
      val joined = probe.join(build, "k")
      // action on THIS Dataset so its own adaptive plan finalizes
      // (count() would spawn a separate query execution)
      assert(joined.collect().length === 104000)

      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(500))
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n${plan.take(1500)}")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
