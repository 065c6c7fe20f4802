package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Blooms

class BloomsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def keys(from: Int, until: Int) = {
    import spark.implicits._
    (from until until).map(i => s"key_$i").toDF("k")
  }

  test("no false negatives: every inserted key probes true") {
    val members = keys(0, 500)
    val bloom = Blooms.build(members, col("k"), 500, 0.01)
    val misses = members
      .filter(!Blooms.mightContain(bloom, col("k"))).count()
    assert(misses === 0L)
  }

  test("measured false-positive rate stays within 5x the configured fpp") {
    val bloom = Blooms.build(keys(0, 500), col("k"), 500, 0.01)
    val probes = 4000
    val fps = keys(100000, 100000 + probes)
      .filter(Blooms.mightContain(bloom, col("k"))).count()
    assert(fps.toDouble / probes <= 0.05,
      s"measured fpr ${fps.toDouble / probes} exceeds 5x fpp")
  }

  test("the probe is scan-local: no exchange in the filtered plan") {
    val bloom = Blooms.build(keys(0, 100), col("k"), 100, 0.01)
    val filtered = keys(0, 1000).filter(Blooms.mightContain(bloom, col("k")))
    filtered.count()
    val shuffles = filtered.queryExecution.executedPlan.collect {
      case s: ShuffleExchangeLike => s
    }
    assert(shuffles.isEmpty,
      "bloom probe must not introduce an exchange above the scan")
  }

  test("the build merges distributed partial filters (partitioning-" +
      "independent bits)") {
    val a = Blooms.build(keys(0, 500).repartition(11), col("k"), 500, 0.01)
    val b = Blooms.build(keys(0, 500).coalesce(1), col("k"), 500, 0.01)
    assert(java.util.Arrays.equals(a, b),
      "bloom bits must not depend on partitioning (merge is bitwise OR)")
  }

  test("build refuses an empty key set") {
    intercept[IllegalArgumentException] {
      Blooms.build(keys(0, 0), col("k"), 1, 0.01)
    }
  }
}
