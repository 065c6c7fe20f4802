package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Mixing, Sampling}

class MixingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._

  // strata sizes 10 / 20 / 40 -> minN = 10 -> thresholds 10000/5000/2500
  private def corpus = {
    import spark.implicits._
    ((0 until 10).map(i => (i.toLong, "a")) ++
      (100 until 120).map(i => (i.toLong, "b")) ++
      (200 until 240).map(i => (i.toLong, "c")))
      .toDF("id", "src")
  }

  test("thresholds: (minN * 10000) div n per stratum") {
    val got = Mixing.thresholds(corpus, "src")
      .orderBy("src").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got === Seq(("a", 10L, 10000L), ("b", 20L, 5000L),
      ("c", 40L, 2500L)))
  }

  test("membership is exactly hashBucket < stratum threshold") {
    val kept = Mixing.balanceToMin(corpus, "id", "src", "tst")
      .select("id").collect().map(_.getLong(0)).toSet
    val expected = corpus
      .withColumn("b", Sampling.hashBucket("id", "tst"))
      .withColumn("thr",
        when(col("src") === "a", 10000L)
          .when(col("src") === "b", 5000L).otherwise(2500L))
      .filter(col("b") < col("thr"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept === expected)
    // the smallest stratum's threshold is 10000: it keeps every row
    assert((0L until 10L).forall(kept.contains))
  }

  test("null strata are dropped, not balanced against") {
    import spark.implicits._
    val withNull = corpus.union(
      Seq((900L, null.asInstanceOf[String])).toDF("id", "src"))
    assert(!Mixing.balanceToMin(withNull, "id", "src", "tst")
      .select("id").collect().map(_.getLong(0)).contains(900L))
    // and the null row never shrinks anyone's threshold
    assert(Mixing.thresholds(withNull, "src").count() === 3)
  }

  test("corpus side joins the threshold table by broadcast (no corpus shuffle)") {
    val df = Mixing.balanceToMin(corpus, "id", "src", "tst")
    df.collect()
    val exec = df.queryExecution.executedPlan
    assert(exec.toString.contains("BroadcastHashJoin"))
  }
}
