package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.GraftExtensions

class GraftExtensionsSpec extends AnyFunSuite {
  import org.apache.spark.sql.functions._

  // isolated session: newSession() shares the context but has its own
  // experimental rule list and conf, so installing here doesn't affect
  // TestSpark. The rewrite only fires on LEGACY arithmetic (ANSI
  // overflow throws where LongDot wraps), so this session runs ANSI off.
  private lazy val spark = {
    val s = TestSpark.spark.newSession()
    s.conf.set("spark.sql.ansi.enabled", "false")
    GraftExtensions.install(s)
    s
  }

  // same rule installed, but ANSI arithmetic — must NOT rewrite
  private lazy val ansiSpark = {
    val s = TestSpark.spark.newSession()
    s.conf.set("spark.sql.ansi.enabled", "true")
    GraftExtensions.install(s)
    s
  }

  private val hofDot =
    "aggregate(zip_with(a, b, (x, y) -> x * y), cast(0 as bigint), (s, v) -> s + v)"

  // spark.range sources keep the projection in the optimized plan
  // (literal Seqs fold into a pre-evaluated LocalRelation).
  private def vecsDf(s: org.apache.spark.sql.SparkSession) =
    s.range(1, 4)
      .select(col("id"),
        expr("array(id, id + 1)").as("a"),
        expr("array(3L, 4L)").as("b"))

  test("the HOF dot-product pattern is rewritten to long_dot") {
    val df = vecsDf(spark).select(expr(hofDot).as("d"), col("id"))
      .orderBy("id")
    assert(df.queryExecution.optimizedPlan.toString.contains("long_dot"))
    // id=1: [1,2]·[3,4] = 11
    assert(df.head().getLong(0) === 11L)
  }

  test("rewrite preserves HOF null semantics on mismatched lengths") {
    val df = vecsDf(spark)
      .select(expr(
        "aggregate(zip_with(array(id, id, id), b, (x, y) -> x * y), cast(0 as bigint), (s, v) -> s + v)")
        .as("d"))
    assert(df.queryExecution.optimizedPlan.toString.contains("long_dot"))
    assert(df.head().isNullAt(0)) // zip_with pads with null -> null sum
  }

  test("non-matching folds are left alone") {
    // different merge op (+ 1) must NOT be rewritten
    val df = vecsDf(spark).select(expr(
      "aggregate(zip_with(a, b, (x, y) -> x * y), cast(0 as bigint), (s, v) -> s + v + 1)")
      .as("d"), col("id")).orderBy("id")
    assert(!df.queryExecution.optimizedPlan.toString.contains("long_dot"))
    assert(df.head().getLong(0) === 13L)
  }

  test("ANSI-mode arithmetic is NOT rewritten (overflow semantics differ)") {
    val df = vecsDf(ansiSpark).select(expr(hofDot).as("d"), col("id"))
      .orderBy("id")
    assert(!df.queryExecution.optimizedPlan.toString.contains("long_dot"))
    assert(df.head().getLong(0) === 11L) // still computes, interpreted
  }

  test("uninstalled sessions are unaffected") {
    val df = vecsDf(TestSpark.spark).select(expr(hofDot).as("d"), col("id"))
    assert(!df.queryExecution.optimizedPlan.toString.contains("long_dot"))
  }
}
