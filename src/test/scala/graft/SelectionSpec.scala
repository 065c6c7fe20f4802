package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Selection

class SelectionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._

  private def docs = {
    import spark.implicits._
    // quality order: d1 (0.9), d2 (0.8), d3 (0.7) — 5 tokens each
    Seq((1L, 5L, 0.9), (2L, 5L, 0.8), (3L, 5L, 0.7))
      .toDF("doc_id", "n_tok", "q")
  }

  private def select(budget: Long) =
    Selection.underTokenBudget(docs, "n_tok", budget,
        col("q").desc, col("doc_id").asc)
      .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted

  test("greedy fill admits the straddling document") {
    // budget 11: d3 starts at offset 10 < 11 -> included though it overflows
    assert(select(11L) === Seq(1L, 2L, 3L))
  }

  test("a document starting exactly at the budget is excluded") {
    // budget 10: d3's start offset == 10 -> out; d2 starts at 5 -> in
    assert(select(10L) === Seq(1L, 2L))
  }

  test("budget smaller than the first document still takes it") {
    assert(select(1L) === Seq(1L))
  }

  test("null token counts never consume budget and are dropped") {
    import spark.implicits._
    val withNull = Seq((1L, java.lang.Long.valueOf(5L), 0.9),
      (2L, null.asInstanceOf[java.lang.Long], 0.95),
      (3L, java.lang.Long.valueOf(5L), 0.8))
      .toDF("doc_id", "n_tok", "q")
    val got = Selection.underTokenBudget(withNull, "n_tok", 10L,
        col("q").desc, col("doc_id").asc)
      .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
    // doc 2 (highest quality, null tokens) is dropped; its presence
    // must not shift doc 1/3's offsets (1 starts at 0, 3 at 5)
    assert(got === Seq(1L, 3L))
  }

  test("cum_tok is the inclusive running sum in the selection order") {
    val got = Selection.underTokenBudget(docs, "n_tok", 100L,
        col("q").desc, col("doc_id").asc)
      .select("doc_id", "cum_tok").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)
    assert(got === Seq((1L, 5L), (2L, 10L), (3L, 15L)))
  }
}
