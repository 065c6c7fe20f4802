package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.QualityGate

class QualityGateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("metrics ride the observed pass and land in the report row") {
    import spark.implicits._
    val df = Seq(
      (1L, "a solid document body", 21L),
      (2L, null.asInstanceOf[String], 0L),
      (3L, "tiny", 4L)
    ).toDF("doc_id", "text", "n_chars")
    val r = QualityGate.textCorpusGate(df, "text", "n_chars").collect().head
    assert(r.getLong(0) === 3L) // n_rows
    assert(r.getLong(1) === 1L) // n_null_text
    assert(r.getLong(2) === 2L) // n_short: the null row's 0 and "tiny"
    assert(r.getLong(3) === 25L) // sum_chars
  }

  test("observed form piggybacks on the caller's action — no separate metrics pass") {
    import spark.implicits._
    val df = Seq((1L, "body", 4L), (2L, "longer body", 11L))
      .toDF("doc_id", "text", "n_chars")
    val (passThrough, obs) = QualityGate.observed(df, "text", "n_chars")
    // the caller's own action (here: the downstream count) feeds the
    // metrics; the returned rows are untouched
    assert(passThrough.count() === 2L)
    val m = obs.get
    assert(m("n_rows") === 2L)
    assert(m("n_null_text") === 0L)
    assert(m("n_short") === 1L)
    assert(m("sum_chars") === 15L)
  }

  test("gate refuses an empty corpus and a null-dominated corpus") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String, Long)].toDF("doc_id", "text", "n_chars")
    intercept[IllegalStateException] {
      QualityGate.textCorpusGate(empty, "text", "n_chars")
    }
    val mostlyNull = Seq(
      (1L, null.asInstanceOf[String], 0L),
      (2L, null.asInstanceOf[String], 0L),
      (3L, "ok", 2L)
    ).toDF("doc_id", "text", "n_chars")
    intercept[IllegalStateException] {
      QualityGate.textCorpusGate(mostlyNull, "text", "n_chars")
    }
  }
}
