package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.PhraseExcise

/** Blocklist phrase excision (E240): overlapping and adjacent matches
  * merge into one island, full-coverage documents empty out cleanly,
  * untouched documents never appear.
  */
class PhraseExciseSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._

  private val phrases = Seq("table scan", "fast sort key", "sort key agg")

  private def run(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    PhraseExcise.excise(rows.toDF("doc_id", "text"), "doc_id", "text",
        phrases)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getString(5)))).toMap
  }

  test("overlapping phrase matches merge into one island; disjoint " +
      "matches stay separate islands") {
    // tokens: a(0) table(1) scan(2) b(3) fast(4) sort(5) key(6) agg(7) c(8)
    // "fast sort key" (4-6) overlaps "sort key agg" (5-7) — one island
    val got = run(Seq(
      (1L, "a table scan b fast sort key agg c"),
      (3L, "nothing blocked here")))
    assert(got.keySet === Set(1L), "untouched docs must not appear")
    assert(got(1L) === ((9L, 3L, 6L, 2L, "a b c")))
  }

  test("a fully-covered document empties out; adjacent matches merge") {
    val got = run(Seq(
      (2L, "table scan"),                  // exact full cover
      (4L, "table scan table scan")))      // adjacent matches, one island
    assert(got(2L) === ((2L, 1L, 2L, 1L, "")))
    assert(got(4L) === ((4L, 2L, 4L, 1L, "")))
  }

  test("matches at the document head and tail slice correctly") {
    // head: island starts at 0; tail: island ends at last token
    val got = run(Seq(
      (5L, "table scan tail words here"),
      (6L, "head words here table scan")))
    assert(got(5L) === ((5L, 1L, 2L, 1L, "tail words here")))
    assert(got(6L) === ((5L, 1L, 2L, 1L, "head words here")))
  }

  test("luhn: canonical vectors validate and near-misses fail") {
    import spark.implicits._
    val got = Seq("4111111111111111", "4111111111111112",
        "79927398713", "79927398710", "0000000000000000")
      .toDF("d")
      .select(col("d"), graft.functions.TextFns.luhnValid("d").as("ok"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got("4111111111111111"), "the canonical Visa test number")
    assert(!got("4111111111111112"), "off-by-one check digit")
    assert(got("79927398713"), "the textbook Luhn example")
    assert(!got("79927398710"))
    assert(got("0000000000000000"), "all zeros sum to 0 mod 10")
  }

  test("luhn: empty input is false, not null") {
    import spark.implicits._
    val row = Seq("").toDF("d")
      .select(graft.functions.TextFns.luhnValid("d").as("ok"))
      .collect().head
    assert(!row.isNullAt(0) && !row.getBoolean(0))
  }

  test("excise: phrase words with quotes and backslashes match literally") {
    import spark.implicits._
    val docs = Seq(
      (1L, "keep a\\b 'q' tail"),
      (2L, "keep nothing odd here")).toDF("doc_id", "text")
    val got = PhraseExcise.excise(docs, "doc_id", "text",
        Seq("a\\b 'q'"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text_clean")).toMap
    assert(got === Map(1L -> "keep tail"),
      "the escaped phrase matches doc 1 and only doc 1")
  }
}
