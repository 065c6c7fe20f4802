package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ops.Nested

/** The [[graft.ops.Nested]] annotation fold on hand-checkable strings:
  * offset prefix sums, span widths = token lengths, the length-class
  * label rule, empty input, and multi-space normalization (offsets
  * address the single-space-joined token text).
  */
class NestedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def anns(text: String): Seq[(Int, Int, String)] = {
    import spark.implicits._
    Seq(text).toDF("text")
      .withColumn("toks", expr("filter(split(text, ' '), t -> t <> '')"))
      .withColumn("anns", Nested.tokenAnnotations("toks"))
      .select("anns").head().getSeq[Row](0)
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2)))
  }

  test("offsets are a prefix sum; widths are token lengths") {
    assert(anns("ab cde longtoken0") === Seq(
      (0, 2, "short"), (3, 6, "short"), (7, 17, "long")))
  }

  test("label classes: <4 short, <8 mid, else long") {
    assert(anns("abc abcd abcdefg abcdefgh").map(_._3) ===
      Seq("short", "mid", "mid", "long"))
  }

  test("empty text yields an empty (non-null) annotation array") {
    assert(anns("") === Seq.empty)
  }

  test("runs of spaces collapse: offsets address the joined tokens") {
    assert(anns("a  b") === Seq((0, 1, "short"), (2, 3, "short")))
  }

  test("every span slices its own token back out of the joined text") {
    import spark.implicits._
    val bad = Seq("the quick brown fox", "a bc def ghij klmno", "x yy zzz")
      .toDF("text")
      .withColumn("toks", expr("filter(split(text, ' '), t -> t <> '')"))
      .withColumn("joined", concat_ws(" ", col("toks")))
      .select(col("toks"), col("joined"),
        posexplode(Nested.tokenAnnotations("toks")).as(Seq("p", "a")))
      .filter(expr("substring(joined, a.span_start + 1, " +
        "a.span_end - a.span_start) <> element_at(toks, p + 1)"))
    assert(bad.count() === 0L)
  }
}
