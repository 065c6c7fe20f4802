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

  test("TokenSpans null semantics: null array -> null, null element -> null") {
    import spark.implicits._
    val out = Seq(
      (1, Some(Seq(Some("ab"), Some("c")))),
      (2, None), // null array
      (3, Some(Seq(Some("ab"), None))) // poisoned element
    ).toDF("id", "toks")
      .withColumn("anns", Nested.tokenAnnotations("toks"))
      .select("id", "anns").collect().map(r => r.getInt(0) -> r.isNullAt(1))
      .toMap
    assert(out === Map(1 -> false, 2 -> true, 3 -> true))
  }

  test("TokenSpans interpreted eval agrees with the codegen path") {
    // eval() drives the interpreted branch directly; the DataFrame
    // paths above run through codegen (build() is shared, but the
    // null/return plumbing differs between the two branches)
    import graft.expressions.TokenSpans
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    def lit(toks: Seq[String]) = Literal.create(
      new GenericArrayData(toks.map(t =>
        if (t == null) null else UTF8String.fromString(t)).toArray[Any]),
      ArrayType(StringType))
    val ok = TokenSpans(lit(Seq("ab", "cde"))).eval(null)
      .asInstanceOf[GenericArrayData]
    assert(ok.numElements() === 2)
    val r1 = ok.getStruct(1, 3)
    assert((r1.getInt(0), r1.getInt(1), r1.getUTF8String(2).toString) ===
      ((3, 6, "short")))
    assert(TokenSpans(lit(Seq("ab", null))).eval(null) === null)
  }
}
