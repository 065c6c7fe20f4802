package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.SortedIntersectCount

/** The native merge-walk intersection count must agree with
  * `size(array_intersect(...))` on every sorted-distinct input, in
  * BOTH evaluation modes (codegen and interpreted).
  */
class SortedIntersectSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._

  private def run(pairs: Seq[(Seq[Long], Seq[Long])]): Seq[(Long, Long)] = {
    import spark.implicits._
    pairs.toDF("a", "b")
      .select(
        SortedIntersectCount.count(col("a"), col("b")).as("native"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("ref"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
  }

  test("edge shapes: empty, disjoint, identical, contained, interleaved") {
    val cases = Seq(
      (Seq.empty[Long], Seq.empty[Long]),
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(1L, 3L, 5L), Seq(2L, 4L, 6L)),
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)),
      (Seq(2L, 3L), Seq(1L, 2L, 3L, 4L)),
      (Seq(-5L, 0L, 7L, 9L), Seq(-5L, 1L, 9L, 11L)),
      (Seq(Long.MinValue, 0L, Long.MaxValue), Seq(Long.MinValue, Long.MaxValue)))
    run(cases).foreach { case (native, ref) => assert(native === ref) }
  }

  test("matches array_intersect on 200 random sorted-distinct pairs") {
    val rnd = new scala.util.Random(42)
    val cases = (0 until 200).map { _ =>
      def arr() = Seq.fill(rnd.nextInt(60))(rnd.nextInt(80).toLong)
        .distinct.sorted
      (arr(), arr())
    }
    val got = run(cases)
    got.foreach { case (native, ref) => assert(native === ref) }
    assert(got.exists(_._1 > 0), "fixture must produce real overlaps")
  }

  test("interpreted eval agrees with codegen") {
    import org.apache.spark.sql.graft.ColumnBridge
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, LongType}
    def lit(xs: Seq[Long]) =
      Literal(ArrayData.toArrayData(xs.toArray), ArrayType(LongType))
    val e = SortedIntersectCount(lit(Seq(1L, 4L, 7L, 9L)),
      lit(Seq(2L, 4L, 9L, 12L)))
    assert(e.eval(null) === 2L)
    val empty = SortedIntersectCount(lit(Seq.empty), lit(Seq(1L)))
    assert(empty.eval(null) === 0L)
  }

  test("null elements: null only when the merge walk reaches one") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, LongType}
    def lit(xs: Seq[java.lang.Long]) =
      Literal(ArrayData.toArrayData(xs.toArray), ArrayType(LongType))
    def l(x: Long): java.lang.Long = java.lang.Long.valueOf(x)
    // the walk hits the null on the right before either side exhausts
    val hit = SortedIntersectCount(
      lit(Seq(l(1L), l(2L))), lit(Seq(null, l(2L))))
    assert(hit.eval(null) === null)
    // the left exhausts at 3 < 5 — [5, null]'s null is never inspected
    val missed = SortedIntersectCount(
      lit(Seq(l(1L), l(2L), l(3L))), lit(Seq(l(5L), null)))
    assert(missed.eval(null) === 0L)
    // whole-array null stays null regardless of the other side
    val wholeNull = SortedIntersectCount(
      Literal(null, ArrayType(LongType)), lit(Seq(l(1L))))
    assert(wholeNull.eval(null) === null)
  }
}
