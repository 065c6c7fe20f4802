package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.SortedWeightedIntersectSum

/** The native weighted merge walk must agree with the reference
  * "explode + group + sum over intersection" computation on every
  * sorted-distinct input, in both evaluation modes, and enforce its
  * alignment contract.
  */
class SortedWeightedIntersectSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._

  private def run(cases: Seq[(Seq[String], Seq[Long], Seq[String])])
      : Seq[(Long, Long)] = {
    import spark.implicits._
    cases.toDF("a", "wa", "b")
      .select(
        SortedWeightedIntersectSum.sum(col("a"), col("wa"), col("b"))
          .as("native"),
        expr("""aggregate(a, 0L, (acc, x) ->
          acc + if(array_contains(b, x),
            element_at(wa, cast(array_position(a, x) as int)), 0L))""")
          .as("ref"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
  }

  test("edge shapes and random pairs match the reference sum") {
    val rnd = new scala.util.Random(7)
    val edge = Seq(
      (Seq.empty[String], Seq.empty[Long], Seq.empty[String]),
      (Seq("a", "b"), Seq(3L, 5L), Seq.empty[String]),
      (Seq("a", "c", "e"), Seq(1L, 2L, 4L), Seq("b", "d", "f")),
      (Seq("a", "b", "c"), Seq(10L, 20L, 30L), Seq("a", "b", "c")),
      (Seq("b", "c"), Seq(7L, 9L), Seq("a", "b", "c", "d")))
    val random = (0 until 100).map { _ =>
      def keys() = Seq.fill(rnd.nextInt(40))(
        "g" + rnd.nextInt(50)).distinct.sorted
      val a = keys()
      (a, a.map(_ => rnd.nextInt(1000).toLong + 1L), keys())
    }
    val got = run(edge ++ random)
    got.foreach { case (native, ref) => assert(native === ref) }
    assert(got.exists(_._1 > 0L), "fixture must produce real overlaps")
  }

  test("multi-byte keys walk in Spark's binary string order") {
    import spark.implicits._
    // sort_array's order IS the walk's contract — build both sides the
    // way the query does and check a mixed ASCII/multi-byte overlap
    val a = Seq("z9", "café", "éclair", "apple").sorted
    val b = Seq("café", "apple", "zulu").sorted
    val wa = a.map(k => k.length.toLong)
    val expected = a.filter(b.contains).map(_.length.toLong).sum
    val got = Seq((a, wa, b)).toDF("a", "wa", "b")
      .select(SortedWeightedIntersectSum.sum(
        sort_array(col("a")), col("wa"), sort_array(col("b"))))
      .head().getLong(0)
    // NOTE: scala .sorted on String is UTF-16 order, which for these
    // BMP keys matches UTF-8 binary order; wa built against the
    // pre-sorted a, so re-sorting a is a no-op and alignment holds
    assert(got === expected)
  }

  test("misaligned weight array is rejected loudly") {
    import spark.implicits._
    val ex = intercept[Exception] {
      Seq((Seq("a", "b"), Seq(1L), Seq("a")))
        .toDF("a", "wa", "b")
        .select(SortedWeightedIntersectSum.sum(col("a"), col("wa"),
          col("b")))
        .collect()
    }
    assert(ex.getMessage != null)
  }

  test("null semantics match SortedIntersectCount: null only when the " +
      "walk reaches one") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, LongType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    def slit(xs: Seq[String]) = Literal(
      ArrayData.toArrayData(xs.map(x =>
        if (x == null) null else UTF8String.fromString(x)).toArray),
      ArrayType(StringType))
    def wlit(xs: Seq[java.lang.Long]) =
      Literal(ArrayData.toArrayData(xs.toArray), ArrayType(LongType))
    // null key reached mid-walk → null
    assert(SortedWeightedIntersectSum(slit(Seq("a", "b")),
      wlit(Seq(1L, 2L)), slit(Seq(null, "b"))).eval(null) === null)
    // right exhausts first → trailing left null never inspected
    assert(SortedWeightedIntersectSum(slit(Seq("c", null)),
      wlit(Seq(1L, 2L)), slit(Seq("a"))).eval(null) === 0L)
    // whole-array null → null
    assert(SortedWeightedIntersectSum(
      Literal(null, ArrayType(StringType)), wlit(Seq(1L)),
      slit(Seq("a"))).eval(null) === null)
  }
}
