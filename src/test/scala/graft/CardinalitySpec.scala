package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Cardinality

class CardinalitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("HLL estimate lands within the rsd bound on a high-cardinality column") {
    import spark.implicits._
    // 100k distinct longs at rsd=0.05: the documented HLL++ standard
    // deviation is 5%, so 2σ = 10% is a conservative measured bound
    // (the q102 gate claims 3σ = 15%; this spec pins the tighter one).
    val df = spark.range(100000L).toDF("id")
    val r = Cardinality.profile(df, Seq("id")).collect().head
    assert(r.getAs[Long]("n_rows") === 100000L)
    assert(r.getAs[Long]("exact_distinct") === 100000L)
    val relError = r.getAs[Double]("rel_error")
    assert(relError <= 0.10,
      f"HLL rel_error $relError%.4f exceeded 2x rsd on 100k distinct")
  }

  test("low-cardinality columns are exact (HLL sparse mode) and multi-column profile unions") {
    import spark.implicits._
    val df = Seq(("a", 1L), ("b", 2L), ("a", 3L)).toDF("k", "v")
    val rows = Cardinality.profile(df, Seq("k", "v"), 0.05, "t")
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows("t.k") === ((3L, 2L, 2L)))
    assert(rows("t.v") === ((3L, 3L, 3L)))
  }
}
