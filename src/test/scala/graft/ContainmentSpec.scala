package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.NearDup

/** [[NearDup.ngramContainmentPairs]]: the asymmetric predicate on
  * hand-checkable corpora — direction, the exact-integer floor, and
  * the motivating case symmetric Jaccard misses.
  */
class ContainmentSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def run(docs: Seq[(Long, String)], minPct: Int = 80) = {
    import spark.implicits._
    NearDup.ngramContainmentPairs(docs.toDF("doc_id", "text"),
        "doc_id", "text", n = 3, minPct = minPct, maxDf = 100L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSeq.sorted
  }

  test("an excerpt is contained in its expansion, not vice versa — " +
      "the case symmetric Jaccard dilutes away") {
    val a = "a b c d" // 3-grams: {a b c, b c d}
    val b = "a b c d e f g h i j" // 8 3-grams, superset of a's
    val out = run(Seq(1L -> a, 2L -> b))
    // Jaccard is 2/8 = 0.25 (under q64's 0.5 floor), but containment
    // of doc 1 in doc 2 is 2/2 = 100 %
    assert(out === Seq((1L, 2L, 2L, 2L, 10000L)))
  }

  test("identical docs contain each other (both directions emitted)") {
    val t = "x y z w v"
    val out = run(Seq(1L -> t, 2L -> t))
    assert(out === Seq((1L, 2L, 3L, 3L, 10000L), (2L, 1L, 3L, 3L, 10000L)))
  }

  test("the integer floor is exact: 79 % fails at minPct = 80") {
    // contained side has 100 grams?? keep small: 4 shared of 5 = 80 %
    // passes; 3 of 4 = 75 % fails
    val shared = "a b c d e f" // 4 3-grams
    val contA = s"$shared q" // 5 grams, 4 shared → 80 % exactly
    val out = run(Seq(1L -> contA, 2L -> s"$shared r s t u v w"))
    assert(out.map(x => (x._1, x._2, x._5)) === Seq((1L, 2L, 8000L)))
  }
}
