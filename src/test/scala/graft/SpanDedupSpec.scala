package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.SpanDedup

/** [[SpanDedup.excise]]: first-occurrence retention, overlap merge,
  * in-document repeats, island counting, reconstruction, and the
  * sub-n-tokens / unaffected-doc exclusions.
  */
class SpanDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val n = 4

  private def run(docs: Seq[(Long, String)]) =
    SpanDedup.excise(docs.toDF("doc_id", "text"), "doc_id", "text", n)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap

  test("a shared n-token run survives in the first doc only") {
    val out = run(Seq(
      1L -> "x1 x2 a b c d y1 y2",
      2L -> "z1 a b c d z2 z3"))
    assert(!out.contains(1L), "canonical doc untouched")
    assert(out(2L) === ((7L, 4L, 1L, "z1 z2 z3")))
  }

  test("a repeat longer than n excises as ONE merged span (the " +
      "overlapping-window union equals the maximal repeat)") {
    val out = run(Seq(
      1L -> "p1 a b c d e f p2",
      2L -> "q1 q2 a b c d e f"))
    // the 6-token repeat = 3 overlapping 4-grams; union = one island
    assert(out(2L) === ((8L, 6L, 1L, "q1 q2")))
  }

  test("two separate repeats in one doc count as two spans") {
    val out = run(Seq(
      1L -> "a b c d m1 m2 m3 w x y z",
      2L -> "a b c d k1 k2 k3 w x y z"))
    assert(out(2L) === ((11L, 8L, 2L, "k1 k2 k3")))
  }

  test("an IN-document repeat keeps only the earlier occurrence") {
    val out = run(Seq(
      1L -> "a b c d u1 u2 a b c d"))
    assert(out(1L) === ((10L, 4L, 1L, "a b c d u1 u2")))
  }

  test("docs shorter than n tokens and docs with no repeats are " +
      "absent from the report") {
    val out = run(Seq(
      1L -> "a b c",
      2L -> "unique tokens only here nothing shared at all",
      3L -> "s1 s2 s3 s4 s5 t1 t2 t3",
      4L -> "v0 s2 s3 s4 s5 t1 t2 t3"))
    assert(out.keySet === Set(4L))
    // doc 4's 7-token repeat of doc 3's suffix excised as one span
    assert(out(4L) === ((8L, 7L, 1L, "v0")))
  }

  test("a fully-duplicated doc reconstructs to the empty string") {
    val out = run(Seq(
      1L -> "a b c d e",
      2L -> "a b c d e"))
    assert(out(2L) === ((5L, 5L, 1L, "")))
    assert(!out.contains(1L))
  }

  test("multi-space runs produce no empty tokens (the split-filter " +
      "convention)") {
    val out = run(Seq(
      1L -> "a  b c   d e",
      2L -> "a b c d e"))
    // identical after tokenization; doc 2 is the later occurrence by id
    assert(out(2L) === ((5L, 5L, 1L, "")))
  }
}
