package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.ParagraphDedup

class ParagraphDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("shared paragraph across two distinct documents is removed from the later one") {
    import spark.implicits._
    // parLen=2: doc 1 = ["a b", "c d"], doc 2 = ["x y", "c d"] — the
    // documents are DISTINCT (document-level dedup would touch
    // neither), but they share the "c d" boilerplate segment; doc 2's
    // copy must be dropped (first occurrence = (1, 1) wins).
    val docs = Seq((1L, "a b c d"), (2L, "x y c d")).toDF("doc_id", "text")
    val got = ParagraphDedup.dedupSummary(docs, "doc_id", "text", 2)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val md5 = java.security.MessageDigest.getInstance("MD5")
    def h(s: String) = md5.digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(got === Array(
      (1L, 2L, 2L, h("a b c d")),
      (2L, 2L, 1L, h("x y"))))
  }

  test("decisions keep the first occurrence by (doc_id, par_idx)") {
    import spark.implicits._
    // doc 5 repeats its own first paragraph at index 2: the in-document
    // repeat is also a dup (published paragraph dedup removes
    // boilerplate regardless of which document repeats it).
    val docs = Seq((5L, "a b c d a b"), (9L, "a b z z"))
      .toDF("doc_id", "text")
    val got = ParagraphDedup.decisions(docs, "doc_id", "text", 2)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getBoolean(2)).toMap
    assert(got === Map(
      (5L, 0) -> true, (5L, 1) -> true, (5L, 2) -> false,
      (9L, 0) -> false, (9L, 1) -> true))
  }

  test("incremental decisions separate history dups from batch-internal dups") {
    import spark.implicits._
    // history holds "a b"; batch doc 10 = ["a b", "c d"], doc 11 =
    // ["c d", "e f"]: "a b" drops as a history dup, doc 11's "c d"
    // drops as a batch dup (doc 10 got there first), the rest keep.
    val hist = Seq((1L, "a b")).toDF("doc_id", "text")
    val batch = Seq((10L, "a b c d"), (11L, "c d e f"))
      .toDF("doc_id", "text")
    val got = graft.ops.ParagraphDedup
      .incrementalDecisions(hist, batch, "doc_id", "text", 2)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getBoolean(2), r.getBoolean(3))).toMap
    assert(got === Map(
      (10L, 0) -> ((true, true)),   // "a b": in history (and first in batch)
      (10L, 1) -> ((false, true)),  // "c d": fresh, first
      (11L, 0) -> ((false, false)), // "c d": fresh, but doc 10 won
      (11L, 1) -> ((false, true)))) // "e f": fresh, first
  }

  test("boilerplate policy removes every copy, first occurrence included") {
    import spark.implicits._
    // "c d" appears in docs 1 and 2 (cross-doc boilerplate → ALL copies
    // go, unlike dedupSummary which keeps doc 1's); "a b" repeats only
    // WITHIN doc 1 (docfreq 1 → boilerplate policy keeps both copies).
    val docs = Seq((1L, "a b c d a b"), (2L, "x y c d"))
      .toDF("doc_id", "text")
    val got = ParagraphDedup
      .boilerplateSummary(docs, "doc_id", "text", 2, 2)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val md5 = java.security.MessageDigest.getInstance("MD5")
    def h(s: String) = md5.digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(got === Array(
      (1L, 3L, 1L, h("a b a b")),
      (2L, 2L, 1L, h("x y"))))
  }

  test("short tail paragraph and empty segments are handled") {
    import spark.implicits._
    // 5 tokens at parLen=2 → paragraphs "a b", "c d", "e" (tail keeps
    // its shorter form and still dedups against an identical tail)
    val docs = Seq((1L, "a b c d e"), (2L, "e")).toDF("doc_id", "text")
    val got = ParagraphDedup.dedupSummary(docs, "doc_id", "text", 2)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got === Array((1L, 3L, 3L), (2L, 1L, 0L)))
  }
}
