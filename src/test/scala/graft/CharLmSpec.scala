package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.CharLm

/** [[graft.ops.CharLm]] on hand-checkable strings: bigram counts,
  * conditional-probability quantization, truncating means, the
  * no-bigram edge, and OOV handling under a foreign model.
  */
class CharLmSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs(ts: (Long, String)*) = {
    import spark.implicits._
    ts.toSeq.toDF("doc_id", "text")
  }

  test("bigram counts are exact") {
    val m = CharLm.trainBigrams(docs(1L -> "abab", 2L -> "ba"), "text")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    // abab: ab, ba, ab; ba: ba → ab×2, ba×2
    assert(m === Set(("a", "b", 2L), ("b", "a", 2L)))
  }

  test("scores are the truncating scaled conditionals") {
    val corpus = docs(1L -> "aab", 2L -> "ab")
    val model = CharLm.trainBigrams(corpus, "text")
    // counts: aa×1, ab×2; tot(a)=3 → q(aa) = 2^20 div 3 = 349525,
    // q(ab) = 2·2^20 div 3 = 699050
    val out = CharLm.score(corpus, "doc_id", "text", model)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out(0) === ((1L, 2L, 349525L + 699050L,
      (349525L + 699050L) / 2)))
    assert(out(1) === ((2L, 1L, 699050L, 699050L)))
  }

  test("an empty model scores everything as fully OOV (sum 0)") {
    val empty = CharLm.trainBigrams(docs(), "text")
    val out = CharLm.score(docs(1L -> "abc"), "doc_id", "text", empty)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((1L, 2L, 0L)))
  }

  test("documents without bigrams are absent; OOV contributes zero") {
    val model = CharLm.trainBigrams(docs(1L -> "ab"), "text")
    val out = CharLm.score(docs(10L -> "x", 11L -> "zz"), "doc_id",
        "text", model)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // "x" has no bigram → absent; "zz" is fully OOV → sum 0
    assert(out.toSeq === Seq((11L, 1L, 0L)))
  }

  test("mixed known/OOV: the OOV bigram still counts in the mean " +
      "divisor (the harshest penalty)") {
    val model = CharLm.trainBigrams(docs(1L -> "ab"), "text")
    // "abz": ab known (q = 2^20 div 1 = 1048576), bz OOV (q = 0)
    // → n = 2, sum = 1048576, avg = 524288 — NOT 1048576/1
    val out = CharLm.score(docs(20L -> "abz"), "doc_id", "text", model)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq((20L, 2L, 1048576L, 524288L)))
  }
}
