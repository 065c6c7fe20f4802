package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.ops.{Bpe, ModelStore}

/** [[graft.ops.Bpe]] on hand-checkable vocabularies: the greedy
  * highest-count merge order, the lexicographic tiebreak, leftmost-
  * nonoverlapping contraction, early exhaustion, word-boundary
  * isolation in application, and the ModelStore roundtrip.
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def wordsDf(ws: (String, Long)*) = {
    import spark.implicits._
    ws.toSeq.toDF("w", "cnt")
  }

  test("merge order follows weighted pair counts, building on merges") {
    // aaab×3, ab×2: round 1 (a,a)@6 beats (a,b)@5; round 2 (a,b)@5
    // (aaab is now [aa,a,b]); round 3 fuses the built symbols (aa,ab)
    val m = Bpe.train(wordsDf("aaab" -> 3L, "ab" -> 2L), "w", "cnt", 3)
    assert(m === Seq(Bpe.Merge(1, "a", "a"), Bpe.Merge(2, "a", "b"),
      Bpe.Merge(3, "aa", "ab")))
  }

  test("count ties break to the lexicographically smallest pair") {
    val m = Bpe.train(wordsDf("ba" -> 1L, "ab" -> 1L), "w", "cnt", 1)
    assert(m === Seq(Bpe.Merge(1, "a", "b")))
  }

  test("training stops early when no adjacent pairs remain") {
    // single-char words have no pairs after round 1 exhausts "ab"
    val m = Bpe.train(wordsDf("ab" -> 1L, "c" -> 5L), "w", "cnt", 4)
    assert(m === Seq(Bpe.Merge(1, "a", "b")))
  }

  test("application is leftmost-nonoverlapping and word-isolated") {
    import spark.implicits._
    val merges = Seq(Bpe.Merge(1, "a", "a"))
    val out = Seq("aaa a aab").toDF("text")
      .withColumn("toks", expr("filter(split(text, ' '), t -> t <> '')"))
      .withColumn("seq", Bpe.docSeq("toks"))
      .withColumn("seq2", Bpe.applyMerges("seq", merges))
      .select(Bpe.symbolCount("seq").as("before"),
        Bpe.symbolCount("seq2").as("after"))
      .head()
    // aaa → (aa)(a)=2, a → 1, aab → (aa)(b)=2: the lone 'a' never
    // fuses across the word gap with the next word's 'a'
    assert(out.getLong(0) === 7L)
    assert(out.getLong(1) === 5L)
  }

  test("ModelStore merge roundtrip preserves chain and order") {
    val merges = Seq(Bpe.Merge(1, "t", "h"), Bpe.Merge(2, "th", "e"))
    val path = graft.Scratch.register(
      s"${System.getProperty("java.io.tmpdir")}/graft_bpe_spec_" +
        ProcessHandle.current().pid())
    ModelStore.saveMerges(spark, path, merges)
    assert(ModelStore.loadMerges(spark, path) === merges)
  }
}
