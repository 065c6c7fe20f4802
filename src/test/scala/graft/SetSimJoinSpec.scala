package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.SetSimJoin

/** The prefix-filter pruning must be LOSSLESS: every pair with true
  * Jaccard ≥ t comes back, with the exact intersection size — checked
  * against a driver-side brute force over all pairs, plus the edge
  * cases the prefix formula has to get right (identical docs, docs
  * shorter than the shingle width, threshold 1.0).
  */
class SetSimJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def grams(text: String, n: Int): Set[String] = {
    val t = text.split(" ")
    if (t.length < n) Set(t.mkString(" "))
    else t.sliding(n).map(_.mkString(" ")).toSet
  }

  private def brute(docs: Seq[(Long, String)], n: Int,
      t: Double): Set[(Long, Long, Long)] =
    (for {
      (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
      ga = grams(ta, n); gb = grams(tb, n)
      inter = (ga & gb).size
      j = inter.toDouble / (ga.size + gb.size - inter)
      if j >= t
    } yield (ia, ib, inter.toLong)).toSet

  private def run(docs: Seq[(Long, String)], n: Int,
      t: Double): Set[(Long, Long, Long)] = {
    import spark.implicits._
    SetSimJoin.prefixJaccardPairs(docs.toDF("doc_id", "text"),
        "doc_id", "text", n, t)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
  }

  private val corpus = Seq(
    1L -> "a b c d e f g h",
    2L -> "a b c d e f g x",     // near-dup of 1
    3L -> "a b c d e f g h",     // exact dup of 1
    4L -> "p q r s t u v w",     // disjoint
    5L -> "p q r s t u v y",     // near-dup of 4
    6L -> "m n",                 // shorter than the shingle width
    7L -> "m n")                 // its exact dup

  test("matches brute force at t=0.5 (no false negatives, none extra)") {
    assert(run(corpus, n = 3, t = 0.5) === brute(corpus, 3, 0.5))
  }

  test("matches brute force at a high threshold") {
    assert(run(corpus, n = 3, t = 0.9) === brute(corpus, 3, 0.9))
  }

  test("t=1.0 returns exactly the identical-set pairs") {
    val out = run(corpus, n = 3, t = 1.0)
    assert(out === Set((1L, 3L, 6L), (6L, 7L, 1L)))
  }

  test("unigram shingles against brute force") {
    assert(run(corpus, n = 1, t = 0.5) === brute(corpus, 1, 0.5))
  }

  test("pruning is lossless on a skewed corpus (shared stop-grams)") {
    // every doc shares the 'the of and' stop tail — the high-df grams
    // a df-cap would drop; prefix filtering must still return every
    // qualifying pair exactly
    val skew = (0L until 12L).map { i =>
      i -> (s"w$i x$i y$i z${i % 3} the of and")
    }
    assert(run(skew, n = 2, t = 0.3) === brute(skew, 2, 0.3))
  }

  private def bruteCross(r: Seq[(Long, String)], s: Seq[(Long, String)],
      n: Int, t: Double): Set[(Long, Long, Long)] =
    (for {
      (ir, tr) <- r; (is, ts) <- s
      gr = grams(tr, n); gs = grams(ts, n)
      inter = (gr & gs).size
      j = inter.toDouble / (gr.size + gs.size - inter)
      if j >= t
    } yield (ir, is, inter.toLong)).toSet

  private def runCross(r: Seq[(Long, String)], s: Seq[(Long, String)],
      n: Int, t: Double): Set[(Long, Long, Long)] = {
    import spark.implicits._
    SetSimJoin.crossJaccardPairs(r.toDF("doc_id", "text"),
        s.toDF("doc_id", "text"), "doc_id", "text", n, t)
      .collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
      .toSet
  }

  test("cross join matches brute force — incl. ids shared across " +
      "sides and a gram rare on one side, common on the other") {
    // side s floods 'a b' (common there, rare in r): a PER-SIDE df
    // ordering would push it out of s-prefixes and lose (1, 10); the
    // union ordering must keep the pair. id 1 exists on both sides
    // with different text — sides are distinct corpora.
    val r = Seq(1L -> "a b c d e", 2L -> "p q r s t")
    val s = Seq(10L -> "a b c d x", 11L -> "a b m", 12L -> "a b n",
      13L -> "a b o", 1L -> "p q r s u")
    assert(runCross(r, s, n = 2, t = 0.4) === bruteCross(r, s, 2, 0.4))
    assert(runCross(r, s, n = 2, t = 0.4).contains((1L, 10L, 3L)))
  }

  test("cross join at t=1.0 returns exactly cross-side identical sets") {
    val r = Seq(1L -> "a b c", 2L -> "x y z")
    val s = Seq(5L -> "a b c", 6L -> "x y w")
    assert(runCross(r, s, n = 2, t = 1.0) === Set((1L, 5L, 2L)))
  }

  test("FromGrams over word-gram hashes is exactly prefixJaccardPairs") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq(1L -> "a b c d e f", 2L -> "a b c d e g",
      3L -> "x y z w v u").toDF("doc_id", "text")
    val viaDocs = SetSimJoin
      .prefixJaccardPairs(docs, "doc_id", "text", n = 2, minJaccard = 0.4)
      .select("id_a", "id_b", "n_shared").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val grams = docs
      .select(col("doc_id").as("__id"), split(col("text"), " ").as("__t"))
      .select(col("__id"), explode(
        graft.ops.Contamination.wordGrams("__t", 2)).as("__g"))
      .select(col("__id"), xxhash64(col("__g")).as("__gh"))
    val viaGrams = SetSimJoin.prefixJaccardPairsFromGrams(grams, 0.4)
      .select("id_a", "id_b", "n_shared").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaDocs === viaGrams)
  }

  test("char-shingle truth and word-gram truth are DIFFERENT spaces — " +
      "the q192 ground truth must use the sets its signatures sketch") {
    // two docs sharing most 5-char shingles (30 of 40 long distinct
    // words intact) but NO shared 5-word gram (every 5-word window
    // spans a substituted slot at i % 4 == 0) — char-shingle-similar,
    // word-gram-dissimilar
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val words = (0 until 40).map(i => s"w${i}longstablewordbody")
    val rotated = words.zipWithIndex.map { case (w, i) =>
      if (i % 4 == 0) s"qq$i" else w
    }
    val docs = Seq(1L -> words.mkString(" "), 2L -> rotated.mkString(" "))
      .toDF("doc_id", "text")
    val wordTruth = SetSimJoin
      .prefixJaccardPairs(docs, "doc_id", "text", n = 5, minJaccard = 0.5)
      .count()
    val shingleGrams = docs
      .select(col("doc_id").as("__id"), explode(
        graft.functions.TextFns.shingles("text", 5)).as("__sh"))
      .select(col("__id"), xxhash64(col("__sh")).as("__gh"))
    val shingleTruth = SetSimJoin
      .prefixJaccardPairsFromGrams(shingleGrams, 0.5).count()
    assert(wordTruth === 0L,
      "every 5-word gram spans a substitution — word-gram truth empty")
    assert(shingleTruth === 1L,
      "the pair IS a near-dup in the char-shingle space the MinHash sketches")
  }
}
