package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFns
import graft.ops.NearDup

class NearDupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._

  // doc 2 is an exact copy of doc 1; doc 3 a near-copy; doc 4 unrelated.
  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "spark makes big data processing fast and simple for everyone"),
      (2L, "spark makes big data processing fast and simple for everyone"),
      (3L, "spark makes big data processing fast and simple for most people"),
      (4L, "completely different content about cooking pasta at home today")
    ).toDF("doc_id", "text")
  }

  private def withShingles = docs
    .withColumn("shingles", TextFns.shingles("text", 5))
    .select("doc_id", "shingles")

  test("identical documents get identical minhash signatures") {
    val sigs = NearDup.minHashSigs(withShingles, "doc_id", "shingles", 16, "sig")
      .select("doc_id", "sig")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) === sigs(2L))
    assert(sigs(1L) !== sigs(4L))
    assert(sigs(1L).size === 16)
  }

  test("LSH bands surface the duplicate pair; jaccard confirms it") {
    val sigs = NearDup.minHashSigs(withShingles, "doc_id", "shingles", 16, "sig")
    val cand = NearDup.candidatePairs(
      NearDup.bandRows(sigs, "doc_id", "sig", 4, 4, 16), "doc_id")
    val jac = NearDup.jaccard(cand, withShingles, "doc_id", "shingles")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(jac.contains((1L, 2L)))
    assert(jac((1L, 2L)) === 1.0)
    // the near-copy should collide on at least one band too
    assert(jac.keys.exists(p => p == (1L, 3L) || p == (2L, 3L)))
  }

  test("simhash: identical docs agree; hamming NN finds the duplicate") {
    val sigs = NearDup.withSimHash(
        docs.withColumn("toks", TextFns.tokens("text")), "toks", "simhash")
      .select("doc_id", "simhash")
    val byId = sigs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byId(1L) === byId(2L))
    assert(byId(1L).length === 32)
    val nn = NearDup.hammingNN(sigs, "doc_id", "simhash")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(nn(1L) === ((2L, 0L))) // exact copy at hamming 0
    assert(nn(2L)._2 === 0L)
  }

  test("estimated jaccard is 1.0 for identical docs, bounded for others") {
    import org.apache.spark.sql.functions.expr
    val sigs = NearDup.minHashSigs(withShingles, "doc_id", "shingles", 16, "sig")
    val a = sigs.select(col("doc_id").as("id_a"), col("sig").as("sa"))
    val b = sigs.select(col("doc_id").as("id_b"), col("sig").as("sb"))
    val est = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("est", expr(NearDup.estimatedJaccardExpr("sa", "sb", 16)))
      .select("id_a", "id_b", "est")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(est((1L, 2L)) === 1.0) // identical docs, identical signatures
    assert(est.values.forall(v => v >= 0.0 && v <= 1.0))
    assert(est((1L, 4L)) < 0.5) // unrelated docs
  }

  test("grouped codegen simhash is bit-identical to the row-local HOF form") {
    import spark.implicits._
    val corpus = docs.union(Seq((5L, "")).toDF("doc_id", "text"))
      .withColumn("toks", TextFns.tokens("text"))
    val hof = NearDup.withSimHash(corpus, "toks", "simhash")
      .select("doc_id", "simhash")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val grouped = NearDup.simHashSigs(corpus, "doc_id", "toks", "simhash")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(grouped === hof)
    assert(grouped.keySet === Set(1L, 2L, 3L, 4L, 5L)) // empty doc kept
  }

  test("simhash block rows give `blocks` blocks of 32/blocks hex chars") {
    val sigs = NearDup.withSimHash(
        docs.withColumn("toks", TextFns.tokens("text")), "toks", "simhash")
    val four = NearDup.simhashBlockRows(sigs, "doc_id", "simhash")
      .filter(col("doc_id") === 1L).collect()
    assert(four.length === 4)
    assert(four.forall(_.getAs[String]("block").length === 8))
    val eight = NearDup.simhashBlockRows(sigs, "doc_id", "simhash", 8)
      .filter(col("doc_id") === 1L).collect()
    assert(eight.length === 8)
    assert(eight.forall(_.getAs[String]("block").length === 4))
    // the blocks concatenate back to the signature
    val sig = sigs.filter(col("doc_id") === 1L)
      .select("simhash").collect().head.getString(0)
    assert(eight.sortBy(_.getAs[Int]("block_idx"))
      .map(_.getAs[String]("block")).mkString === sig)
  }

  test("radius-bounded NN agrees with brute force restricted to the radius") {
    // pigeonhole completeness: every pair within Hamming ≤ blocks−1
    // shares a block, so the blocked NN must EQUAL the all-pairs NN
    // filtered to the radius — on a corpus with dups, near-dups, and
    // unrelated docs
    val sigs = NearDup.withSimHash(
        docs.withColumn("toks", TextFns.tokens("text")), "toks", "simhash")
      .select("doc_id", "simhash")
    val blocked = NearDup.simhashNnWithinRadius(sigs, "doc_id", "simhash", 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val brute = NearDup.hammingNN(sigs, "doc_id", "simhash")
      .filter(col("hamming") <= 7)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(blocked === brute)
    assert(blocked(1L) === ((2L, 0L))) // exact copy found at hamming 0
  }

  test("ngram jaccard: exact copy scores 1.0, near-copy in (0,1), unrelated absent") {
    val pairs = NearDup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 3, minJaccard = 0.1, maxDf = 100L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(pairs((1L, 2L)) === 1.0)
    val near = pairs((1L, 3L))
    assert(near > 0.0 && near < 1.0)
    // doc 1 has 10 tokens → 8 trigrams, doc 3 has 11 → 9; the first 7
    // positions agree → 7 / (8 + 9 − 7)
    assert(math.abs(near - 7.0 / 10.0) < 1e-12)
    assert(!pairs.keySet.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("ngram jaccard: df cap removes stop-grams from candidates AND sizes") {
    import spark.implicits._
    // every doc shares the ubiquitous prefix; only 1 and 2 share a tail.
    // with the prefix grams capped away (df = 4 > maxDf = 3), the pair
    // (1,2) is scored over tail grams alone and all other pairs vanish.
    val d = Seq(
      (1L, "the quick brown fox jumps alpha beta gamma"),
      (2L, "the quick brown fox jumps alpha beta gamma"),
      (3L, "the quick brown fox jumps delta epsilon zeta"),
      (4L, "the quick brown fox jumps eta theta iota")
    ).toDF("doc_id", "text")
    val capped = NearDup.ngramJaccardPairs(d, "doc_id", "text",
        n = 3, minJaccard = 0.01, maxDf = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3))
      .toMap
    // grams "the quick brown".."jumps delta|alpha|eta *" — the first 3
    // trigrams have df 4 and are capped; (1,2) keep their 3 tail grams
    assert(capped((1L, 2L)) === 1.0)
    // (1,3): tail grams disjoint, shared grams all capped → no pair row
    assert(capped.size === 1)
    // uncapped control: every pair shares the prefix grams → 6 pairs
    val uncapped = NearDup.ngramJaccardPairs(d, "doc_id", "text",
        n = 3, minJaccard = 0.01, maxDf = 100L).count()
    assert(uncapped === 6L)
  }

  test("fraction df cap: resolution rule pinned against the absolute " +
      "form, and the fraction operator equals the absolute one at the " +
      "resolved cap") {
    import spark.implicits._
    // the resolution rule: ceil(fraction * nDocs), floored at 2
    assert(NearDup.dfCapForFraction(1000L, 0.1) === 100L)
    assert(NearDup.dfCapForFraction(50000L, 0.002) === 100L)
    // SCALE-AWARENESS, the reason the form exists: 10x corpus, same
    // fraction -> 10x cap (the absolute form would stay at 100)
    assert(NearDup.dfCapForFraction(500000L, 0.002) === 1000L)
    // ceil, not floor; and the >=2 floor keeps repeated grams findable
    assert(NearDup.dfCapForFraction(1001L, 0.001) === 2L)
    assert(NearDup.dfCapForFraction(100L, 0.0001) === 2L)
    intercept[IllegalArgumentException] {
      NearDup.dfCapForFraction(100L, 0.0)
    }
    intercept[IllegalArgumentException] {
      NearDup.dfCapForFraction(100L, 1.5)
    }
    // operator equivalence: 4 docs, fraction 0.75 -> cap 3 (the same
    // cap the absolute spec above uses), identical pair rows
    val d = Seq(
      (1L, "the quick brown fox jumps alpha beta gamma"),
      (2L, "the quick brown fox jumps alpha beta gamma"),
      (3L, "the quick brown fox jumps delta epsilon zeta"),
      (4L, "the quick brown fox jumps eta theta iota")
    ).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getDouble(3))).toSet
    val frac = rows(NearDup.ngramJaccardPairsByDfFraction(
      d, "doc_id", "text", n = 3, minJaccard = 0.01,
      maxDfFraction = 0.75))
    val abs = rows(NearDup.ngramJaccardPairs(
      d, "doc_id", "text", n = 3, minJaccard = 0.01, maxDf = 3L))
    assert(frac === abs)
    assert(frac.nonEmpty)
    // containment variant delegates through the same resolution
    val fracC = NearDup.ngramContainmentPairsByDfFraction(
      d, "doc_id", "text", n = 3, minPct = 50,
      maxDfFraction = 0.75).collect().toSet.map((r: org.apache.spark.sql.Row) =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val absC = NearDup.ngramContainmentPairs(
      d, "doc_id", "text", n = 3, minPct = 50,
      maxDf = 3L).collect().toSet.map((r: org.apache.spark.sql.Row) =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(fracC === absC)
  }
}
