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

  test("simhash block rows give 4 blocks of 8 hex chars") {
    val sigs = NearDup.withSimHash(
        docs.withColumn("toks", TextFns.tokens("text")), "toks", "simhash")
    val blocks = NearDup.simhashBlockRows(sigs, "doc_id", "simhash")
      .filter(col("doc_id") === 1L).collect()
    assert(blocks.length === 4)
    assert(blocks.forall(_.getAs[String]("block").length === 8))
  }
}
