package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.Classifier

/** The exact-integer token-vote quality classifier
  * ([[Classifier.trainTokenVotes]]/[[Classifier.scoreTokenVotes]]):
  * discriminative tokens earn ±1, shared vocabulary earns nothing even
  * under class imbalance (the smoothed-rate normalization), ties
  * reject, and the stored-model roundtrip preserves scoring.
  */
class ClassifierSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def labeled = {
    val s = spark
    import s.implicits._
    // class sizes 2:1 — "the" appears once per doc in BOTH classes, so
    // its RATE is equal and it must earn no vote despite raw counts 4:2
    Seq(
      (1L, true, Seq("the", "citation", "summary")),
      (2L, true, Seq("the", "citation", "reference")),
      (3L, true, Seq("the", "citation", "summary")),
      (4L, true, Seq("the", "reference", "summary")),
      (5L, false, Seq("the", "cheap", "pills")),
      (6L, false, Seq("the", "cheap", "click")))
      .toDF("doc_id", "label_good", "toks")
  }

  test("discriminative tokens vote, shared vocabulary does not") {
    val votes = Classifier.trainTokenVotes(labeled, "toks", "label_good")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(votes("citation") === 1L)
    assert(votes("cheap") === -1L)
    assert(votes("pills") === -1L)
    assert(!votes.contains("the"), "equal-rate token must earn no vote")
  }

  test("scoring sums occurrence votes; ties reject") {
    val s = spark
    import s.implicits._
    val votes = Classifier.trainTokenVotes(labeled, "toks", "label_good")
    val test = Seq(
      (10L, Seq("citation", "summary", "noise")), // +2 -> good
      (11L, Seq("cheap", "cheap", "citation")),   // -2 + 1 -> bad
      (12L, Seq("noise", "the")),                 // 0 -> tie -> reject
      (13L, Seq.empty[String]))                   // no tokens at all
      .toDF("doc_id", "toks")
    val got = Classifier.scoreTokenVotes(test, votes, "doc_id", "toks")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    assert(got(10L) === ((2L, true)))
    assert(got(11L) === ((-1L, false)))
    assert(got(12L) === ((0L, false)))
    // a doc with no tokens emits no occurrence rows (explode of an
    // empty array), but the one-verdict-per-doc contract holds: the
    // join-back scores it 0, and ties reject
    assert(got(13L) === ((0L, false)))
  }

  test("repeated-token occurrences each vote (multinomial form)") {
    val s = spark
    import s.implicits._
    val votes = Classifier.trainTokenVotes(labeled, "toks", "label_good")
    val got = Classifier.scoreTokenVotes(
      Seq((20L, Seq("cheap", "cheap", "cheap", "citation", "citation")))
        .toDF("doc_id", "toks"), votes, "doc_id", "toks")
      .head()
    assert(got.getLong(1) === -1L) // 2 - 3
  }

  test("counts are additive: stored-base + batch merge trains the " +
      "identical model to a from-scratch retrain") {
    val s = spark
    import s.implicits._
    val all = labeled
    val base = all.filter(col("doc_id") <= 4L)
    val batch = all.filter(col("doc_id") > 4L)
    val merged = Classifier.votesFromCounts(Classifier.mergeCounts(
      Classifier.tokenCounts(base, "toks", "label_good"),
      Classifier.tokenCounts(batch, "toks", "label_good")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = Classifier.trainTokenVotes(all, "toks", "label_good")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged === full)
  }

  test("streaming gate: streamed verdicts are row-identical to batch " +
      "scoring against the same stored model") {
    val s = spark
    import s.implicits._
    val streamed = SparkEntry.queries("q297_stream_classifier_gate")(
      s, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sorted
    assert(streamed.nonEmpty)
    // the batch answer, from the same query surface (q286 columns
    // projected to the gate's) — the shared-oracle equivalence locally
    val batch = SparkEntry.queries("q286_quality_classifier")(
      s, "/root/testdata/sf0.001").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("score"),
        r.getAs[Boolean]("pred_good"))).sorted
    assert(streamed === batch)
  }

  test("class imbalance alone creates no spurious votes") {
    val s = spark
    import s.implicits._
    // 4:1 doc imbalance, every token at identical per-class RATE
    val df = (1L to 8L).map(i => (i, true, Seq("w", "x"))) ++
      Seq((9L, false, Seq("w", "x")), (10L, false, Seq("w", "x")))
    val votes = Classifier
      .trainTokenVotes(df.toDF("doc_id", "label_good", "toks"),
        "toks", "label_good")
      .collect()
    assert(votes.isEmpty, s"spurious votes: ${votes.mkString(",")}")
  }
}
