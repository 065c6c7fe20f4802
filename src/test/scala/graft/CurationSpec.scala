package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Contamination, Sampling}

/** Specs for the corpus-curation operators: benchmark-contamination
  * detection and deterministic stratified sampling.
  */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._

  test("wordGrams: sliding distinct n-grams; short text yields its whole run") {
    import spark.implicits._
    val g = Seq((1L, "a b c d"), (2L, "a b")).toDF("id", "text")
      .withColumn("toks", split(col("text"), " "))
      .select(col("id"), Contamination.wordGrams("toks", 3).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(g(1L) === Seq("a b c", "b c d"))
    assert(g(2L) === Seq("a b"))
  }

  test("sharedGramCounts finds the planted overlap and only it") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),      // shares 2 grams w/ eval
      (2L, "zeta eta theta iota kappa"),           // no overlap
      (100L, "alpha beta gamma delta other"))      // eval doc
      .toDF("doc_id", "text")
    val hits = Contamination.sharedGramCounts(
        docs.filter(col("doc_id") < 100),
        docs.filter(col("doc_id") === 100),
        "doc_id", "text", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // "alpha beta gamma delta" is the one shared 4-gram
    assert(hits === Map((1L, 100L) -> 1L))
  }

  test("approx_count_distinct tracks exact distinct within its rsd bound") {
    // the approximate-distinct branch of the profiling family: HLL++
    // with rsd=0.05 must land within ~3σ of the exact distinct count.
    // Measured (like the ANN recall and percentile-error specs) so the
    // at-scale swap has a contract.
    import spark.implicits._
    val df = (0 until 20000).map(i => (i.toLong, (i * 7919) % 4231))
      .toDF("id", "k")
    val exact = df.select(countDistinct("k")).head().getLong(0)
    val approx = df.select(approx_count_distinct("k", 0.05)).head().getLong(0)
    assert(exact === 4231)
    assert(math.abs(approx - exact).toDouble / exact < 0.15,
      s"approx $approx vs exact $exact")
  }

  test("stratified sample is deterministic, monotone in rate, near the rate") {
    import spark.implicits._
    val rows = (0 until 2000).map(i =>
      (i.toLong, if (i % 2 == 0) "en" else "de"))
    val df = rows.toDF("doc_id", "lang")
    def sample(rates: Map[String, Int]) =
      Sampling.stratifiedHashSample(df, "doc_id", "lang", rates, 0, "smp")
        .collect().map(_.getLong(0)).toSet
    val s1 = sample(Map("en" -> 5000, "de" -> 1000))
    val s2 = sample(Map("en" -> 5000, "de" -> 1000))
    assert(s1 === s2) // pure function of (salt, key, stratum)
    // sampled fraction within ±10% of the configured rate per stratum
    val en = s1.count(_ % 2 == 0) / 1000.0
    val de = s1.count(_ % 2 == 1) / 1000.0
    assert(math.abs(en - 0.5) < 0.05, s"en rate $en")
    assert(math.abs(de - 0.1) < 0.05, s"de rate $de")
    // raising a rate only ADDS members of that stratum (hash threshold
    // is monotone); the other stratum is untouched
    val s3 = sample(Map("en" -> 7000, "de" -> 1000))
    assert(s1.subsetOf(s3))
    assert(s3.count(_ % 2 == 1) === s1.count(_ % 2 == 1))
  }
}
