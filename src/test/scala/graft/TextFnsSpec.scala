package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFns

class TextFnsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox and the lazy dog"),
      (2L, "der hund und die katze und der vogel"),
      (3L, "xyzzy plugh")
    ).toDF("doc_id", "text")
  }

  test("tokens splits on single spaces") {
    val n = docs.select(size(TextFns.tokens("text")).as("n"))
      .collect().map(_.getInt(0)).toSeq
    assert(n === Seq(8, 8, 2))
  }

  test("shingles are distinct n-grams; short text yields whole text") {
    import spark.implicits._
    val sh = Seq((1L, "abcde"), (2L, "abc")).toDF("doc_id", "text")
      .select(col("doc_id"), TextFns.shingles("text", 5).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(sh(1L) === Seq("abcde"))
    assert(sh(2L) === Seq("abc"))
  }

  test("languageId picks the dominant stopword profile, 'und' when none") {
    val got = docs
      .withColumn("toks", TextFns.tokens("text"))
      .select(col("doc_id"), TextFns.languageId("toks").as("p"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "en", 2L -> "de", 3L -> "und"))
  }

  test("fingerprint is whitespace/case-insensitive") {
    import spark.implicits._
    val fp = Seq((1L, "Hello  World"), (2L, "hello world "))
      .toDF("doc_id", "text")
      .select(TextFns.fingerprint("text").as("f"))
      .collect().map(_.getString(0)).toSeq
    assert(fp.distinct.size === 1)
  }

  test("qualityScore stays within [0, 1]") {
    val q = docs
      .withColumn("toks", TextFns.tokens("text"))
      .select(TextFns.qualityScore("text", "toks").as("q"))
      .collect().map(_.getDouble(0))
    assert(q.forall(v => v >= 0.0 && v <= 1.0))
  }

  test("withLanguageId agrees with the single-Column languageId form") {
    val base = docs.withColumn("toks", TextFns.tokens("text"))
    val a = base.select(col("doc_id"), TextFns.languageId("toks").as("p"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = TextFns.withLanguageId(base, "toks", "p")
      .select("doc_id", "p")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a === b)
  }

  test("redactPii replaces emails and phone runs, leaves clean text alone") {
    import spark.implicits._
    val rows = Seq(
      (1L, "contact alice.smith+x@example.co.uk for details"),
      (2L, "call +1 (555) 123-4567 or 030-1234567 today"),
      (3L, "mail bob@ex.io or ring 555.867.5309 now"),
      (4L, "the quick brown fox jumps over nothing"))
      .toDF("id", "text")
      .select(col("id"), TextFns.redactPii(col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows(1L) === "contact <EMAIL> for details")
    assert(rows(2L) === "call <PHONE> or <PHONE> today")
    assert(rows(3L) === "mail <EMAIL> or ring <PHONE> now")
    assert(rows(4L) === "the quick brown fox jumps over nothing")
  }

  test("repetition signals survive single-token documents (no bigrams)") {
    // sequence(1, 0) in Spark is DESCENDING [1, 0] — an unguarded
    // bigram transform would index element 0 and crash on any
    // space-free document
    import spark.implicits._
    val r = Seq((1L, "loneword")).toDF("doc_id", "text")
      .withColumn("toks", TextFns.tokens("text"))
      .withColumn("bg", TextFns.wordBigrams("toks"))
      .select(size(col("bg")).as("nbg"), TextFns.dupTokenRatio("toks").as("d"),
        TextFns.topGramShare("bg").as("s"))
      .head()
    assert(r.getInt(0) === 0)
    assert(r.getDouble(1) === 0.0)
    assert(r.isNullAt(2)) // no grams → share undefined, not a crash
  }

  test("repetition signals: dup-token ratio and top-bigram share") {
    import spark.implicits._
    val got = Seq(
      (1L, "a b a b a b"),       // 2 distinct of 6; "a b" bigram 3 of 5
      (2L, "v w x y z"))         // all distinct; every bigram unique
      .toDF("doc_id", "text")
      .withColumn("toks", TextFns.tokens("text"))
      .withColumn("bg", TextFns.wordBigrams("toks"))
      .select(col("doc_id"), TextFns.dupTokenRatio("toks").as("d"),
        TextFns.topGramShare("bg").as("s"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    assert(got(1L)._1 === 1.0 - 2.0 / 6.0)
    assert(got(1L)._2 === 3.0 / 5.0)
    assert(got(2L)._1 === 0.0)
    assert(got(2L)._2 === 1.0 / 4.0)
  }

  test("maskDigits preserves shape, masks every digit") {
    import spark.implicits._
    val got = Seq(("Customer#000123456", 0)).toDF("s", "x")
      .select(TextFns.maskDigits(col("s")).as("m")).head().getString(0)
    assert(got === "Customer##########")
  }

  test("stripMarkup: comments/head/script/style removed WITH content, " +
      "tags stripped, entities decoded, whitespace collapsed") {
    import spark.implicits._
    def strip(html: String): String =
      Seq((html, 0)).toDF("h", "x")
        .select(TextFns.stripMarkup(col("h")).as("t")).head().getString(0)
    assert(strip("<!DOCTYPE html><html><!-- note --><head><title>T" +
      "</title></head><body><script>var x = '<p>';</script>" +
      "<style>p{}</style><p>hello <b>world</b></p></body></html>")
      === "hello world")
    // content INSIDE script/style never leaks (tag-strip alone would)
    assert(strip("<body><script>leak1</script><style>leak2</style>a</body>")
      === "a")
    // multi-line blocks: (?s) dotall really applies
    assert(strip("<head>\nx\ny\n</head><p>k</p>") === "k")
    // entity decode, &amp; last so &amp;#32; cannot double-decode
    assert(strip("a&#32;b &lt;tag&gt; c &amp;#32; d")
      === "a b <tag> c &#32; d")
    // adjacent blocks don't glue words together (tags become spaces)
    assert(strip("<p>one</p><p>two</p>") === "one two")
  }
}
