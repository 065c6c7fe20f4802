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

  // --- round-10 curation queries, exercised on adversarial fixtures ---

  private def fixtureDir(name: String): String = {
    val d = s"${System.getProperty("java.io.tmpdir")}/graft_cur_$name"
    new java.io.File(d).mkdirs()
    d
  }

  test("q242: normalized screen recovers formatting-mangled overlap " +
      "the raw screen misses") {
    import spark.implicits._
    val dir = fixtureDir("q242")
    // doc 50 is the eval holdout (%50==0); doc 1 shares the 4-gram
    // "alpha beta gamma delta" with it, doc 2 shares nothing.
    Seq((1L, "alpha beta gamma delta other"),
        (2L, "zeta eta theta iota kappa"),
        (50L, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // the RAW screen against the formatted eval text finds NOTHING —
    // that is the failure mode q242 exists to close
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val formattedEval = docs.filter(col("doc_id") === 50L)
      .select(col("doc_id"),
        expr("concat(upper(array_join(split(text, ' '), ', ')), '.')")
          .as("text"))
    val rawHits = Contamination.sharedGramCounts(
      docs.filter(col("doc_id") =!= 50L), formattedEval,
      "doc_id", "text", 4).count()
    assert(rawHits === 0L, "raw screen must miss the formatted eval set")
    // the normalized screen recovers exactly the true overlap
    val got = SparkEntry.queries("q242_norm_decontam")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got === Map((1L, 50L) -> 1L))
  }

  test("q238: pow-2 bucket boundaries are exact — a 16-token doc pads " +
      "zero, 17 jumps to 32, an over-cap doc truncates to 4096") {
    import spark.implicits._
    val dir = fixtureDir("q238")
    def words(n: Int): String = (1 to n).map(i => s"w$i").mkString(" ")
    Seq((1L, words(16)), (2L, words(17)), (3L, words(5000)))
      .toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q238_length_buckets")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // bucket 16: one doc, 16 tokens, zero padding
    assert(got(16L) === ((1L, 16L, 0L)))
    // bucket 32: the 17-token doc pads 15
    assert(got(32L) === ((1L, 17L, 15L)))
    // cap: 5000 tokens truncate to eff=4096 — zero padding, bucket 4096
    assert(got(4096L) === ((1L, 4096L, 0L)))
  }

  test("q239: repeat cap binds on the scarce source, deficit is " +
      "non-negative and exact") {
    import spark.implicits._
    val dir = fixtureDir("q239")
    def words(n: Int): String = (1 to n).map(_ => "w").mkString(" ")
    // source a: 1000 tokens, source b: 100 → tot=1100, ideal=1100 each;
    // a grants 1.1 epochs (uncapped, deficit 0), b caps at 4 epochs
    // (achieved 400, deficit 700)
    (Seq((1L, words(1000), "a")) ++ Seq((2L, words(100), "b")))
      .toDF("doc_id", "text", "source").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q239_epoch_schedule")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    assert(got("a") === ((1000L, 1100L, 1100000L, 1100L, 0L)))
    assert(got("b") === ((100L, 1100L, 4000000L, 400L, 700L)))
  }

  test("q240: a k-large but sensitive-homogeneous group fails l = 3 — " +
      "the homogeneity attack k-anonymity cannot see") {
    import spark.implicits._
    val dir = fixtureDir("q240")
    // nation 0 / BUILDING: 10 rows, ALL 'mid' band (homogeneous);
    // nation 0 / AUTO: 3 rows spanning all three bands
    val cust =
      (1 to 10).map(i => (i.toLong, 0L, "BUILDING", 100.0 * i)) ++
      Seq((11L, 0L, "AUTO", -50.0), (12L, 0L, "AUTO", 100.0),
        (13L, 0L, "AUTO", 9000.0))
    cust.toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/customer.parquet")
    Seq((0L, "ALGERIA")).toDF("n_nationkey", "n_name").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    val got = SparkEntry.queries("q240_l_diversity")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(got(("ALGERIA", "BUILDING")) === ((10L, 1L, false)),
      "10 rows sharing one band must fail l-diversity despite k=10")
    assert(got(("ALGERIA", "AUTO")) === ((3L, 3L, true)))
  }

  test("q241: session paths truncate at 8 turns but count every event; " +
      "a 31-minute gap starts a new session") {
    import spark.implicits._
    val dir = fixtureDir("q241")
    // user 1: 10 events 1 min apart (one session, path of 8, ne=10);
    // user 2: 2 events 31 min apart (two 1-event sessions)
    val base = 1700000000000L
    val ev =
      (0 until 10).map(i =>
        (i.toLong, new java.sql.Timestamp(base + i * 60000L), 1L, s"e$i")) ++
      Seq((100L, new java.sql.Timestamp(base), 2L, "solo"),
        (101L, new java.sql.Timestamp(base + 31 * 60000L), 2L, "solo"))
    ev.toDF("event_id", "ts", "user_id", "event_type").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q241_session_paths")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got((0 until 8).map(i => s"e$i").mkString(">")) ===
      ((1L, 1L, 10L)), "8-turn truncation must keep the 10-event count")
    assert(got("solo") === ((2L, 1L, 2L)),
      "the 31-minute gap must split user 2 into two sessions")
  }

  test("q243: the r/k keep rule is the engine's own hash rule, and a " +
      "planted triplet cluster lands in the size-3 row") {
    import spark.implicits._
    val dir = fixtureDir("q243")
    val dup = "one two three four five six seven eight nine ten"
    val docs = Seq(1L, 2L, 3L).map(id => (id, dup)) ++
      (10L to 29L).map(id => (id,
        s"unique${id}a unique${id}b unique${id}c unique${id}d unique${id}e"))
    docs.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q243_dedup_weighted_sample")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // independent replay of the keep rule at each size
    def expectKept(ids: Seq[Long], csz: Long): Long =
      ids.toDF("doc_id").withColumn("k", expr(
        s"""cast(conv(substring(md5(concat('dws|',
           |  cast(doc_id as string))), 1, 12), 16, 10) as bigint)
           |  % (10000L * ${csz}L) < 2000L""".stripMargin))
        .filter(col("k")).count()
    val k3 = expectKept(Seq(1L, 2L, 3L), 3L)
    val k1 = expectKept(10L to 29L, 1L)
    assert(got(3L)._1 === 1L && got(3L)._2 === 3L, "one triplet cluster")
    assert(got(3L)._3 === k3, "size-3 kept count = the hash rule")
    assert(got(1L) === ((20L, 20L, k1, k1)),
      "singletons: every kept doc is its own hit cluster")
  }

  test("q247: a document whose parts identify as different languages " +
      "is mixed; single-language docs stay consistent") {
    import spark.implicits._
    val dir = fixtureDir("q247")
    val en = Seq.fill(4)("the a of and is x").mkString(" ")     // 24 toks en
    val de = Seq.fill(4)("der die das und ist y").mkString(" ") // 24 toks de
    Seq((1L, s"$en $de", "web"),     // part 1 en, part 2 en/de boundary
        (2L, en, "web"),             // consistent en
        (3L, de, "books"))           // consistent de
      .toDF("doc_id", "text", "source").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q247_mixed_lang_audit")(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("web") === ((2L, 1L, 1L)),
      "the code-switched doc must count as mixed, the pure one as consistent")
    assert(got("books") === ((1L, 1L, 0L)))
  }

  test("q248: only surviving near-dups of tombstoned docs surface — " +
      "not same-status pairs") {
    import spark.implicits._
    val dir = fixtureDir("q248")
    val dup1 = "the quick brown fox jumps over the lazy dog again and again"
    val dup2 = "pack my box with five dozen liquor jugs every single day now"
    val dup3 = "sphinx of black quartz judge my vow tonight and tomorrow too"
    Seq((10L, dup1), (11L, dup1),    // tombstoned 10, survivor 11 → flag
        (12L, dup2), (13L, dup2),    // neither tombstoned → silent
        (20L, dup3), (30L, dup3))    // both tombstoned → silent
      .toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q248_tombstone_screen")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((11L, 10L)))
  }

  test("q249: the redistribution pass moves the capped source's " +
      "deficit onto the source with headroom, exactly") {
    import spark.implicits._
    val dir = fixtureDir("q249")
    def words(n: Int): String = (1 to n).map(_ => "w").mkString(" ")
    (Seq((1L, words(1000), "a")) ++ Seq((2L, words(100), "b")))
      .toDF("doc_id", "text", "source").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q249_budget_remix")(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    // a: r1 grants 1100 (deficit 0, headroom 2900); b caps at 400
    // (deficit 700) — the full 700 moves to a: final 1800 = 1.8 epochs
    assert(got("a") === ((1000L, 1100L, 2900L, 700L, 1800L, 1800000L)))
    assert(got("b") === ((100L, 400L, 0L, 0L, 400L, 4000000L)))
  }

  test("q250: a token in >=30% of a language's docs is discovered, " +
      "one below the line is not") {
    import spark.implicits._
    val dir = fixtureDir("q250")
    val docs = (1 to 10).map { i =>
      val common = if (i <= 4) " common" else ""
      val rare = if (i <= 2) " rare" else ""
      (i.toLong, s"filler$i other$i more$i$common$rare", "en")
    }
    docs.toDF("doc_id", "text", "lang").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q250_stopword_discovery")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got(("en", "common")) === ((4L, 4000L)))
    assert(!got.contains(("en", "rare")), "20% df must stay below the line")
  }

  test("q237: only verified near-dup pairs whose members cross the " +
      "split boundary surface") {
    import spark.implicits._
    val dir = fixtureDir("q237")
    // split of an id under the q46 rule, computed with the engine
    def splitOf(ids: Seq[Long]): Map[Long, String] =
      ids.toDF("id").withColumn("b", expr(
        """cast(conv(substring(md5(cast(id as string)), 1, 8), 16, 10)
          | as bigint) % 100""".stripMargin))
        .withColumn("s", when(col("b") < 80, "train")
          .when(col("b") < 90, "val").otherwise("test"))
        .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val sp = splitOf(1L to 200L)
    val train = (1L to 200L).filter(sp(_) == "train")
    val test = (1L to 200L).filter(sp(_) == "test")
    // two identical cross-split docs, two identical same-split docs,
    // one unique doc — long texts so 5-char shingle sets are rich
    val dup1 = "the quick brown fox jumps over the lazy dog again and again"
    val dup2 = "pack my box with five dozen liquor jugs every single day now"
    val docs = Seq(
      (train(0), dup1), (test(0), dup1),       // leaks
      (train(1), dup2), (train(2), dup2),      // same split — silent
      (test(1), "sphinx of black quartz judge my vow tonight"))
    docs.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q237_split_leakage")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getString(3), r.getString(4)))
    val (lo, hi) = (math.min(train(0), test(0)), math.max(train(0), test(0)))
    assert(got.toSeq === Seq((lo, hi, sp(lo), sp(hi))))
  }
}
