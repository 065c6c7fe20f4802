package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Sampling

class SamplingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._

  private def corpus = {
    import spark.implicits._
    ((0 until 50).map(i => (i.toLong, "a")) ++
      (100 until 105).map(i => (i.toLong, "b")) ++
      (200 until 203).map(i => (i.toLong, "c")))
      .toDF("id", "lang")
  }

  test("exactKPerStratum returns exactly min(k, stratum size) rows each") {
    val got = Sampling.exactKPerStratum(corpus, "id", "lang", 5, "t")
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 5L, "b" -> 5L, "c" -> 3L))
  }

  test("membership is deterministic and rank-stable across runs") {
    def draw() = Sampling.exactKPerStratum(corpus, "id", "lang", 3, "t")
      .select("lang", "rk", "id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(draw() === draw())
  }

  test("changing the salt re-draws; ranks stay 1..k") {
    val a = Sampling.exactKPerStratum(corpus, "id", "lang", 5, "s1")
    val b = Sampling.exactKPerStratum(corpus, "id", "lang", 5, "s2")
    val idsA = a.filter(col("lang") === "a").select("id")
      .collect().map(_.getLong(0)).toSet
    val idsB = b.filter(col("lang") === "a").select("id")
      .collect().map(_.getLong(0)).toSet
    assert(idsA !== idsB) // 50-choose-5: collision ~ impossible
    assert(a.select("rk").collect().map(_.getLong(0)).forall(r => r >= 1 && r <= 5))
  }

  test("exactKPerStratum never samples NULL-key rows (no hash, no rank)") {
    import spark.implicits._
    val withNulls = corpus.union(
      Seq.fill(5)((null.asInstanceOf[java.lang.Long], "c"))
        .map(t => (Option(t._1).map(Long2long), t._2))
        .toDF("id", "lang"))
    val got = Sampling.exactKPerStratum(withNulls, "id", "lang", 4, "t")
      .filter(col("lang") === "c").select("id").collect()
    // stratum c has 3 real rows + 5 null-key rows: exactly the 3 real
    // rows sample in, and none of them is null
    assert(got.length === 3)
    assert(got.forall(!_.isNullAt(0)))
  }

  test("hashBucket is hashValue mod 10000") {
    val df = corpus.select(
      Sampling.hashValue("id", "t").as("hv"),
      Sampling.hashBucket("id", "t").as("hb"))
    df.collect().foreach { r =>
      assert(r.getLong(1) === r.getLong(0) % 10000)
    }
  }

  private def weighted = {
    import spark.implicits._
    ((1 to 20).map(i => (i.toLong, "a", i.toLong)) ++
      (21 to 30).map(i => (i.toLong, "b", 100L)) ++
      Seq((31L, "c", 1000L), (32L, "c", 1L)))
      .toDF("id", "src", "w")
  }

  test("systematicPps: picks per stratum sum to exactly k (the points " +
      "partition the weight axis)") {
    val got = Sampling.systematicPps(weighted, "id", "src", "w", 5, "s")
      .groupBy("src").agg(sum("n_picks").as("p"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 5L, "b" -> 5L, "c" -> 5L))
  }

  test("systematicPps: a row heavier than tot/k is always selected, " +
      "with proportional multiplicity") {
    // stratum c: tot=1001, k=5, spacing ~200 — the w=1000 row spans
    // at least 4 points, the w=1 row at most 1
    val c = Sampling.systematicPps(weighted, "id", "src", "w", 5, "s")
      .filter(col("src") === "c")
      .collect().map(r => r.getLong(r.fieldIndex("id")) ->
        r.getLong(r.fieldIndex("n_picks"))).toMap
    assert(c.contains(31L) && c(31L) >= 4L)
    assert(c.getOrElse(32L, 0L) <= 1L)
  }

  test("systematicPps is deterministic and partitioning-independent") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Sampling.systematicPps(df, "id", "src", "w", 3, "s")
        .select("src", "id", "n_picks").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(run(weighted.repartition(7)) === run(weighted.coalesce(1)))
  }

  test("systematicPps is correct when Spark's binary string order and " +
      "Java's UTF-16 order disagree on the strata") {
    import spark.implicits._
    // U+10000 sorts BEFORE U+FFFF in Java's UTF-16 code units but
    // AFTER it in UTF-8 binary (Spark's sort): any driver-side
    // re-sort used for stratum offsets would assign them crosswise
    val s1 = "𐀀" // U+10000, UTF-8 f0 90 80 80
    val s2 = "￿" //                 UTF-8 ef bf bf
    val df = ((1 to 10).map(i => (i.toLong, s1, i.toLong)) ++
      (11 to 20).map(i => (i.toLong, s2, 2L * i))).toDF("id", "src", "w")
    val got = Sampling.systematicPps(df, "id", "src", "w", 4, "s")
      .groupBy("src").agg(sum("n_picks").as("p"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map(s1 -> 4L, s2 -> 4L))
  }

  test("systematicPps excludes zero-weight and null rows") {
    import spark.implicits._
    val withBad = weighted.unionByName(
      Seq((90L, "a", 0L), (91L, "a", -5L)).toDF("id", "src", "w"))
      .unionByName(Seq(("a", 92L)).toDF("src", "id")
        .withColumn("w", lit(null).cast("long"))
        .select("id", "src", "w"))
    val ids = Sampling.systematicPps(withBad, "id", "src", "w", 5, "s")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(!ids.contains(90L) && !ids.contains(91L) && !ids.contains(92L))
    // and the draw over the good rows is unchanged
    val base = Sampling.systematicPps(weighted, "id", "src", "w", 5, "s")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids === base)
  }

  test("q150 exact split: every stratum lands exactly " +
      "⌈0.8n⌉ / ⌈0.9n⌉−⌈0.8n⌉ / rest — no rate-split variance") {
    val dir = "/root/testdata/sf0.001"
    val totals = Tables(spark, dir, "documents")
      .groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = SparkEntry.queries("q150_exact_split")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    totals.foreach { case (src, n) =>
      // rk*10 < n*8 keeps rk = 0..⌈0.8n⌉−1 — ceil, not floor
      val train = (n * 8 + 9) / 10
      val valN = (n * 9 + 9) / 10 - train
      assert(got.getOrElse((src, "train"), 0L) === train, s"$src train")
      assert(got.getOrElse((src, "val"), 0L) === valN, s"$src val")
      assert(got.getOrElse((src, "test"), 0L) === n - train - valN,
        s"$src test")
    }
  }
}
