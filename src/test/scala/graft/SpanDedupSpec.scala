package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.SpanDedup

/** [[SpanDedup.excise]]: first-occurrence retention, overlap merge,
  * in-document repeats, island counting, reconstruction, and the
  * sub-n-tokens / unaffected-doc exclusions.
  */
class SpanDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val n = 4

  private def run(docs: Seq[(Long, String)]) =
    SpanDedup.excise(docs.toDF("doc_id", "text"), "doc_id", "text", n)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap

  test("a shared n-token run survives in the first doc only") {
    val out = run(Seq(
      1L -> "x1 x2 a b c d y1 y2",
      2L -> "z1 a b c d z2 z3"))
    assert(!out.contains(1L), "canonical doc untouched")
    assert(out(2L) === ((7L, 4L, 1L, "z1 z2 z3")))
  }

  test("a repeat longer than n excises as ONE merged span (the " +
      "overlapping-window union equals the maximal repeat)") {
    val out = run(Seq(
      1L -> "p1 a b c d e f p2",
      2L -> "q1 q2 a b c d e f"))
    // the 6-token repeat = 3 overlapping 4-grams; union = one island
    assert(out(2L) === ((8L, 6L, 1L, "q1 q2")))
  }

  test("two separate repeats in one doc count as two spans") {
    val out = run(Seq(
      1L -> "a b c d m1 m2 m3 w x y z",
      2L -> "a b c d k1 k2 k3 w x y z"))
    assert(out(2L) === ((11L, 8L, 2L, "k1 k2 k3")))
  }

  test("an IN-document repeat keeps only the earlier occurrence") {
    val out = run(Seq(
      1L -> "a b c d u1 u2 a b c d"))
    assert(out(1L) === ((10L, 4L, 1L, "a b c d u1 u2")))
  }

  test("docs shorter than n tokens and docs with no repeats are " +
      "absent from the report") {
    val out = run(Seq(
      1L -> "a b c",
      2L -> "unique tokens only here nothing shared at all",
      3L -> "s1 s2 s3 s4 s5 t1 t2 t3",
      4L -> "v0 s2 s3 s4 s5 t1 t2 t3"))
    assert(out.keySet === Set(4L))
    // doc 4's 7-token repeat of doc 3's suffix excised as one span
    assert(out(4L) === ((8L, 7L, 1L, "v0")))
  }

  test("a fully-duplicated doc reconstructs to the empty string") {
    val out = run(Seq(
      1L -> "a b c d e",
      2L -> "a b c d e"))
    assert(out(2L) === ((5L, 5L, 1L, "")))
    assert(!out.contains(1L))
  }

  test("multi-space runs produce no empty tokens (the split-filter " +
      "convention)") {
    val out = run(Seq(
      1L -> "a  b c   d e",
      2L -> "a b c d e"))
    // identical after tokenization; doc 2 is the later occurrence by id
    assert(out(2L) === ((5L, 5L, 1L, "")))
  }

  /** Brute-force reference of the documented semantics: mark every
    * non-first occurrence's n positions, union, count islands,
    * rebuild. Independent of the engine's island-merge formulation.
    */
  private def reference(docs: Seq[(Long, String)], n: Int)
      : Map[Long, (Long, Long, Long, String)] = {
    val toks = docs.map { case (id, t) =>
      id -> t.split(" ").filter(_.nonEmpty).toVector }
    val occ = for {
      (id, tv) <- toks
      p <- 0 to tv.size - n
    } yield (tv.slice(p, p + n).mkString(" "), id, p)
    val covered = scala.collection.mutable.Map.empty[Long, Set[Int]]
    occ.groupBy(_._1).valuesIterator.filter(_.size >= 2).foreach { os =>
      val canon = os.minBy(o => (o._2, o._3))
      os.filterNot(o => o._2 == canon._2 && o._3 == canon._3)
        .foreach { case (_, id, p) =>
          covered(id) = covered.getOrElse(id, Set()) ++ (p until p + n)
        }
    }
    val byId = toks.toMap
    covered.toMap.map { case (id, cov) =>
      val tv = byId(id)
      val spans = cov.toSeq.sorted.count(i => !cov.contains(i - 1))
      val clean = tv.zipWithIndex.collect {
        case (t, i) if !cov.contains(i) => t }.mkString(" ")
      id -> ((tv.size.toLong, cov.size.toLong, spans.toLong, clean))
    }
  }

  test("adversarial long document (>=50% covered, many islands) " +
      "matches the brute-force reference exactly") {
    val pattern = (0 until 40).map(i => s"p$i")
    val rng = new scala.util.Random(7)
    // doc 1 carries the canonical pattern; doc 2 is a long document of
    // alternating (pattern, short unique filler) segments plus an
    // IN-document repeated block — ~90% covered, dozens of islands
    var u = 0
    val segs = (0 until 60).flatMap { _ =>
      val fill = (0 until (1 + rng.nextInt(3))).map { _ =>
        u += 1; s"u$u" }
      pattern ++ fill
    }
    val doc2 = (segs ++ segs.take(100)).mkString(" ")
    val docs = Seq(1L -> pattern.mkString(" "), 2L -> doc2)
    val want = reference(docs, n)
    val got = run(docs)
    assert(got === want)
    // the adversarial shape actually happened: long doc, mostly covered
    assert(want(2L)._1 > 2000L)
    assert(want(2L)._2.toDouble / want(2L)._1 > 0.5)
    assert(want(2L)._3 > 10L)
  }

  test("stagingDir variant produces the identical report " +
      "(executor-loss-safe pinning path)") {
    val docs = Seq(
      1L -> "x1 x2 a b c d y1 y2",
      2L -> "z1 a b c d z2 z3",
      3L -> "a b c d e f g h",
      4L -> "w0 a b c d e f g h w1")
    val tmp = java.nio.file.Files
      .createTempDirectory("spandedup-staging").toString
    val base = run(docs)
    val staged = SpanDedup
      .excise(docs.toDF("doc_id", "text"), "doc_id", "text", n,
        stagingDir = Some(tmp))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap
    assert(staged === base)
    // the staging table was actually written and committed
    assert(new java.io.File(s"$tmp/spandedup-occ/_SUCCESS").exists())
  }

  test("PosBits invariants are enforced at runtime, not by comment") {
    // doc id out of [0, 2^43)
    val neg = intercept[Exception] {
      run(Seq(-1L -> "a b c d e", 2L -> "a b c d e"))
    }
    assert(neg.getMessage.contains("doc id outside"))
    // a document of 2^20 tokens overflows the position field
    val big = ("x " * (1 << 20)).trim
    val over = intercept[Exception] {
      run(Seq(1L -> big, 2L -> "a b c d e"))
    }
    assert(over.getMessage.contains("exceeds 2^20 tokens"))
  }
}
