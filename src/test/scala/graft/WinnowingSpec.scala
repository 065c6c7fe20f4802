package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Winnowing

/** [[graft.ops.Winnowing]]: selection equivalence against a reference
  * per-window-min implementation (Schleimer et al.'s true rule), the
  * shared-substring guarantee INCLUDING the exact L+w−1 boundary with
  * adversarial surrounding context, short texts, and the audit's
  * deterministic ordering.
  */
class WinnowingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString

  /** Reference: position j selected iff h(j) is the minimum of SOME
    * full window of w consecutive hashes containing j (docs with
    * fewer than w grams: global minimum). Ties select all minima.
    */
  private def refSelect(text: String, l: Int, w: Int): Set[String] = {
    if (text.length < l) return Set.empty
    val hs = (0 to text.length - l).map { j =>
      java.lang.Long.parseLong(md5hex(text.substring(j, j + l)).take(15), 16)
    }
    val n = hs.length
    val eff = math.min(w, n)
    hs.indices.collect {
      case j if (math.max(0, j - eff + 1) to math.min(j, n - eff))
          .exists(s => (s until s + eff).forall(k => hs(j) <= hs(k))) =>
        text.substring(j, j + l)
    }.toSet
  }

  private def engineSelect(texts: Seq[String], l: Int,
      w: Int): Map[Long, Set[String]] = {
    import spark.implicits._
    Winnowing.selectedGrams(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text"),
        "doc_id", "text", l, w)
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
  }

  test("selection equals the reference per-window-min rule") {
    val rnd = new scala.util.Random(7)
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog again and again",
      "aaaaaaaaaaaaaaaaaaaaaa",
      "short",
      "exactly-w", // fewer than w grams at l=5, w=4 → global-min path
      Seq.fill(80)(('a' + rnd.nextInt(4)).toChar).mkString)
    for (w <- Seq(1, 2, 4, 8)) {
      val got = engineSelect(texts, l = 5, w = w)
      texts.zipWithIndex.foreach { case (t, i) =>
        assert(got.getOrElse(i.toLong, Set.empty) === refSelect(t, 5, w),
          s"text #$i w=$w")
      }
    }
  }

  test("native expression equals the SQL HOF form, including " +
      "multi-byte code points, ties, and sub-window texts") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog again and again",
      "aaaaaaaaaaaaaaaaaaaaaaaa", // all ties
      "ábç déf ghî jkl mnö pqr stü vwx", // 2-byte code points
      "的是了在和的是了在和的是了在和", // 3-byte code points
      "mixed ascii 和 multi-byte 的 boundaries 了 here",
      "tiny", // below L
      "justsix", // below w grams at l=5, w=8
      Seq.fill(200)(('a' + rnd.nextInt(5)).toChar).mkString,
      Seq.fill(300)(if (rnd.nextBoolean()) '字' else 'x').mkString)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    for (w <- Seq(1, 3, 8); l <- Seq(2, 5)) {
      val native = Winnowing.selectedGrams(df, "doc_id", "text", l, w)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val sql = Winnowing.selectedGramsSql(df, "doc_id", "text", l, w)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(native === sql, s"native/SQL divergence at l=$l w=$w")
    }
  }

  test("WinnowSelect interpreted eval agrees with the codegen path") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    import graft.expressions.WinnowSelect
    // eval() is the interpreted path; the DataFrame runs above go
    // through codegen — assert both produce the same selections
    for (t <- Seq("the quick brown fox jumps over the lazy dog",
        "aaaaaaaaaa", "tiny", "字字x字 mixed 的 bytes here")) {
      val e = WinnowSelect(Literal(UTF8String.fromString(t)), 5, 4)
      val interpreted = e.eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toArray[UTF8String](org.apache.spark.sql.types.StringType)
        .map(_.toString).toSet
      assert(interpreted === refSelect(t, 5, 4), s"text '$t'")
    }
    // null in, null out
    assert(WinnowSelect(Literal(null,
      org.apache.spark.sql.types.StringType), 5, 4).eval(null) === null)
  }

  test("guarantee: a shared run of >= L + w - 1 chars yields a " +
      "common selected gram") {
    val shared = "zzCOMMONSHAREDRUNzz" // 19 chars >= 5 + 4 - 1 = 8
    val a = s"prefix one $shared suffix alpha"
    val b = s"completely different head $shared and tail"
    val got = engineSelect(Seq(a, b), l = 5, w = 4)
    assert((got(0L) intersect got(1L)).nonEmpty,
      s"docs sharing '$shared' must share a fingerprint")
  }

  test("boundary guarantee: a shared run of EXACTLY L + w - 1 chars " +
      "(= w grams, one full window) survives adversarial context") {
    // The trailing-window-only rule fails this ~(1-1/w) of the time:
    // a smaller hash within w-1 grams before the run suppresses every
    // in-run selection in one document. The per-window-min rule may
    // not: the run IS one full window, its min is selected in both.
    val l = 5
    val w = 4
    val rnd = new scala.util.Random(42)
    def rand(k: Int): String =
      Seq.fill(k)(('a' + rnd.nextInt(26)).toChar).mkString
    val trials = (0 until 25).map { _ =>
      val shared = rand(l + w - 1) // exactly w grams
      (shared, s"${rand(12)}$shared${rand(12)}",
        s"${rand(17)}$shared${rand(9)}")
    }
    val texts = trials.flatMap { case (_, a, b) => Seq(a, b) }
    val got = engineSelect(texts, l, w)
    trials.zipWithIndex.foreach { case ((shared, _, _), i) =>
      val inRun = (got(2L * i) intersect got(2L * i + 1))
        .filter(shared.contains)
      assert(inRun.nonEmpty,
        s"trial $i: no common in-run fingerprint for '$shared'")
    }
  }

  test("audit orders by (n_docs desc, gram) with a hard limit") {
    import spark.implicits._
    // Shared prefix of L + w - 1 = 12 chars (= w grams, one full
    // window) so the guarantee forces a common selection.
    val docs = Seq((1L, "abcdefghijkl klm"), (2L, "abcdefghijkl xyz"),
      (3L, "unrelated text here")).toDF("doc_id", "text")
    val rows = Winnowing.repeatedGrams(docs, "doc_id", "text",
        l = 10, w = 3, topK = 2)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.length <= 2)
    assert(rows.map(_._2).toSeq === rows.map(_._2).sorted.reverse.toSeq)
    assert(rows.head._2 === 2L) // a shared 10-gram from docs 1 and 2
  }
}
