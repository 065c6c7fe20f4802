package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Winnowing

/** [[graft.ops.Winnowing]]: selection equivalence against a reference
  * windowed-min implementation, the shared-substring guarantee, short
  * texts, and the audit's deterministic ordering.
  */
class WinnowingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString

  /** Reference: position j selected iff h(j) == min over trailing
    * window of w hashes.
    */
  private def refSelect(text: String, l: Int, w: Int): Set[String] = {
    if (text.length < l) return Set.empty
    val hs = (0 to text.length - l).map { j =>
      java.lang.Long.parseLong(md5hex(text.substring(j, j + l)).take(15), 16)
    }
    hs.indices.collect {
      case j if (math.max(0, j - w + 1) to j).forall(k => hs(j) <= hs(k)) =>
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

  test("selection equals the reference windowed-min rule") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog again and again",
      "aaaaaaaaaaaaaaaaaaaaaa",
      "short")
    val got = engineSelect(texts, l = 5, w = 4)
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got.getOrElse(i.toLong, Set.empty) === refSelect(t, 5, 4),
        s"text #$i")
    }
  }

  test("guarantee: a shared run of >= L + w - 1 chars yields a " +
      "common selected gram") {
    val shared = "zzCOMMONSHAREDRUNzz" // 19 chars >= 5 + 4 - 1? use L=5 w=4 → 8
    val a = s"prefix one $shared suffix alpha"
    val b = s"completely different head $shared and tail"
    val got = engineSelect(Seq(a, b), l = 5, w = 4)
    assert((got(0L) intersect got(1L)).nonEmpty,
      s"docs sharing '$shared' must share a fingerprint")
  }

  test("audit orders by (n_docs desc, gram) with a hard limit") {
    import spark.implicits._
    val docs = Seq((1L, "abcdefghij klm"), (2L, "abcdefghij xyz"),
      (3L, "unrelated text here")).toDF("doc_id", "text")
    val rows = Winnowing.repeatedGrams(docs, "doc_id", "text",
        l = 10, w = 3, topK = 2)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.length <= 2)
    assert(rows.map(_._2).toSeq === rows.map(_._2).sorted.reverse.toSeq)
    assert(rows.head._2 === 2L) // the shared 10-gram from docs 1 and 2
  }
}
