package graft

import org.apache.spark.sql.functions._

import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.UnicodeNormalize
import graft.functions.TextFns

/** [[graft.expressions.UnicodeNormalize]] and its wiring into the
  * canonical fingerprint chain: NFC collapses canonical equivalents
  * (the NFD-twin evasion class), NFKC additionally folds
  * compatibility variants, NFD decomposes, and the exact-dedup /
  * paragraph keys catch planted decomposed twins that the byte-level
  * chain provably missed. Every non-ASCII code point is an explicit
  * backslash-u escape: source-file literals get silently recomposed
  * by editors/toolchains (this spec's first draft proved it).
  */
class UnicodeNormalizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // precomposed é (U+00E9) vs decomposed e + combining acute (U+0301)
  private val cafePre = "caf\u00e9"
  private val cafeDec = "cafe\u0301"

  private def one(c: org.apache.spark.sql.Column): String = {
    import spark.implicits._
    Seq(1).toDF("x").select(c.as("v")).head().getString(0)
  }

  test("NFC composes decomposed sequences; already-NFC text is identity") {
    import spark.implicits._
    assert(cafePre !== cafeDec, "the fixture itself must be decomposed")
    assert(one(UnicodeNormalize.nfc(lit(cafeDec))) === cafePre)
    assert(one(UnicodeNormalize.nfc(lit(cafePre))) === cafePre)
    // canonical REORDERING: dot-below (U+0323, ccc 220) sorts before
    // dot-above (U+0307, ccc 230) regardless of input order
    val order1 = "q\u0307\u0323" // dot-above then dot-below
    val order2 = "q\u0323\u0307" // dot-below then dot-above
    assert(one(UnicodeNormalize.nfc(lit(order1))) ===
      one(UnicodeNormalize.nfc(lit(order2))))
    // null propagates
    assert(Seq(1).toDF("x")
      .select(UnicodeNormalize.nfc(lit(null).cast("string")).as("v"))
      .head().isNullAt(0))
  }

  test("NFKC folds compatibility variants that NFC must preserve") {
    // full-width A B C (U+FF21..FF23) and the ffi ligature (U+FB03)
    val fullWidth = "\uff21\uff22\uff23"
    assert(one(UnicodeNormalize.nfkc(lit(fullWidth))) === "ABC")
    assert(one(UnicodeNormalize.nfc(lit(fullWidth))) === fullWidth,
      "NFC is canonical-only: full-width forms are DISTINCT characters")
    val ligature = "e\ufb03cient"
    assert(one(UnicodeNormalize.nfkc(lit(ligature))) === "efficient")
    assert(one(UnicodeNormalize.nfc(lit(ligature))) === ligature)
  }

  test("NFD decomposes precomposed characters (the adversarial twin " +
      "generator)") {
    assert(one(UnicodeNormalize.nfd(lit(cafePre))) === cafeDec)
  }

  test("the canonical fingerprint collapses NFD twins the byte-level " +
      "chain misses (exact dedup + tombstone evasion closed)") {
    import spark.implicits._
    val docs = Seq(
      (1L, s"R\u00e9sum\u00e9 of the $cafePre wi-fi policy"),
      (2L, s"R\u00e9sum\u00e9 of the $cafeDec wi-fi policy"),
      (3L, "unrelated third document")).toDF("doc_id", "text")
    val fps = docs.select(col("doc_id"),
        TextFns.fingerprint("text").as("fp"),
        md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")
          .cast("binary")).as("raw_fp"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1),
        r.getString(2)))).toMap
    assert(fps(1L)._1 === fps(2L)._1,
      "NFC fingerprint must collapse the decomposed twin")
    assert(fps(1L)._2 !== fps(2L)._2,
      "the byte-level fingerprint demonstrably missed this pair")
    assert(fps(1L)._1 !== fps(3L)._1)
  }

  test("paragraph dedup keys are canonicalization-aware: a decomposed " +
      "paragraph twin is dropped as a duplicate") {
    import spark.implicits._
    // 20-token paragraphs; doc 2's single paragraph is the NFD twin of
    // doc 1's — same abstract characters, different bytes
    val para = (1 to 20).map(i => s"$cafePre$i").mkString(" ")
    val paraNfd = (1 to 20).map(i => s"$cafeDec$i").mkString(" ")
    assert(para !== paraNfd)
    val docs = Seq((1L, para), (2L, paraNfd)).toDF("doc_id", "text")
    val d = graft.ops.ParagraphDedup
      .decisions(docs, "doc_id", "text", parLen = 20)
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).toMap
    assert(d(1L) === true, "first occurrence wins")
    assert(d(2L) === false,
      "the NFD paragraph twin must lose the canonical-key group-by")
  }
}
