package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.ops.Bpe

/** Property tests for [[graft.ops.Bpe]]'s string-replace contraction
  * (PropertySpec's fixed-seed style): the wrapped-string `replace`
  * must equal a reference leftmost-nonoverlapping merge on the symbol
  * list, for generated words over a 3-char alphabet — where overlaps
  * (aaa + merge(a,a)) and built-symbol collisions actually happen.
  */
class BpePropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Reference model: leftmost-nonoverlapping merge on a symbol list. */
  private def refMerge(syms: List[String], s1: String,
      s2: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == s1 && syms(i + 1) == s2) {
        out += s1 + s2
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toList
  }

  private val word = Gen.nonEmptyListOf(Gen.oneOf('a', 'b', 'c'))
    .map(_.mkString)
  private val wordsGen = Gen.listOfN(6, word)
  private val pairGen = Gen.zip(Gen.oneOf("a", "b", "c", "ab", "ba"),
    Gen.oneOf("a", "b", "c", "ab", "bc"))

  private def cases[A](g: Gen[A], n: Int)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(42L + i)).foreach(body)
    }

  private def engineCounts(words: List[String],
      merges: Seq[Bpe.Merge]): List[Long] = {
    import spark.implicits._
    words.zipWithIndex.toDF("w", "i")
      .withColumn("toks", array(col("w")))
      .withColumn("seq", Bpe.docSeq("toks"))
      .withColumn("seq2", Bpe.applyMerges("seq", merges))
      .orderBy("i")
      .select(Bpe.symbolCount("seq2").as("n"))
      .collect().map(_.getLong(0)).toList
  }

  test("engine contraction ≡ reference leftmost-nonoverlapping merge") {
    cases(Gen.zip(wordsGen, pairGen), 20) { case (words, (s1, s2)) =>
      val got = engineCounts(words, Seq(Bpe.Merge(1, s1, s2)))
      val want = words.map(w =>
        refMerge(w.map(_.toString).toList, s1, s2).length.toLong)
      assert(got === want, s"words=$words merge=($s1,$s2)")
    }
  }

  test("two-round chains: later merges see earlier fusions") {
    cases(wordsGen, 20) { words =>
      val merges = Seq(Bpe.Merge(1, "a", "b"), Bpe.Merge(2, "ab", "c"))
      val got = engineCounts(words, merges)
      val want = words.map { w =>
        refMerge(refMerge(w.map(_.toString).toList, "a", "b"), "ab", "c")
          .length.toLong
      }
      assert(got === want, s"words=$words")
    }
  }

  test("annotation offsets reconstruct any generated text exactly") {
    import spark.implicits._
    cases(Gen.listOfN(5, Gen.nonEmptyListOf(word).map(_.mkString(" "))),
      10) { texts =>
      val bad = texts.toDF("text")
        .withColumn("toks", expr("filter(split(text, ' '), t -> t <> '')"))
        .withColumn("joined", concat_ws(" ", col("toks")))
        .select(col("toks"), col("joined"),
          posexplode(graft.ops.Nested.tokenAnnotations("toks"))
            .as(Seq("p", "a")))
        .filter(expr("substring(joined, a.span_start + 1, " +
          "a.span_end - a.span_start) <> element_at(toks, p + 1)"))
        .count()
      assert(bad === 0L, s"texts=$texts")
    }
  }
}
