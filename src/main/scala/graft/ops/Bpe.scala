package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training and scan-local application
  * (SURVEY §7.2.8 extension) — the tokenizer-TRAINING member of the
  * text family: q68 counts pre-tokenization runs under a fixed rule;
  * this LEARNS the merge table a real tokenizer ships. Training is
  * the q71/q118 BSP class: each of `rounds` iterations is one
  * scan-local pair expansion + ONE (s1, s2) partial-agg shuffle +
  * a driver-side argmax of ONE row (metadata), then a scan-local
  * contraction — state is vocabulary-sized (distinct words × their
  * symbol strings), never corpus-sized, and is re-pinned per round
  * with the exact-RDD-handle [[Snap]] discipline.
  *
  * Representation: a word's symbol sequence is ONE delimited string —
  * each symbol wrapped in U+001F unit separators (`␟s␟`), symbols
  * abutting (`␟a␟␟b␟`). Contracting merge (s1, s2) is then a plain
  * `replace(seq, '␟s1␟␟s2␟', '␟s1s2␟')` — leftmost, non-overlapping,
  * exactly the greedy BPE application order, and IDENTICAL semantics
  * in Spark and DuckDB (`UTF8String.replace` / DuckDB `replace`), so
  * the oracle can replay the whole merge chain verbatim. The wrapper
  * also makes token counting free: every symbol carries exactly two
  * `␟`, so count = (len − len-without-␟) / 2.
  *
  * Contract: input tokens must not contain U+001F (training filters
  * such tokens out defensively; the corpus is plain text).
  */
object Bpe {

  /** A learned merge: at `rank`, adjacent symbols (s1, s2) fuse. */
  final case class Merge(rank: Int, s1: String, s2: String)

  private def sqlLit(s: String): String =
    "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

  /** SQL for the wrapped symbol string of a (non-empty) word column:
    * `␟c1␟␟c2␟…` over its characters.
    */
  private def wrapSql(w: String): String =
    s"concat(chr(31), array_join(transform(sequence(1, length($w)), " +
      s"i -> substring($w, i, 1)), concat(chr(31), chr(31))), chr(31))"

  /** SQL applying one merge to a wrapped symbol string. */
  private def contractSql(seq: String, s1: String, s2: String): String =
    s"replace($seq, concat(chr(31), ${sqlLit(s1)}, chr(31), chr(31), " +
      s"${sqlLit(s2)}, chr(31)), " +
      s"concat(chr(31), ${sqlLit(s1)}, ${sqlLit(s2)}, chr(31)))"

  /** Train `rounds` merges over a word-count table (`wordCol`,
    * `cntCol`): each round fuses the adjacent symbol pair with the
    * highest corpus-weighted count (ties → lexicographically smallest
    * (s1, s2) — deterministic on any engine). Stops early if no
    * adjacent pairs remain. Driver state is one (s1, s2) row per
    * round — metadata, like a range partitioner's boundaries.
    */
  def train(words: DataFrame, wordCol: String, cntCol: String,
      rounds: Int): Seq[Merge] = {
    require(rounds >= 1, s"rounds must be >= 1: $rounds")
    var cur = Snap.pin(words
      .filter(length(col(wordCol)) > 0 &&
        !col(wordCol).contains("\u001f"))
      .select(expr(wrapSql(wordCol)).as("seq"),
        col(cntCol).cast("long").as("cnt")))
    var prevRdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] = null
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val best = pairCounts(cur._1)
        .orderBy(col("c").desc, col("s1"), col("s2"))
        .limit(1).collect()
      Snap.release(prevRdd)
      if (best.isEmpty) exhausted = true
      else {
        val (s1, s2) = (best(0).getString(0), best(0).getString(1))
        merges += Merge(r, s1, s2)
        val next = Snap.pin(cur._1
          .withColumn("seq", expr(contractSql("seq", s1, s2))))
        prevRdd = cur._2
        cur = next
      }
      r += 1
    }
    Snap.release(prevRdd)
    Snap.release(cur._2)
    merges.toSeq
  }

  /** One round's adjacent-pair counts over the wrapped-symbol state —
    * package-visible so PlanSpec asserts the round's plan shape
    * directly (the expansion is scan-local — sequence/transform over
    * the symbol split, no join — and only (s1, s2, partial count)
    * rows shuffle).
    */
  private[graft] def pairCounts(state: DataFrame): DataFrame =
    state
      .select(col("cnt"), expr("split(substring(seq, 2, " +
        "length(seq) - 2), concat(chr(31), chr(31)))").as("s"))
      .select(col("cnt"), explode(expr(
        // guard: sequence(1, 0) is the DESCENDING [1, 0] in Spark,
        // so single-symbol words must short-circuit to an empty list
        "case when size(s) < 2 then " +
          "cast(array() as array<struct<s1:string,s2:string>>) " +
          "else transform(sequence(1, size(s) - 1), " +
          "i -> struct(element_at(s, i) as s1, " +
          "element_at(s, i + 1) as s2)) end")).as("p"))
      .groupBy(col("p.s1").as("s1"), col("p.s2").as("s2"))
      .agg(sum("cnt").as("c"))

  /** The wrapped whole-document symbol string: words wrapped
    * individually, joined by ' ' (symbols never contain spaces and
    * patterns are ␟-delimited, so merges can never fuse across a word
    * boundary — BPE's per-word semantics on one string per doc).
    */
  def docSeq(toksCol: String): Column =
    expr(s"array_join(transform($toksCol, w -> ${wrapSql("w")}), ' ')")

  /** Apply a trained merge chain scan-locally: one composed
    * replace-chain expression, fully inside whole-stage codegen — no
    * joins, no shuffle; the merge table rides the plan as literals
    * (metadata-sized, the stored-model discipline).
    */
  def applyMerges(seqColName: String, merges: Seq[Merge]): Column =
    expr(merges.sortBy(_.rank).foldLeft(seqColName) { (acc, m) =>
      contractSql(acc, m.s1, m.s2)
    })

  /** Symbol count of a wrapped sequence: every symbol carries exactly
    * two U+001F delimiters.
    */
  def symbolCount(seqCol: String): Column =
    expr(s"cast((length($seqCol) - " +
      s"length(replace($seqCol, chr(31), ''))) div 2 as bigint)")
}
