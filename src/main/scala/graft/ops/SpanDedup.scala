package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact-substring span excision — sub-document dedup at TOKEN-SPAN
  * granularity (SURVEY §2.11 E223), the surgical member of the dedup
  * family: q24 drops whole duplicate DOCUMENTS, q101/q117 whole
  * duplicate PARAGRAPHS; this removes every repeated run of ≥ n
  * tokens from all but its first occurrence in the corpus, keeping
  * the surrounding novel text. That is the operation published
  * pretraining pipelines run as "exact substring deduplication"
  * (suffix-array formulations find maximal repeats ≥ 50 tokens; the
  * fixed-n-gram form here marks the SAME character positions — every
  * maximal repeat of length L ≥ n is exactly the union of its L−n+1
  * overlapping repeated n-grams, so the covered-token set is
  * identical and no suffix array is needed).
  *
  * Semantics: an n-token window is REPEATED if the corpus contains
  * ≥ 2 occurrences of its exact token sequence (across documents or
  * within one). The canonical occurrence is the globally first —
  * min (doc, pos) — and survives; every other occurrence's n token
  * positions are marked. Marked positions union into maximal covered
  * runs (overlapping windows merge for free in the covered-SET
  * formulation — no interval logic), and the cleaned text is the
  * uncovered tokens in original order. Only affected documents
  * return; everything is integer/string arithmetic, so any ANSI
  * engine replays the rows bit-exactly.
  *
  * Scale shape: the window expansion is scan-local (one struct per
  * token position); only (gram-hash, doc, pos) rows — never text —
  * shuffle into the gram-stats partial agg. The repeat set (cnt ≥ 2)
  * is a small fraction of the gram vocabulary, so the mark join's
  * build side is the cheap one, and the final reassembly join keys
  * the metadata-sized marked-position table against a fresh corpus
  * scan — with AQE the position side broadcasts and text never
  * crosses the wire (the [[ParagraphDedup]] reassembly discipline).
  * Per-document work is O(tokens × covered-runs) in the rebuild —
  * doc-bounded, never corpus-sized.
  */
object SpanDedup {

  /** Positions fit 20 bits: (doc, pos) occurrences encode as one long
    * `doc·2^20 + pos` for the min-aggregate canonical pick, exact for
    * documents up to 1,048,576 tokens and doc ids up to 2^43.
    */
  val PosBits = 20

  private def toks(textCol: String): Column =
    expr(s"filter(split($textCol, ' '), t -> t <> '')")

  /** Repeated-span excision over `docs(idCol, textCol)` with window
    * width `n` tokens. Returns one row per AFFECTED document:
    * (idCol, n_tokens, n_tokens_removed, n_spans_removed, text_clean)
    * where n_spans_removed counts maximal removed runs and text_clean
    * is the surviving tokens joined by single spaces.
    */
  def excise(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    require(n >= 2, s"span width must be >= 2 tokens: $n")
    val occ = docs
      .select(col(idCol).as("__id"), toks(textCol).as("__toks"))
      .select(col("__id"), explode(expr(
        s"""case when size(__toks) >= $n
           |  then transform(sequence(0, size(__toks) - $n),
           |    p -> named_struct('pos', cast(p as long),
           |      'gh', md5(array_join(slice(__toks, p + 1, $n), ' '))))
           |  else cast(array() as array<struct<pos: bigint, gh: string>>)
           |end""".stripMargin)).as("__o"))
      .select(col("__id"), col("__o.pos").as("__pos"),
        col("__o.gh").as("__gh"))
      .withColumn("__enc",
        shiftleft(col("__id"), PosBits) + col("__pos"))
      // fans out to the gram-stats aggregate and the mark join
      .localCheckpoint()
    // repeated grams only — the small side; cnt >= 2 BEFORE the join
    // so the probe never touches unique grams' stats
    val repeats = occ.groupBy("__gh")
      .agg(count(lit(1)).as("__cnt"), min(col("__enc")).as("__canon"))
      .filter(col("__cnt") >= 2L)
      .select("__gh", "__canon")
    val marked = occ.join(repeats, "__gh")
      .filter(col("__enc") =!= col("__canon"))
      .groupBy(col("__id"))
      .agg(sort_array(collect_set(col("__pos"))).as("__mpos"))
    docs
      .select(col(idCol).as("__id"), toks(textCol).as("__toks"))
      .join(marked, "__id")
      .withColumn("__covered", sort_array(array_distinct(expr(
        s"flatten(transform(__mpos, p -> sequence(p, p + ${n - 1}L)))"))))
      .select(col("__id").as(idCol),
        size(col("__toks")).cast("long").as("n_tokens"),
        size(col("__covered")).cast("long").as("n_tokens_removed"),
        expr("""cast(size(filter(__covered,
               |  i -> not array_contains(__covered, i - 1L))) as long)"""
          .stripMargin).as("n_spans_removed"),
        expr("""array_join(filter(__toks,
               |  (t, i) -> not array_contains(__covered, cast(i as long))),
               |  ' ')""".stripMargin).as("text_clean"))
  }
}
