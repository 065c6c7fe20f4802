package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Nested-data surface (SURVEY §1.3 — the reference's data model is
  * flat JSON/parquet; `README.md:23`'s song record has no nested
  * fields, so this is the documented edge of its engine). A training
  * corpus is NOT flat: per-document span annotations (NER, toxicity
  * spans, PII redactions, quality flags) arrive as
  * `annotations: array<struct<span_start, span_end, label>>`, and the
  * engine must build, store, prune, explode, and flatten-join that
  * shape without de-nesting the whole table.
  *
  * Construction is SCAN-LOCAL and O(tokens): one `aggregate` HOF folds
  * the token array into (annotation-so-far, next-offset) state, so
  * char offsets are an in-expression prefix sum — no explode, no
  * window, no shuffle; the nested column materializes inside
  * whole-stage codegen on the scan. The oracle rebuilds the same spans
  * the structurally opposite way (unnest + a windowed prefix sum), so
  * a green gate proves the fold ≡ the windowed definition.
  *
  * Offsets index the single-space-joined token text (≡ the original
  * `documents.text`, which is single-space separated — the
  * [[graft.functions.TextFns.tokens]] contract): span i covers
  * [span_start, span_end) with span_end − span_start = token length.
  */
object Nested {

  /** DDL of the annotation array — shared by builders and the empty
    * cast in tests.
    */
  val annotationsDdl = "array<struct<span_start:int,span_end:int,label:string>>"

  /** Deterministic length-class label (the fixture's "annotation
    * model"): < 4 chars → 'short', < 8 → 'mid', else 'long'. A real
    * pipeline swaps this CASE for its tagger's output; every
    * downstream operator is label-agnostic.
    */
  private def labelSql(tok: String): String =
    s"case when length($tok) < 4 then 'short' " +
      s"when length($tok) < 8 then 'mid' else 'long' end"

  /** One annotation per token of `tokensCol` (array<string>), built by
    * a single O(n) `aggregate` fold: span_start = running char offset
    * (token lengths + 1 separator), span_end = span_start + length,
    * label = [[labelSql]]'s length class. Empty token array → empty
    * annotations (the fold's seed), never null.
    */
  def tokenAnnotations(tokensCol: String): Column = expr(
    s"""aggregate(
       |  $tokensCol,
       |  named_struct(
       |    'anns', cast(array() as $annotationsDdl),
       |    'nxt', 0),
       |  (acc, t) -> named_struct(
       |    'anns', array_append(acc.anns, named_struct(
       |      'span_start', acc.nxt,
       |      'span_end', acc.nxt + length(t),
       |      'label', ${labelSql("t")})),
       |    'nxt', acc.nxt + length(t) + 1),
       |  acc -> acc.anns)""".stripMargin)
}
