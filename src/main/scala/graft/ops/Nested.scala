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
  * Construction is SCAN-LOCAL and O(tokens): the offsets are an
  * in-expression prefix sum computed by the native
  * [[graft.expressions.TokenSpans]] expression in one pass — no
  * explode, no window, no shuffle; the nested column materializes
  * inside whole-stage codegen on the scan. The oracle rebuilds the
  * same spans the structurally opposite way (unnest + a windowed
  * prefix sum over token lengths), so a green gate proves the native
  * pass ≡ the windowed prefix-sum definition.
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
    * pipeline swaps this rule for its tagger's output; every
    * downstream operator is label-agnostic. This is the SQL-visible
    * statement of the rule the oracles replay;
    * [[graft.expressions.TokenSpans]] implements the same rule
    * natively.
    */
  val labelSql: String =
    "case when length(t) < 4 then 'short' " +
      "when length(t) < 8 then 'mid' else 'long' end"

  /** One annotation per token of `tokensCol` (array<string>):
    * span_start = running char offset in the single-space-joined
    * text, span_end = span_start + token length, label =
    * [[labelSql]]'s length class. Built by the native
    * [[graft.expressions.TokenSpans]] expression — ONE O(tokens)
    * pass, offsets allocated once, codegen-friendly. Every
    * SQL-expressible alternative measured worse (numbers on the q202
    * bench at sf0.1): an `aggregate` + `array_append` fold copies the
    * accumulator per token (O(tokens²) bytes — quadratic blowup on
    * multi-thousand-token documents), and the truly-linear
    * char-boundary scan runs an interpreted lambda per CHARACTER
    * (higher-order functions are CodegenFallback) — 6.2 s vs 0.8 s
    * for the fold form vs 0.35 s native. A further trap either SQL
    * form must dodge: `tokensCol` is typically itself an expression
    * (`filter(split(text, ' '), …)`) and CollapseProject inlines it
    * into every use site unless bound once as a lambda variable —
    * unbound, the q202 build re-splits the document per position,
    * 15.7 s. Empty token array → empty annotations, never null.
    */
  def tokenAnnotations(tokensCol: String): Column =
    graft.expressions.TokenSpans.spans(col(tokensCol))
}
