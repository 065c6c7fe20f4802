package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocklist PHRASE excision — policy scrubbing at token-span
  * granularity (SURVEY §2.11 E240): remove every occurrence of any
  * blocked multi-word phrase from the corpus text, keeping the
  * surrounding tokens. The pattern-driven sibling of
  * [[SpanDedup.excise]] (which removes corpus-REPEATED spans): the
  * spans to cut here come from a parameter-bounded phrase list, so
  * no corpus statistics are needed at all and the whole operator is
  * ONE map-only pass — phrases fold into the plan as literals,
  * matching and reassembly are scan-local, nothing shuffles (the
  * q234 dictionary-tagging discipline, upgraded from tagging to
  * surgery).
  *
  * Semantics: a phrase of L tokens matches at position p iff the
  * document's tokens p..p+L−1 equal it exactly. All matches across
  * all phrases mark their token positions; marked positions union
  * into maximal covered islands (overlapping or adjacent matches
  * merge), and the cleaned text is the uncovered tokens in original
  * order. Only affected documents return. Everything is integer and
  * string arithmetic — any ANSI engine replays the rows bit-exactly.
  *
  * Per-document cost is O(tokens · phrases) for matching (each
  * phrase is one scan-local window compare; the phrase list is a
  * governance artifact of dozens-to-hundreds of entries, not data)
  * and O(covered) for the island merge + gap-slice reassembly — the
  * SpanDedup island pattern with run width 1, never a per-token
  * membership probe over the covered set.
  */
object PhraseExcise {

  private def toks(textCol: String): Column =
    expr(s"filter(split($textCol, ' '), t -> t <> '')")

  /** One row per document containing ≥ 1 blocked phrase:
    * (idCol, n_tokens, n_matches, n_tokens_removed, n_spans_removed,
    * text_clean). `phrases` are space-separated multi-word strings;
    * empty or single-space phrases are rejected.
    */
  def excise(docs: DataFrame, idCol: String, textCol: String,
      phrases: Seq[String]): DataFrame = {
    require(phrases.nonEmpty, "phrase list must be non-empty")
    val split = phrases.map(_.split(" ").toSeq)
    require(split.forall(p => p.nonEmpty && p.forall(_.nonEmpty)),
      s"phrases must be non-empty space-separated words: $phrases")
    // per-phrase match intervals: starts where the L-token window
    // equals the phrase, as (s, e) structs — phrase tokens are plan
    // literals, and the window compare is a word-by-word element_at
    // conjunction (short-circuits on the first mismatch, allocates
    // nothing — measured 6.2 s → sub-second at sf0.1 vs the
    // slice-equality form, which materialized an L-token array per
    // position per phrase)
    val matchArrays = split.map { p =>
      val l = p.length
      val eqs = p.zipWithIndex.map { case (w, j) =>
        val lit = graft.functions.TextFns.sqlLit(w)
        s"element_at(__toks, cast(i as int) + ${j + 1}) = $lit"
      }.mkString(" and ")
      s"""transform(
         |  filter(if(size(__toks) >= $l,
         |      sequence(0, size(__toks) - $l),
         |      cast(array() as array<int>)),
         |    i -> $eqs),
         |  i -> named_struct('s', cast(i as long),
         |                    'e', cast(i as long) + ${l - 1}L))"""
        .stripMargin
    }.mkString("concat(", ",\n", ")")
    docs
      // explode(array(...)) is a Generate barrier: __toks becomes a
      // real attribute, so the per-position lambdas below index a
      // materialized array instead of re-splitting the document per
      // lambda call (the CollapseProject inlining trap measured at
      // 15.7 s in the TokenSpans scaladoc; here 4.8 s → 0.2 s at
      // sf0.1)
      .select(col(idCol).as("__id"),
        explode(array(toks(textCol))).as("__toks"))
      .withColumn("__ms", expr(matchArrays))
      .filter(size(col("__ms")) > 0)
      // covered token positions (sorted, distinct) — O(covered)
      .withColumn("__cov", expr(
        """array_sort(array_distinct(flatten(
          |  transform(__ms, m -> sequence(m.s, m.e)))))""".stripMargin))
      // island boundaries: position j starts an island iff it is the
      // first or the previous covered position is not adjacent
      .withColumn("__bnd", expr(
        """filter(sequence(0, size(__cov) - 1), j -> j = 0 or
          |  element_at(__cov, cast(j as int) + 1)
          |  - element_at(__cov, cast(j as int)) > 1L)""".stripMargin))
      .withColumn("__isl", expr(
        """transform(sequence(0, size(__bnd) - 1), j -> named_struct(
          |  's', element_at(__cov, cast(element_at(__bnd,
          |         cast(j as int) + 1) as int) + 1),
          |  'e', element_at(__cov, cast(if(j + 1 < size(__bnd),
          |         element_at(__bnd, cast(j as int) + 2),
          |         size(__cov)) as int))))""".stripMargin))
      .select(col("__id").as(idCol),
        size(col("__toks")).cast("long").as("n_tokens"),
        size(col("__ms")).cast("long").as("n_matches"),
        size(col("__cov")).cast("long").as("n_tokens_removed"),
        size(col("__isl")).cast("long").as("n_spans_removed"),
        expr(
          """array_join(flatten(transform(sequence(0, size(__isl)),
            |  j -> slice(__toks,
            |    cast(if(j = 0, 0L, element_at(__isl, cast(j as int)).e
            |      + 1L) as int) + 1,
            |    cast(greatest(0L,
            |      if(j < size(__isl),
            |        element_at(__isl, cast(j as int) + 1).s - 1L,
            |        size(__toks) - 1L)
            |      - if(j = 0, 0L,
            |          element_at(__isl, cast(j as int)).e + 1L)
            |      + 1L) as int)))), ' ')""".stripMargin)
          .as("text_clean"))
  }
}
