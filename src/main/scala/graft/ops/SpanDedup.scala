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
  * runs (overlapping or ADJACENT windows merge into one island), and
  * the cleaned text is the uncovered tokens in original order. Only
  * affected documents return; everything is integer/string
  * arithmetic, so any ANSI engine replays the rows bit-exactly.
  *
  * Scale shape: the window expansion is scan-local (one struct per
  * token position); only (gram-hash, doc, pos) rows — never text —
  * shuffle into the gram-stats partial agg. The repeat set (cnt ≥ 2)
  * is a small fraction of the gram vocabulary, so the mark join's
  * build side is the cheap one, and the final reassembly join keys
  * the metadata-sized marked-position table against a fresh corpus
  * scan — with AQE the position side broadcasts and text never
  * crosses the wire (the [[ParagraphDedup]] reassembly discipline).
  * Per-document reassembly is O(tokens + marked windows): the sorted
  * marked-start array merges into covered ISLANDS in one vectorized
  * pass (boundary indices by consecutive-difference, no per-token
  * membership probes), counts fold over the islands, and the clean
  * text is the concatenation of the island-complement gap slices —
  * a heavily-duplicated 100k-token document costs ~10⁵ element
  * visits, not the ~10¹⁰ a per-token `array_contains` re-probe of
  * the covered set would (the pre-round-10 shape).
  */
object SpanDedup {

  /** Positions fit 20 bits: (doc, pos) occurrences encode as one long
    * `doc·2^20 + pos`, exact for documents up to 1,048,576 tokens and
    * doc ids in [0, 2^43). Both bounds are ENFORCED at runtime (a
    * violating row raises inside the scan rather than silently
    * corrupting the min-enc canonical pick, which could excise the
    * true first occurrence); a null doc id also raises — there is no
    * meaningful "first occurrence" ordering for it.
    */
  val PosBits = 20

  /** Exclusive doc-id bound: ids use the 43 bits above [[PosBits]]. */
  val MaxDocId: Long = 1L << 43

  private def toks(textCol: String): Column =
    expr(s"filter(split($textCol, ' '), t -> t <> '')")

  /** Repeated-span excision over `docs(idCol, textCol)` with window
    * width `n` tokens. Returns one row per AFFECTED document:
    * (idCol, n_tokens, n_tokens_removed, n_spans_removed, text_clean)
    * where n_spans_removed counts maximal removed runs and text_clean
    * is the surviving tokens joined by single spaces.
    *
    * `stagingDir`: the occurrence expansion fans out to both the
    * gram-stats aggregate and the mark join, so it must be pinned.
    * `None` (default) pins with `localCheckpoint()` — exact and fast
    * in local mode, but checkpoint blocks live on executors, so an
    * executor loss mid-job recomputes nothing and fails the job. At
    * cluster scale pass `Some(dir)`: the expansion is written once to
    * `dir/spandedup-occ` as parquet and re-read by both consumers —
    * executor-loss-safe (any task re-reads from the filesystem), at
    * the cost of one materialized write (the staging-table
    * discipline of [[graft.streaming.Staging]]).
    */
  def excise(docs: DataFrame, idCol: String, textCol: String,
      n: Int, stagingDir: Option[String] = None): DataFrame = {
    require(n >= 2, s"span width must be >= 2 tokens: $n")
    val occ0 = docs
      .select(col(idCol).as("__id"), toks(textCol).as("__toks"))
      // Enforce the PosBits encoding invariants (see PosBits): raise
      // on violation instead of silently mis-ordering occurrences.
      .select(
        expr(
          s"""case when __id >= 0 and __id < ${MaxDocId}L then __id
             |else raise_error(concat(
             |  'SpanDedup: doc id outside [0, 2^43): ',
             |  coalesce(cast(__id as string), 'null'))) end"""
            .stripMargin).as("__id"),
        expr(
          s"""case when size(__toks) < ${1 << PosBits} then __toks
             |else raise_error(concat(
             |  'SpanDedup: document exceeds 2^20 tokens: ',
             |  cast(size(__toks) as string))) end"""
            .stripMargin).as("__toks"))
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
    // fans out to the gram-stats aggregate and the mark join — pinned
    // either on executors (localCheckpoint) or on the filesystem
    // (staging table; survives executor loss)
    val occ = stagingDir match {
      case Some(dir) =>
        val path = s"$dir/spandedup-occ"
        occ0.write.mode("overwrite").parquet(path)
        docs.sparkSession.read.parquet(path)
      case None => occ0.localCheckpoint()
    }
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
    // Island merge over the SORTED marked window starts: window i and
    // its predecessor share one maximal covered run iff
    // start_i − start_{i−1} ≤ n (≤ n−1 overlaps; = n is adjacent).
    // __bnd holds the 0-based indices into __mpos where a new island
    // begins; islands materialize as (s, e) covered intervals. All
    // passes are O(marked windows) with O(1) element_at indexing.
    docs
      .select(col(idCol).as("__id"), toks(textCol).as("__toks"))
      .join(marked, "__id")
      .withColumn("__bnd", expr(
        s"""filter(sequence(0, size(__mpos) - 1), i -> i = 0 or
           |  element_at(__mpos, i + 1) - element_at(__mpos, i) > ${n}L)"""
          .stripMargin))
      .withColumn("__isl", expr(
        s"""transform(sequence(0, size(__bnd) - 1), j -> named_struct(
           |  's', element_at(__mpos, element_at(__bnd, j + 1) + 1),
           |  'e', element_at(__mpos, if(j + 1 < size(__bnd),
           |         element_at(__bnd, j + 2), size(__mpos)))
           |       + ${n - 1}L))""".stripMargin))
      .select(col("__id").as(idCol),
        size(col("__toks")).cast("long").as("n_tokens"),
        expr("aggregate(__isl, 0L, (a, x) -> a + x.e - x.s + 1L)")
          .as("n_tokens_removed"),
        size(col("__isl")).cast("long").as("n_spans_removed"),
        // clean text = the gap slices between islands (plus head/tail),
        // concatenated in order; empty gaps slice to empty arrays
        expr(
          """array_join(flatten(transform(sequence(0, size(__isl)),
            |  j -> slice(__toks,
            |    cast(if(j = 0, 0L, element_at(__isl, j).e + 1L)
            |      as int) + 1,
            |    cast(greatest(0L,
            |      if(j < size(__isl), element_at(__isl, j + 1).s - 1L,
            |        size(__toks) - 1L)
            |      - if(j = 0, 0L, element_at(__isl, j).e + 1L)
            |      + 1L) as int)))), ' ')""".stripMargin)
          .as("text_clean"))
  }
}
