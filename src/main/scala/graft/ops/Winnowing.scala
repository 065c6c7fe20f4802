package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken,
  * SIGMOD'03 — the MOSS algorithm) over character L-grams — the
  * repeated-substring / memorization-audit primitive (the motivation
  * behind "Deduplicating Training Data Makes Language Models Better",
  * Lee et al. '22): any substring shared between two documents with
  * length ≥ L + w − 1 is GUARANTEED to contribute at least one
  * identical selected fingerprint to both. The paper's rule — select
  * position j iff h(j) is the minimum of SOME window of w consecutive
  * gram hashes containing j — makes the guarantee context-free: a
  * shared run of ≥ w grams contains at least one full window, that
  * window's content (hence its min) is identical in both documents,
  * and a window min depends only on the window's own content, never
  * on surrounding context. Grouping selections by gram across the
  * corpus therefore finds every sufficiently-long repeated sequence —
  * boilerplate, licenses, templates — without any pairwise
  * comparison. (A trailing-window-only rule — h(j) ≤ its w−1
  * PREDECESSORS — is a strict subset and loses the guarantee: a
  * smaller hash within w−1 grams BEFORE a boundary-length shared run
  * suppresses selection in one document but not the other.)
  *
  * Implementation: "min of some covering window" ≡ the two-sided run
  * test lrun(j) + rrun(j) ≥ min(w, n) − 1, where lrun/rrun count the
  * CONSECUTIVE neighbors left/right of j with hash ≥ h(j) (capped at
  * w − 1): the maximal ≥-interval around j has length lrun+rrun+1,
  * and a full w-window covering j fits inside it iff that length ≥ w.
  * Documents with fewer than w grams (n < w) fall back to their
  * global minimum (the min(w, n) clamp) so every non-empty document
  * still yields ≥ 1 fingerprint. Ties select every tied minimum —
  * deterministic in any engine, and the guarantee survives ties.
  *
  * Scale shape: ENTIRELY scan-local until the final count — hashing,
  * selection, and per-doc dedup are ONE native O(n_chars) codegen pass
  * per document ([[graft.expressions.WinnowSelect]]) — so the
  * n_chars-sized gram stream NEVER shuffles; the only shuffle is the
  * partial-agg count over the ~2n/(w+1) selected grams.
  */
object Winnowing {

  /** Distinct (id, gram) selections: position j's L-gram is selected
    * iff its hash is the minimum of some full window of w consecutive
    * gram hashes containing j (≡ lrun + rrun ≥ min(w, n) − 1; docs
    * with fewer than w grams select their global min). Hashes are the
    * repo's 60-bit md5 convention. Evaluates as the native O(n)
    * [[graft.expressions.WinnowSelect]] pass (monotonic-stack
    * nearest-smaller runs, one thread-local digest) — the SQL HOF form
    * below ([[selectedGramsSql]]) computes the identical selection
    * interpreted and is kept as the cross-implementation parity
    * reference (`WinnowingSpec` asserts native ≡ SQL on adversarial
    * inputs including multi-byte code points).
    */
  def selectedGrams(docs: DataFrame, idCol: String, textCol: String,
      l: Int, w: Int): DataFrame = {
    require(l >= 2 && w >= 1, s"bad winnowing params: L=$l w=$w")
    docs.select(col(idCol),
      explode(graft.expressions.WinnowSelect.grams(col(textCol), l, w))
        .as("gram"))
  }

  /** The SQL higher-order-function form of [[selectedGrams]] — two
    * interpreted O(w) run-length folds per position. Identical output;
    * retained as the parity oracle for the native expression (and as
    * the dialect-portable statement of the selection rule).
    */
  private[graft] def selectedGramsSql(docs: DataFrame, idCol: String,
      textCol: String, l: Int, w: Int): DataFrame = {
    require(l >= 2 && w >= 1, s"bad winnowing params: L=$l w=$w")
    // Run-length fold: acc = k after step k iff steps 1..k ALL
    // qualified (acc = k−1 gates consecutiveness), so the final acc
    // is the length of the consecutive ≥-run next to j, capped w−1.
    def run(sign: String, bound: String) =
      s"""aggregate(sequence(1, ${w - 1}), 0, (acc, k) ->
         |  if(acc = k - 1 and $bound
         |     and element_at(hs, j $sign k) >= element_at(hs, j),
         |   k, acc))""".stripMargin
    val selectedSql =
      if (w == 1) "sequence(1, size(hs))"
      else
        s"""filter(sequence(1, size(hs)), j ->
           |  ${run("-", "j > k")} + ${run("+", "j + k <= size(hs)")}
           |  >= least($w, size(hs)) - 1)""".stripMargin
    docs
      .select(col(idCol), col(textCol).as("__t"))
      .withColumn("hs", expr(
        s"""case when length(__t) < $l
           |  then cast(array() as array<bigint>)
           |  else transform(sequence(1, length(__t) - ${l - 1}),
           |    j -> cast(conv(substring(md5(substring(__t, j, $l)),
           |      1, 15), 16, 10) as bigint)) end""".stripMargin))
      .select(col(idCol), explode(expr(
        s"""case when size(hs) = 0
           |  then cast(array() as array<string>)
           |  else array_distinct(transform($selectedSql,
           |    j -> substring(__t, j, $l))) end""".stripMargin))
        .as("gram"))
  }

  /** The memorization audit: the `topK` selected grams repeated
    * across the most documents (ties → lexicographically smallest
    * gram). Every shared run ≥ L + w − 1 chars surfaces here.
    */
  def repeatedGrams(docs: DataFrame, idCol: String, textCol: String,
      l: Int, w: Int, topK: Int): DataFrame =
    selectedGrams(docs, idCol, textCol, l, w)
      .groupBy("gram")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("n_docs").desc, col("gram"))
      .limit(topK)
}
