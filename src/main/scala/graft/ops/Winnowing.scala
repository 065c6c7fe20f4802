package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken,
  * SIGMOD'03 — the MOSS algorithm) over character L-grams — the
  * repeated-substring / memorization-audit primitive (the motivation
  * behind "Deduplicating Training Data Makes Language Models Better",
  * Lee et al. '22): any substring shared between two documents with
  * length ≥ L + w − 1 is GUARANTEED to contribute at least one
  * identical selected fingerprint to both (every window of w
  * consecutive grams selects its minimum hash, and selection is
  * content-defined, so alignment never matters). Grouping selections
  * by gram across the corpus therefore finds every sufficiently-long
  * repeated sequence — boilerplate, licenses, templates — without any
  * pairwise comparison.
  *
  * Scale shape: ENTIRELY scan-local until the final count — the
  * per-position gram hashes are one in-array `transform`, the
  * trailing-window minimum test is a w−1-term conjunction over the
  * hash array (selection is h[j] ≤ every hash in its trailing window
  * — algebraically identical to h[j] = windowed MIN, which is how the
  * oracle replays it), and per-doc dedup is `array_distinct` — so the
  * n_chars-sized gram stream NEVER shuffles; the only shuffle is the
  * partial-agg count over the ~n/w selected grams. Ties inside a
  * window select both positions — deterministic in any engine.
  */
object Winnowing {

  /** Distinct (id, gram) selections: position j's L-gram is selected
    * iff its hash is ≤ each of the w−1 preceding gram hashes (≡ the
    * trailing-window-of-w minimum; partial leading windows
    * participate). Hashes are the repo's 60-bit md5 convention.
    */
  def selectedGrams(docs: DataFrame, idCol: String, textCol: String,
      l: Int, w: Int): DataFrame = {
    require(l >= 2 && w >= 1, s"bad winnowing params: L=$l w=$w")
    val guards = (1 until w).map(k =>
      s"(j <= $k or element_at(hs, j) <= element_at(hs, j - $k))")
      .mkString(" and ")
    val selectedSql =
      if (w == 1) "sequence(1, size(hs))"
      else s"filter(sequence(1, size(hs)), j -> $guards)"
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
