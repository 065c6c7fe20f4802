package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Paragraph-level exact dedup (SURVEY §2.11 extension; the sub-document
  * granularity the document-level families — exact q24, MinHash q25,
  * n-gram q64, semantic q97 — cannot touch): repeated boilerplate
  * segments *inside* otherwise-distinct documents are removed
  * first-occurrence-wins, the step published curation pipelines run
  * alongside document-level MinHash.
  *
  * Paragraph model: fixed `parLen`-token segments of the whitespace
  * token stream (the corpus has no newline structure; for corpora that
  * do, split on the real separator upstream and pass parLen-sized
  * normalized units). Normalization = trim + drop empties, mirrored
  * exactly by the q101 oracle.
  *
  * Plan shape at 100 TB: the winner election and keep/drop decisions
  * travel as (doc_id, par_idx, md5) only — paragraph TEXT never enters
  * those shuffles. Text crosses the wire exactly once, in the final
  * reassembly join of the per-doc kept-index arrays back onto the
  * document scan, where the kept paragraphs are re-derived scan-locally
  * and filtered by index membership.
  */
object ParagraphDedup {

  /** Scan-local paragraph stream: (id, par_idx, para) — one posexplode
    * of the `parLen`-token segments, empties dropped.
    */
  def paragraphs(docs: DataFrame, idCol: String, textCol: String,
      parLen: Int): DataFrame = {
    require(parLen > 0, s"parLen must be positive: $parLen")
    docs
      .select(col(idCol), split(col(textCol), " ").as("__t"))
      .select(col(idCol), posexplode(expr(
        s"""transform(
           |  sequence(0, greatest(cast(ceil(size(__t) / ${parLen}.0d)
           |                       as int), 1) - 1),
           |  i -> trim(array_join(slice(__t, i * $parLen + 1, $parLen),
           |            ' ')))""".stripMargin)))
      .select(col(idCol), col("pos").as("par_idx"), col("col").as("para"))
      .filter(col("para") =!= "")
  }

  /** Keep/drop decision per (doc, paragraph): first occurrence — the
    * minimum (doc_id, par_idx) — of each distinct paragraph hash wins.
    * Ids and 32-byte hashes only; no text in any shuffle here.
    */
  def decisions(docs: DataFrame, idCol: String, textCol: String,
      parLen: Int): DataFrame = {
    val ids = paragraphs(docs, idCol, textCol, parLen)
      .select(col(idCol), col("par_idx"), md5(graft.expressions.UnicodeNormalize.nfc(col("para"))).as("__ph"))
    val winners = ids
      .groupBy("__ph")
      .agg(min(struct(col(idCol), col("par_idx"))).as("__w"))
    ids.join(winners, "__ph")
      .select(col(idCol), col("par_idx"),
        (col(s"__w.$idCol") === col(idCol) &&
          col("__w.par_idx") === col("par_idx")).as("keep"))
  }

  /** Incremental form (the E53/E89/E93 axis at paragraph granularity):
    * keep/drop decisions for an incoming BATCH against an existing
    * history corpus. A batch paragraph is kept iff it is unseen in
    * history AND the first occurrence within the batch; the two drop
    * causes are reported separately. History reduces to a distinct
    * 32-byte hash set computed once (the stored artifact in
    * production), so per-batch cost is independent of history size,
    * and as in [[decisions]] no text enters any shuffle.
    */
  def incrementalDecisions(history: DataFrame, batch: DataFrame,
      idCol: String, textCol: String, parLen: Int): DataFrame = {
    val histH = paragraphs(history, idCol, textCol, parLen)
      .select(md5(graft.expressions.UnicodeNormalize.nfc(col("para"))).as("__ph")).distinct()
    val ids = paragraphs(batch, idCol, textCol, parLen)
      .select(col(idCol), col("par_idx"), md5(graft.expressions.UnicodeNormalize.nfc(col("para"))).as("__ph"))
    val winners = ids.groupBy("__ph")
      .agg(min(struct(col(idCol), col("par_idx"))).as("__w"))
    ids.join(winners, "__ph")
      .join(histH.withColumn("__seen", lit(true)), Seq("__ph"), "left")
      .select(col(idCol), col("par_idx"),
        coalesce(col("__seen"), lit(false)).as("seen_in_history"),
        (col(s"__w.$idCol") === col(idCol) &&
          col("__w.par_idx") === col("par_idx")).as("first_in_batch"))
  }

  /** Per-document summary after first-occurrence-wins removal:
    * (id, n_paras, n_kept, kept_md5) where kept_md5 fingerprints the
    * document rebuilt from its surviving paragraphs in order. The
    * rebuild re-derives paragraphs scan-locally on the document side
    * and filters them by the kept-index array — the only join that
    * carries text.
    */
  def dedupSummary(docs: DataFrame, idCol: String, textCol: String,
      parLen: Int): DataFrame = {
    val perDoc = decisions(docs, idCol, textCol, parLen)
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_paras"),
        sum(col("keep").cast("long")).as("n_kept"),
        sort_array(collect_list(when(col("keep"), col("par_idx"))))
          .as("__kept_idx"))
    reassemble(docs, idCol, textCol, parLen, perDoc,
      Seq("n_paras", "n_kept"))
  }

  /** Corpus-frequency boilerplate removal (the CCNet/C4 policy, the
    * complement of [[dedupSummary]]'s first-occurrence-wins): a
    * paragraph whose hash appears in ≥ `minDocs` DISTINCT documents is
    * boilerplate — navigation chrome, licence footers, cookie banners —
    * and is removed from EVERY document, first occurrence included
    * (first-occurrence-wins would keep one copy of the cookie banner;
    * this policy says no copy belongs in the training corpus).
    *
    * Scale shape: document frequency is one distinct + one count over
    * (hash, doc) pairs — 32-byte keys, text never shuffles; the
    * boilerplate set is corpus-chrome-sized and broadcasts back onto
    * the paragraph stream; reassembly is [[dedupSummary]]'s single
    * text-carrying join.
    */
  def boilerplateSummary(docs: DataFrame, idCol: String, textCol: String,
      parLen: Int, minDocs: Int): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2: $minDocs")
    val ids = paragraphs(docs, idCol, textCol, parLen)
      .select(col(idCol), col("par_idx"), md5(graft.expressions.UnicodeNormalize.nfc(col("para"))).as("__ph"))
    val boiler = ids.select(col("__ph"), col(idCol)).distinct()
      .groupBy("__ph").agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= minDocs)
    val perDoc = ids
      .join(broadcast(boiler.select(col("__ph"),
        lit(true).as("__isb"))), Seq("__ph"), "left")
      .select(col(idCol), col("par_idx"),
        coalesce(col("__isb"), lit(false)).as("__boiler"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_paras"),
        sum(col("__boiler").cast("long")).as("n_boiler"),
        sort_array(collect_list(when(!col("__boiler"), col("par_idx"))))
          .as("__kept_idx"))
    reassemble(docs, idCol, textCol, parLen, perDoc,
      Seq("n_paras", "n_boiler"))
  }

  /** Shared reassembly: join per-doc kept-index arrays back onto the
    * document scan and fingerprint the doc rebuilt from surviving
    * paragraphs in order — the only join in either policy that
    * carries text.
    */
  private def reassemble(docs: DataFrame, idCol: String, textCol: String,
      parLen: Int, perDoc: DataFrame, statCols: Seq[String]): DataFrame =
    docs.select(col(idCol), col(textCol)).join(perDoc, idCol)
      .select(col(idCol) +: statCols.map(col) :+
        md5(expr(
          s"""array_join(
             |  filter(transform(
             |    sequence(0, greatest(cast(ceil(
             |        size(split($textCol, ' ')) / ${parLen}.0d) as int),
             |      1) - 1),
             |    i -> if(array_contains(__kept_idx, i),
             |            trim(array_join(slice(split($textCol, ' '),
             |              i * $parLen + 1, $parLen), ' ')),
             |            null)),
             |  x -> x is not null), ' ')""".stripMargin)).as("kept_md5"): _*)
}
