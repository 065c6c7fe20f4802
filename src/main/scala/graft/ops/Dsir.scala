package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Importance-resampling data selection over hashed n-gram features
  * (SURVEY §2.11 E224) — the DSIR shape (Xie et al. 2023, "Data
  * Selection for Language Models via Importance Resampling"): score
  * every raw document by how much more TARGET-like than RAW-typical
  * its token mix is, then keep the best under a token budget. The
  * curation step that tilts a crawl toward a reference corpus
  * (quality domain, target language, in-domain text) without training
  * a classifier — two count tables stand in for the two LMs.
  *
  * Exact-integer core (the [[CharLm]] discipline — logs are
  * transcendental, so the log-likelihood-ratio form would not replay
  * bit-exactly across engines): each hashed unigram bucket b gets the
  * scaled smoothed odds q(b) = ((cnt_target(b)+1) · 2^20) div
  * (cnt_raw(b)+1) — Laplace-smoothed target/raw frequency ratio, up
  * to the constant total-count normalizers, which shift every
  * bucket's q by the same factor and therefore never reorder
  * documents. A document scores the truncating MEAN of its tokens'
  * q — high when its words are target-typical, low when raw-typical
  * noise dominates. The ordering is the DSIR ranking in ratio space
  * rather than log space.
  *
  * Scale shape: both count tables are one scan-local hash expansion
  * into a ≤`buckets`-group partial agg — the model is
  * parameter-bounded (never vocabulary-sized), broadcasts onto the
  * scoring scan, and the per-doc reduce shuffles (id, two longs).
  * Selection composes [[Selection.underTokenBudget]]'s prefix-sum
  * machinery — no single-task window anywhere.
  */
object Dsir {

  /** 2^20 — the odds quantization, [[CharLm.Scale]]'s class. */
  val Scale = 1048576L

  private def tokens(textCol: String): Column =
    expr(s"filter(split($textCol, ' '), t -> t <> '')")

  private def bucketSql(tok: String, buckets: Int): String =
    s"cast(conv(substring(md5($tok), 1, 8), 16, 10) as bigint) % $buckets"

  /** Hashed-unigram bucket counts of a corpus: (bucket, cnt), at most
    * `buckets` rows — the count-table "LM" of the DSIR pair.
    */
  def hashedCounts(docs: DataFrame, textCol: String,
      buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    docs
      .select(explode(tokens(textCol)).as("__w"))
      .select(expr(bucketSql("__w", buckets)).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Per-document importance scores of `docs` under a
    * (`target`, `raw`) count-table pair from [[hashedCounts]]:
    * (idCol, n_tokens, sum_q, score_q) with score_q the truncating
    * mean scaled odds. Buckets absent from a table count 0 there
    * (Laplace floor); a bucket absent from BOTH scores q = 2^20
    * (odds 1 — no evidence either way). Zero-token documents have no
    * defined score and are absent.
    */
  def score(docs: DataFrame, idCol: String, textCol: String,
      target: DataFrame, raw: DataFrame, buckets: Int): DataFrame = {
    val model = raw.select(col("bucket"), col("cnt").as("__cr"))
      .join(target.select(col("bucket"), col("cnt").as("__ct")),
        Seq("bucket"), "full_outer")
      .select(col("bucket"), expr(
        s"(coalesce(__ct, 0L) + 1L) * ${Scale}L div (coalesce(__cr, 0L) + 1L)")
        .as("__q"))
    docs
      .select(col(idCol), explode(tokens(textCol)).as("__w"))
      .select(col(idCol), expr(bucketSql("__w", buckets)).as("bucket"))
      .join(broadcast(model), Seq("bucket"), "left")
      .select(col(idCol), coalesce(col("__q"), lit(Scale)).as("__q"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("__q")).as("sum_q"))
      .withColumn("score_q", expr("sum_q div n_tokens"))
  }
}
