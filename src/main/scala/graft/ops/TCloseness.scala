package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** t-closeness release audit (SURVEY §2.11 E274) — the third member of
  * the governance trio beside k-anonymity (group size) and l-diversity
  * (distinct sensitive values): a quasi-identifier group can be large
  * AND diverse yet still leak — if 90 % of one group sits in the top
  * sensitive band vs 30 % corpus-wide, membership alone shifts an
  * attacker's belief. t-closeness (Li, Li, Venkatasubramanian, ICDE
  * 2007) bounds the DISTANCE between each group's sensitive
  * distribution and the corpus-wide one.
  *
  * For ORDERED categorical bands the paper's distance is the
  * earth-mover distance with unit ground spacing, which has the exact
  * prefix-sum form EMD(p, q) = (1/(m−1)) · Σ_{i<m} |Σ_{j≤i} (p_j −
  * q_j)| — computed here entirely in int64 (the E97 TV-distance
  * idiom over ordered bands): with group band counts g_j (total G)
  * and corpus counts c_j (total C), each cumulative term is
  * |cumG_i·C − cumC_i·G| and emd_bp = Σ·10⁴ div ((m−1)·G·C). No
  * floats anywhere, so any engine reproduces the verdict bit-for-bit.
  * The cross-multiplied terms run in DECIMAL(38,0) (still exact
  * integers — Spark and DuckDB decimal arithmetic is exact at scale
  * 0): in int64, cumG·C alone wraps once G·C exceeds ~9.2×10¹⁸/10⁴,
  * which a coarse QI rung (G ≈ C/5) reaches near ~10⁸ audited rows —
  * a silently negative EMD would PASS the very group the audit
  * exists to catch. Decimal(38,0) extends the exact range to ~10¹⁶
  * rows; the final floor-division is computed as (n − n mod d)/d,
  * which is exact in decimal because the adjusted numerator is
  * divisible (and the quotient ≤ 10⁴ by TV ≤ 1).
  *
  * Scale shape: one partial-agg rollup to (QI, band counts) — only
  * group-bounded rows shuffle — and the corpus distribution is a
  * 1-row broadcast; the EMD is scan-local arithmetic on the grouped
  * rows. Same cost class as the k-anon/l-div audits it completes.
  */
object TCloseness {

  /** Per-QI-group audit rows: the QI columns, `n_rows`, `l_distinct`
    * (distinct sensitive bands present — the l-diversity count, kept
    * beside the distance so the homogeneity-blind class "l-diverse
    * but t-far" is visible in one table), `emd_bp` (exact-integer
    * ordered-band EMD vs the corpus, basis points), and `t_ok`
    * (emd_bp ≤ `tBp`). `bandCol` must evaluate to the band INDEX
    * 0..nBands−1 in the sensitive attribute's order.
    */
  def audit(df: DataFrame, qiCols: Seq[(String, Column)], bandCol: Column,
      nBands: Int, tBp: Long): DataFrame = {
    require(nBands >= 2, s"need >= 2 ordered bands: $nBands")
    require(tBp >= 0, s"tBp must be non-negative: $tBp")
    // an out-of-domain or NULL band would silently vanish from both
    // distributions (its rows land in no band sum) — a governance
    // audit must fail fast instead of under-reporting violations
    val checkedBand = {
      val b = bandCol.cast("long")
      when(b.isNull || b < 0 || b >= nBands,
        raise_error(concat(lit(s"band index outside 0..${nBands - 1}: "),
          coalesce(b.cast("string"), lit("NULL")))).cast("long"))
        .otherwise(b)
    }
    val base = df.select(qiCols.map { case (n, c) => c.as(n) } :+
      checkedBand.as("__b"): _*)
    def bandSums(prefix: String): Seq[Column] = (0 until nBands)
      .map(j => sum(when(col("__b") === j, 1L).otherwise(0L))
        .as(s"$prefix$j"))
    val grouped = base.groupBy(qiCols.map(q => col(q._1)): _*)
      .agg(bandSums("__g").head, bandSums("__g").tail: _*)
    val corpus = base.agg(bandSums("__c").head, bandSums("__c").tail: _*)
    val g = (0 until nBands).map(j => col(s"__g$j")).reduce(_ + _)
    val c = (0 until nBands).map(j => col(s"__c$j")).reduce(_ + _)
    val dec = "decimal(38,0)"
    def cum(prefix: String, i: Int): Column =
      (0 to i).map(j => col(s"$prefix$j")).reduce(_ + _).cast(dec)
    val numer = (0 until nBands - 1)
      .map(i => abs(cum("__g", i) * c.cast(dec) -
        cum("__c", i) * g.cast(dec)))
      .reduce(_ + _)
    grouped.crossJoin(broadcast(corpus))
      .withColumn("n_rows", g)
      .withColumn("l_distinct", (0 until nBands)
        .map(j => when(col(s"__g$j") > 0, 1L).otherwise(0L))
        .reduce(_ + _))
      .withColumn("__num", (numer * lit(10000L).cast(dec)).cast(dec))
      .withColumn("__den", (lit((nBands - 1).toLong).cast(dec)
        * g.cast(dec) * c.cast(dec)).cast(dec))
      // exact floor division in decimal: (n − n mod d)/d — the
      // adjusted numerator is divisible, and the quotient ≤ 10⁴, so
      // the decimal divide is exact and the bigint cast lossless
      .withColumn("emd_bp",
        ((col("__num") - col("__num") % col("__den")) / col("__den"))
          .cast("bigint"))
      .withColumn("t_ok", col("emd_bp") <= tBp)
      .drop((0 until nBands).flatMap(j => Seq(s"__g$j", s"__c$j")) ++
        Seq("__num", "__den"): _*)
  }
}
