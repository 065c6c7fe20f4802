package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expressions.LongDot
import graft.functions.{QuantizedCentroid, TextFns, TopK}
import graft.ops.{Audio, Video, Bfs, Blooms, Bpe, Cardinality, CharLm, Classifier, Cogrouped, Contamination, Dedup, DedupClusters, DenseId, Drift, Dsir, FreqSketch, FuzzyJoin, GapFill, JoinEstimate, KCenter, KCore, KMeans, Mixing, ModelStore, Multimodal, NearDup, Nested, Packing, PageRank, ParagraphDedup, Paths, Percentiles, PhraseExcise, ProductQuant, Salting, Sampling, Scd, Selection, Sessionize, Sharding, SetSimJoin, Similarity, Skyline, Snm, SpanDedup, TableDiff, TCloseness, Triangles, Winnowing}
import graft.streaming.{BudgetAdmission, EventStream, IncrementalClusters, NearDupIndex, RateMonitor, SemanticDedupScreen, StatefulSessions, VersionedStore}

/** Oracle SQL entries, slice 3 of 3 (split from TrainQueries;
  * every `SparkEntry.queries` key resolves to exactly one entry
  * across the three slices — `SurveyRegistrySpec` enforces the
  * pairing). Shared CTE fragments come from [[TrainQueries]].
  */
private[graft] object TrainOracles3 {
  import TrainQueries._
  import TrainQueriesCore._
  import TrainQueriesCuration._
  import TrainQueriesMedia._

  val entries: Map[String, String] = Map(
    // q275: the stored-IVF semantic screen's recall vs the exact flag
    // set — the oracle RETRAINS the k=8/iters=2 coarse model in SQL
    // (the q115/q129 cl_* chain: lowest-id seeding, (d, j) tie-break,
    // truncating-division updates over ALL nonzero vectors), probes
    // each %50 eval vector's 2 nearest cells, runs the in-cell exact
    // cosine top-1, and compares against the q273 exact top-1 flags.
    "q275_semantic_contam_ivf" ->
      s"""WITH $quantCte,
         $qlistCte,
         qf AS (SELECT q.vec_id, q.i, q.x FROM q JOIN nrm USING (vec_id)),
         ids_cl AS (SELECT vec_id,
             CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS j
           FROM nrm ORDER BY vec_id LIMIT 8),
         cl_c0 AS (SELECT ids_cl.j, t.i, t.x FROM qf t
           JOIN ids_cl USING (vec_id)),
         cl_d1 AS (SELECT t.vec_id, c.j,
             SUM((t.x - c.x) * (t.x - c.x)) AS d
           FROM qf t JOIN cl_c0 c ON t.i = c.i GROUP BY 1, 2),
         cl_a1 AS (SELECT vec_id, j AS cluster FROM (
             SELECT vec_id, j, row_number() OVER
               (PARTITION BY vec_id ORDER BY d, j) AS rn FROM cl_d1)
           WHERE rn = 1),
         cl_s1 AS (SELECT a.cluster, t.i, SUM(t.x) AS sx, COUNT(*) AS n
           FROM qf t JOIN cl_a1 a USING (vec_id) GROUP BY 1, 2),
         cl_c1 AS (SELECT c.j, c.i,
             CAST(COALESCE(s.sx // s.n, c.x) AS BIGINT) AS x
           FROM cl_c0 c LEFT JOIN cl_s1 s ON c.j = s.cluster AND c.i = s.i),
         cl_d2 AS (SELECT t.vec_id, c.j,
             SUM((t.x - c.x) * (t.x - c.x)) AS d
           FROM qf t JOIN cl_c1 c ON t.i = c.i GROUP BY 1, 2),
         cl_a2 AS (SELECT vec_id, j AS cluster FROM (
             SELECT vec_id, j, row_number() OVER
               (PARTITION BY vec_id ORDER BY d, j) AS rn FROM cl_d2)
           WHERE rn = 1),
         cl_s2 AS (SELECT a.cluster, t.i, SUM(t.x) AS sx, COUNT(*) AS n
           FROM qf t JOIN cl_a2 a USING (vec_id) GROUP BY 1, 2),
         cl_c2 AS (SELECT c.j, c.i,
             CAST(COALESCE(s.sx // s.n, c.x) AS BIGINT) AS x
           FROM cl_c1 c LEFT JOIN cl_s2 s ON c.j = s.cluster AND c.i = s.i),
         cl_dfin AS (SELECT t.vec_id, c.j,
             SUM((t.x - c.x) * (t.x - c.x)) AS d
           FROM qf t JOIN cl_c2 c ON t.i = c.i GROUP BY 1, 2),
         cl_afin AS (SELECT vec_id, j AS cluster FROM (
             SELECT vec_id, j, row_number() OVER
               (PARTITION BY vec_id ORDER BY d, j) AS rn FROM cl_dfin)
           WHERE rn = 1),
         probed AS (SELECT vec_id AS query_id, j AS cell FROM (
             SELECT vec_id, j, row_number() OVER
               (PARTITION BY vec_id ORDER BY d, j) AS rn FROM cl_dfin
             WHERE vec_id % 50 = 0)
           WHERE rn <= 2),
         fined AS (SELECT p.query_id, ca.vec_id AS id_b,
             CAST(list_inner_product(a.xs, b.xs) AS BIGINT) AS dot
           FROM probed p
           JOIN cl_afin ca ON ca.cluster = p.cell AND ca.vec_id % 50 <> 0
           JOIN qv a ON a.vec_id = p.query_id
           JOIN qv b ON b.vec_id = ca.vec_id),
         fs AS (SELECT query_id, id_b, CAST(dot AS DOUBLE) /
             (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE)))
               AS sim
           FROM fined JOIN nrm na ON fined.query_id = na.vec_id
                      JOIN nrm nb ON fined.id_b = nb.vec_id),
         ivf1 AS (SELECT query_id, id_b, sim FROM (
             SELECT query_id, id_b, sim, row_number() OVER
               (PARTITION BY query_id ORDER BY sim DESC, id_b ASC) AS rn
             FROM fs)
           WHERE rn = 1),
         exd AS (SELECT a.vec_id AS query_id, b.vec_id AS id_b,
             CAST(list_inner_product(a.xs, b.xs) AS BIGINT) AS dot
           FROM qv a, qv b
           WHERE a.vec_id % 50 = 0 AND b.vec_id % 50 <> 0),
         exs AS (SELECT query_id, id_b, CAST(dot AS DOUBLE) /
             (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE)))
               AS sim
           FROM exd JOIN nrm na ON exd.query_id = na.vec_id
                    JOIN nrm nb ON exd.id_b = nb.vec_id),
         ex1 AS (SELECT query_id, id_b, sim FROM (
             SELECT query_id, id_b, sim, row_number() OVER
               (PARTITION BY query_id ORDER BY sim DESC, id_b ASC) AS rn
             FROM exs)
           WHERE rn = 1),
         agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_eval,
             CAST(SUM(CASE WHEN e.sim >= 0.3 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_flagged_exact,
             CAST(SUM(CASE WHEN v.sim >= 0.3 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_flagged_ivf,
             CAST(SUM(CASE WHEN e.sim >= 0.3 AND v.sim >= 0.3
               THEN 1 ELSE 0 END) AS BIGINT) AS n_flag_hits,
             CAST(SUM(CASE WHEN e.id_b = v.id_b THEN 1 ELSE 0 END)
               AS BIGINT) AS n_top1_hits
           FROM ex1 e LEFT JOIN ivf1 v USING (query_id))
         SELECT 'ivf_semantic' AS method, CAST(2 AS BIGINT) AS nprobe,
             n_eval, n_flagged_exact, n_flagged_ivf, n_flag_hits,
             CASE WHEN n_flagged_exact = 0 THEN 1.0
               ELSE CAST(n_flag_hits AS DOUBLE)
                 / CAST(n_flagged_exact AS DOUBLE) END AS flag_recall,
             CAST(n_top1_hits AS DOUBLE) / CAST(n_eval AS DOUBLE)
               AS top1_recall
         FROM agg""",
    // q280: the PNG fps replay closed-form (q277's px chain), the
    // distinct-fp band graph + recursive-CTE closure is metadata-sized
    // by construction (22 fps at sf1), and the keep policy is the
    // q274 argmax.
    "q280_raster_clusters" ->
      """WITH RECURSIVE m AS (SELECT doc_id,
             CAST(16 + ((doc_id // 3) % 3) * 8 AS BIGINT) AS w,
             CAST(16 + (doc_id % 2) * 8 AS BIGINT) AS h,
             text
           FROM documents WHERE doc_id % 3 = 0),
         px AS (SELECT doc_id, w, h, (i * 60) // (w * h * 3) AS blk,
             CASE i % 3 WHEN 0 THEN (((i // 3) % w) * 255) // (w - 1)
                        WHEN 1 THEN (((i // 3) // w) * 255) // (h - 1)
                        ELSE (doc_id * 37) % 256 END AS v
           FROM m, unnest(range(0, w * h * 3)) u(i)),
         cs AS (SELECT doc_id, blk, CAST(SUM(v) AS BIGINT) AS s
           FROM px GROUP BY 1, 2),
         tt AS (SELECT doc_id, CAST(SUM(v) AS BIGINT) AS total
           FROM px GROUP BY 1),
         fpt AS (SELECT cs.doc_id,
             CAST(SUM(CASE WHEN cs.s * 60 > tt.total
               THEN 1::BIGINT << cs.blk ELSE 0 END) AS BIGINT) AS fp
           FROM cs JOIN tt ON cs.doc_id = tt.doc_id GROUP BY cs.doc_id),
         dfp AS (SELECT DISTINCT fp FROM fpt),
         bnd AS (SELECT fp, ((fp >> (b.b * 15)) & 32767) * 4 + b.b AS bk
           FROM dfp, unnest(range(0, 4)) b(b)),
         e AS (SELECT DISTINCT a.fp AS fa, c.fp AS fb
           FROM bnd a JOIN bnd c ON a.bk = c.bk AND a.fp < c.fp
           WHERE bit_count(xor(a.fp, c.fp)) <= 8),
         sym AS (SELECT fa AS src, fb AS dst FROM e
                 UNION SELECT fb, fa FROM e),
         r AS (SELECT src AS node, dst AS peer FROM sym
               UNION
               SELECT r.node, s.dst FROM r JOIN sym s ON r.peer = s.src),
         lab AS (SELECT node, LEAST(node, MIN(peer)) AS cluster_rep
           FROM r GROUP BY node),
         tk AS (SELECT doc_id, text,
             list_filter(string_split(text, ' '), t -> t <> '') AS toks
           FROM m),
         qq AS (SELECT doc_id, CAST(floor((
               0.5 * least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0)
               + 0.3 * (1.0 - CAST(len(list_filter(toks,
                     w -> w IN ('the','a','of','and','is')))
                   AS DOUBLE) / CAST(len(toks) AS DOUBLE))
               + 0.2 * least(((CAST(length(text) AS DOUBLE)
                     - (CAST(len(toks) AS DOUBLE) - 1.0))
                   / CAST(len(toks) AS DOUBLE)) / 8.0, 1.0)
             ) * 10000.0 + 0.5) AS BIGINT) AS q_bp
           FROM tk),
         dl AS (SELECT f.doc_id, f.fp,
             COALESCE(l.cluster_rep, f.fp) AS cluster_rep, q.q_bp
           FROM fpt f LEFT JOIN lab l ON f.fp = l.node
           JOIN qq q ON f.doc_id = q.doc_id),
         win AS (SELECT cluster_rep, doc_id, q_bp, row_number() OVER
             (PARTITION BY cluster_rep ORDER BY q_bp DESC, doc_id ASC)
             AS rn
           FROM dl),
         agg AS (SELECT cluster_rep, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_fps
           FROM dl GROUP BY 1)
         SELECT a.cluster_rep, a.n_docs, a.n_fps,
             w.doc_id AS kept_doc, w.q_bp AS kept_q_bp
         FROM agg a JOIN win w
           ON a.cluster_rep = w.cluster_rep AND w.rn = 1
         ORDER BY a.cluster_rep""",
    // q279: exact-integer ordered-band EMD per QI group vs the corpus
    // (prefix |Δ| cross-multiplied sums — pure int64, `//` mirrors
    // Spark's div), three generalization rungs, t = 1000 bp.
    "q279_t_closeness" ->
      """WITH b AS (SELECT c_nationkey, c_mktsegment, n_regionkey,
             CASE WHEN CAST(c_acctbal AS DECIMAL(18,2)) < 0 THEN 0
                  WHEN CAST(c_acctbal AS DECIMAL(18,2)) < 5000 THEN 1
                  ELSE 2 END AS band
           FROM customer JOIN nation ON c_nationkey = n_nationkey),
         corpus AS (SELECT
             SUM(CASE WHEN band = 0 THEN 1 ELSE 0 END) AS c0,
             SUM(CASE WHEN band = 1 THEN 1 ELSE 0 END) AS c1,
             COUNT(*) AS c FROM b),
         g0 AS (SELECT c_nationkey, c_mktsegment,
             SUM(CASE WHEN band = 0 THEN 1 ELSE 0 END) AS g0,
             SUM(CASE WHEN band = 1 THEN 1 ELSE 0 END) AS g1,
             SUM(CASE WHEN band = 2 THEN 1 ELSE 0 END) AS g2,
             COUNT(*) AS gg
           FROM b GROUP BY 1, 2),
         g1 AS (SELECT n_regionkey, c_mktsegment,
             SUM(CASE WHEN band = 0 THEN 1 ELSE 0 END) AS g0,
             SUM(CASE WHEN band = 1 THEN 1 ELSE 0 END) AS g1,
             SUM(CASE WHEN band = 2 THEN 1 ELSE 0 END) AS g2,
             COUNT(*) AS gg
           FROM b GROUP BY 1, 2),
         g2 AS (SELECT n_regionkey,
             SUM(CASE WHEN band = 0 THEN 1 ELSE 0 END) AS g0,
             SUM(CASE WHEN band = 1 THEN 1 ELSE 0 END) AS g1,
             SUM(CASE WHEN band = 2 THEN 1 ELSE 0 END) AS g2,
             COUNT(*) AS gg
           FROM b GROUP BY 1),
         e0 AS (SELECT gg,
             (CASE WHEN g0 > 0 THEN 1 ELSE 0 END
              + CASE WHEN g1 > 0 THEN 1 ELSE 0 END
              + CASE WHEN g2 > 0 THEN 1 ELSE 0 END) AS l_distinct,
             (abs(g0 * c - c0 * gg) + abs((g0 + g1) * c - (c0 + c1) * gg))
               * 10000 // (2 * gg * c) AS emd_bp
           FROM g0, corpus),
         e1 AS (SELECT gg,
             (CASE WHEN g0 > 0 THEN 1 ELSE 0 END
              + CASE WHEN g1 > 0 THEN 1 ELSE 0 END
              + CASE WHEN g2 > 0 THEN 1 ELSE 0 END) AS l_distinct,
             (abs(g0 * c - c0 * gg) + abs((g0 + g1) * c - (c0 + c1) * gg))
               * 10000 // (2 * gg * c) AS emd_bp
           FROM g1, corpus),
         e2 AS (SELECT gg,
             (CASE WHEN g0 > 0 THEN 1 ELSE 0 END
              + CASE WHEN g1 > 0 THEN 1 ELSE 0 END
              + CASE WHEN g2 > 0 THEN 1 ELSE 0 END) AS l_distinct,
             (abs(g0 * c - c0 * gg) + abs((g0 + g1) * c - (c0 + c1) * gg))
               * 10000 // (2 * gg * c) AS emd_bp
           FROM g2, corpus)
         SELECT CAST(0 AS BIGINT) AS level, 'nation,segment' AS qi,
             CAST(COUNT(*) AS BIGINT) AS n_groups,
             CAST(SUM(CASE WHEN emd_bp > 1000 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_t_fail,
             CAST(SUM(CASE WHEN l_distinct >= 3 AND emd_bp > 1000
               THEN 1 ELSE 0 END) AS BIGINT) AS n_ldiv_ok_t_fail,
             CAST(MAX(emd_bp) AS BIGINT) AS max_emd_bp
         FROM e0
         UNION ALL
         SELECT CAST(1 AS BIGINT), 'region,segment',
             CAST(COUNT(*) AS BIGINT),
             CAST(SUM(CASE WHEN emd_bp > 1000 THEN 1 ELSE 0 END)
               AS BIGINT),
             CAST(SUM(CASE WHEN l_distinct >= 3 AND emd_bp > 1000
               THEN 1 ELSE 0 END) AS BIGINT),
             CAST(MAX(emd_bp) AS BIGINT)
         FROM e1
         UNION ALL
         SELECT CAST(2 AS BIGINT), 'region',
             CAST(COUNT(*) AS BIGINT),
             CAST(SUM(CASE WHEN emd_bp > 1000 THEN 1 ELSE 0 END)
               AS BIGINT),
             CAST(SUM(CASE WHEN l_distinct >= 3 AND emd_bp > 1000
               THEN 1 ELSE 0 END) AS BIGINT),
             CAST(MAX(emd_bp) AS BIGINT)
         FROM e2
         ORDER BY level""",
    // q278: the oracle re-plants the marker corpus (marker lists from
    // the same stopwordProfiles constant — one source of truth),
    // re-derives the per-language profiles from the training split
    // (the q250 discovery SQL) and re-scores the held-out split —
    // token-occurrence counts per (doc, lang), argmax ties to lang
    // ASC, no-hit docs fall back to 'und' — so a green row proves
    // stored-model scoring ≡ inline-trained scoring.
    "q278_stored_lang_id" -> storedLangIdOracle,
    // q277: the PNG-leg blockhash replays bit-exactly from the
    // closed-form gradient (q252/q265/q267's px CTE); the JPEG-leg
    // raster proximity is the TRUE claim (spec-measured, no
    // cross-engine bit contract for a lossy codec); caption canonical
    // fps (q263's form) and the q274 quality formula replay exactly.
    "q277_pair_curation" ->
      """WITH m AS (SELECT doc_id,
             CAST(16 + ((doc_id // 3) % 3) * 8 AS BIGINT) AS w,
             CAST(16 + (doc_id % 2) * 8 AS BIGINT) AS h,
             text
           FROM documents WHERE doc_id % 3 = 0),
         px AS (SELECT doc_id, w, h, (i * 60) // (w * h * 3) AS blk,
             CASE i % 3 WHEN 0 THEN (((i // 3) % w) * 255) // (w - 1)
                        WHEN 1 THEN (((i // 3) // w) * 255) // (h - 1)
                        ELSE (doc_id * 37) % 256 END AS v
           FROM m, unnest(range(0, w * h * 3)) u(i)),
         cs AS (SELECT doc_id, blk, CAST(SUM(v) AS BIGINT) AS s
           FROM px GROUP BY 1, 2),
         tt AS (SELECT doc_id, CAST(SUM(v) AS BIGINT) AS total
           FROM px GROUP BY 1),
         fp AS (SELECT cs.doc_id,
             CAST(SUM(CASE WHEN cs.s * 60 > tt.total
               THEN 1::BIGINT << cs.blk ELSE 0 END) AS BIGINT) AS fp
           FROM cs JOIN tt ON cs.doc_id = tt.doc_id GROUP BY cs.doc_id),
         cap AS (SELECT doc_id, text AS cap_a,
             CASE WHEN (doc_id // 3) % 2 = 0
               THEN text || ' alternate caption variant'
               ELSE substr(text, 1, greatest(length(text) // 2, 1))
             END AS cap_b FROM m),
         cq AS (SELECT doc_id,
             md5(regexp_replace(lower(trim(nfc_normalize(cap_a))),
               '\s+', ' ', 'g')) AS cfa,
             md5(regexp_replace(lower(trim(nfc_normalize(cap_b))),
               '\s+', ' ', 'g')) AS cfb,
             list_filter(string_split(cap_a, ' '), t -> t <> '') AS ta,
             list_filter(string_split(cap_b, ' '), t -> t <> '') AS tb,
             cap_a, cap_b
           FROM cap),
         qq AS (SELECT doc_id, cfa, cfb,
             CAST(floor((
               0.5 * least(CAST(len(ta) AS DOUBLE) / 100.0, 1.0)
               + 0.3 * (1.0 - CAST(len(list_filter(ta,
                     w -> w IN ('the','a','of','and','is')))
                   AS DOUBLE) / CAST(len(ta) AS DOUBLE))
               + 0.2 * least(((CAST(length(cap_a) AS DOUBLE)
                     - (CAST(len(ta) AS DOUBLE) - 1.0))
                   / CAST(len(ta) AS DOUBLE)) / 8.0, 1.0)
             ) * 10000.0 + 0.5) AS BIGINT) AS q_a,
             CAST(floor((
               0.5 * least(CAST(len(tb) AS DOUBLE) / 100.0, 1.0)
               + 0.3 * (1.0 - CAST(len(list_filter(tb,
                     w -> w IN ('the','a','of','and','is')))
                   AS DOUBLE) / CAST(len(tb) AS DOUBLE))
               + 0.2 * least(((CAST(length(cap_b) AS DOUBLE)
                     - (CAST(len(tb) AS DOUBLE) - 1.0))
                   / CAST(len(tb) AS DOUBLE)) / 8.0, 1.0)
             ) * 10000.0 + 0.5) AS BIGINT) AS q_b
           FROM cq)
         SELECT q.doc_id AS base_id, q.doc_id + 1000000 AS twin_id,
             f.fp AS fp_base, TRUE AS raster_match,
             (q.cfa <> q.cfb) AS caption_differs,
             CASE WHEN q.q_b > q.q_a THEN q.doc_id + 1000000
               ELSE q.doc_id END AS kept_id,
             CASE WHEN q.q_b > q.q_a THEN q.q_b ELSE q.q_a END
               AS kept_q_bp,
             CASE WHEN q.q_b > q.q_a THEN q.doc_id
               ELSE q.doc_id + 1000000 END AS dropped_id
         FROM qq q JOIN fp f ON q.doc_id = f.doc_id
         ORDER BY base_id""",
    // q267: closed-form gradient blockhash per media doc (the q265
    // fp replay), staging NTILE batches, broadcast blocklist join.
    "q267_stream_media_screen" ->
      """WITH m AS (SELECT doc_id,
             CAST(16 + ((doc_id // 3) % 3) * 8 AS BIGINT) AS w,
             CAST(16 + (doc_id % 2) * 8 AS BIGINT) AS h,
             CAST(NTILE(3) OVER (ORDER BY doc_id) - 1 AS BIGINT)
               AS batch_id
           FROM documents WHERE doc_id % 3 = 0),
         px AS (SELECT doc_id, w, h, (i * 60) // (w * h * 3) AS blk,
             CASE i % 3 WHEN 0 THEN (((i // 3) % w) * 255) // (w - 1)
                        WHEN 1 THEN (((i // 3) // w) * 255) // (h - 1)
                        ELSE (doc_id * 37) % 256 END AS v
           FROM m, unnest(range(0, w * h * 3)) u(i)),
         cs AS (SELECT doc_id, blk, CAST(SUM(v) AS BIGINT) AS s
           FROM px GROUP BY 1, 2),
         tt AS (SELECT doc_id, CAST(SUM(v) AS BIGINT) AS total
           FROM px GROUP BY 1),
         fp AS (SELECT cs.doc_id,
             CAST(SUM(CASE WHEN cs.s * 60 > tt.total
               THEN 1::BIGINT << cs.blk ELSE 0 END) AS BIGINT) AS fp
           FROM cs JOIN tt ON cs.doc_id = tt.doc_id GROUP BY cs.doc_id),
         bl AS (SELECT DISTINCT fp AS bfp FROM fp WHERE doc_id % 41 = 0),
         bb AS (SELECT bfp, ((bfp >> (b.b * 15)) & 32767) * 4 + b.b AS bk
           FROM bl, unnest(range(0, 4)) b(b)),
         ab AS (SELECT fp.doc_id, fp.fp,
             ((fp.fp >> (b.b * 15)) & 32767) * 4 + b.b AS bk
           FROM fp, unnest(range(0, 4)) b(b)),
         hits AS (SELECT DISTINCT ab.doc_id
           FROM ab JOIN bb ON ab.bk = bb.bk
           WHERE bit_count(xor(ab.fp, bb.bfp)) <= 8)
         SELECT m.batch_id, CAST(COUNT(*) AS BIGINT) AS n_media,
             CAST(SUM(CASE WHEN h.doc_id IS NULL THEN 0 ELSE 1 END)
               AS BIGINT) AS n_blocked,
             CAST((SUM(CASE WHEN h.doc_id IS NULL THEN 0 ELSE 1 END)
               * 10000) // COUNT(*) AS BIGINT) AS blocked_bp
         FROM m LEFT JOIN hits h ON m.doc_id = h.doc_id
         GROUP BY m.batch_id ORDER BY m.batch_id""",
    "q127_copurchase" ->
      """WITH cs AS (SELECT DISTINCT o_custkey AS cust,
             l_suppkey AS supp
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         tot AS (SELECT COUNT(DISTINCT cust) AS n FROM cs),
         sup AS (SELECT supp, COUNT(*) AS c FROM cs GROUP BY 1),
         p AS (SELECT a.supp AS supp_a, b.supp AS supp_b,
             COUNT(*) AS cnt_ab
           FROM cs a JOIN cs b ON a.cust = b.cust AND a.supp < b.supp
           GROUP BY 1, 2),
         top AS (SELECT p.supp_a, p.supp_b, p.cnt_ab,
             sa.c AS cnt_a, sb.c AS cnt_b
           FROM p JOIN sup sa ON p.supp_a = sa.supp
                JOIN sup sb ON p.supp_b = sb.supp
           ORDER BY p.cnt_ab DESC, p.supp_a, p.supp_b LIMIT 20)
         SELECT supp_a, supp_b, cnt_ab, cnt_a, cnt_b,
             CAST(cnt_ab AS DOUBLE) / CAST(n AS DOUBLE) AS support,
             CAST(cnt_ab AS DOUBLE) / CAST(cnt_a AS DOUBLE)
               AS confidence,
             CAST(cnt_ab AS DOUBLE) * CAST(n AS DOUBLE)
               / (CAST(cnt_a AS DOUBLE) * CAST(cnt_b AS DOUBLE)) AS lift
         FROM top, tot
         ORDER BY cnt_ab DESC, supp_a, supp_b""",
    // q283: every decoded number recomputed from the generation rule —
    // the closed-form sawtooth (id·31 + 7j) mod 4096 − 2048 per sample,
    // zero-crossings via the (j, j−1) pair BOTH computed closed-form
    // (no window), frame energies grouped on j // 100, peak frame via
    // ROW_NUMBER(energy DESC, f) — the decoder's strict-> tie rule.
    "q283_wav_decode" ->
      """WITH dims AS (SELECT doc_id,
             400 + (doc_id % 7) * 100 + (doc_id % 53) AS n,
             8000 + (doc_id % 3) * 4000 AS rate FROM documents),
         sm AS (SELECT doc_id, n, rate, unnest(range(0, n)) AS j
           FROM dims),
         v AS (SELECT doc_id, n, rate, j,
             (doc_id * 31 + 7 * j) % 4096 - 2048 AS s,
             CASE WHEN j > 0
               THEN (doc_id * 31 + 7 * (j - 1)) % 4096 - 2048 END AS p
           FROM sm),
         fe AS (SELECT doc_id, j // 100 AS f,
             CAST(SUM(s * s) AS BIGINT) AS energy
           FROM v GROUP BY 1, 2),
         pk AS (SELECT doc_id, f, energy, ROW_NUMBER() OVER (
               PARTITION BY doc_id ORDER BY energy DESC, f) AS rn
           FROM fe),
         agg AS (SELECT doc_id, MAX(n) AS n, MAX(rate) AS rate,
             CAST(SUM(ABS(s)) AS BIGINT) AS sum_abs,
             CAST(MAX(ABS(s)) AS BIGINT) AS peak_abs,
             CAST(SUM(CASE WHEN j > 0 AND ((s >= 0) <> (p >= 0))
               THEN 1 ELSE 0 END) AS BIGINT) AS zc
           FROM v GROUP BY 1)
         SELECT a.doc_id, CAST(a.rate AS BIGINT) AS sample_rate,
             CAST(a.n AS BIGINT) AS n_samples, a.sum_abs, a.peak_abs,
             a.zc AS zero_crossings,
             CAST((a.n + 99) // 100 AS BIGINT) AS n_frames,
             CAST(p.f AS BIGINT) AS peak_frame_idx,
             p.energy AS peak_frame_energy
         FROM agg a JOIN pk p ON a.doc_id = p.doc_id AND p.rn = 1
         ORDER BY a.doc_id""",
    // q284: every decoded plane byte recomputed from the generation
    // rule (id·31 + 5f + k) mod 96 (+160 from the cut frame on), the
    // Y-plane restricted to k < w·h, the cut rule replayed with LAG,
    // brightest frame via ROW_NUMBER(ysum DESC, f) — the decoder's
    // strict-> tie rule.
    "q284_y4m_scenes" ->
      """WITH dims AS (SELECT doc_id, 4 + doc_id % 3 AS w,
             3 + doc_id % 2 AS h, 6 + doc_id % 5 AS nf,
             CASE WHEN doc_id % 4 = 0 THEN -1
               ELSE (6 + doc_id % 5) // 2 END AS cut
           FROM documents),
         fr AS (SELECT doc_id, w, h, nf, cut, unnest(range(0, nf)) AS f
           FROM dims),
         px AS (SELECT doc_id, w, h, nf, cut, f,
             unnest(range(0, 3 * w * h)) AS k
           FROM fr),
         v AS (SELECT doc_id, w, h, nf, cut, f, k,
             (doc_id * 31 + 5 * f + k) % 96
               + CASE WHEN cut >= 0 AND f >= cut THEN 160 ELSE 0 END
               AS val
           FROM px),
         ys AS (SELECT doc_id, w, h, nf, f,
             CAST(SUM(CASE WHEN k < w * h THEN val ELSE 0 END) AS BIGINT)
               AS ysum,
             CAST(SUM(val) AS BIGINT) AS allsum
           FROM v GROUP BY 1, 2, 3, 4, 5),
         lagd AS (SELECT doc_id, w, h, nf, f, ysum, allsum,
             LAG(ysum) OVER (PARTITION BY doc_id ORDER BY f) AS prev
           FROM ys),
         mx AS (SELECT doc_id, f, ROW_NUMBER() OVER (PARTITION BY doc_id
               ORDER BY ysum DESC, f) AS rn
           FROM ys),
         agg AS (SELECT doc_id, MAX(w) AS w, MAX(h) AS h, MAX(nf) AS nf,
             SUM(allsum) AS y_total,
             CAST(SUM(CASE WHEN prev IS NOT NULL
                 AND ABS(ysum - prev) > 48 * w * h
               THEN 1 ELSE 0 END) AS BIGINT) AS n_cuts,
             COALESCE(MIN(CASE WHEN prev IS NOT NULL
                 AND ABS(ysum - prev) > 48 * w * h
               THEN f END), -1) AS cut_frame
           FROM lagd GROUP BY 1)
         SELECT a.doc_id, CAST(a.w AS BIGINT) AS width,
             CAST(a.h AS BIGINT) AS height, CAST(a.nf AS BIGINT) AS n_frames,
             CAST(a.y_total AS BIGINT) AS y_total,
             CAST(m.f AS BIGINT) AS max_y_frame, a.n_cuts,
             CAST(a.cut_frame AS BIGINT) AS cut_frame
         FROM agg a JOIN mx m ON a.doc_id = m.doc_id AND m.rn = 1
         ORDER BY a.doc_id""",
    // q285: the page construction AND the extraction chain replayed
    // verbatim — same element-wise render rules, same ordered
    // regexp_replace chain (inline (?s) dotall, 'g' global), same
    // truncating integer division for the markup share.
    "q285_html_extract" ->
      """WITH src AS (SELECT doc_id, text,
             array_to_string(list_transform(string_split(text, ' '),
               w -> (CASE WHEN length(w) % 3 = 0
                   THEN '<b>' || w || '</b>' ELSE w END) ||
                 (CASE WHEN length(w) % 4 = 0 THEN '&#32;'
                   ELSE ' ' END)), '') AS rendered
           FROM documents),
         page AS (SELECT doc_id, text,
             '<!DOCTYPE html><html><!-- graft crawler snapshot -->'
               || '<head><title>doc ' || doc_id
               || '</title><style>p { color: #222; }</style></head>'
               || '<body><script>var doc = ' || doc_id
               || ';</script><p>' || rendered || '</p>'
               || CASE WHEN doc_id % 10 = 0
                 THEN '<footer>copyright 2026 example corp</footer>'
                 ELSE '' END
               || '</body></html>' AS html
           FROM src),
         ext AS (SELECT doc_id, text, html,
             trim(regexp_replace(regexp_replace(regexp_replace(
               regexp_replace(regexp_replace(regexp_replace(
               regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                 html,
                 '(?s)<!--.*?-->', '', 'g'),
                 '(?s)<head>.*?</head>', '', 'g'),
                 '(?s)<script[^>]*>.*?</script>', '', 'g'),
                 '(?s)<style[^>]*>.*?</style>', '', 'g'),
                 '<[^>]*>', ' ', 'g'),
                 '&#32;', ' ', 'g'),
                 '&lt;', '<', 'g'),
                 '&gt;', '>', 'g'),
                 '&amp;', '&', 'g'),
               '\s+', ' ', 'g')) AS extracted
           FROM page)
         SELECT doc_id, CAST(length(html) AS BIGINT) AS html_len,
             CAST(length(extracted) AS BIGINT) AS extracted_len,
             CAST((length(html) - length(replace(html, '<b>', ''))) // 3
               AS BIGINT) AS n_bold,
             CAST(CAST(length(html) - length(extracted) AS BIGINT)
               * 10000 // CAST(length(html) AS BIGINT) AS BIGINT)
               AS markup_bp,
             extracted = text AS clean
         FROM ext ORDER BY doc_id""",
    // q286: the oracle RETRAINS the token-vote model in SQL from the
    // same closed-form plants — identical smoothed cross-multiplied
    // vote rule, identical occurrence scoring — so stored-model
    // scoring ≡ inline-trained scoring through the parquet roundtrip.
    "q286_quality_classifier" -> qualityClassifierOracle,
    // q288 SHARES q286's oracle verbatim: counts are additive, so the
    // stored-base + arriving-batch merge trains the SAME model as the
    // from-scratch retrain over doc_id % 10 <> 0 — the q103/q276
    // incremental≡batch shared-oracle discipline on the model axis.
    "q288_incr_classifier" -> qualityClassifierOracle,
    // q287: the quantized-cosine arithmetic replayed exactly (shared
    // quantCte), the swap plant closed-form, zero-norm exclusion via
    // the nrm joins on BOTH pair sides.
    "q287_pair_alignment" ->
      s"""WITH $quantCte,
         pr AS (SELECT n.vec_id AS pair_id,
             CASE WHEN n.vec_id % 13 = 0 THEN n.vec_id + 1
               ELSE n.vec_id END AS cap_src
           FROM nrm n),
         d AS (SELECT p.pair_id, p.cap_src, SUM(a.x * b.x) AS dot
           FROM pr p JOIN q a ON a.vec_id = p.pair_id
             JOIN q b ON b.vec_id = p.cap_src AND a.i = b.i
           GROUP BY 1, 2),
         sm AS (SELECT d.pair_id, d.cap_src,
             CAST(d.dot AS DOUBLE) / (sqrt(CAST(na.nn AS DOUBLE))
               * sqrt(CAST(nb.nn AS DOUBLE))) AS alignment
           FROM d JOIN nrm na ON d.pair_id = na.vec_id
                  JOIN nrm nb ON d.cap_src = nb.vec_id)
         SELECT pair_id, cap_src, cap_src <> pair_id AS swapped,
             alignment, alignment >= 0.9 AS kept
         FROM sm ORDER BY pair_id""",
    // q289: all three budgets replayed from the quantization CTE
    // restricted to i <= d — same slice-prefix arithmetic, same
    // zero-norm exclusion per budget, same (sim DESC, id) top-3 rule,
    // same double division for recall.
    "q289_dim_truncation" ->
      """WITH qq AS (SELECT vec_id, i,
             CAST(floor(CAST(embedding[i] AS DOUBLE) * 10000.0 + 0.5)
               AS BIGINT) AS x
           FROM embeddings, (SELECT unnest(range(1, 65)) AS i)),
         dd(d) AS (VALUES (16), (32), (64)),
         qd AS (SELECT d, vec_id, i, x FROM qq, dd WHERE i <= d),
         nrm AS (SELECT d, vec_id, SUM(x * x) AS nn FROM qd
           GROUP BY 1, 2 HAVING SUM(x * x) > 0),
         dt AS (SELECT a.d, a.vec_id AS query_id, b.vec_id AS id_b,
             SUM(a.x * b.x) AS dot
           FROM qd a JOIN qd b ON a.i = b.i AND a.d = b.d
           WHERE a.vec_id % 50 = 0 AND b.vec_id % 50 <> 0
             AND a.vec_id IN (SELECT vec_id FROM nrm n2
               WHERE n2.d = a.d)
             AND b.vec_id IN (SELECT vec_id FROM nrm n3
               WHERE n3.d = b.d)
           GROUP BY 1, 2, 3),
         sm AS (SELECT dt.d, dt.query_id, dt.id_b,
             CAST(dt.dot AS DOUBLE) / (sqrt(CAST(na.nn AS DOUBLE))
               * sqrt(CAST(nb.nn AS DOUBLE))) AS sim
           FROM dt JOIN nrm na
               ON dt.d = na.d AND dt.query_id = na.vec_id
             JOIN nrm nb ON dt.d = nb.d AND dt.id_b = nb.vec_id),
         rk AS (SELECT d, query_id, id_b, row_number() OVER (
               PARTITION BY d, query_id
               ORDER BY sim DESC, id_b ASC) AS rn
           FROM sm),
         t3 AS (SELECT d, query_id, id_b FROM rk WHERE rn <= 3),
         ex AS (SELECT query_id, id_b FROM t3 WHERE d = 64),
         nq AS (SELECT d, COUNT(DISTINCT query_id) AS n_q FROM t3
           GROUP BY 1),
         hits AS (SELECT t3.d, COUNT(*) AS n_hits FROM t3
           JOIN ex USING (query_id, id_b) GROUP BY 1)
         SELECT CAST(nq.d AS BIGINT) AS dims,
             CAST(nq.n_q AS BIGINT) AS n_q,
             CAST(COALESCE(hits.n_hits, 0) AS BIGINT) AS n_hits,
             CAST(COALESCE(hits.n_hits, 0) AS DOUBLE)
               / (3.0 * CAST(nq.n_q AS DOUBLE)) AS recall
         FROM nq LEFT JOIN hits ON nq.d = hits.d ORDER BY dims""",
    // q290: BOTH envelope fingerprints replayed bit-exactly from the
    // closed-form modulated recording (half leg: sample 2k of the full
    // rule, bins over m = n // 2), the q193 fp-bit idiom, truncating
    // // for the gain scale (DuckDB // truncates like Java — the q87
    // measurement).
    "q290_audio_neardup" ->
      """WITH dims AS (SELECT doc_id,
             2000 + (doc_id % 7) * 500 + (doc_id % 53) AS n
           FROM documents),
         fj AS (SELECT doc_id, n, unnest(range(0, n)) AS j FROM dims),
         fv AS (SELECT doc_id, (j * 60) // n AS b,
             (doc_id * 60 + (j * 60) // n + 1) * 2654435761
               % 4294967296 AS h0,
             xor(h0, h0 >> 16) * 40503 % 4294967296 AS h1,
             xor(h1, h1 >> 13) % 6 AS m,
             ABS(((doc_id * 31 + 997 * j) % 4096 - 2048)
               * (1 + m + CASE WHEN m >= 3 THEN 5 ELSE 0 END) // 8) AS a
           FROM fj),
         fbin AS (SELECT doc_id, b, CAST(SUM(a) AS BIGINT) AS s
           FROM fv GROUP BY 1, 2),
         ftot AS (SELECT doc_id, CAST(SUM(a) AS BIGINT) AS total
           FROM fv GROUP BY 1),
         ffp AS (SELECT fbin.doc_id,
             CAST(SUM(CASE WHEN fbin.s * 60 > ftot.total
               THEN (CAST(1 AS BIGINT) << fbin.b) ELSE 0 END)
               AS BIGINT) AS fp_full
           FROM fbin JOIN ftot ON fbin.doc_id = ftot.doc_id GROUP BY 1),
         hj AS (SELECT doc_id, n, n // 2 AS m,
             unnest(range(0, n // 2)) AS k
           FROM dims),
         hv AS (SELECT doc_id, (k * 60) // m AS b,
             (doc_id * 60 + ((2 * k) * 60) // n + 1) * 2654435761
               % 4294967296 AS h0,
             xor(h0, h0 >> 16) * 40503 % 4294967296 AS h1,
             xor(h1, h1 >> 13) % 6 AS m2,
             ABS(((doc_id * 31 + 997 * (2 * k)) % 4096 - 2048)
               * (1 + m2 + CASE WHEN m2 >= 3 THEN 5 ELSE 0 END) // 8) AS a
           FROM hj),
         hbin AS (SELECT doc_id, b, CAST(SUM(a) AS BIGINT) AS s
           FROM hv GROUP BY 1, 2),
         htot AS (SELECT doc_id, CAST(SUM(a) AS BIGINT) AS total
           FROM hv GROUP BY 1),
         hfp AS (SELECT hbin.doc_id,
             CAST(SUM(CASE WHEN hbin.s * 60 > htot.total
               THEN (CAST(1 AS BIGINT) << hbin.b) ELSE 0 END)
               AS BIGINT) AS fp_half
           FROM hbin JOIN htot ON hbin.doc_id = htot.doc_id GROUP BY 1)
         SELECT f.doc_id, f.fp_full, h.fp_half,
             CAST(bit_count(xor(f.fp_full, h.fp_half)) AS BIGINT)
               AS hamming,
             bit_count(xor(f.fp_full, h.fp_half)) <= 8 AS is_dup,
             CAST(bit_count(xor(f.fp_full, c.fp_full)) AS BIGINT)
               AS control_hamming,
             bit_count(xor(f.fp_full, c.fp_full)) > 8 AS separated
         FROM ffp f JOIN hfp h ON f.doc_id = h.doc_id
              JOIN ffp c ON c.doc_id = f.doc_id + 1
         ORDER BY f.doc_id""",
    // q291: scores re-derived from the shared retrain CTEs, the same
    // 5-threshold sweep, truncating bp division, NULL on an empty
    // precision/recall denominator in both engines.
    "q291_classifier_calibration" ->
      s"""WITH $qualityClassifierCtes,
         th(t) AS (VALUES (-2), (-1), (0), (1), (2)),
         j AS (SELECT th.t, s.score, l.pos
           FROM sc s JOIN lab l USING (doc_id), th),
         cm AS (SELECT t AS threshold,
             CAST(SUM(CASE WHEN score > t AND pos THEN 1 ELSE 0 END)
               AS BIGINT) AS n_tp,
             CAST(SUM(CASE WHEN score > t AND NOT pos THEN 1 ELSE 0 END)
               AS BIGINT) AS n_fp,
             CAST(SUM(CASE WHEN score <= t AND pos THEN 1 ELSE 0 END)
               AS BIGINT) AS n_fn,
             CAST(SUM(CASE WHEN score <= t AND NOT pos THEN 1 ELSE 0 END)
               AS BIGINT) AS n_tn
           FROM j GROUP BY 1)
         SELECT CAST(threshold AS BIGINT) AS threshold, n_tp, n_fp,
             n_fn, n_tn,
             CASE WHEN n_tp + n_fp = 0 THEN NULL
               ELSE n_tp * 10000 // (n_tp + n_fp) END AS precision_bp,
             CASE WHEN n_tp + n_fn = 0 THEN NULL
               ELSE n_tp * 10000 // (n_tp + n_fn) END AS recall_bp
         FROM cm ORDER BY threshold""",
    // q292: the routed formats and content units replayed closed-form
    // from the per-format fixture dims (JPEG dims are exact container
    // structure — the q264 rule; everything else is lossless).
    "q292_media_router" ->
      """SELECT doc_id,
             CASE doc_id % 5 WHEN 0 THEN 'ppm' WHEN 1 THEN 'png'
               WHEN 2 THEN 'jpeg' WHEN 3 THEN 'wav'
               ELSE 'y4m' END AS format,
             CAST(CASE doc_id % 5
               WHEN 0 THEN (4 + doc_id % 5) * (3 + doc_id % 4)
               WHEN 1 THEN (8 + doc_id % 5) * (6 + doc_id % 3)
               WHEN 2 THEN (8 + doc_id % 5) * (6 + doc_id % 3)
               WHEN 3 THEN 400 + doc_id % 53
               ELSE (6 + doc_id % 5) * (4 + doc_id % 3)
                 * (3 + doc_id % 2) END AS BIGINT) AS content_units
         FROM documents ORDER BY doc_id""",
    // q293: batch membership via the staging NTILE, the corruption
    // boundary closed-form, formats + units from the per-format
    // fixture dims (unknown → units 0), truncated-bp unroutable share
    // batch-scoped.
    "q293_stream_media_router" ->
      """WITH nn AS (SELECT COUNT(*) AS n FROM documents),
         src AS (SELECT doc_id,
             CAST(NTILE(3) OVER (ORDER BY doc_id) AS BIGINT) - 1 AS b,
             CASE WHEN doc_id >= (2 * nn.n + 2) // 3 AND doc_id % 7 = 0
               THEN 'unknown'
               ELSE CASE doc_id % 5 WHEN 0 THEN 'ppm' WHEN 1 THEN 'png'
                 WHEN 2 THEN 'jpeg' WHEN 3 THEN 'wav'
                 ELSE 'y4m' END END AS format
           FROM documents, nn),
         u AS (SELECT doc_id, b, format,
             CASE WHEN format = 'unknown' THEN 0
               ELSE CASE doc_id % 5
                 WHEN 0 THEN (4 + doc_id % 5) * (3 + doc_id % 4)
                 WHEN 1 THEN (8 + doc_id % 5) * (6 + doc_id % 3)
                 WHEN 2 THEN (8 + doc_id % 5) * (6 + doc_id % 3)
                 WHEN 3 THEN 400 + doc_id % 53
                 ELSE (6 + doc_id % 5) * (4 + doc_id % 3)
                   * (3 + doc_id % 2) END END AS units
           FROM src),
         bt AS (SELECT b, COUNT(*) AS n,
             SUM(CASE WHEN format = 'unknown' THEN 1 ELSE 0 END) AS nu
           FROM u GROUP BY 1)
         SELECT u.b AS batch_id, u.format,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(u.units) AS BIGINT) AS sum_units,
             CAST(bt.nu * 10000 // bt.n AS BIGINT) AS unknown_bp,
             (bt.nu * 10000 // bt.n > 100) AS unknown_alert
         FROM u JOIN bt ON u.b = bt.b
         GROUP BY u.b, u.format, bt.nu, bt.n
         ORDER BY batch_id, u.format""",
    // q294: the q280 recursive-closure idiom over audio envelope fps —
    // every fingerprint replayed closed-form (seed = id // 5, the
    // step-2 leg sampling 2k of the full rule), 5x12-bit bands,
    // hamming <= 8 verify, quality-max keep per cluster.
    "q294_audio_clusters" ->
      """WITH RECURSIVE base AS (SELECT doc_id, doc_id // 5 AS seed,
             2000 + ((doc_id // 5) % 7) * 500 + ((doc_id // 5) % 53)
               AS n,
             1 + doc_id % 2 AS step, text
           FROM documents),
         b2 AS (SELECT doc_id, seed, n, step,
             CASE WHEN step = 1 THEN n ELSE n // 2 END AS m
           FROM base),
         kv AS (SELECT doc_id, m, (k * 60) // m AS b,
             (seed * 60 + ((k * step) * 60) // n + 1) * 2654435761
               % 4294967296 AS h0,
             xor(h0, h0 >> 16) * 40503 % 4294967296 AS h1,
             xor(h1, h1 >> 13) % 6 AS mm,
             ABS(((seed * 31 + 997 * (k * step)) % 4096 - 2048)
               * (1 + mm + CASE WHEN mm >= 3 THEN 5 ELSE 0 END) // 8) AS a
           FROM b2, unnest(range(0, m)) u(k)),
         bins AS (SELECT doc_id, b, CAST(SUM(a) AS BIGINT) AS s
           FROM kv GROUP BY 1, 2),
         tt AS (SELECT doc_id, CAST(SUM(a) AS BIGINT) AS total
           FROM kv GROUP BY 1),
         fpt AS (SELECT bins.doc_id,
             CAST(SUM(CASE WHEN bins.s * 60 > tt.total
               THEN 1::BIGINT << bins.b ELSE 0 END) AS BIGINT) AS fp
           FROM bins JOIN tt ON bins.doc_id = tt.doc_id
           GROUP BY bins.doc_id),
         dfp AS (SELECT DISTINCT fp FROM fpt),
         bnd AS (SELECT fp, ((fp >> (b.b * 12)) & 4095) * 5 + b.b AS bk
           FROM dfp, unnest(range(0, 5)) b(b)),
         e AS (SELECT DISTINCT a.fp AS fa, c.fp AS fb
           FROM bnd a JOIN bnd c ON a.bk = c.bk AND a.fp < c.fp
           WHERE bit_count(xor(a.fp, c.fp)) <= 8),
         sym AS (SELECT fa AS src, fb AS dst FROM e
                 UNION SELECT fb, fa FROM e),
         r AS (SELECT src AS node, dst AS peer FROM sym
               UNION
               SELECT r.node, s.dst FROM r JOIN sym s ON r.peer = s.src),
         lab AS (SELECT node, LEAST(node, MIN(peer)) AS cluster_rep
           FROM r GROUP BY node),
         tk AS (SELECT doc_id, text,
             list_filter(string_split(text, ' '), t -> t <> '') AS toks
           FROM documents),
         qq AS (SELECT doc_id, CAST(floor((
               0.5 * least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0)
               + 0.3 * (1.0 - CAST(len(list_filter(toks,
                     w -> w IN ('the','a','of','and','is')))
                   AS DOUBLE) / CAST(len(toks) AS DOUBLE))
               + 0.2 * least(((CAST(length(text) AS DOUBLE)
                     - (CAST(len(toks) AS DOUBLE) - 1.0))
                   / CAST(len(toks) AS DOUBLE)) / 8.0, 1.0)
             ) * 10000.0 + 0.5) AS BIGINT) AS q_bp
           FROM tk),
         dl AS (SELECT f.doc_id, f.fp,
             COALESCE(l.cluster_rep, f.fp) AS cluster_rep, q.q_bp
           FROM fpt f LEFT JOIN lab l ON f.fp = l.node
           JOIN qq q ON f.doc_id = q.doc_id),
         win AS (SELECT cluster_rep, doc_id, q_bp, row_number() OVER
             (PARTITION BY cluster_rep ORDER BY q_bp DESC, doc_id ASC)
             AS rn
           FROM dl),
         agg AS (SELECT cluster_rep, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_fps
           FROM dl GROUP BY 1)
         SELECT a.cluster_rep, a.n_docs, a.n_fps,
             w.doc_id AS kept_doc, w.q_bp AS kept_q_bp
         FROM agg a JOIN win w
           ON a.cluster_rep = w.cluster_rep AND w.rn = 1
         ORDER BY a.cluster_rep""",
    // q295: the per-frame luma series replayed closed-form (Y plane
    // only), the same LAG cut rule, running cut-count scene ids, and
    // the (ysum DESC, f) keyframe election.
    "q295_video_keyframes" ->
      """WITH dims AS (SELECT doc_id, 4 + doc_id % 3 AS w,
             3 + doc_id % 2 AS h, 6 + doc_id % 5 AS nf,
             CASE WHEN doc_id % 4 = 0 THEN -1
               ELSE (6 + doc_id % 5) // 2 END AS cut
           FROM documents),
         fr AS (SELECT doc_id, w, h, nf, cut, unnest(range(0, nf)) AS f
           FROM dims),
         px AS (SELECT doc_id, w, h, cut, f,
             unnest(range(0, w * h)) AS k
           FROM fr),
         ys AS (SELECT doc_id, w, h, f,
             CAST(SUM((doc_id * 31 + 5 * f + k) % 96
               + CASE WHEN cut >= 0 AND f >= cut THEN 160 ELSE 0 END)
               AS BIGINT) AS ysum
           FROM px GROUP BY 1, 2, 3, 4),
         lg AS (SELECT doc_id, w, h, f, ysum,
             LAG(ysum) OVER (PARTITION BY doc_id ORDER BY f) AS prev
           FROM ys),
         ct AS (SELECT doc_id, f, ysum,
             CASE WHEN prev IS NOT NULL
                 AND ABS(ysum - prev) > 48 * w * h
               THEN 1 ELSE 0 END AS cut1
           FROM lg),
         sc AS (SELECT doc_id, f, ysum,
             CAST(SUM(cut1) OVER (PARTITION BY doc_id ORDER BY f
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS scene
           FROM ct),
         rk AS (SELECT doc_id, scene, f, ysum, ROW_NUMBER() OVER (
               PARTITION BY doc_id, scene
               ORDER BY ysum DESC, f) AS rn
           FROM sc),
         agg AS (SELECT doc_id, scene,
             CAST(MIN(f) AS BIGINT) AS start_frame,
             CAST(MAX(f) AS BIGINT) AS end_frame,
             CAST(COUNT(*) AS BIGINT) AS n_frames
           FROM sc GROUP BY 1, 2)
         SELECT a.doc_id, a.scene, a.start_frame, a.end_frame,
             a.n_frames, CAST(r.f AS BIGINT) AS keyframe,
             r.ysum AS key_y_sum
         FROM agg a JOIN rk r ON a.doc_id = r.doc_id
           AND a.scene = r.scene AND r.rn = 1
         ORDER BY a.doc_id, a.scene""",
    // q296: the q272 lexical CTEs + the q273 semantic CTEs composed —
    // all four screens' replay idioms verbatim, one left join, the
    // partial-coverage semantic leg honest (screened flag).
    "q296_full_certificate" ->
      s"""$winnowSelCtes,
         toks AS (SELECT doc_id, string_split(text, ' ') AS t
           FROM documents),
         gr AS (SELECT doc_id,
             unnest(list_distinct(list_transform(
               range(1, greatest(len(t) - 2, 1) + 1),
               i -> array_to_string(t[i:i+2], ' ')))) AS gram3
           FROM toks),
         cg AS (SELECT DISTINCT gram3 FROM gr WHERE doc_id % 50 <> 0),
         la AS (SELECT e.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_shared_grams
           FROM gr e JOIN cg ON e.gram3 = cg.gram3
           WHERE e.doc_id % 50 = 0 GROUP BY 1),
         cf AS (SELECT DISTINCT gram FROM sel WHERE doc_id % 50 <> 0),
         lb AS (SELECT e.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_shared_fps
           FROM sel e JOIN cf ON e.gram = cf.gram
           WHERE e.doc_id % 50 = 0 GROUP BY 1),
         cn AS (SELECT doc_id,
             md5(regexp_replace(lower(trim(nfc_normalize(text))),
               '\\s+', ' ', 'g')) AS fp
           FROM documents),
         ch AS (SELECT DISTINCT fp FROM cn WHERE doc_id % 50 <> 0),
         lc AS (SELECT e.doc_id, (ch.fp IS NOT NULL) AS exact_canon_hit
           FROM cn e LEFT JOIN ch ON e.fp = ch.fp
           WHERE e.doc_id % 50 = 0),
         $quantCte,
         $qlistCte,
         d AS (SELECT a.vec_id AS query_id, b.vec_id AS id_b,
             CAST(list_inner_product(a.xs, b.xs) AS BIGINT) AS dot
           FROM qv a, qv b
           WHERE a.vec_id % 50 = 0 AND b.vec_id % 50 <> 0),
         sm AS (SELECT query_id, id_b,
             CAST(dot AS DOUBLE) / (sqrt(CAST(na.nn AS DOUBLE))
               * sqrt(CAST(nb.nn AS DOUBLE))) AS sim
           FROM d JOIN nrm na ON d.query_id = na.vec_id
                  JOIN nrm nb ON d.id_b = nb.vec_id),
         rk AS (SELECT query_id, sim, row_number() OVER
             (PARTITION BY query_id ORDER BY sim DESC, id_b ASC) AS rank
           FROM sm),
         se AS (SELECT query_id AS doc_id, sim FROM rk WHERE rank = 1)
         SELECT lc.doc_id,
             COALESCE(la.n_shared_grams, 0) AS n_shared_grams,
             COALESCE(lb.n_shared_fps, 0) AS n_shared_fps,
             lc.exact_canon_hit,
             (COALESCE(la.n_shared_grams, 0) >= 5
              OR COALESCE(lb.n_shared_fps, 0) >= 1
              OR lc.exact_canon_hit) AS lexical_contaminated,
             se.sim AS semantic_sim,
             COALESCE(se.sim >= 0.3, FALSE) AS semantic_hit,
             se.sim IS NOT NULL AS semantic_screened,
             (COALESCE(la.n_shared_grams, 0) >= 5
              OR COALESCE(lb.n_shared_fps, 0) >= 1
              OR lc.exact_canon_hit
              OR COALESCE(se.sim >= 0.3, FALSE)) AS contaminated
         FROM lc LEFT JOIN la ON lc.doc_id = la.doc_id
                 LEFT JOIN lb ON lc.doc_id = lb.doc_id
                 LEFT JOIN se ON lc.doc_id = se.doc_id
         ORDER BY lc.doc_id""",
    // q297: docs arrive once and the model is static, so the streamed
    // union is row-identical to batch scoring — q286's retrain
    // projected to the gate's verdict columns (the stream≡batch
    // shared-oracle discipline).
    "q297_stream_classifier_gate" ->
      s"""WITH $qualityClassifierCtes
         SELECT s.doc_id, s.score, s.score > 0 AS admitted
         FROM sc s ORDER BY s.doc_id""",
    // q303: the q291 sweep REPLAYED, the choice rule applied in SQL
    // (max F1 at precision >= 9500 bp, ties to the smallest
    // threshold — F1 compared as a double, exact for these small
    // integer counts), verdicts gated at the chosen threshold. Green
    // proves the stored-artifact roundtrip AND the choice agree.
    "q303_calibrated_gate" ->
      s"""WITH $qualityClassifierCtes,
         th(t) AS (VALUES (-2), (-1), (0), (1), (2)),
         j AS (SELECT th.t, s.score, l.pos
           FROM sc s JOIN lab l USING (doc_id), th),
         cm AS (SELECT t AS threshold,
             CAST(SUM(CASE WHEN score > t AND pos THEN 1 ELSE 0 END)
               AS BIGINT) AS n_tp,
             CAST(SUM(CASE WHEN score > t AND NOT pos THEN 1 ELSE 0 END)
               AS BIGINT) AS n_fp,
             CAST(SUM(CASE WHEN score <= t AND pos THEN 1 ELSE 0 END)
               AS BIGINT) AS n_fn
           FROM j GROUP BY 1),
         el AS (SELECT CAST(threshold AS BIGINT) AS threshold,
             n_tp, n_fp, n_fn,
             CASE WHEN n_tp + n_fp = 0 THEN NULL
               ELSE n_tp * 10000 // (n_tp + n_fp) END AS precision_bp
           FROM cm),
         ch AS (SELECT threshold FROM el
           WHERE precision_bp IS NOT NULL AND precision_bp >= 9500
           ORDER BY CASE WHEN 2 * n_tp + n_fp + n_fn = 0 THEN 0.0
             ELSE 2.0 * n_tp / (2 * n_tp + n_fp + n_fn) END DESC,
             threshold ASC
           LIMIT 1)
         SELECT s.doc_id, s.score, ch.threshold,
             s.score > ch.threshold AS admitted
         FROM sc s, ch ORDER BY s.doc_id""",
    // q304: both legs' envelope fingerprints replayed per-sample
    // closed-form (the q290/q294 pattern with the per-group seed key),
    // then the engine's EXACT candidate rule: >= 1 shared 12-bit band
    // AND hamming <= 8 (a naive all-pairs <= 8 oracle would claim
    // pairs the band layout cannot surface).
    "q304_stream_audio_dedup" ->
      """WITH base AS (SELECT doc_id, doc_id // 3 AS grp,
             doc_id % 3 AS r FROM documents),
         b2 AS (SELECT doc_id, r,
             CASE WHEN r = 0 AND grp % 5 = 0 THEN 2 * grp + 1
               ELSE 2 * grp END AS sk,
             2000 + (grp % 7) * 500 + grp % 53 AS n,
             CASE WHEN r = 0 THEN 2 ELSE 1 END AS step
           FROM base),
         b3 AS (SELECT doc_id, r, sk, n, step,
             CASE WHEN step = 1 THEN n ELSE n // 2 END AS m FROM b2),
         kv AS (SELECT doc_id, m, (k * 60) // m AS b,
             (sk * 60 + ((k * step) * 60) // n + 1) * 2654435761
               % 4294967296 AS h0,
             xor(h0, h0 >> 16) * 40503 % 4294967296 AS h1,
             xor(h1, h1 >> 13) % 6 AS mm,
             ABS(((sk * 31 + 997 * (k * step)) % 4096 - 2048)
               * (1 + mm + CASE WHEN mm >= 3 THEN 5 ELSE 0 END) // 8)
               AS a
           FROM b3, unnest(range(0, m)) u(k)),
         bins AS (SELECT doc_id, b, CAST(SUM(a) AS BIGINT) AS s
           FROM kv GROUP BY 1, 2),
         tt AS (SELECT doc_id, CAST(SUM(a) AS BIGINT) AS total
           FROM kv GROUP BY 1),
         fpt AS (SELECT bins.doc_id,
             CAST(SUM(CASE WHEN bins.s * 60 > tt.total
               THEN 1::BIGINT << bins.b ELSE 0 END) AS BIGINT) AS fp
           FROM bins JOIN tt ON bins.doc_id = tt.doc_id
           GROUP BY bins.doc_id),
         ab AS (SELECT f.doc_id, f.fp,
             ((f.fp >> (b.b * 12)) & 4095) * 5 + b.b AS bk
           FROM fpt f JOIN base USING (doc_id),
             unnest(range(0, 5)) b(b)
           WHERE base.r = 0),
         hb AS (SELECT f.doc_id AS hist_id, f.fp AS hfp,
             ((f.fp >> (b.b * 12)) & 4095) * 5 + b.b AS bk
           FROM fpt f JOIN base USING (doc_id),
             unnest(range(0, 5)) b(b)
           WHERE base.r <> 0)
         SELECT DISTINCT ab.doc_id, hb.hist_id,
             CAST(bit_count(xor(ab.fp, hb.hfp)) AS BIGINT) AS hamming
         FROM ab JOIN hb ON ab.bk = hb.bk
         WHERE bit_count(xor(ab.fp, hb.hfp)) <= 8
         ORDER BY ab.doc_id, hb.hist_id""",
    // q305: the keyframe election replayed closed-form (scenes
    // 3 + u%3, keyframe = last frame of each scene), the caption link
    // rule, and the same best-frame max-cosine via native list dots.
    "q305_video_caption_align" ->
      s"""WITH $quantCte,
         $qlistCte,
         uu AS (SELECT (MAX(vec_id) - 6) // 7 + 1 AS uc
           FROM embeddings),
         vids AS (SELECT unnest(range(0, (SELECT uc FROM uu))) AS u),
         vb AS (SELECT u, 3 + u % 3 AS nsc,
             (u + 1) % (SELECT uc FROM uu) AS u2
           FROM vids),
         caps AS (SELECT u, nsc,
             CASE WHEN u % 13 = 0 THEN 7 * u2 + u2 % (3 + u2 % 3)
               ELSE 7 * u + u % nsc END AS cap_src
           FROM vb),
         kf AS (SELECT vb.u, s AS scene, 7 * vb.u + s AS kvec,
             4 * s + 3 AS keyframe
           FROM vb, unnest(range(0, vb.nsc)) t(s)),
         sm AS (SELECT kf.u, kf.scene, kf.keyframe, c.cap_src,
             CAST(list_inner_product(a.xs, d.xs) AS DOUBLE)
               / (sqrt(CAST(na.nn AS DOUBLE))
                 * sqrt(CAST(nc.nn AS DOUBLE))) AS sim
           FROM kf JOIN caps c ON kf.u = c.u
           JOIN qv a ON a.vec_id = kf.kvec
           JOIN qv d ON d.vec_id = c.cap_src
           JOIN nrm na ON na.vec_id = kf.kvec
           JOIN nrm nc ON nc.vec_id = c.cap_src),
         rk AS (SELECT u, scene, keyframe, cap_src, sim,
             row_number() OVER (PARTITION BY u
               ORDER BY sim DESC, scene ASC) AS rn
           FROM sm),
         ag AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS n_scenes
           FROM sm GROUP BY 1)
         SELECT r.u AS video_id, ag.n_scenes, r.cap_src,
             (r.u % 13 = 0) AS swapped, r.scene AS best_scene,
             CAST(r.keyframe AS BIGINT) AS best_keyframe,
             r.sim AS alignment, r.sim >= 0.9 AS kept
         FROM rk r JOIN ag ON r.u = ag.u
         WHERE r.rn = 1 ORDER BY r.u""",
    // q306: clicks replayed once; each leg's envelope bins come from
    // the background mass per bin PLUS one correction row per click
    // (amp minus the background it overwrote) — exact, and never a
    // sample-by-click join; landmark sets transform onset positions
    // per leg (resample pos//2 for even positions, trim pos−T); both
    // edge rules, one union, the recursive closure, quality-max keep.
    "q306_union_clusters" ->
      s"""WITH RECURSIVE $landmarkOpCtes,
         base AS (SELECT doc_id, doc_id // 4 AS g,
             doc_id % 4 AS r FROM documents),
         b2 AS (SELECT doc_id, g, r,
             CASE WHEN r = 3 THEN 2 * g + 1 ELSE 2 * g END AS sk,
             4000 + (g % 7) * 500 + g % 53 AS n
           FROM base),
         gi AS (SELECT doc_id, n, sk, i,
             (sk * 1024 + 2 * i + 1) * 2654435761 % 4294967296 AS g0,
             xor(g0, g0 >> 16) * 40503 % 4294967296 AS g1,
             150 + xor(g1, g1 >> 13) % 250 AS gap,
             (sk * 1024 + 2 * i + 2) * 2654435761 % 4294967296 AS a0,
             xor(a0, a0 >> 16) * 40503 % 4294967296 AS a1,
             256 + xor(a1, a1 >> 13) % 8 * 32 AS amp
           FROM b2, unnest(range(0, 45)) u(i)),
         -- 45 >= 1 + (7052-100-w-200)//(w+150) for click widths
         -- w in {1,3}: the densest legal train fits the budget
         -- exactly (OracleClickBudgetSpec guards n growth)
         ps AS (SELECT doc_id, sk,
             (sk * 1024 + 1000) * 2654435761 % 4294967296 AS h0,
             xor(h0, h0 >> 16) * 40503 % 4294967296 AS h1,
             200 + xor(h1, h1 >> 13) % 200 AS p
           FROM b2),
         ck AS (SELECT gi.doc_id, gi.i, gi.amp, gi.n,
             ps.p + COALESCE(SUM(1 + gi.gap) OVER (
               PARTITION BY gi.doc_id ORDER BY gi.i
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS pos
           FROM gi JOIN ps ON gi.doc_id = ps.doc_id),
         cf AS (SELECT * FROM ck WHERE pos + 1 <= n - 100),
         b3 AS (SELECT b2.doc_id, b2.r, b2.sk, b2.n,
             CASE WHEN b2.r = 2 THEN ps.p + 3 ELSE 0 END AS tr,
             CASE WHEN b2.r = 1 THEN b2.n // 2
               WHEN b2.r = 2 THEN b2.n - (ps.p + 3)
               ELSE b2.n END AS len
           FROM b2 JOIN ps ON b2.doc_id = ps.doc_id),
         bgv AS (SELECT q.doc_id, (q.jj * 60) // q.len AS b,
             ABS(((q.sk * 31 + 997 * q.oj) % 4096 - 2048)
               * (1 + q.mm + CASE WHEN q.mm >= 3 THEN 5 ELSE 0 END))
               // 8 // 16 AS v
           FROM (SELECT b3x.doc_id, b3x.sk, b3x.len, jj,
               CASE WHEN b3x.r = 1 THEN 2 * jj
                 ELSE jj + b3x.tr END AS oj,
               (b3x.sk * 60 + ((CASE WHEN b3x.r = 1 THEN 2 * jj
                   ELSE jj + b3x.tr END) * 60) // b3x.n + 1)
                 * 2654435761 % 4294967296 AS mh0,
               xor(mh0, mh0 >> 16) * 40503 % 4294967296 AS mh1,
               xor(mh1, mh1 >> 13) % 6 AS mm
             FROM b3 b3x, unnest(range(0, b3x.len)) u(jj)) q),
         crx AS (SELECT cf.doc_id, b3.r, b3.tr, b3.len, b3.n, b3.sk,
             cf.pos, cf.amp,
             CASE WHEN b3.r = 1 THEN cf.pos // 2
               ELSE cf.pos - b3.tr END AS k
           FROM cf JOIN b3 USING (doc_id)
           WHERE (b3.r <> 1 OR cf.pos % 2 = 0)
             AND (b3.r <> 2 OR cf.pos >= b3.tr)),
         cr AS (SELECT q.doc_id, (q.k * 60) // q.len AS b,
             q.amp - ABS(((q.sk * 31 + 997 * q.pos) % 4096 - 2048)
               * (1 + q.mm + CASE WHEN q.mm >= 3 THEN 5 ELSE 0 END))
               // 8 // 16 AS v
           FROM (SELECT crx.doc_id, crx.sk, crx.len, crx.k, crx.pos,
               crx.amp,
               (crx.sk * 60 + (crx.pos * 60) // crx.n + 1)
                 * 2654435761 % 4294967296 AS mh0,
               xor(mh0, mh0 >> 16) * 40503 % 4294967296 AS mh1,
               xor(mh1, mh1 >> 13) % 6 AS mm
             FROM crx) q),
         allv AS (SELECT doc_id, b, CAST(v AS BIGINT) AS v FROM bgv
                  UNION ALL
                  SELECT doc_id, b, CAST(v AS BIGINT) FROM cr),
         bins AS (SELECT doc_id, b, CAST(SUM(v) AS BIGINT) AS s
           FROM allv GROUP BY 1, 2),
         tt AS (SELECT doc_id, CAST(SUM(v) AS BIGINT) AS total
           FROM allv GROUP BY 1),
         fpt AS (SELECT bins.doc_id,
             CAST(SUM(CASE WHEN bins.s * 60 > tt.total
               THEN 1::BIGINT << bins.b ELSE 0 END) AS BIGINT) AS fp
           FROM bins JOIN tt ON bins.doc_id = tt.doc_id
           GROUP BY bins.doc_id),
         eb1 AS (SELECT doc_id, fp,
             ((fp >> (b.b * 12)) & 4095) * 5 + b.b AS bk
           FROM fpt, unnest(range(0, 5)) b(b)),
         ee AS (SELECT DISTINCT a.doc_id AS na, c.doc_id AS nb
           FROM eb1 a JOIN eb1 c ON a.bk = c.bk AND a.doc_id < c.doc_id
           WHERE bit_count(xor(a.fp, c.fp)) <= 4),
         lmq AS (SELECT crx.doc_id, crx.k AS q, crx.amp,
             row_number() OVER (PARTITION BY crx.doc_id
               ORDER BY crx.pos) AS rk
           FROM crx),
         tr2 AS (SELECT a.doc_id,
             ((((b.q - a.q) >> (SELECT qstar FROM lmop)) * 1048576
                 + ((c.q - b.q) >> (SELECT qstar FROM lmop))) * 256
               + LEAST(b.amp * 8 // a.amp, 15) * 16
               + LEAST(c.amp * 8 // b.amp, 15)) AS h
           FROM lmq a
           JOIN lmq b ON a.doc_id = b.doc_id AND b.rk = a.rk + 1
           JOIN lmq c ON a.doc_id = c.doc_id AND c.rk = a.rk + 2),
         hs AS (SELECT DISTINCT doc_id, h FROM tr2),
         le AS (SELECT a.doc_id AS na, c.doc_id AS nb
           FROM hs a JOIN hs c ON a.h = c.h AND a.doc_id < c.doc_id
           GROUP BY 1, 2 HAVING COUNT(*) >= (SELECT tstar FROM lmop)),
         e AS (SELECT na, nb FROM ee UNION SELECT na, nb FROM le),
         sym AS (SELECT na AS src, nb AS dst FROM e
                 UNION SELECT nb, na FROM e),
         rr AS (SELECT src AS node, dst AS peer FROM sym
               UNION
               SELECT rr.node, s.dst FROM rr JOIN sym s
                 ON rr.peer = s.src),
         lab AS (SELECT node, LEAST(node, MIN(peer)) AS cluster_rep
           FROM rr GROUP BY node),
         tk AS (SELECT doc_id, text,
             list_filter(string_split(text, ' '), t -> t <> '') AS toks
           FROM documents),
         qq AS (SELECT doc_id, CAST(floor((
               0.5 * least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0)
               + 0.3 * (1.0 - CAST(len(list_filter(toks,
                     w -> w IN ('the','a','of','and','is')))
                   AS DOUBLE) / CAST(len(toks) AS DOUBLE))
               + 0.2 * least(((CAST(length(text) AS DOUBLE)
                     - (CAST(len(toks) AS DOUBLE) - 1.0))
                   / CAST(len(toks) AS DOUBLE)) / 8.0, 1.0)
             ) * 10000.0 + 0.5) AS BIGINT) AS q_bp
           FROM tk),
         dl AS (SELECT d.doc_id,
             COALESCE(l.cluster_rep, d.doc_id) AS cluster_rep, q.q_bp
           FROM base d LEFT JOIN lab l ON d.doc_id = l.node
           JOIN qq q ON d.doc_id = q.doc_id),
         win AS (SELECT cluster_rep, doc_id, q_bp, row_number() OVER
             (PARTITION BY cluster_rep ORDER BY q_bp DESC, doc_id ASC)
             AS rn
           FROM dl),
         agg AS (SELECT cluster_rep, CAST(COUNT(*) AS BIGINT) AS n_docs
           FROM dl GROUP BY 1)
         SELECT a.cluster_rep, a.n_docs,
             w.doc_id AS kept_doc, w.q_bp AS kept_q_bp
         FROM agg a JOIN win w
           ON a.cluster_rep = w.cluster_rep AND w.rn = 1
         ORDER BY a.cluster_rep""",
    // q307: the q300 hash-bit replay with per-role scene windows
    // (history full at offset 0, arrivals trimmed at offset 1, novel
    // arrivals full in the odd namespace), then the exact-equality
    // >= 2-keyframe vote.
    "q307_stream_video_dedup" ->
      """WITH base AS (SELECT doc_id, doc_id // 3 AS g, doc_id % 3 AS r
           FROM documents),
         b2 AS (SELECT doc_id, g, r,
             CASE WHEN r = 0 AND g % 5 = 0 THEN 2 * g + 1
               ELSE 2 * g END AS sk,
             3 + g % 3 AS ns
           FROM base),
         sc AS (SELECT doc_id, r, sk,
             CASE WHEN r = 0 AND g % 5 <> 0 THEN s + 1 ELSE s END
               AS scene
           FROM b2, unnest(range(0,
             CASE WHEN r = 0 AND g % 5 <> 0 THEN ns - 1 ELSE ns END))
             u(s)),
         bits AS (SELECT doc_id, r, scene, b,
             (sk * 512 + scene * 64 + b + 1) * 2654435761
               % 4294967296 AS h0,
             xor(h0, h0 >> 16) * 40503 % 4294967296 AS h1,
             xor(h1, h1 >> 13) % 2 AS bit
           FROM sc, unnest(range(0, 64)) v(b)),
         kf AS (SELECT doc_id, r, scene,
             CASE WHEN SUM(bit) = 64 THEN 0
               ELSE CAST(SUM(CASE WHEN bit = 0 THEN 0
                 WHEN b = 63 THEN -9223372036854775808
                 ELSE 1::BIGINT << b END) AS BIGINT) END AS kf_hash
           FROM bits GROUP BY 1, 2, 3),
         ar AS (SELECT DISTINCT doc_id, kf_hash FROM kf WHERE r = 0),
         hi AS (SELECT DISTINCT doc_id AS hist_id, kf_hash FROM kf
           WHERE r <> 0)
         SELECT ar.doc_id, hi.hist_id,
             CAST(COUNT(*) AS BIGINT) AS n_shared
         FROM ar JOIN hi ON ar.kf_hash = hi.kf_hash
         GROUP BY 1, 2 HAVING COUNT(*) >= 2
         ORDER BY ar.doc_id, hi.hist_id""",
    // q308: bursts replayed from ~12 closed-form rows per doc
    // (cumulative positions via one window; the first overflow is
    // final because p_i + d_i is strictly increasing), the two planted
    // degenerate classes as CASE rows.
    "q308_utterance_stats" ->
      """WITH dims AS (SELECT doc_id,
             4000 + (doc_id % 7) * 500 + doc_id % 53 AS n
           FROM documents),
         cls AS (SELECT doc_id, n,
             CASE WHEN doc_id % 7 = 0 THEN 's'
               WHEN doc_id % 11 = 0 THEN 'l' ELSE 'b' END AS cl
           FROM dims),
         gi AS (SELECT doc_id, n, i,
             (doc_id * 2048 + 3 * i + 1) * 2654435761
               % 4294967296 AS d0,
             xor(d0, d0 >> 16) * 40503 % 4294967296 AS d1,
             100 + xor(d1, d1 >> 13) % 400 AS dur,
             (doc_id * 2048 + 3 * i + 3) * 2654435761
               % 4294967296 AS g0,
             xor(g0, g0 >> 16) * 40503 % 4294967296 AS g1,
             120 + xor(g1, g1 >> 13) % 300 AS gap
           FROM cls, unnest(range(0, 40)) u(i)
           WHERE cl = 'b'),
         ps AS (SELECT doc_id,
             (doc_id * 2048 + 3000) * 2654435761 % 4294967296 AS h0,
             xor(h0, h0 >> 16) * 40503 % 4294967296 AS h1,
             150 + xor(h1, h1 >> 13) % 150 AS p
           FROM cls WHERE cl = 'b'),
         bu AS (SELECT gi.doc_id, gi.i, gi.dur, gi.n,
             ps.p + COALESCE(SUM(gi.dur + gi.gap) OVER (
               PARTITION BY gi.doc_id ORDER BY gi.i
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS pos
           FROM gi JOIN ps ON gi.doc_id = ps.doc_id),
         bv AS (SELECT * FROM bu WHERE pos + dur <= n - 100),
         bs AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_utt,
             CAST(SUM(dur) AS BIGINT) AS speech
           FROM bv GROUP BY 1),
         bl AS (SELECT doc_id, dur, pos, row_number() OVER
             (PARTITION BY doc_id ORDER BY dur DESC, i ASC) AS rn
           FROM bv)
         SELECT c.doc_id,
             CASE c.cl WHEN 's' THEN 0 WHEN 'l' THEN 1
               ELSE COALESCE(bs.n_utt, 0) END AS n_utterances,
             CASE c.cl WHEN 's' THEN 0 WHEN 'l' THEN c.n
               ELSE COALESCE(bs.speech, 0) END AS speech_samples,
             CASE c.cl WHEN 's' THEN 0 WHEN 'l' THEN 10000
               ELSE COALESCE(bs.speech, 0) * 10000 // c.n END
               AS speech_bp,
             CASE c.cl WHEN 's' THEN 0 WHEN 'l' THEN c.n
               ELSE COALESCE(bl.dur, 0) END AS longest_len,
             CAST(CASE c.cl WHEN 's' THEN -1 WHEN 'l' THEN 0
               ELSE COALESCE(bl.pos, -1) END AS BIGINT) AS longest_start
         FROM cls c
         LEFT JOIN bs ON c.doc_id = bs.doc_id
         LEFT JOIN bl ON c.doc_id = bl.doc_id AND bl.rn = 1
         ORDER BY c.doc_id""",
    // q309: the q308 replay thresholded — reasons as columns.
    "q309_speech_quality" ->
      """WITH dims AS (SELECT doc_id,
             4000 + (doc_id % 7) * 500 + doc_id % 53 AS n
           FROM documents),
         cls AS (SELECT doc_id, n,
             CASE WHEN doc_id % 7 = 0 THEN 's'
               WHEN doc_id % 11 = 0 THEN 'l' ELSE 'b' END AS cl
           FROM dims),
         gi AS (SELECT doc_id, n, i,
             (doc_id * 2048 + 3 * i + 1) * 2654435761
               % 4294967296 AS d0,
             xor(d0, d0 >> 16) * 40503 % 4294967296 AS d1,
             100 + xor(d1, d1 >> 13) % 400 AS dur,
             (doc_id * 2048 + 3 * i + 3) * 2654435761
               % 4294967296 AS g0,
             xor(g0, g0 >> 16) * 40503 % 4294967296 AS g1,
             120 + xor(g1, g1 >> 13) % 300 AS gap
           FROM cls, unnest(range(0, 40)) u(i)
           WHERE cl = 'b'),
         ps AS (SELECT doc_id,
             (doc_id * 2048 + 3000) * 2654435761 % 4294967296 AS h0,
             xor(h0, h0 >> 16) * 40503 % 4294967296 AS h1,
             150 + xor(h1, h1 >> 13) % 150 AS p
           FROM cls WHERE cl = 'b'),
         bu AS (SELECT gi.doc_id, gi.i, gi.dur, gi.n,
             ps.p + COALESCE(SUM(gi.dur + gi.gap) OVER (
               PARTITION BY gi.doc_id ORDER BY gi.i
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS pos
           FROM gi JOIN ps ON gi.doc_id = ps.doc_id),
         bv AS (SELECT * FROM bu WHERE pos + dur <= n - 100),
         bs AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_utt,
             CAST(SUM(dur) AS BIGINT) AS speech,
             CAST(MAX(dur) AS BIGINT) AS longest
           FROM bv GROUP BY 1),
         st AS (SELECT c.doc_id,
             CASE c.cl WHEN 's' THEN 0 WHEN 'l' THEN 1
               ELSE COALESCE(bs.n_utt, 0) END AS n_utterances,
             CASE c.cl WHEN 's' THEN 0 WHEN 'l' THEN 10000
               ELSE COALESCE(bs.speech, 0) * 10000 // c.n END
               AS speech_bp,
             CASE c.cl WHEN 's' THEN 0 WHEN 'l' THEN c.n
               ELSE COALESCE(bs.longest, 0) END AS longest_len
           FROM cls c LEFT JOIN bs ON c.doc_id = bs.doc_id)
         SELECT doc_id, n_utterances, speech_bp, longest_len,
             n_utterances >= 3 AS enough_utterances,
             (speech_bp >= 2000 AND speech_bp <= 9000) AS ratio_in_band,
             longest_len <= 1200 AS segmentable,
             (n_utterances >= 3 AND speech_bp >= 2000
              AND speech_bp <= 9000 AND longest_len <= 1200) AS kept
         FROM st ORDER BY doc_id""",
    // q310: support bounds recomputed exactly (a sample qualifies at
    // |bg| >= 16 or by holding a click), trimmed and raw binnings from
    // the one background-plus-corrections table; the padded leg's
    // trimmed fingerprint equals the master's BY CONSTRUCTION (zeros
    // never qualify and the support maps 1:1 under the shift), which
    // is exactly what green verifies about the engine's trim.
    "q310_pad_robust_dedup" ->
      """WITH base AS (SELECT doc_id,
             4000 + (doc_id % 7) * 500 + doc_id % 53 AS n
           FROM documents),
         legs AS (SELECT doc_id, n, 2 * doc_id AS sk, TRUE AS is_m
             FROM base
           UNION ALL
           SELECT doc_id, n, 2 * doc_id + 1, FALSE FROM base),
         gi AS (SELECT doc_id, n, sk, i,
             (sk * 1024 + 2 * i + 1) * 2654435761 % 4294967296 AS g0,
             xor(g0, g0 >> 16) * 40503 % 4294967296 AS g1,
             150 + xor(g1, g1 >> 13) % 250 AS gap,
             (sk * 1024 + 2 * i + 2) * 2654435761 % 4294967296 AS a0,
             xor(a0, a0 >> 16) * 40503 % 4294967296 AS a1,
             256 + xor(a1, a1 >> 13) % 8 * 32 AS amp
           FROM legs, unnest(range(0, 45)) u(i)),
         -- 45 >= 1 + (7052-100-w-200)//(w+150) for click widths
         -- w in {1,3}: the densest legal train fits the budget
         -- exactly (OracleClickBudgetSpec guards n growth)
         ps AS (SELECT doc_id, sk,
             (sk * 1024 + 1000) * 2654435761 % 4294967296 AS h0,
             xor(h0, h0 >> 16) * 40503 % 4294967296 AS h1,
             200 + xor(h1, h1 >> 13) % 200 AS p
           FROM legs),
         ck AS (SELECT gi.doc_id, gi.sk, gi.i, gi.amp, gi.n,
             ps.p + COALESCE(SUM(1 + gi.gap) OVER (
               PARTITION BY gi.doc_id, gi.sk ORDER BY gi.i
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS pos
           FROM gi JOIN ps ON gi.doc_id = ps.doc_id AND gi.sk = ps.sk),
         cf AS (SELECT * FROM ck WHERE pos + 1 <= n - 100),
         mv AS (SELECT q.doc_id, q.sk, q.is_m, q.n, q.j,
             ABS(((q.sk * 31 + 997 * q.j) % 4096 - 2048)
               * (1 + q.mm + CASE WHEN q.mm >= 3 THEN 5 ELSE 0 END))
               // 8 // 16 AS v
           FROM (SELECT l.doc_id, l.sk, l.is_m, l.n, jj AS j,
               (l.sk * 60 + (jj * 60) // l.n + 1)
                 * 2654435761 % 4294967296 AS mh0,
               xor(mh0, mh0 >> 16) * 40503 % 4294967296 AS mh1,
               xor(mh1, mh1 >> 13) % 6 AS mm
             FROM legs l, unnest(range(0, l.n)) u(jj)) q),
         cv AS (SELECT q.doc_id, q.sk, q.pos,
             q.amp - ABS(((q.sk * 31 + 997 * q.pos) % 4096 - 2048)
               * (1 + q.mm + CASE WHEN q.mm >= 3 THEN 5 ELSE 0 END))
               // 8 // 16 AS d
           FROM (SELECT cf.doc_id, cf.sk, cf.pos, cf.amp,
               (cf.sk * 60 + (cf.pos * 60) // cf.n + 1)
                 * 2654435761 % 4294967296 AS mh0,
               xor(mh0, mh0 >> 16) * 40503 % 4294967296 AS mh1,
               xor(mh1, mh1 >> 13) % 6 AS mm
             FROM cf) q),
         q1 AS (SELECT doc_id, sk, MIN(j) AS lo, MAX(j) AS hi FROM
             (SELECT doc_id, sk, j FROM mv WHERE v >= 16
              UNION ALL SELECT doc_id, sk, pos FROM cf)
           GROUP BY 1, 2),
         tv AS (SELECT mv.doc_id, mv.sk,
             ((mv.j - q1.lo) * 60) // (q1.hi - q1.lo + 1) AS b,
             CAST(mv.v AS BIGINT) AS v
           FROM mv JOIN q1 ON mv.doc_id = q1.doc_id AND mv.sk = q1.sk
           WHERE mv.j BETWEEN q1.lo AND q1.hi
           UNION ALL
           SELECT cv.doc_id, cv.sk,
             ((cv.pos - q1.lo) * 60) // (q1.hi - q1.lo + 1),
             CAST(cv.d AS BIGINT)
           FROM cv JOIN q1 ON cv.doc_id = q1.doc_id AND cv.sk = q1.sk),
         tb AS (SELECT doc_id, sk, b, CAST(SUM(v) AS BIGINT) AS s
           FROM tv GROUP BY 1, 2, 3),
         ttt AS (SELECT doc_id, sk, CAST(SUM(v) AS BIGINT) AS total
           FROM tv GROUP BY 1, 2),
         tfp AS (SELECT tb.doc_id, tb.sk,
             CAST(SUM(CASE WHEN tb.s * 60 > ttt.total
               THEN 1::BIGINT << tb.b ELSE 0 END) AS BIGINT) AS fp
           FROM tb JOIN ttt ON tb.doc_id = ttt.doc_id
             AND tb.sk = ttt.sk
           GROUP BY 1, 2),
         rv AS (SELECT doc_id, (j * 60) // n AS br,
             ((j + n // 3) * 60) // (n + n // 3 + n // 5) AS bp,
             CAST(v AS BIGINT) AS v
           FROM mv WHERE is_m
           UNION ALL
           SELECT cv.doc_id, (cv.pos * 60) // cf.n,
             ((cv.pos + cf.n // 3) * 60)
               // (cf.n + cf.n // 3 + cf.n // 5),
             CAST(cv.d AS BIGINT)
           FROM cv JOIN cf ON cv.doc_id = cf.doc_id
             AND cv.sk = cf.sk AND cv.pos = cf.pos
           WHERE cf.sk % 2 = 0),
         rfm AS (SELECT r2.doc_id,
             CAST(SUM(CASE WHEN r2.s * 60 > r2.total
               THEN 1::BIGINT << r2.br ELSE 0 END) AS BIGINT) AS fp
           FROM (SELECT doc_id, br, CAST(SUM(v) AS BIGINT) AS s,
               SUM(CAST(SUM(v) AS BIGINT)) OVER (PARTITION BY doc_id)
                 AS total
             FROM rv GROUP BY doc_id, br) r2
           GROUP BY 1),
         rfp AS (SELECT r2.doc_id,
             CAST(SUM(CASE WHEN r2.s * 60 > r2.total
               THEN 1::BIGINT << r2.bp ELSE 0 END) AS BIGINT) AS fp
           FROM (SELECT doc_id, bp, CAST(SUM(v) AS BIGINT) AS s,
               SUM(CAST(SUM(v) AS BIGINT)) OVER (PARTITION BY doc_id)
                 AS total
             FROM rv GROUP BY doc_id, bp) r2
           GROUP BY 1)
         SELECT b.doc_id, tm.fp AS fp_trim_master,
             tm.fp AS fp_trim_padded,
             CAST(0 AS BIGINT) AS trim_hamming, TRUE AS is_dup,
             CAST(bit_count(xor(rfm.fp, rfp.fp)) AS BIGINT)
               AS raw_hamming,
             bit_count(xor(rfm.fp, rfp.fp)) > 8 AS raw_missed,
             CAST(bit_count(xor(tm.fp, tc.fp)) AS BIGINT)
               AS control_hamming,
             bit_count(xor(tm.fp, tc.fp)) > 8 AS separated
         FROM base b
         JOIN tfp tm ON b.doc_id = tm.doc_id AND tm.sk = 2 * b.doc_id
         JOIN tfp tc ON b.doc_id = tc.doc_id
           AND tc.sk = 2 * b.doc_id + 1
         JOIN rfm ON b.doc_id = rfm.doc_id
         JOIN rfp ON b.doc_id = rfp.doc_id
         ORDER BY b.doc_id""",
    // q311: the q307 hash replay aggregated into maintenance counts —
    // entries per role, hash vocabulary novelty (only novel clips add
    // any), and the self-match guarantee (every arrival has >= 2
    // scenes, so recheck_unmatched is identically 0). The stop
    // threshold is the DERIVED q321 capstar (the engine reads the
    // stored artifact), never a constant.
    "q311_incr_keyframe_index" ->
      s"""WITH $landmarkOpCtes,
         $dfCapCtes,
         base AS (SELECT doc_id, doc_id // 3 AS g, doc_id % 3 AS r
           FROM documents),
         b2 AS (SELECT doc_id, g, r,
             CASE WHEN r = 0 AND g % 5 = 0 THEN 2 * g + 1
               ELSE 2 * g END AS sk,
             3 + g % 3 AS ns
           FROM base),
         sc AS (SELECT doc_id, r, sk,
             CASE WHEN r = 0 AND g % 5 <> 0 THEN s + 1 ELSE s END
               AS scene
           FROM b2, unnest(range(0,
             CASE WHEN r = 0 AND g % 5 <> 0 THEN ns - 1 ELSE ns END))
             u(s)),
         bits AS (SELECT doc_id, r, scene, b,
             (sk * 512 + scene * 64 + b + 1) * 2654435761
               % 4294967296 AS h0,
             xor(h0, h0 >> 16) * 40503 % 4294967296 AS h1,
             xor(h1, h1 >> 13) % 2 AS bit
           FROM sc, unnest(range(0, 64)) v(b)),
         kf AS (SELECT doc_id, r, scene,
             CASE WHEN SUM(bit) = 64 THEN 0
               ELSE CAST(SUM(CASE WHEN bit = 0 THEN 0
                 WHEN b = 63 THEN -9223372036854775808
                 ELSE 1::BIGINT << b END) AS BIGINT) END AS kf_hash
           FROM bits GROUP BY 1, 2, 3),
         hist AS (SELECT DISTINCT doc_id, kf_hash FROM kf WHERE r <> 0),
         arr AS (SELECT DISTINCT doc_id, kf_hash FROM kf WHERE r = 0),
         cnts AS (SELECT
             (SELECT CAST(COUNT(*) AS BIGINT) FROM hist) AS nb,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM arr) AS na,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM
               (SELECT DISTINCT kf_hash FROM arr) x
               WHERE kf_hash NOT IN (SELECT kf_hash FROM hist))
               AS nv),
         stopn AS (SELECT CAST(COUNT(*) AS BIGINT) AS ns FROM (
             SELECT kf_hash FROM (SELECT * FROM hist
               UNION ALL SELECT * FROM arr) u2
             GROUP BY kf_hash
             HAVING COUNT(*) > (SELECT capstar FROM ccap)) hot)
         SELECT phase, n FROM (
           SELECT 'added_entries' AS phase, na AS n FROM cnts
           UNION ALL SELECT 'after_entries', nb + na FROM cnts
           UNION ALL SELECT 'before_entries', nb FROM cnts
           UNION ALL SELECT 'novel_hashes', nv FROM cnts
           UNION ALL SELECT 'recheck_unmatched', 0 FROM cnts
           UNION ALL SELECT 'stop_hashes', ns FROM stopn)
         ORDER BY phase""",
    // q312: bursts replayed closed-form (position cumsum, hashed
    // channel bits — forced left on monologue docs), turns = adjacent
    // channel changes via LAG.
    "q312_channel_diarization" ->
      """WITH dims AS (SELECT doc_id,
             4000 + (doc_id % 7) * 500 + doc_id % 53 AS n
           FROM documents),
         gi AS (SELECT doc_id, n, i,
             (doc_id * 4096 + 4 * i + 1) * 2654435761
               % 4294967296 AS d0,
             xor(d0, d0 >> 16) * 40503 % 4294967296 AS d1,
             100 + xor(d1, d1 >> 13) % 300 AS dur,
             (doc_id * 4096 + 4 * i + 3) * 2654435761
               % 4294967296 AS g0,
             xor(g0, g0 >> 16) * 40503 % 4294967296 AS g1,
             120 + xor(g1, g1 >> 13) % 300 AS gap,
             (doc_id * 4096 + 4 * i) * 2654435761 % 4294967296 AS c0,
             xor(c0, c0 >> 16) * 40503 % 4294967296 AS c1,
             CASE WHEN doc_id % 13 = 0 THEN 0
               ELSE xor(c1, c1 >> 13) % 2 END AS ch
           FROM dims, unnest(range(0, 45)) u(i)),
         -- 45 >= 1 + (7052-100-w-200)//(w+150) for click widths
         -- w in {1,3}: the densest legal train fits the budget
         -- exactly (OracleClickBudgetSpec guards n growth)
         ps AS (SELECT doc_id,
             (doc_id * 4096 + 4000) * 2654435761 % 4294967296 AS h0,
             xor(h0, h0 >> 16) * 40503 % 4294967296 AS h1,
             150 + xor(h1, h1 >> 13) % 150 AS p
           FROM dims),
         bu AS (SELECT gi.doc_id, gi.i, gi.dur, gi.ch, gi.n,
             ps.p + COALESCE(SUM(gi.dur + gi.gap) OVER (
               PARTITION BY gi.doc_id ORDER BY gi.i
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS pos
           FROM gi JOIN ps ON gi.doc_id = ps.doc_id),
         bv AS (SELECT * FROM bu WHERE pos + dur <= n - 100),
         tv AS (SELECT doc_id, i, ch,
             LAG(ch) OVER (PARTITION BY doc_id ORDER BY i) AS pch
           FROM bv),
         ag AS (SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_utterances,
             CAST(SUM(CASE WHEN pch IS NOT NULL AND ch <> pch
               THEN 1 ELSE 0 END) AS BIGINT) AS n_turns,
             CAST(SUM(CASE WHEN ch = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS left_utts,
             CAST(SUM(CASE WHEN ch = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS right_utts
           FROM tv GROUP BY 1)
         SELECT d.doc_id, COALESCE(a.n_utterances, 0) AS n_utterances,
             COALESCE(a.n_turns, 0) AS n_turns,
             COALESCE(a.left_utts, 0) AS left_utts,
             COALESCE(a.right_utts, 0) AS right_utts,
             (COALESCE(a.left_utts, 0) >= 1
              AND COALESCE(a.right_utts, 0) >= 1) AS two_speakers
         FROM dims d LEFT JOIN ag a ON d.doc_id = a.doc_id
         ORDER BY d.doc_id""",
    // q298: both channels recomputed closed-form (right = half-period
    // phase shift), truncated-bp balance, zero-sum guard mirrored.
    "q298_wav_stereo" ->
      """WITH dims AS (SELECT doc_id, 300 + doc_id % 47 AS n,
             22050 + (doc_id % 2) * 22050 AS rate FROM documents),
         sm AS (SELECT doc_id, n, rate, unnest(range(0, n)) AS j
           FROM dims),
         v AS (SELECT doc_id, n, rate,
             ABS((doc_id * 31 + 7 * j) % 4096 - 2048) AS al,
             ABS((doc_id * 31 + 7 * j + 2048) % 4096 - 2048) AS ar
           FROM sm),
         agg AS (SELECT doc_id, MAX(n) AS n, MAX(rate) AS rate,
             CAST(SUM(al) AS BIGINT) AS sl,
             CAST(SUM(ar) AS BIGINT) AS sr,
             CAST(MAX(al) AS BIGINT) AS pl,
             CAST(MAX(ar) AS BIGINT) AS pr
           FROM v GROUP BY 1)
         SELECT doc_id, CAST(rate AS BIGINT) AS sample_rate,
             CAST(n AS BIGINT) AS n_samples, sl AS sum_abs_l,
             sr AS sum_abs_r, pl AS peak_abs_l, pr AS peak_abs_r,
             CASE WHEN sl + sr = 0 THEN 5000
               ELSE sl * 10000 // (sl + sr) END AS balance_bp
         FROM agg ORDER BY doc_id""",
    // q299: both fingerprints replayed bit-exactly — the master leg is
    // q290's full rule; the downmix leg is d = (L + L//2) // 2 with L
    // the signed modulated sample (all truncating divisions mirror
    // Scala's, the measured q87/q290 property).
    "q299_stereo_downmix" ->
      """WITH dims AS (SELECT doc_id,
             2000 + (doc_id % 7) * 500 + (doc_id % 53) AS n
           FROM documents),
         fj AS (SELECT doc_id, n, unnest(range(0, n)) AS j FROM dims),
         lv AS (SELECT doc_id, n, j, (j * 60) // n AS b,
             (doc_id * 60 + (j * 60) // n + 1) * 2654435761
               % 4294967296 AS h0,
             xor(h0, h0 >> 16) * 40503 % 4294967296 AS h1,
             xor(h1, h1 >> 13) % 6 AS m,
             ((doc_id * 31 + 997 * j) % 4096 - 2048)
               * (1 + m + CASE WHEN m >= 3 THEN 5 ELSE 0 END) // 8 AS l
           FROM fj),
         mv AS (SELECT doc_id, b, ABS(l) AS am,
             ABS((l + l // 2) // 2) AS ad
           FROM lv),
         mbin AS (SELECT doc_id, b, CAST(SUM(am) AS BIGINT) AS sm,
             CAST(SUM(ad) AS BIGINT) AS sd
           FROM mv GROUP BY 1, 2),
         mtot AS (SELECT doc_id, CAST(SUM(am) AS BIGINT) AS tm,
             CAST(SUM(ad) AS BIGINT) AS td
           FROM mv GROUP BY 1),
         fps AS (SELECT mbin.doc_id,
             CAST(SUM(CASE WHEN mbin.sm * 60 > mtot.tm
               THEN 1::BIGINT << mbin.b ELSE 0 END) AS BIGINT)
               AS fp_master,
             CAST(SUM(CASE WHEN mbin.sd * 60 > mtot.td
               THEN 1::BIGINT << mbin.b ELSE 0 END) AS BIGINT)
               AS fp_downmix
           FROM mbin JOIN mtot ON mbin.doc_id = mtot.doc_id
           GROUP BY mbin.doc_id)
         SELECT f.doc_id, f.fp_master, f.fp_downmix,
             CAST(bit_count(xor(f.fp_master, f.fp_downmix)) AS BIGINT)
               AS hamming,
             bit_count(xor(f.fp_master, f.fp_downmix)) <= 8 AS is_dup,
             CAST(bit_count(xor(f.fp_downmix, c.fp_master)) AS BIGINT)
               AS control_hamming,
             bit_count(xor(f.fp_downmix, c.fp_master)) > 8 AS separated
         FROM fps f JOIN fps c ON c.doc_id = f.doc_id + 1
         ORDER BY f.doc_id""",
    // q300: keyframe blockhashes replayed closed-form (the planted
    // per-(clip, scene, block) xor-shift bits ARE the decoded
    // block-vs-frame-mean bits, all-ones degenerating to 0 under the
    // strict > rule), the same exact-equality >= 2 pair rule, the
    // recursive closure, and the q274 quality-max keep.
    "q300_video_clusters" ->
      """WITH RECURSIVE base AS (SELECT doc_id, doc_id // 4 AS seed,
             doc_id % 4 AS r FROM documents),
         b2 AS (SELECT doc_id,
             CASE WHEN r = 3 THEN 2 * seed + 1 ELSE 2 * seed END AS sk,
             3 + seed % 3 AS ns, r
           FROM base),
         sc AS (SELECT doc_id, sk,
             CASE WHEN r = 2 THEN s + 1 ELSE s END AS scene
           FROM b2, unnest(range(0,
             CASE WHEN r = 2 THEN ns - 1 ELSE ns END)) u(s)),
         bits AS (SELECT doc_id, scene, b,
             (sk * 512 + scene * 64 + b + 1) * 2654435761
               % 4294967296 AS h0,
             xor(h0, h0 >> 16) * 40503 % 4294967296 AS h1,
             xor(h1, h1 >> 13) % 2 AS bit
           FROM sc, unnest(range(0, 64)) v(b)),
         kf AS (SELECT doc_id, scene,
             CASE WHEN SUM(bit) = 64 THEN 0
               ELSE CAST(SUM(CASE WHEN bit = 0 THEN 0
                 WHEN b = 63 THEN -9223372036854775808
                 ELSE 1::BIGINT << b END) AS BIGINT) END AS kf_hash
           FROM bits GROUP BY 1, 2),
         e AS (SELECT a.doc_id AS na, c.doc_id AS nb
           FROM kf a JOIN kf c ON a.kf_hash = c.kf_hash
             AND a.doc_id < c.doc_id
           GROUP BY 1, 2 HAVING COUNT(*) >= 2),
         sym AS (SELECT na AS src, nb AS dst FROM e
                 UNION SELECT nb, na FROM e),
         r AS (SELECT src AS node, dst AS peer FROM sym
               UNION
               SELECT r.node, s.dst FROM r JOIN sym s ON r.peer = s.src),
         lab AS (SELECT node, LEAST(node, MIN(peer)) AS cluster_rep
           FROM r GROUP BY node),
         tk AS (SELECT doc_id, text,
             list_filter(string_split(text, ' '), t -> t <> '') AS toks
           FROM documents),
         qq AS (SELECT doc_id, CAST(floor((
               0.5 * least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0)
               + 0.3 * (1.0 - CAST(len(list_filter(toks,
                     w -> w IN ('the','a','of','and','is')))
                   AS DOUBLE) / CAST(len(toks) AS DOUBLE))
               + 0.2 * least(((CAST(length(text) AS DOUBLE)
                     - (CAST(len(toks) AS DOUBLE) - 1.0))
                   / CAST(len(toks) AS DOUBLE)) / 8.0, 1.0)
             ) * 10000.0 + 0.5) AS BIGINT) AS q_bp
           FROM tk),
         dl AS (SELECT d.doc_id,
             COALESCE(l.cluster_rep, d.doc_id) AS cluster_rep, q.q_bp
           FROM base d LEFT JOIN lab l ON d.doc_id = l.node
           JOIN qq q ON d.doc_id = q.doc_id),
         win AS (SELECT cluster_rep, doc_id, q_bp, row_number() OVER
             (PARTITION BY cluster_rep ORDER BY q_bp DESC, doc_id ASC)
             AS rn
           FROM dl),
         nk AS (SELECT dl.cluster_rep,
             CAST(COUNT(DISTINCT kf.kf_hash) AS BIGINT) AS n_kf_hashes
           FROM dl JOIN kf ON dl.doc_id = kf.doc_id GROUP BY 1),
         agg AS (SELECT cluster_rep, CAST(COUNT(*) AS BIGINT) AS n_docs
           FROM dl GROUP BY 1)
         SELECT a.cluster_rep, a.n_docs, k.n_kf_hashes,
             w.doc_id AS kept_doc, w.q_bp AS kept_q_bp
         FROM agg a JOIN nk k ON a.cluster_rep = k.cluster_rep
           JOIN win w ON a.cluster_rep = w.cluster_rep AND w.rn = 1
         ORDER BY a.cluster_rep""",
    // q301: clicks replayed closed-form (xor-shift gaps/amps,
    // cumulative positions), triplet hashes in the arithmetic packing,
    // DISTINCT sets per leg. The pad leg shifts every onset equally so
    // its hash set IS the master's (a theorem of the construction);
    // the trim leg keeps exactly the i >= 1 triplets (a subset, so the
    // intersection is its own size). Oracle cost scales with clicks
    // (~20/doc), never samples.
    "q301_audio_landmarks" ->
      """WITH dims AS (SELECT doc_id,
             4000 + (doc_id % 7) * 500 + doc_id % 53 AS n
           FROM documents),
         legs AS (SELECT doc_id, n, 2 * doc_id AS sk, TRUE AS is_m
             FROM dims
           UNION ALL
           SELECT doc_id, n, 2 * doc_id + 1, FALSE FROM dims),
         gi AS (SELECT doc_id, n, sk, is_m, i,
             (sk * 1024 + 2 * i + 1) * 2654435761 % 4294967296 AS g0,
             xor(g0, g0 >> 16) * 40503 % 4294967296 AS g1,
             150 + xor(g1, g1 >> 13) % 250 AS gap,
             (sk * 1024 + 2 * i + 2) * 2654435761 % 4294967296 AS a0,
             xor(a0, a0 >> 16) * 40503 % 4294967296 AS a1,
             1500 + xor(a1, a1 >> 13) % 8 * 64 AS amp
           FROM legs, unnest(range(0, 45)) u(i)),
         -- 45 >= 1 + (7052-100-w-200)//(w+150) for click widths
         -- w in {1,3}: the densest legal train fits the budget
         -- exactly (OracleClickBudgetSpec guards n growth)
         ps AS (SELECT doc_id, sk,
             (sk * 1024 + 1000) * 2654435761 % 4294967296 AS h0,
             xor(h0, h0 >> 16) * 40503 % 4294967296 AS h1,
             200 + xor(h1, h1 >> 13) % 200 AS p
           FROM legs),
         ck AS (SELECT gi.doc_id, gi.sk, gi.is_m, gi.i, gi.amp, gi.n,
             ps.p + COALESCE(SUM(3 + gi.gap) OVER (
               PARTITION BY gi.doc_id, gi.sk ORDER BY gi.i
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS pos
           FROM gi JOIN ps ON gi.doc_id = ps.doc_id AND gi.sk = ps.sk),
         cf AS (SELECT * FROM ck WHERE pos + 3 <= n - 100),
         tr AS (SELECT a.doc_id, a.sk, a.is_m, a.i,
             (((b.pos - a.pos) * 1048576 + (c.pos - b.pos)) * 256
               + LEAST(b.amp * 8 // a.amp, 15) * 16
               + LEAST(c.amp * 8 // b.amp, 15)) AS h
           FROM cf a
           JOIN cf b ON a.doc_id = b.doc_id AND a.sk = b.sk
             AND b.i = a.i + 1
           JOIN cf c ON a.doc_id = c.doc_id AND a.sk = c.sk
             AND c.i = a.i + 2),
         mh AS (SELECT DISTINCT doc_id, h FROM tr WHERE is_m),
         th AS (SELECT DISTINCT doc_id, h FROM tr WHERE is_m
           AND i >= 1),
         ch AS (SELECT DISTINCT doc_id, h FROM tr WHERE NOT is_m),
         non AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_onsets
           FROM cf WHERE is_m GROUP BY 1),
         nh AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hashes
           FROM mh GROUP BY 1),
         ts AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS trim_shared
           FROM th GROUP BY 1),
         cs AS (SELECT m.doc_id, CAST(COUNT(*) AS BIGINT) AS ctrl_shared
           FROM mh m JOIN ch c ON m.doc_id = c.doc_id AND m.h = c.h
           GROUP BY 1)
         SELECT nh.doc_id, non.n_onsets, nh.n_hashes,
             nh.n_hashes AS pad_shared, ts.trim_shared,
             COALESCE(cs.ctrl_shared, 0) AS ctrl_shared,
             nh.n_hashes >= 3 AS pad_dup,
             ts.trim_shared >= 3 AS trim_dup,
             COALESCE(cs.ctrl_shared, 0) < 3 AS ctrl_separated
         FROM nh JOIN non ON nh.doc_id = non.doc_id
              JOIN ts ON nh.doc_id = ts.doc_id
              LEFT JOIN cs ON nh.doc_id = cs.doc_id
         ORDER BY nh.doc_id""",
    // q302: the q301 click replay per id/4 group (trimmed member
    // keeps i >= 1 triplets), vote edges at the lmop-derived stored
    // operating point, recursive closure,
    // quality-max keep — the q300 oracle shape on the audio axis.
    "q302_landmark_clusters" ->
      s"""WITH RECURSIVE $landmarkOpCtes,
         base AS (SELECT doc_id, doc_id // 4 AS g,
             doc_id % 4 AS r FROM documents),
         b2 AS (SELECT doc_id, g, r,
             CASE WHEN r = 3 THEN 2 * g + 1 ELSE 2 * g END AS sk,
             4000 + (g % 7) * 500 + g % 53 AS n
           FROM base),
         gi AS (SELECT doc_id, n, sk, r, i,
             (sk * 1024 + 2 * i + 1) * 2654435761 % 4294967296 AS g0,
             xor(g0, g0 >> 16) * 40503 % 4294967296 AS g1,
             150 + xor(g1, g1 >> 13) % 250 AS gap,
             (sk * 1024 + 2 * i + 2) * 2654435761 % 4294967296 AS a0,
             xor(a0, a0 >> 16) * 40503 % 4294967296 AS a1,
             1500 + xor(a1, a1 >> 13) % 8 * 64 AS amp
           FROM b2, unnest(range(0, 45)) u(i)),
         -- 45 >= 1 + (7052-100-w-200)//(w+150) for click widths
         -- w in {1,3}: the densest legal train fits the budget
         -- exactly (OracleClickBudgetSpec guards n growth)
         ps AS (SELECT doc_id, sk,
             (sk * 1024 + 1000) * 2654435761 % 4294967296 AS h0,
             xor(h0, h0 >> 16) * 40503 % 4294967296 AS h1,
             200 + xor(h1, h1 >> 13) % 200 AS p
           FROM b2),
         ck AS (SELECT gi.doc_id, gi.r, gi.i, gi.amp, gi.n,
             ps.p + COALESCE(SUM(3 + gi.gap) OVER (
               PARTITION BY gi.doc_id ORDER BY gi.i
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS pos
           FROM gi JOIN ps ON gi.doc_id = ps.doc_id),
         cf AS (SELECT * FROM ck WHERE pos + 3 <= n - 100),
         tr AS (SELECT a.doc_id, a.r, a.i,
             ((((b.pos - a.pos) >> (SELECT qstar FROM lmop)) * 1048576
                 + ((c.pos - b.pos) >> (SELECT qstar FROM lmop))) * 256
               + LEAST(b.amp * 8 // a.amp, 15) * 16
               + LEAST(c.amp * 8 // b.amp, 15)) AS h
           FROM cf a
           JOIN cf b ON a.doc_id = b.doc_id AND b.i = a.i + 1
           JOIN cf c ON a.doc_id = c.doc_id AND c.i = a.i + 2),
         hs AS (SELECT DISTINCT doc_id, h FROM tr
           WHERE r <> 2 OR i >= 1),
         e AS (SELECT a.doc_id AS na, c.doc_id AS nb
           FROM hs a JOIN hs c ON a.h = c.h AND a.doc_id < c.doc_id
           GROUP BY 1, 2 HAVING COUNT(*) >= (SELECT tstar FROM lmop)),
         sym AS (SELECT na AS src, nb AS dst FROM e
                 UNION SELECT nb, na FROM e),
         rr AS (SELECT src AS node, dst AS peer FROM sym
               UNION
               SELECT rr.node, s.dst FROM rr JOIN sym s
                 ON rr.peer = s.src),
         lab AS (SELECT node, LEAST(node, MIN(peer)) AS cluster_rep
           FROM rr GROUP BY node),
         tk AS (SELECT doc_id, text,
             list_filter(string_split(text, ' '), t -> t <> '') AS toks
           FROM documents),
         qq AS (SELECT doc_id, CAST(floor((
               0.5 * least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0)
               + 0.3 * (1.0 - CAST(len(list_filter(toks,
                     w -> w IN ('the','a','of','and','is')))
                   AS DOUBLE) / CAST(len(toks) AS DOUBLE))
               + 0.2 * least(((CAST(length(text) AS DOUBLE)
                     - (CAST(len(toks) AS DOUBLE) - 1.0))
                   / CAST(len(toks) AS DOUBLE)) / 8.0, 1.0)
             ) * 10000.0 + 0.5) AS BIGINT) AS q_bp
           FROM tk),
         dl AS (SELECT d.doc_id,
             COALESCE(l.cluster_rep, d.doc_id) AS cluster_rep, q.q_bp
           FROM base d LEFT JOIN lab l ON d.doc_id = l.node
           JOIN qq q ON d.doc_id = q.doc_id),
         win AS (SELECT cluster_rep, doc_id, q_bp, row_number() OVER
             (PARTITION BY cluster_rep ORDER BY q_bp DESC, doc_id ASC)
             AS rn
           FROM dl),
         nk AS (SELECT dl.cluster_rep,
             CAST(COUNT(DISTINCT hs.h) AS BIGINT) AS n_lm_hashes
           FROM dl JOIN hs ON dl.doc_id = hs.doc_id GROUP BY 1),
         agg AS (SELECT cluster_rep, CAST(COUNT(*) AS BIGINT) AS n_docs
           FROM dl GROUP BY 1)
         SELECT a.cluster_rep, a.n_docs, k.n_lm_hashes,
             w.doc_id AS kept_doc, w.q_bp AS kept_q_bp
         FROM agg a JOIN nk k ON a.cluster_rep = k.cluster_rep
           JOIN win w ON a.cluster_rep = w.cluster_rep AND w.rn = 1
         ORDER BY a.cluster_rep""",
    // q314: the calibration sample, all four quantization levels, and
    // the admitted-count sweep replayed verbatim from landmarkOpCtes;
    // 768 = the fixed positive-pair count (3 per sample group).
    "q314_landmark_tuning" ->
      s"""WITH $landmarkOpCtes,
         lmts AS (SELECT t FROM unnest(range(1, 17)) tt(t)),
         cellp AS (SELECT p.q, t.t,
             CAST(SUM(CASE WHEN p.shared >= t.t THEN 1 ELSE 0 END)
               AS BIGINT) AS pos_admitted
           FROM lmposj p, lmts t GROUP BY 1, 2),
         celln AS (SELECT n2.q, t.t,
             CAST(SUM(CASE WHEN n2.shared >= t.t THEN 1 ELSE 0 END)
               AS BIGINT) AS neg_admitted
           FROM lmneg n2, lmts t GROUP BY 1, 2)
         SELECT CAST(cp.q AS BIGINT) AS delta_qbits,
             CAST(cp.t AS BIGINT) AS vote_t,
             cp.pos_admitted,
             COALESCE(cn.neg_admitted, 0) AS neg_admitted,
             cp.pos_admitted * 10000 // 768 AS recall_bp,
             CASE WHEN cp.pos_admitted + COALESCE(cn.neg_admitted, 0)
                 = 0 THEN 10000
               ELSE cp.pos_admitted * 10000
                 // (cp.pos_admitted + COALESCE(cn.neg_admitted, 0))
               END AS precision_bp
         FROM cellp cp LEFT JOIN celln cn
           ON cp.q = cn.q AND cp.t = cn.t
         ORDER BY 1, 2""",
    // q321: the df-cap sweep at the chosen (q*, t*) — per-hash df over
    // the replayed calibration sample, the capped vote re-run per grid
    // cap, and the headroom choice rule; 768 = the fixed positive-pair
    // count, 16 = the documented headroom multiplier.
    "q321_df_cap_tuning" ->
      s"""WITH $landmarkOpCtes,
         $dfCapCtes,
         cocc AS (SELECT a.did AS da, b.did AS db, d.dfh
           FROM chq a JOIN chq b ON a.h = b.h AND a.did < b.did
           JOIN cdf d ON d.h = a.h),
         csh AS (SELECT g.cap, o.da, o.db,
             CAST(COUNT(*) AS BIGINT) AS shared
           FROM capg g JOIN cocc o ON o.dfh <= g.cap
           GROUP BY 1, 2, 3),
         cposk AS (SELECT g.cap, 4 * lmg.g + pp.ra AS da,
             4 * lmg.g + pp.rb AS db
           FROM capg g, lmg, (VALUES (0, 1), (0, 2), (1, 2)) pp(ra, rb)),
         cpos AS (SELECT k.cap,
             CAST(SUM(CASE WHEN COALESCE(s.shared, 0) >=
               (SELECT tstar FROM lmop) THEN 1 ELSE 0 END) AS BIGINT)
               AS pos_admitted
           FROM cposk k LEFT JOIN csh s
             ON k.cap = s.cap AND k.da = s.da AND k.db = s.db
           GROUP BY 1),
         cneg AS (SELECT s.cap,
             CAST(SUM(CASE WHEN s.shared >= (SELECT tstar FROM lmop)
               THEN 1 ELSE 0 END) AS BIGINT) AS neg_admitted
           FROM csh s
           WHERE NOT (s.da // 4 = s.db // 4
             AND s.da % 4 < 3 AND s.db % 4 < 3)
           GROUP BY 1),
         chot AS (SELECT g.cap, CAST(COUNT(*) AS BIGINT) AS n_hot_hashes
           FROM capg g JOIN cdf d ON d.dfh > g.cap GROUP BY 1)
         SELECT g.cap,
           COALESCE(ch.n_hot_hashes, 0) AS n_hot_hashes,
           COALESCE(cp.pos_admitted, 0) AS pos_admitted,
           COALESCE(cn.neg_admitted, 0) AS neg_admitted,
           COALESCE(cp.pos_admitted, 0) * 10000 // 768 AS recall_bp,
           (SELECT m FROM cmax) AS sample_max_df,
           g.cap = (SELECT capstar FROM ccap) AS chosen
         FROM capg g
         LEFT JOIN chot ch ON g.cap = ch.cap
         LEFT JOIN cpos cp ON g.cap = cp.cap
         LEFT JOIN cneg cn ON g.cap = cn.cap
         ORDER BY g.cap""",
    // q323: both reference waves' envelope fingerprints replayed
    // closed-form (the q315 kv chain with refs at g % 9 IN (0, 3)),
    // entry/novel/stop counts over the band index, and the grown
    // index's <= 4 probe over the full arrival corpus; the stop
    // threshold is the DERIVED q321 capstar, never a constant.
    "q323_incr_band_index" ->
      s"""WITH $landmarkOpCtes,
         $dfCapCtes,
         units AS (SELECT doc_id AS uid,
             2 * (doc_id // 3) AS sk,
             2000 + ((doc_id // 3) % 7) * 500 + (doc_id // 3) % 53
               AS n,
             1 + doc_id % 2 AS step, FALSE AS is_td,
             doc_id AS out_id
           FROM documents
           UNION ALL
           SELECT -g - 1, 2 * g, 2000 + (g % 7) * 500 + g % 53, 1,
             TRUE, g
           FROM (SELECT DISTINCT doc_id // 3 AS g FROM documents
                 WHERE (doc_id // 3) % 9 IN (0, 3)) tds),
         b3 AS (SELECT uid, sk, n, step, is_td, out_id,
             n // step AS m
           FROM units),
         kv AS (SELECT uid, m, (k * 60) // m AS b,
             (sk * 60 + ((k * step) * 60) // n + 1) * 2654435761
               % 4294967296 AS h0,
             xor(h0, h0 >> 16) * 40503 % 4294967296 AS h1,
             xor(h1, h1 >> 13) % 6 AS mm,
             ABS(((sk * 31 + 997 * (k * step)) % 4096 - 2048)
               * (1 + mm + CASE WHEN mm >= 3 THEN 5 ELSE 0 END) // 8)
               AS a
           FROM b3, unnest(range(0, m)) u(k)),
         bins AS (SELECT uid, b, CAST(SUM(a) AS BIGINT) AS sm
           FROM kv GROUP BY 1, 2),
         tt AS (SELECT uid, CAST(SUM(a) AS BIGINT) AS total
           FROM kv GROUP BY 1),
         fpt AS (SELECT bins.uid,
             CAST(SUM(CASE WHEN bins.sm * 60 > tt.total
               THEN 1::BIGINT << bins.b ELSE 0 END) AS BIGINT) AS fp
           FROM bins JOIN tt ON bins.uid = tt.uid
           GROUP BY bins.uid),
         ab AS (SELECT u.out_id AS doc_id, f.fp,
             ((f.fp >> (b.b * 12)) & 4095) * 5 + b.b AS bk
           FROM fpt f JOIN b3 u ON f.uid = u.uid,
             unnest(range(0, 5)) b(b)
           WHERE NOT u.is_td),
         hb AS (SELECT u.out_id AS hist_id, u.out_id % 9 AS gres,
             f.fp AS hfp,
             ((f.fp >> (b.b * 12)) & 4095) * 5 + b.b AS bk
           FROM fpt f JOIN b3 u ON f.uid = u.uid,
             unnest(range(0, 5)) b(b)
           WHERE u.is_td),
         cnts AS (SELECT
             CAST(COUNT(*) FILTER (WHERE gres = 0) AS BIGINT)
               AS before_e,
             CAST(COUNT(*) FILTER (WHERE gres = 3) AS BIGINT)
               AS added_e
           FROM hb),
         novel AS (SELECT CAST(COUNT(DISTINCT w1.bk) AS BIGINT) AS nv
           FROM hb w1 WHERE w1.gres = 3 AND w1.bk NOT IN
             (SELECT bk FROM hb w0 WHERE w0.gres = 0)),
         stopb AS (SELECT CAST(COUNT(*) AS BIGINT) AS ns
           FROM (SELECT bk FROM hb GROUP BY bk
                 HAVING COUNT(*) > (SELECT capstar FROM ccap)) sx),
         -- a reference is unindexed iff EVERY band was hot within its
         -- own wave's build (the engine caps per build pass)
         hbw AS (SELECT gres, bk, COUNT(*) AS dfw FROM hb
           GROUP BY 1, 2),
         uix AS (SELECT CAST(COUNT(*) AS BIGINT) AS nu FROM (
             SELECT h2.hist_id FROM hb h2
             JOIN hbw ON hbw.gres = h2.gres AND hbw.bk = h2.bk
             GROUP BY h2.hist_id
             HAVING SUM(CASE WHEN hbw.dfw <=
               (SELECT capstar FROM ccap) THEN 1 ELSE 0 END) = 0) ux),
         blockedd AS (SELECT DISTINCT ab.doc_id FROM ab JOIN hb
             ON ab.bk = hb.bk
           WHERE bit_count(xor(ab.fp, hb.hfp)) <= 4),
         blk AS (SELECT CAST(COUNT(*) AS BIGINT) AS nb FROM blockedd),
         rc AS (SELECT CAST(COUNT(*) AS BIGINT) AS nr FROM documents d
           WHERE (d.doc_id // 3) % 9 IN (0, 3)
             AND d.doc_id NOT IN (SELECT doc_id FROM blockedd))
         SELECT 'added_entries' AS phase, added_e AS n FROM cnts
         UNION ALL SELECT 'after_entries', before_e + added_e FROM cnts
         UNION ALL SELECT 'before_entries', before_e FROM cnts
         UNION ALL SELECT 'blocked_arrivals', nb FROM blk
         UNION ALL SELECT 'novel_bands', nv FROM novel
         UNION ALL SELECT 'recheck_unmatched', nr FROM rc
         UNION ALL SELECT 'stop_bands', ns FROM stopb
         UNION ALL SELECT 'unindexed_refs', nu FROM uix
         ORDER BY phase""",
    // q324: both reference waves' click trains replayed closed-form
    // (the q319 window chain with refs at g % 9 IN (0, 3)), the vote
    // rule at the derived (q*, t*), and the same count family at the
    // derived capstar.
    "q324_incr_landmark_index" ->
      s"""WITH $landmarkOpCtes,
         $dfCapCtes,
         tdbase AS (SELECT doc_id, doc_id // 3 AS g, doc_id % 3 AS r
           FROM documents),
         tdg AS (SELECT DISTINCT g, 2 * g AS sk,
             4000 + (g % 7) * 500 + g % 53 AS n
           FROM tdbase),
         tdgi AS (SELECT g, n, sk, i,
             (sk * 1024 + 2 * i + 1) * 2654435761 % 4294967296 AS g0,
             xor(g0, g0 >> 16) * 40503 % 4294967296 AS g1,
             150 + xor(g1, g1 >> 13) % 250 AS gap,
             (sk * 1024 + 2 * i + 2) * 2654435761 % 4294967296 AS a0,
             xor(a0, a0 >> 16) * 40503 % 4294967296 AS a1,
             1500 + xor(a1, a1 >> 13) % 8 * 64 AS amp
           FROM tdg, unnest(range(0, 45)) u(i)),
         tdps AS (SELECT g,
             (sk * 1024 + 1000) * 2654435761 % 4294967296 AS h0,
             xor(h0, h0 >> 16) * 40503 % 4294967296 AS h1,
             200 + xor(h1, h1 >> 13) % 200 AS p
           FROM tdg),
         tdck AS (SELECT tdgi.g, tdgi.i, tdgi.amp, tdgi.n,
             tdps.p + COALESCE(SUM(3 + tdgi.gap) OVER (
               PARTITION BY tdgi.g ORDER BY tdgi.i
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS pos
           FROM tdgi JOIN tdps ON tdgi.g = tdps.g),
         tdcf AS (SELECT * FROM tdck WHERE pos + 3 <= n - 100),
         tdtr AS (SELECT a.g, a.i,
             ((((b.pos - a.pos) >> (SELECT qstar FROM lmop)) * 1048576
                 + ((c.pos - b.pos) >> (SELECT qstar FROM lmop))) * 256
               + LEAST(b.amp * 8 // a.amp, 15) * 16
               + LEAST(c.amp * 8 // b.amp, 15)) AS h
           FROM tdcf a
           JOIN tdcf b ON a.g = b.g AND b.i = a.i + 1
           JOIN tdcf c ON a.g = c.g AND c.i = a.i + 2),
         tdarr AS (SELECT DISTINCT d.doc_id, t2.h
           FROM tdbase d JOIN tdtr t2 ON d.g = t2.g
           WHERE d.r <> 2 OR t2.i >= 1),
         tdref AS (SELECT DISTINCT g AS takedown_id, g % 9 AS gres, h
           FROM tdtr WHERE g % 9 IN (0, 3)),
         cnts AS (SELECT
             CAST(COUNT(*) FILTER (WHERE gres = 0) AS BIGINT)
               AS before_e,
             CAST(COUNT(*) FILTER (WHERE gres = 3) AS BIGINT)
               AS added_e
           FROM tdref),
         novel AS (SELECT CAST(COUNT(DISTINCT w1.h) AS BIGINT) AS nv
           FROM tdref w1 WHERE w1.gres = 3 AND w1.h NOT IN
             (SELECT h FROM tdref w0 WHERE w0.gres = 0)),
         stoph AS (SELECT CAST(COUNT(*) AS BIGINT) AS ns
           FROM (SELECT h FROM tdref GROUP BY h
                 HAVING COUNT(*) > (SELECT capstar FROM ccap)) sx),
         blockedd AS (SELECT a.doc_id
           FROM tdarr a JOIN tdref rf ON a.h = rf.h
           GROUP BY a.doc_id, rf.takedown_id
           HAVING COUNT(*) >= (SELECT tstar FROM lmop)),
         blkd AS (SELECT DISTINCT doc_id FROM blockedd),
         blk AS (SELECT CAST(COUNT(*) AS BIGINT) AS nb FROM blkd),
         rc AS (SELECT CAST(COUNT(*) AS BIGINT) AS nr FROM documents d
           WHERE (d.doc_id // 3) % 9 IN (0, 3)
             AND d.doc_id NOT IN (SELECT doc_id FROM blkd))
         SELECT 'added_entries' AS phase, added_e AS n FROM cnts
         UNION ALL SELECT 'after_entries', before_e + added_e FROM cnts
         UNION ALL SELECT 'before_entries', before_e FROM cnts
         UNION ALL SELECT 'blocked_arrivals', nb FROM blk
         UNION ALL SELECT 'novel_hashes', nv FROM novel
         UNION ALL SELECT 'recheck_unmatched', nr FROM rc
         UNION ALL SELECT 'stop_hashes', ns FROM stoph
         ORDER BY phase""",
    // q315: arrival and takedown-reference envelope fingerprints
    // replayed per-sample closed-form (the q304 kv chain over a
    // tagged unit union), the exact band rule, and the <= 4
    // compliance gate (the guaranteed pigeonhole bound, not the
    // band-lucky dedup 8).
    "q315_audio_takedown" ->
      """WITH units AS (SELECT doc_id AS uid,
             2 * (doc_id // 3) AS sk,
             2000 + ((doc_id // 3) % 7) * 500 + (doc_id // 3) % 53
               AS n,
             1 + doc_id % 2 AS step, FALSE AS is_td,
             doc_id AS out_id
           FROM documents
           UNION ALL
           SELECT -g - 1, 2 * g, 2000 + (g % 7) * 500 + g % 53, 1,
             TRUE, g
           FROM (SELECT DISTINCT doc_id // 3 AS g FROM documents
                 WHERE (doc_id // 3) % 9 = 0) tds),
         b3 AS (SELECT uid, sk, n, step, is_td, out_id,
             n // step AS m
           FROM units),
         kv AS (SELECT uid, m, (k * 60) // m AS b,
             (sk * 60 + ((k * step) * 60) // n + 1) * 2654435761
               % 4294967296 AS h0,
             xor(h0, h0 >> 16) * 40503 % 4294967296 AS h1,
             xor(h1, h1 >> 13) % 6 AS mm,
             ABS(((sk * 31 + 997 * (k * step)) % 4096 - 2048)
               * (1 + mm + CASE WHEN mm >= 3 THEN 5 ELSE 0 END) // 8)
               AS a
           FROM b3, unnest(range(0, m)) u(k)),
         bins AS (SELECT uid, b, CAST(SUM(a) AS BIGINT) AS sm
           FROM kv GROUP BY 1, 2),
         tt AS (SELECT uid, CAST(SUM(a) AS BIGINT) AS total
           FROM kv GROUP BY 1),
         fpt AS (SELECT bins.uid,
             CAST(SUM(CASE WHEN bins.sm * 60 > tt.total
               THEN 1::BIGINT << bins.b ELSE 0 END) AS BIGINT) AS fp
           FROM bins JOIN tt ON bins.uid = tt.uid
           GROUP BY bins.uid),
         ab AS (SELECT u.out_id AS doc_id, f.fp,
             ((f.fp >> (b.b * 12)) & 4095) * 5 + b.b AS bk
           FROM fpt f JOIN b3 u ON f.uid = u.uid,
             unnest(range(0, 5)) b(b)
           WHERE NOT u.is_td),
         hb AS (SELECT u.out_id AS hist_id, f.fp AS hfp,
             ((f.fp >> (b.b * 12)) & 4095) * 5 + b.b AS bk
           FROM fpt f JOIN b3 u ON f.uid = u.uid,
             unnest(range(0, 5)) b(b)
           WHERE u.is_td)
         SELECT DISTINCT ab.doc_id, hb.hist_id,
             CAST(bit_count(xor(ab.fp, hb.hfp)) AS BIGINT) AS hamming
         FROM ab JOIN hb ON ab.bk = hb.bk
         WHERE bit_count(xor(ab.fp, hb.hfp)) <= 4
         ORDER BY ab.doc_id, hb.hist_id""",
    // q316: the q300/q307 keyframe-hash bit replay over a tagged unit
    // union (arrival renditions + takedown references), exact
    // equality probe, >= 2-keyframe vote.
    "q316_video_takedown" ->
      """WITH units AS (SELECT doc_id AS uid,
             2 * (doc_id // 3) AS sk,
             3 + (doc_id // 3) % 3 AS ns, doc_id % 3 AS r,
             FALSE AS is_td, doc_id AS out_id
           FROM documents
           UNION ALL
           SELECT -g - 1, 2 * g, 3 + g % 3, 0, TRUE, g
           FROM (SELECT DISTINCT doc_id // 3 AS g FROM documents
                 WHERE (doc_id // 3) % 9 = 0) tds),
         sc AS (SELECT uid, sk, is_td, out_id,
             CASE WHEN NOT is_td AND r = 1 THEN sx + 1 ELSE sx END
               AS scene
           FROM units, unnest(range(0,
             CASE WHEN NOT is_td AND r = 1 THEN ns - 1 ELSE ns END))
             u(sx)),
         bits AS (SELECT uid, is_td, out_id, scene, b,
             (sk * 512 + scene * 64 + b + 1) * 2654435761
               % 4294967296 AS h0,
             xor(h0, h0 >> 16) * 40503 % 4294967296 AS h1,
             xor(h1, h1 >> 13) % 2 AS bit
           FROM sc, unnest(range(0, 64)) v(b)),
         kf AS (SELECT uid, is_td, out_id, scene,
             CASE WHEN SUM(bit) = 64 THEN 0
               ELSE CAST(SUM(CASE WHEN bit = 0 THEN 0
                 WHEN b = 63 THEN -9223372036854775808
                 ELSE 1::BIGINT << b END) AS BIGINT) END AS kf_hash
           FROM bits GROUP BY 1, 2, 3, 4),
         akf AS (SELECT DISTINCT out_id AS doc_id, kf_hash FROM kf
           WHERE NOT is_td),
         tkf AS (SELECT DISTINCT out_id AS hist_id, kf_hash FROM kf
           WHERE is_td)
         SELECT a.doc_id, t2.hist_id,
             CAST(COUNT(*) AS BIGINT) AS n_shared
         FROM akf a JOIN tkf t2 ON a.kf_hash = t2.kf_hash
         GROUP BY 1, 2 HAVING COUNT(*) >= 2
         ORDER BY a.doc_id, t2.hist_id""",
    // q317: bursts replayed closed-form for BOTH pair sides (the
    // audio recording and the transcript's SOURCE recording — id+1 on
    // every 13th doc), zip-joined on burst index; token counts are
    // dur//25 + 1 on each side. 45 rows over-cover the densest legal
    // burst train (min advance 220).
    "q317_audio_transcript_align" ->
      """WITH dims AS (SELECT doc_id,
             4000 + (doc_id % 7) * 500 + doc_id % 53 AS n,
             CASE WHEN doc_id % 13 = 0 THEN doc_id + 1
               ELSE doc_id END AS src
           FROM documents),
         units AS (SELECT doc_id, doc_id AS seed, n, FALSE AS is_tr
           FROM dims
           UNION ALL
           SELECT doc_id, src,
             4000 + (src % 7) * 500 + src % 53, TRUE
           FROM dims),
         gi AS (SELECT doc_id, is_tr, seed, n, i,
             (seed * 2048 + 3 * i + 1) * 2654435761
               % 4294967296 AS d0,
             xor(d0, d0 >> 16) * 40503 % 4294967296 AS d1,
             100 + xor(d1, d1 >> 13) % 400 AS dur,
             (seed * 2048 + 3 * i + 3) * 2654435761
               % 4294967296 AS g0,
             xor(g0, g0 >> 16) * 40503 % 4294967296 AS g1,
             120 + xor(g1, g1 >> 13) % 300 AS gap
           FROM units, unnest(range(0, 45)) u(i)),
         ps AS (SELECT doc_id, is_tr,
             (seed * 2048 + 3000) * 2654435761 % 4294967296 AS h0,
             xor(h0, h0 >> 16) * 40503 % 4294967296 AS h1,
             150 + xor(h1, h1 >> 13) % 150 AS p
           FROM units),
         bu AS (SELECT gi.doc_id, gi.is_tr, gi.i, gi.dur, gi.n,
             ps.p + COALESCE(SUM(gi.dur + gi.gap) OVER (
               PARTITION BY gi.doc_id, gi.is_tr ORDER BY gi.i
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS pos
           FROM gi JOIN ps
             ON gi.doc_id = ps.doc_id AND gi.is_tr = ps.is_tr),
         bv AS (SELECT * FROM bu WHERE pos + dur <= n - 100),
         au AS (SELECT doc_id, i, dur // 25 + 1 AS toks FROM bv
           WHERE NOT is_tr),
         tr AS (SELECT doc_id, i, dur // 25 + 1 AS toks FROM bv
           WHERE is_tr),
         ac AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_utts
           FROM au GROUP BY 1),
         tc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_lines,
             CAST(SUM(toks) AS BIGINT) AS n_tokens
           FROM tr GROUP BY 1),
         zp AS (SELECT a.doc_id,
             CAST(COALESCE(SUM(ABS(t2.toks - a.toks)), 0) AS BIGINT)
               AS gap
           FROM au a JOIN tr t2
             ON a.doc_id = t2.doc_id AND a.i = t2.i
           GROUP BY 1)
         SELECT d.doc_id, ac.n_utts AS n_utterances, tc.n_lines,
             tc.n_tokens, (d.doc_id % 13 = 0) AS swapped,
             COALESCE(zp.gap, 0) AS token_gap,
             tc.n_lines = ac.n_utts AS count_match,
             tc.n_lines = ac.n_utts AND COALESCE(zp.gap, 0) = 0
               AS aligned,
             tc.n_lines = ac.n_utts AND COALESCE(zp.gap, 0) = 0
               AS kept
         FROM dims d JOIN ac ON d.doc_id = ac.doc_id
           JOIN tc ON d.doc_id = tc.doc_id
           LEFT JOIN zp ON d.doc_id = zp.doc_id
         ORDER BY d.doc_id""",
    // q319: clicks replayed once per GROUP (all three renditions of a
    // group derive from the same master train; the pad keeps every
    // triplet, the trim keeps i >= 1), hashes at the lmop-derived
    // stored quantization, the protected groups' sets as the
    // blocklist, and the >= tstar vote.
    "q319_landmark_takedown" ->
      s"""WITH $landmarkOpCtes,
         tdbase AS (SELECT doc_id, doc_id // 3 AS g, doc_id % 3 AS r
           FROM documents),
         tdg AS (SELECT DISTINCT g, 2 * g AS sk,
             4000 + (g % 7) * 500 + g % 53 AS n
           FROM tdbase),
         tdgi AS (SELECT g, n, sk, i,
             (sk * 1024 + 2 * i + 1) * 2654435761 % 4294967296 AS g0,
             xor(g0, g0 >> 16) * 40503 % 4294967296 AS g1,
             150 + xor(g1, g1 >> 13) % 250 AS gap,
             (sk * 1024 + 2 * i + 2) * 2654435761 % 4294967296 AS a0,
             xor(a0, a0 >> 16) * 40503 % 4294967296 AS a1,
             1500 + xor(a1, a1 >> 13) % 8 * 64 AS amp
           FROM tdg, unnest(range(0, 45)) u(i)),
         tdps AS (SELECT g,
             (sk * 1024 + 1000) * 2654435761 % 4294967296 AS h0,
             xor(h0, h0 >> 16) * 40503 % 4294967296 AS h1,
             200 + xor(h1, h1 >> 13) % 200 AS p
           FROM tdg),
         tdck AS (SELECT tdgi.g, tdgi.i, tdgi.amp, tdgi.n,
             tdps.p + COALESCE(SUM(3 + tdgi.gap) OVER (
               PARTITION BY tdgi.g ORDER BY tdgi.i
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS pos
           FROM tdgi JOIN tdps ON tdgi.g = tdps.g),
         tdcf AS (SELECT * FROM tdck WHERE pos + 3 <= n - 100),
         tdtr AS (SELECT a.g, a.i,
             ((((b.pos - a.pos) >> (SELECT qstar FROM lmop)) * 1048576
                 + ((c.pos - b.pos) >> (SELECT qstar FROM lmop))) * 256
               + LEAST(b.amp * 8 // a.amp, 15) * 16
               + LEAST(c.amp * 8 // b.amp, 15)) AS h
           FROM tdcf a
           JOIN tdcf b ON a.g = b.g AND b.i = a.i + 1
           JOIN tdcf c ON a.g = c.g AND c.i = a.i + 2),
         tdarr AS (SELECT DISTINCT d.doc_id, t2.h
           FROM tdbase d JOIN tdtr t2 ON d.g = t2.g
           WHERE d.r <> 2 OR t2.i >= 1),
         tdref AS (SELECT DISTINCT g AS takedown_id, h FROM tdtr
           WHERE g % 9 = 0)
         SELECT a.doc_id, rf.takedown_id,
             CAST(COUNT(*) AS BIGINT) AS n_shared
         FROM tdarr a JOIN tdref rf ON a.h = rf.h
         GROUP BY 1, 2
         HAVING COUNT(*) >= (SELECT tstar FROM lmop)
         ORDER BY a.doc_id, rf.takedown_id""")
}
