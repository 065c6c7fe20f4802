package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expressions.LongDot
import graft.functions.{QuantizedCentroid, TextFns, TopK}
import graft.ops.{Audio, Video, Bfs, Blooms, Bpe, Cardinality, CharLm, Classifier, Cogrouped, Contamination, Dedup, DedupClusters, DenseId, Drift, Dsir, FreqSketch, FuzzyJoin, GapFill, JoinEstimate, KCenter, KCore, KMeans, Mixing, ModelStore, Multimodal, NearDup, Nested, Packing, PageRank, ParagraphDedup, Paths, Percentiles, PhraseExcise, ProductQuant, Salting, Sampling, Scd, Selection, Sessionize, Sharding, SetSimJoin, Similarity, Skyline, Snm, SpanDedup, TableDiff, TCloseness, Triangles, Winnowing}
import graft.streaming.{BudgetAdmission, EventStream, IncrementalClusters, NearDupIndex, RateMonitor, SemanticDedupScreen, StatefulSessions, VersionedStore}

/** Oracle SQL entries, slice 1 of 3 (split from TrainQueries;
  * every `SparkEntry.queries` key resolves to exactly one entry
  * across the three slices — `SurveyRegistrySpec` enforces the
  * pairing). Shared CTE fragments come from [[TrainQueries]].
  */
private[graft] object TrainOracles1 {
  import TrainQueries._
  import TrainQueriesCore._
  import TrainQueriesCuration._
  import TrainQueriesMedia._

  val entries: Map[String, String] = Map(
    "q21_text_stats" ->
      """WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS toks
                    FROM documents)
         SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(length(text) AS BIGINT) AS n_chars_calc,
           (CAST(length(text) AS DOUBLE)
              - (CAST(len(toks) AS DOUBLE) - 1.0))
             / CAST(len(toks) AS DOUBLE) AS avg_token_len,
           CAST(len(list_filter(toks,
                 w -> w IN ('the','a','of','and','is'))) AS DOUBLE)
             / CAST(len(toks) AS DOUBLE) AS stop_ratio,
           CAST(len(regexp_extract_all(text, '[a-z]{4,}')) AS BIGINT)
             AS n_long_tokens,
           0.5 * least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0)
             + 0.3 * (1.0 - CAST(len(list_filter(toks,
                   w -> w IN ('the','a','of','and','is'))) AS DOUBLE)
                 / CAST(len(toks) AS DOUBLE))
             + 0.2 * least(((CAST(length(text) AS DOUBLE)
                   - (CAST(len(toks) AS DOUBLE) - 1.0))
                 / CAST(len(toks) AS DOUBLE)) / 8.0, 1.0) AS quality
         FROM d ORDER BY doc_id""",
    "q22_lang_id" ->
      """WITH d AS (SELECT doc_id, lang, string_split(text, ' ') AS toks
                    FROM documents),
         sc AS (SELECT doc_id, lang,
             len(list_filter(toks, w -> w IN ('der','die','das','und','ist'))) AS s_de,
             len(list_filter(toks, w -> w IN ('the','a','of','and','is'))) AS s_en,
             len(list_filter(toks, w -> w IN ('el','los','las','y','es'))) AS s_es,
             len(list_filter(toks, w -> w IN ('le','la','les','et','est'))) AS s_fr,
             len(list_filter(toks, w -> w IN ('的','是','了','在','和'))) AS s_zh
           FROM d)
         SELECT doc_id, lang,
           CASE WHEN greatest(s_de, s_en, s_es, s_fr, s_zh) <= 0 THEN 'und'
                WHEN s_de = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'de'
                WHEN s_en = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'en'
                WHEN s_es = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'es'
                WHEN s_fr = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'fr'
                WHEN s_zh = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'zh'
                ELSE 'und' END AS predicted
         FROM sc ORDER BY doc_id""",
    "q23_fingerprint" ->
      """SELECT doc_id,
           md5(regexp_replace(lower(trim(nfc_normalize(text))), '\s+', ' ', 'g'))
             AS fingerprint,
           list_min(list_transform(
             list_distinct(list_transform(
               range(1, greatest(length(text) - 7, 1) + 1),
               i -> substr(text, i, 8))),
             sh -> md5(sh))) AS min_shingle
         FROM documents ORDER BY doc_id""",
    "q24_dedup_exact" ->
      """SELECT md5(regexp_replace(lower(trim(nfc_normalize(text))), '\s+', ' ', 'g'))
                  AS fingerprint,
                COUNT(*) AS n_docs, MIN(doc_id) AS rep_doc
         FROM documents GROUP BY 1 ORDER BY fingerprint""",
    "q25_minhash_lsh" -> minhashLshOracle,
    "q26_simhash" ->
      s"""WITH $simhashCte
         SELECT doc_id, simhash FROM sig ORDER BY doc_id""",
    "q27_simhash_knn" ->
      s"""WITH $simhashCte,
         ch AS (SELECT doc_id, list_transform(range(0, 4),
             b -> CAST('0x' || substr(simhash, b * 8 + 1, 8) AS BIGINT))
               AS chunks
           FROM sig),
         blk AS (SELECT doc_id, b AS block_idx, substr(simhash, b * 4 + 1, 4)
               AS block
           FROM sig, (SELECT unnest(range(0, 8)) AS b)),
         cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
           FROM blk a JOIN blk b
             ON a.block_idx = b.block_idx AND a.block = b.block
            AND a.doc_id <> b.doc_id),
         ham AS (SELECT id_a, id_b,
             CAST(bit_count(xor(x.chunks[1], y.chunks[1]))
                + bit_count(xor(x.chunks[2], y.chunks[2]))
                + bit_count(xor(x.chunks[3], y.chunks[3]))
                + bit_count(xor(x.chunks[4], y.chunks[4])) AS BIGINT)
               AS hamming
           FROM cand JOIN ch x ON cand.id_a = x.doc_id
                     JOIN ch y ON cand.id_b = y.doc_id),
         rk AS (SELECT id_a, id_b, hamming, row_number() OVER
             (PARTITION BY id_a ORDER BY hamming ASC, id_b ASC) AS rn
           FROM ham WHERE hamming <= 7)
         SELECT id_a, id_b, hamming FROM rk WHERE rn = 1 ORDER BY id_a""",
    "q28_cosine_topk" ->
      s"""WITH $quantCte,
         d AS (SELECT a.vec_id AS query_id, b.vec_id AS id_b,
             SUM(a.x * b.x) AS dot
           FROM q a JOIN q b ON a.i = b.i
           WHERE a.vec_id < 100 AND a.vec_id <> b.vec_id
           GROUP BY 1, 2),
         sm AS (SELECT query_id, id_b,
             CAST(dot AS DOUBLE) / (sqrt(CAST(na.nn AS DOUBLE))
               * sqrt(CAST(nb.nn AS DOUBLE))) AS sim
           FROM d JOIN nrm na ON d.query_id = na.vec_id
                  JOIN nrm nb ON d.id_b = nb.vec_id),
         rk AS (SELECT query_id, id_b, sim, row_number() OVER
             (PARTITION BY query_id ORDER BY sim DESC, id_b ASC) AS rank
           FROM sm)
         SELECT query_id, CAST(rank AS BIGINT) AS rank,
                id_b AS neighbor_id, sim
         FROM rk WHERE rank <= 5 ORDER BY query_id, rank""",
    "q29_cosine_lsh" ->
      s"""WITH $quantCte,
         w AS (SELECT h, i, CAST(strpos('0123456789abcdef',
               substr(md5(CAST(h AS VARCHAR) || ',' ||
                 CAST(i - 1 AS VARCHAR)), 1, 1)) - 1 AS DOUBLE) - 7.5 AS w
           FROM (SELECT unnest(range(1, 5)) AS h),
                (SELECT unnest(range(1, 65)) AS i)),
         proj AS (SELECT q.vec_id, w.h, SUM(w.w * CAST(q.x AS DOUBLE)) AS p
           FROM q JOIN w ON q.i = w.i GROUP BY 1, 2),
         bkt AS (SELECT vec_id, CAST(SUM(CASE WHEN p > 0
               THEN 1 << (4 - h) ELSE 0 END) AS BIGINT) AS bucket
           FROM proj GROUP BY 1),
         d AS (SELECT a.vec_id AS query_id, b.vec_id AS id_b,
             ba.bucket AS bucket, SUM(a.x * b.x) AS dot
           FROM q a JOIN bkt ba ON a.vec_id = ba.vec_id
                JOIN bkt bb ON ba.bucket = bb.bucket
                JOIN q b ON b.vec_id = bb.vec_id AND a.i = b.i
           WHERE a.vec_id <> b.vec_id
           GROUP BY 1, 2, 3),
         sm AS (SELECT query_id, id_b, bucket,
             CAST(dot AS DOUBLE) / (sqrt(CAST(na.nn AS DOUBLE))
               * sqrt(CAST(nb.nn AS DOUBLE))) AS sim
           FROM d JOIN nrm na ON d.query_id = na.vec_id
                  JOIN nrm nb ON d.id_b = nb.vec_id),
         rk AS (SELECT query_id, id_b, bucket, sim, row_number() OVER
             (PARTITION BY query_id ORDER BY sim DESC, id_b ASC) AS rank
           FROM sm)
         SELECT query_id, CAST(rank AS BIGINT) AS rank,
                id_b AS neighbor_id, sim, bucket
         FROM rk WHERE rank <= 3 ORDER BY query_id, rank""",
    "q30_multimodal" ->
      """WITH h AS (SELECT doc_id, COALESCE(text, '') AS text,
             hex(encode(COALESCE(text, ''))) AS hx
           FROM documents),
         hs AS (SELECT doc_id, CAST(COALESCE(SUM(
               CAST('0x' || substr(hx, CAST(b * 2 + 1 AS BIGINT), 2)
                 AS BIGINT)), 0) AS BIGINT) AS head_sum
           FROM h, (SELECT unnest(range(0, 16)) AS b)
           WHERE b * 2 + 1 <= length(hx) GROUP BY h.doc_id)
         SELECT h.doc_id,
                CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                COALESCE(hs.head_sum, 0) AS head_sum, md5(text) AS checksum
         FROM h LEFT JOIN hs ON h.doc_id = hs.doc_id ORDER BY h.doc_id""",
    "q31_stream_window" -> streamWindowOracle,
    "q58_stream_sink" -> streamWindowOracle,
    "q32_sessionize" ->
      """WITH e AS (SELECT user_id, event_id,
             epoch_us(CAST(ts AS TIMESTAMP)) // 1000 AS ms FROM events),
         g AS (SELECT user_id, event_id, ms,
             CASE WHEN lag(ms) OVER w IS NULL
                    OR ms - lag(ms) OVER w > 1800000
                  THEN 1 ELSE 0 END AS ns
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
         s AS (SELECT user_id, ms, CAST(SUM(ns) OVER
             (PARTITION BY user_id ORDER BY ms, event_id
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
           FROM g)
         SELECT user_id, session_idx, COUNT(*) AS n_events,
                MIN(ms) AS session_start_ms, MAX(ms) AS session_end_ms
         FROM s GROUP BY 1, 2 ORDER BY user_id, session_idx""",
    "q36_embed_centroids" ->
      """WITH q AS (SELECT e.vec_id, e.label, i,
             CAST(floor(CAST(embedding[i] AS DOUBLE) * 10000.0 + 0.5)
                  AS BIGINT) AS x
           FROM embeddings e, (SELECT unnest(range(1, 65)) AS i))
         SELECT CAST(label AS BIGINT) AS label, CAST(i - 1 AS BIGINT) AS dim,
                CAST(SUM(x) AS BIGINT) AS sum_q, COUNT(*) AS n,
                CAST(SUM(x) AS DOUBLE) / (COUNT(*) * 10000.0) AS centroid
         FROM q GROUP BY 1, 2 ORDER BY label, dim""",
    "q37_ivf_topk" ->
      """WITH q AS (SELECT e.vec_id, e.label, i,
             CAST(floor(CAST(embedding[i] AS DOUBLE) * 10000.0 + 0.5)
                  AS BIGINT) AS x
           FROM embeddings e, (SELECT unnest(range(1, 65)) AS i)),
         nrm AS (SELECT vec_id, SUM(x * x) AS nn FROM q GROUP BY 1
                 HAVING SUM(x * x) > 0),
         cells AS (SELECT CAST(label AS BIGINT) AS cell_label, i,
             CAST(SUM(x) AS BIGINT) AS s
           FROM q GROUP BY 1, 2),
         cellnorm AS (SELECT cell_label, SUM(s * s) AS cn
           FROM cells GROUP BY 1),
         coarse AS (SELECT a.vec_id AS query_id, c.cell_label,
             SUM(a.x * c.s) AS dot
           FROM q a JOIN cells c ON a.i = c.i
           WHERE a.vec_id < 50 GROUP BY 1, 2),
         csim AS (SELECT query_id, coarse.cell_label,
             CAST(dot AS DOUBLE) / (sqrt(CAST(n1.nn AS DOUBLE))
               * sqrt(CAST(cn.cn AS DOUBLE))) AS coarse_sim
           FROM coarse JOIN nrm n1 ON coarse.query_id = n1.vec_id
                JOIN cellnorm cn ON coarse.cell_label = cn.cell_label),
         best AS (SELECT query_id, cell_label FROM
             (SELECT query_id, cell_label, row_number() OVER
               (PARTITION BY query_id
                ORDER BY coarse_sim DESC, cell_label ASC) AS rn
              FROM csim) WHERE rn = 1),
         fine AS (SELECT b.query_id, e.vec_id AS neighbor_id,
             b.cell_label, SUM(a.x * bb.x) AS dot
           FROM best b JOIN embeddings e
             ON CAST(e.label AS BIGINT) = b.cell_label
           JOIN q a ON a.vec_id = b.query_id
           JOIN q bb ON bb.vec_id = e.vec_id AND bb.i = a.i
           WHERE e.vec_id <> b.query_id GROUP BY 1, 2, 3),
         fsim AS (SELECT query_id, neighbor_id, cell_label,
             CAST(dot AS DOUBLE) / (sqrt(CAST(na.nn AS DOUBLE))
               * sqrt(CAST(nb.nn AS DOUBLE))) AS sim
           FROM fine JOIN nrm na ON fine.query_id = na.vec_id
                JOIN nrm nb ON fine.neighbor_id = nb.vec_id),
         rk AS (SELECT query_id, neighbor_id, cell_label, sim,
             row_number() OVER (PARTITION BY query_id
               ORDER BY sim DESC, neighbor_id ASC) AS rank
           FROM fsim)
         SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, sim,
                cell_label
         FROM rk WHERE rank <= 3 ORDER BY query_id, rank""",
    "q38_rollup" ->
      """SELECT COALESCE(r_name, 'ALL') AS region,
                COALESCE(n_name, 'ALL') AS nation,
                CAST(GROUPING(r_name, n_name) AS BIGINT) AS gid,
                COUNT(*) AS n_items,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                  * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
                  AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY ROLLUP (r_name, n_name)
         ORDER BY gid, region, nation""",
    "q39_frame_sample" ->
      """WITH h AS (SELECT doc_id, hex(encode(text)) AS hx,
             octet_length(encode(text)) AS nb
           FROM documents),
         f AS (SELECT doc_id, hx, nb,
             unnest(range(0, CAST(ceil(nb / 64.0) AS BIGINT))) AS frame_idx
           FROM h),
         b AS (SELECT doc_id, frame_idx,
             CAST('0x' || substr(hx,
               CAST((frame_idx * 64 + j) * 2 + 1 AS BIGINT), 2) AS BIGINT)
               AS byte_val
           FROM f, (SELECT unnest(range(0, 64)) AS j)
           WHERE frame_idx * 64 + j < nb)
         SELECT doc_id, frame_idx, COUNT(*) AS frame_len,
                CAST(SUM(byte_val) AS BIGINT) AS frame_sum
         FROM b GROUP BY 1, 2 ORDER BY doc_id, frame_idx""",
    "q40_json_roundtrip" ->
      """SELECT event_type, COUNT(*) AS n_events,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                  AS total_value
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q41_bucketed_join" ->
      """SELECT o_custkey, COUNT(*) AS n_items,
                CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                  AS sum_qty
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_custkey ORDER BY o_custkey""",
    "q42_pivot" ->
      """SELECT user_id,
                COUNT(*) FILTER (WHERE event_type = 'click') AS click,
                COUNT(*) FILTER (WHERE event_type = 'error') AS error,
                COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
                COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
                COUNT(*) FILTER (WHERE event_type = 'view') AS view
         FROM events GROUP BY user_id ORDER BY user_id""",
    "q43_stats_moments" ->
      """WITH a AS (SELECT l_returnflag, COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))
               * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS s2
           FROM lineitem GROUP BY 1)
         SELECT l_returnflag, n, s1 / n AS mean,
                (CAST(n AS DOUBLE) * s2 - s1 * s1)
                  / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))
                  AS var_samp,
                sqrt((CAST(n AS DOUBLE) * s2 - s1 * s1)
                  / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
                  AS stddev_samp
         FROM a ORDER BY l_returnflag""",
    "q44_histogram" ->
      """SELECT CAST(floor(l_extendedprice / 5000.0) AS BIGINT) AS bin,
                CAST(floor(l_extendedprice / 5000.0) AS BIGINT) * 5000.0
                  AS bin_lo,
                COUNT(*) AS n_rows
         FROM lineitem GROUP BY 1, 2 ORDER BY bin""",
    "q45_curation_pipeline" ->
      """WITH d AS (SELECT doc_id, source, text,
             string_split(text, ' ') AS toks FROM documents),
         scored AS (SELECT doc_id, source,
             0.5 * least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0)
               + 0.3 * (1.0 - CAST(len(list_filter(toks,
                     w -> w IN ('the','a','of','and','is'))) AS DOUBLE)
                   / CAST(len(toks) AS DOUBLE))
               + 0.2 * least(((CAST(length(text) AS DOUBLE)
                     - (CAST(len(toks) AS DOUBLE) - 1.0))
                   / CAST(len(toks) AS DOUBLE)) / 8.0, 1.0) AS quality,
             CASE WHEN greatest(
                 len(list_filter(toks, w -> w IN ('der','die','das','und','ist'))),
                 len(list_filter(toks, w -> w IN ('the','a','of','and','is'))),
                 len(list_filter(toks, w -> w IN ('el','los','las','y','es'))),
                 len(list_filter(toks, w -> w IN ('le','la','les','et','est'))),
                 len(list_filter(toks, w -> w IN ('的','是','了','在','和')))) <= 0
               THEN 'und'
               WHEN len(list_filter(toks, w -> w IN ('der','die','das','und','ist'))) = greatest(
                 len(list_filter(toks, w -> w IN ('der','die','das','und','ist'))),
                 len(list_filter(toks, w -> w IN ('the','a','of','and','is'))),
                 len(list_filter(toks, w -> w IN ('el','los','las','y','es'))),
                 len(list_filter(toks, w -> w IN ('le','la','les','et','est'))),
                 len(list_filter(toks, w -> w IN ('的','是','了','在','和')))) THEN 'de'
               WHEN len(list_filter(toks, w -> w IN ('the','a','of','and','is'))) = greatest(
                 len(list_filter(toks, w -> w IN ('der','die','das','und','ist'))),
                 len(list_filter(toks, w -> w IN ('the','a','of','and','is'))),
                 len(list_filter(toks, w -> w IN ('el','los','las','y','es'))),
                 len(list_filter(toks, w -> w IN ('le','la','les','et','est'))),
                 len(list_filter(toks, w -> w IN ('的','是','了','在','和')))) THEN 'en'
               ELSE 'other' END AS predicted,
             md5(regexp_replace(lower(trim(nfc_normalize(text))), '\s+', ' ', 'g'))
               AS fingerprint
           FROM d),
         kept AS (SELECT * FROM scored
           WHERE quality >= 0.6 AND predicted = 'en'),
         uniq AS (SELECT * FROM (SELECT *, row_number() OVER
               (PARTITION BY fingerprint ORDER BY doc_id ASC) AS rn
             FROM kept) WHERE rn = 1)
         SELECT s.source, COUNT(*) AS n_docs,
                COALESCE(k.n_kept, 0) AS n_kept,
                COALESCE(u.n_unique, 0) AS n_unique
         FROM scored s
         LEFT JOIN (SELECT source, COUNT(*) AS n_kept FROM kept
                    GROUP BY 1) k ON s.source = k.source
         LEFT JOIN (SELECT source, COUNT(*) AS n_unique FROM uniq
                    GROUP BY 1) u ON s.source = u.source
         GROUP BY s.source, k.n_kept, u.n_unique ORDER BY s.source""",
    "q46_hash_split" ->
      """WITH b AS (SELECT doc_id,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
               AS BIGINT) % 100 AS bucket
           FROM documents)
         SELECT CASE WHEN bucket < 80 THEN 'train'
                     WHEN bucket < 90 THEN 'val'
                     ELSE 'test' END AS split,
                COUNT(*) AS n_docs, MIN(doc_id) AS min_doc,
                MAX(doc_id) AS max_doc
         FROM b GROUP BY 1 ORDER BY split""",
    "q47_percentiles" ->
      """SELECT l_returnflag,
                quantile_cont(l_quantity, 0.25) AS p25,
                quantile_cont(l_quantity, 0.5) AS p50,
                quantile_cont(l_quantity, 0.75) AS p75
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q48_date_dim" ->
      """SELECT strftime(d, '%Y-%m-%d') AS date_str,
                CAST(year(d) AS BIGINT) AS year,
                CAST(quarter(d) AS BIGINT) AS quarter,
                CAST(month(d) AS BIGINT) AS month,
                CAST(day(d) AS BIGINT) AS day,
                CAST(weekofyear(d) AS BIGINT) AS week,
                CAST(dayofweek(d) + 1 AS BIGINT) AS weekday,
                CAST(CASE WHEN dayofweek(d) IN (0, 6) THEN 1 ELSE 0 END
                  AS BIGINT) AS is_weekend
         FROM generate_series(DATE '2024-01-01', DATE '2024-12-31',
                              INTERVAL 1 DAY) t(d)
         ORDER BY date_str""",
    "q49_asof_join" -> asofOracle,
    "q95_cogroup_asof" -> asofOracle,
    "q50_stream_dedup" ->
      """SELECT DISTINCT user_id, event_type FROM events
         ORDER BY user_id, event_type""",
    "q33_cosine_neardup" ->
      s"""WITH $quantCte,
         w AS (SELECT h, i, CAST(strpos('0123456789abcdef',
               substr(md5(CAST(h AS VARCHAR) || ',' ||
                 CAST(i - 1 AS VARCHAR)), 1, 1)) - 1 AS DOUBLE) - 7.5 AS w
           FROM (SELECT unnest(range(1, 5)) AS h),
                (SELECT unnest(range(1, 65)) AS i)),
         proj AS (SELECT q.vec_id, w.h, SUM(w.w * CAST(q.x AS DOUBLE)) AS p
           FROM q JOIN w ON q.i = w.i GROUP BY 1, 2),
         bkt AS (SELECT vec_id, CAST(SUM(CASE WHEN p > 0
               THEN 1 << (4 - h) ELSE 0 END) AS BIGINT) AS bucket
           FROM proj GROUP BY 1),
         d AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             ba.bucket AS bucket, SUM(a.x * b.x) AS dot
           FROM q a JOIN bkt ba ON a.vec_id = ba.vec_id
                JOIN bkt bb ON ba.bucket = bb.bucket
                JOIN q b ON b.vec_id = bb.vec_id AND a.i = b.i
           WHERE a.vec_id < b.vec_id
           GROUP BY 1, 2, 3),
         sm AS (SELECT id_a, id_b, bucket,
             CAST(dot AS DOUBLE) / (sqrt(CAST(na.nn AS DOUBLE))
               * sqrt(CAST(nb.nn AS DOUBLE))) AS sim
           FROM d JOIN nrm na ON d.id_a = na.vec_id
                  JOIN nrm nb ON d.id_b = nb.vec_id)
         SELECT id_a, id_b, sim, bucket FROM sm
         WHERE sim >= 0.3 ORDER BY id_a, id_b""",
    "q51_ann_recall" -> annRecallOracle,
    "q56_lsh_multiprobe_recall" -> lshMultiProbeOracle,
    "q59_ivf_multiprobe_recall" -> ivfMultiProbeOracle,
    "q61_resize" ->
      """WITH r AS (SELECT doc_id, COALESCE(text, '') AS text,
             array_to_string(list_transform(range(1, length(text) + 1, 4),
               i -> substring(text, i, 1)), '') AS red
           FROM documents)
         SELECT doc_id, CAST(length(text) AS BIGINT) AS orig_bytes,
             CAST(length(red) AS BIGINT) AS resized_bytes,
             CAST(COALESCE(list_sum(list_transform(range(1, length(red) + 1),
               i -> ascii(substring(red, i, 1)))), 0) AS BIGINT)
               AS resized_sum,
             md5(red) AS resized_checksum
         FROM r ORDER BY doc_id""",
    "q60_range_shard" ->
      """WITH b AS (SELECT lang,
             quantile_cont(CAST(n_chars AS DOUBLE), 0.25) AS b1,
             quantile_cont(CAST(n_chars AS DOUBLE), 0.5) AS b2,
             quantile_cont(CAST(n_chars AS DOUBLE), 0.75) AS b3
           FROM documents GROUP BY lang),
         a AS (SELECT d.lang,
             CASE WHEN CAST(n_chars AS DOUBLE) <= b1 THEN 0
                  WHEN CAST(n_chars AS DOUBLE) <= b2 THEN 1
                  WHEN CAST(n_chars AS DOUBLE) <= b3 THEN 2
                  ELSE 3 END AS shard,
             n_chars
           FROM documents d JOIN b ON d.lang = b.lang)
         SELECT lang, CAST(shard AS INT) AS shard,
             COUNT(*) AS n_docs,
             CAST(MIN(n_chars) AS BIGINT) AS min_chars,
             CAST(MAX(n_chars) AS BIGINT) AS max_chars
         FROM a GROUP BY 1, 2 ORDER BY lang, shard""",
    "q57_stream_stream_join" -> intervalJoinOracle,
    "q70_interval_join" -> intervalJoinOracle,
    "q52_pii_scrub" ->
      """SELECT c_custkey, md5(c_name) AS name_hash,
             regexp_replace(c_name, '[0-9]', '#', 'g') AS masked_name,
             CAST(length(c_name) - length(regexp_replace(c_name, '[0-9]',
               '', 'g')) AS BIGINT) AS n_digits
         FROM customer ORDER BY c_custkey""",
    "q53_contamination" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
                       FROM documents),
         g AS (SELECT doc_id, list_distinct(list_transform(
                 range(1, greatest(len(t) - 3, 1) + 1),
                 i -> array_to_string(t[i:i+3], ' '))) AS grams
               FROM toks),
         x AS (SELECT doc_id, unnest(grams) AS gram FROM g)
         SELECT a.doc_id AS corpus_id, b.doc_id AS eval_id,
                CAST(count(*) AS BIGINT) AS n_shared
         FROM x a JOIN x b ON a.gram = b.gram
         WHERE a.doc_id % 50 <> 0 AND b.doc_id % 50 = 0
         GROUP BY 1, 2 ORDER BY corpus_id, eval_id""",
    "q54_stratified_sample" ->
      """WITH smp AS (SELECT lang FROM documents
             WHERE CAST('0x' || substr(md5('smp|' ||
                 CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 10000
               < CASE lang WHEN 'en' THEN 5000 WHEN 'zh' THEN 2500
                 ELSE 1000 END),
         tot AS (SELECT lang, count(*) AS n_total FROM documents GROUP BY 1),
         ns AS (SELECT lang, count(*) AS n_sampled FROM smp GROUP BY 1)
         SELECT tot.lang, n_total, COALESCE(n_sampled, 0) AS n_sampled
         FROM tot LEFT JOIN ns ON tot.lang = ns.lang ORDER BY tot.lang""",
    "q55_repetition_filter" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS t
                    FROM documents),
         s AS (SELECT doc_id, t,
             list_transform(range(1, len(t)),
               i -> t[i] || ' ' || t[i + 1]) AS bg
           FROM d)
         SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tok,
             1.0 - CAST(len(list_distinct(t)) AS DOUBLE)
                 / CAST(len(t) AS DOUBLE) AS dup_ratio,
             CAST(list_max(list_transform(list_distinct(bg),
                 x -> len(list_filter(bg, b -> b = x)))) AS DOUBLE)
               / CAST(len(bg) AS DOUBLE) AS top_bigram_share,
             (1.0 - CAST(len(list_distinct(t)) AS DOUBLE)
                  / CAST(len(t) AS DOUBLE)) < 0.6
               AND (CAST(list_max(list_transform(list_distinct(bg),
                     x -> len(list_filter(bg, b -> b = x)))) AS DOUBLE)
                   / CAST(len(bg) AS DOUBLE)) < 0.2 AS keep
         FROM s ORDER BY doc_id""",
    "q34_salted_join" ->
      """WITH d AS (SELECT user_id,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS user_total
           FROM events GROUP BY 1)
         SELECT e.user_id, COUNT(*) AS n_events, MIN(d.user_total) AS user_total
         FROM events e JOIN d USING (user_id)
         GROUP BY 1 ORDER BY e.user_id""",
    "q35_stream_sessionize" ->
      """WITH e AS (SELECT user_id, event_id,
             epoch_us(CAST(ts AS TIMESTAMP)) // 1000 AS ms FROM events),
         g AS (SELECT user_id, event_id, ms,
             CASE WHEN lag(ms) OVER w IS NULL
                    OR ms - lag(ms) OVER w > 1800000
                  THEN 1 ELSE 0 END AS ns
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
         s AS (SELECT user_id, ms, CAST(SUM(ns) OVER
             (PARTITION BY user_id ORDER BY ms, event_id
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
           FROM g)
         SELECT user_id, session_idx, COUNT(*) AS n_events,
                MIN(ms) AS session_start_ms, MAX(ms) AS session_end_ms
         FROM s GROUP BY 1, 2 ORDER BY user_id, session_idx""",
    "q62_csv_roundtrip" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_price
         FROM orders GROUP BY 1 ORDER BY 1""",
    "q63_orc_roundtrip" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
               AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
               AS sum_price
         FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""",
    "q64_ngram_jaccard" ->
      s"""WITH $ngramIdxCte
         SELECT id_a, id_b, CAST(n_shared AS BIGINT) AS n_shared,
             CAST(n_shared AS DOUBLE)
               / CAST(x.n + y.n - n_shared AS DOUBLE) AS jaccard
         FROM p JOIN na x ON p.id_a = x.doc_id
                JOIN na y ON p.id_b = y.doc_id
         WHERE CAST(n_shared AS DOUBLE)
               / CAST(x.n + y.n - n_shared AS DOUBLE) >= 0.5
         ORDER BY id_a, id_b""",
    "q71_dedup_clusters" ->
      s"""WITH RECURSIVE $dedupClusterCtes
         SELECT lab.node AS doc_id, lab.cluster_rep, sz.n_members
         FROM lab JOIN sz USING (cluster_rep) ORDER BY doc_id""",
    // q128 shares q71's full-recompute oracle: the incremental path
    // must be bit-identical to CC over history ∪ batch (the q57/q70
    // shared-oracle pattern applied to the component family)
    "q128_incr_clusters" ->
      s"""WITH RECURSIVE $dedupClusterCtes
         SELECT lab.node AS doc_id, lab.cluster_rep, sz.n_members
         FROM lab JOIN sz USING (cluster_rep) ORDER BY doc_id""",
    // q130 shares the same full-recompute closure: the STREAMING fold
    // (micro-batched arrivals through the versioned label store) must
    // land bit-identical to one CC over all edges
    "q130_stream_incr_clusters" ->
      s"""WITH RECURSIVE $dedupClusterCtes
         SELECT lab.node AS doc_id, lab.cluster_rep, sz.n_members
         FROM lab JOIN sz USING (cluster_rep) ORDER BY doc_id""",
    // q131: the all-pairs statement of the streamed-index semantics —
    // dup_of(d) = least earlier doc sharing a band with signature-
    // estimated Jaccard ≥ 0.5 (same minhash CTE chain as q25/q99)
    "q131_stream_neardup_index" ->
      s"""$minhashCtes,
         cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
           FROM bands a JOIN bands b
             ON a.b = b.b AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
         est AS (SELECT id_a, id_b,
             CAST(len(list_filter(
                 list_zip(sa.sg, sb.sg), p -> p[1] = p[2])) AS DOUBLE)
               / 32.0 AS est_jaccard
           FROM cand JOIN sig sa ON cand.id_a = sa.doc_id
                     JOIN sig sb ON cand.id_b = sb.doc_id)
         SELECT id_b AS doc_id, CAST(MIN(id_a) AS BIGINT) AS dup_of
         FROM est WHERE est_jaccard >= 0.5
         GROUP BY id_b ORDER BY doc_id""",
    // q132: the q46 bucket formula keyed by the recursive near-dup
    // closure's cluster rep (singletons key by their own id)
    "q132_group_split" ->
      s"""WITH RECURSIVE $dedupClusterCtes,
         grp AS (SELECT d.doc_id,
             COALESCE(lab.cluster_rep, d.doc_id) AS group_key
           FROM documents d LEFT JOIN lab ON d.doc_id = lab.node),
         bk AS (SELECT doc_id, group_key,
             CAST('0x' || substr(md5(CAST(group_key AS VARCHAR)), 1, 8)
               AS BIGINT) % 100 AS bucket
           FROM grp)
         SELECT doc_id, group_key,
           CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split
         FROM bk ORDER BY doc_id""",
    // q133: exact triangle enumeration as three self-joins over the
    // a<b near-dup edge list — each triangle (a<b<c) found once as
    // e(a,b), e(b,c), e(a,c); every corner credited
    "q133_triangles" ->
      s"""WITH $ngramIdxCte,
         pairs AS (SELECT id_a, id_b
               FROM p JOIN na x ON p.id_a = x.doc_id
                      JOIN na y ON p.id_b = y.doc_id
               WHERE CAST(n_shared AS DOUBLE)
                     / CAST(x.n + y.n - n_shared AS DOUBLE) >= 0.5),
         deg AS (SELECT node, COUNT(*) AS degree FROM
               (SELECT id_a AS node FROM pairs
                UNION ALL SELECT id_b FROM pairs) u
             GROUP BY node),
         tri AS (SELECT e1.id_a AS u, e1.id_b AS v, e2.id_b AS w
             FROM pairs e1 JOIN pairs e2 ON e2.id_a = e1.id_b
                  JOIN pairs e3 ON e3.id_a = e1.id_a
                               AND e3.id_b = e2.id_b),
         tc AS (SELECT node, COUNT(*) AS triangles FROM
               (SELECT u AS node FROM tri
                UNION ALL SELECT v FROM tri
                UNION ALL SELECT w FROM tri) x
             GROUP BY node)
         SELECT d.node, CAST(d.degree AS BIGINT) AS degree,
           CAST(COALESCE(t.triangles, 0) AS BIGINT) AS triangles,
           CASE WHEN d.degree >= 2
                THEN 2.0 * COALESCE(t.triangles, 0)
                     / (d.degree * (d.degree - 1.0))
                ELSE 0.0 END AS clustering_coeff
         FROM deg d LEFT JOIN tc t ON d.node = t.node
         ORDER BY d.node""",
    // q134: the UNCAPPED full inverted-index join — the exact
    // semantics the prefix-filtered Spark plan must reproduce with
    // zero false negatives (q64's CTE minus the df cap)
    "q134_setsim_join" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
                     FROM documents),
         g AS (SELECT doc_id, unnest(list_distinct(list_transform(
                 range(1, greatest(len(t) - 2, 1) + 1),
                 i -> array_to_string(t[i:i+2], ' ')))) AS gram
               FROM toks),
         na AS (SELECT doc_id, count(*) AS n FROM g GROUP BY 1),
         p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 count(*) AS n_shared
               FROM g a JOIN g b
                 ON a.gram = b.gram AND a.doc_id < b.doc_id
               GROUP BY 1, 2)
         SELECT id_a, id_b, CAST(n_shared AS BIGINT) AS n_shared,
             CAST(n_shared AS DOUBLE)
               / CAST(x.n + y.n - n_shared AS DOUBLE) AS jaccard
         FROM p JOIN na x ON p.id_a = x.doc_id
                JOIN na y ON p.id_b = y.doc_id
         WHERE CAST(n_shared AS DOUBLE)
               / CAST(x.n + y.n - n_shared AS DOUBLE) >= 0.5
         ORDER BY id_a, id_b""",
    // q135: the closure over exactly the first two ntile(3) chunks of
    // the (id_a, id_b)-ordered edge stream — what label version 1
    // must equal if every stored version is the true prefix state
    "q135_state_time_travel" ->
      s"""WITH RECURSIVE $ngramIdxCte,
         allp AS (SELECT id_a, id_b
               FROM p JOIN na x ON p.id_a = x.doc_id
                      JOIN na y ON p.id_b = y.doc_id
               WHERE CAST(n_shared AS DOUBLE)
                     / CAST(x.n + y.n - n_shared AS DOUBLE) >= 0.5),
         tiled AS (SELECT id_a, id_b,
               ntile(3) OVER (ORDER BY id_a, id_b) AS tile FROM allp),
         pairs AS (SELECT id_a, id_b FROM tiled WHERE tile <= 2),
         sym AS (SELECT id_a AS src, id_b AS dst FROM pairs
                 UNION
                 SELECT id_b, id_a FROM pairs),
         r AS (SELECT src AS node, dst AS peer FROM sym
               UNION
               SELECT r.node, s.dst FROM r JOIN sym s ON r.peer = s.src),
         lab AS (SELECT node, LEAST(node, MIN(peer)) AS cluster_rep
                 FROM r GROUP BY node),
         sz AS (SELECT cluster_rep, COUNT(*) AS n_members
                FROM lab GROUP BY 1)
         SELECT lab.node AS doc_id, lab.cluster_rep, sz.n_members
         FROM lab JOIN sz USING (cluster_rep) ORDER BY doc_id""",
    "q65_top_bigrams" ->
      """WITH d AS (SELECT string_split(text, ' ') AS t FROM documents),
         g AS (SELECT unnest(CASE WHEN len(t) >= 2
                 THEN list_transform(range(1, len(t)),
                   i -> t[i] || ' ' || t[i + 1])
                 ELSE [] END) AS gram
               FROM d)
         SELECT gram, COUNT(*) AS n FROM g
         GROUP BY 1 ORDER BY n DESC, gram ASC LIMIT 20""",
    "q66_event_lag" ->
      """WITH e AS (SELECT user_id, event_id,
             epoch_us(CAST(ts AS TIMESTAMP)) // 1000 AS ts_ms FROM events)
         SELECT user_id, event_id,
             ts_ms - lag(ts_ms) OVER w AS prev_gap_ms,
             lead(event_id) OVER w AS next_event_id,
             CAST(ntile(4) OVER w AS INT) AS qtile
         FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)
         ORDER BY user_id, event_id""",
    "q67_incremental_dedup" ->
      """WITH f AS (SELECT doc_id, md5(text) AS fingerprint FROM documents),
         seen AS (SELECT DISTINCT fingerprint FROM f WHERE doc_id % 10 = 0),
         inc AS (SELECT * FROM f WHERE doc_id % 10 <> 0)
         SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id, fingerprint
         FROM inc
         WHERE NOT EXISTS (SELECT 1 FROM seen
                           WHERE seen.fingerprint = inc.fingerprint)
         GROUP BY fingerprint ORDER BY doc_id""",
    "q68_bpe_tokens" ->
      """SELECT doc_id,
             CAST(len(regexp_extract_all(text,
               '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]+')) AS BIGINT)
               AS n_bpe_tokens,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
             CAST(len(regexp_extract_all(text,
               '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]+')) AS DOUBLE)
               / CAST(len(string_split(text, ' ')) AS DOUBLE) AS bpe_per_ws
         FROM documents ORDER BY doc_id""",
    "q69_schema_merge" ->
      """WITH m AS (SELECT lang, CAST(NULL AS BIGINT) AS n_chars
                    FROM documents
                    UNION ALL
                    SELECT CAST(NULL AS VARCHAR), n_chars FROM documents)
         SELECT lang, COUNT(*) AS n_rows,
             COUNT(n_chars) AS n_with_chars,
             CAST(SUM(n_chars) AS BIGINT) AS sum_chars
         FROM m GROUP BY lang ORDER BY lang NULLS FIRST""",
    "q72_chunking" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS t
                    FROM documents),
         st AS (SELECT doc_id, t, unnest(range(1, len(t) + 1, 24)) AS s
                FROM d),
         c AS (SELECT doc_id, CAST((s - 1) // 24 AS BIGINT) AS chunk_idx,
                 array_to_string(t[s:s+31], ' ') AS chunk
               FROM st)
         SELECT doc_id, chunk_idx,
             CAST(len(string_split(chunk, ' ')) AS BIGINT)
               AS n_chunk_tokens,
             md5(chunk) AS chunk_hash
         FROM c ORDER BY doc_id, chunk_idx""",
    "q73_seq_packing" ->
      """WITH d AS (SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
           FROM documents),
         c AS (SELECT doc_id, n_tokens,
             SUM(n_tokens) OVER (ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING) AS cum
           FROM d),
         b AS (SELECT doc_id, n_tokens,
             CAST((cum - n_tokens) // 2048 AS BIGINT) AS bin_id
           FROM c)
         SELECT bin_id, COUNT(*) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS n_bin_tokens,
             MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
         FROM b GROUP BY 1 ORDER BY 1""",
    "q74_cube" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
             COALESCE(l_linestatus, 'ALL') AS linestatus,
             CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid,
             COUNT(*) AS n_items,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
               AS sum_qty
         FROM lineitem
         GROUP BY CUBE (l_returnflag, l_linestatus)
         ORDER BY gid, returnflag, linestatus""",
    "q75_window_dist" ->
      """WITH e AS (SELECT user_id, event_id,
             epoch_us(CAST(ts AS TIMESTAMP)) // 1000 AS ts_ms FROM events)
         SELECT user_id, event_id,
             percent_rank() OVER w AS pr,
             cume_dist() OVER w AS cd,
             first_value(event_id) OVER (w ROWS BETWEEN UNBOUNDED
               PRECEDING AND UNBOUNDED FOLLOWING) AS first_event,
             last_value(event_id) OVER (w ROWS BETWEEN UNBOUNDED
               PRECEDING AND UNBOUNDED FOLLOWING) AS last_event
         FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)
         ORDER BY user_id, event_id""",
    "q76_int8_quant" ->
      s"""WITH $quantCte,
         am AS (SELECT vec_id, MAX(ABS(x)) AS amax FROM q GROUP BY 1),
         q8 AS (SELECT q.vec_id, q.i, q.x, am.amax,
             CAST(FLOOR(CAST(q.x AS DOUBLE) * 127.0
               / CAST(am.amax AS DOUBLE) + 0.5) AS BIGINT) AS v8
           FROM q JOIN am ON q.vec_id = am.vec_id),
         agg AS (SELECT vec_id, SUM(x * v8) AS dxq, SUM(v8 * v8) AS nq,
             MAX(ABS(CAST(x AS DOUBLE) - CAST(v8 AS DOUBLE)
               * CAST(amax AS DOUBLE) / 127.0)) AS max_err
           FROM q8 GROUP BY 1)
         SELECT agg.vec_id, am.amax AS amax_q,
             CAST(dxq AS DOUBLE) / (sqrt(CAST(nn AS DOUBLE))
               * sqrt(CAST(nq AS DOUBLE))) AS cos_sim,
             max_err
         FROM agg JOIN nrm ON agg.vec_id = nrm.vec_id
              JOIN am ON agg.vec_id = am.vec_id
         ORDER BY agg.vec_id""",
    "q77_upsert" ->
      """SELECT c_custkey,
             CASE WHEN c_custkey % 10 = 0 THEN upper(c_name)
                  ELSE c_name END AS c_name,
             CAST(CASE WHEN c_custkey % 10 = 0 THEN 2 ELSE 1 END
               AS BIGINT) AS version,
             CASE WHEN c_custkey % 10 = 0 THEN 'reprocessed'
                  ELSE NULL END AS update_note
         FROM customer ORDER BY c_custkey""",
    "q78_quality_gate" ->
      """SELECT COUNT(*) AS n_rows,
             CAST(COUNT(*) FILTER (text IS NULL) AS BIGINT) AS n_null_text,
             CAST(COUNT(*) FILTER (n_chars < 10) AS BIGINT) AS n_short,
             CAST(COALESCE(SUM(n_chars), 0) AS BIGINT) AS sum_chars
         FROM documents""",
    "q79_profiler" ->
      """WITH p AS (
           SELECT 'l_quantity' AS column_name,
               CAST(COUNT(l_quantity) AS BIGINT) AS n_nonnull,
               MIN(l_quantity) AS min_v, MAX(l_quantity) AS max_v,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                 AS sum_v
           FROM lineitem
           UNION ALL
           SELECT 'l_extendedprice',
               CAST(COUNT(l_extendedprice) AS BIGINT),
               MIN(l_extendedprice), MAX(l_extendedprice),
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
           FROM lineitem
           UNION ALL
           SELECT 'l_discount', CAST(COUNT(l_discount) AS BIGINT),
               MIN(l_discount), MAX(l_discount),
               CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE)
           FROM lineitem
           UNION ALL
           SELECT 'l_tax', CAST(COUNT(l_tax) AS BIGINT),
               MIN(l_tax), MAX(l_tax),
               CAST(SUM(CAST(l_tax AS DECIMAL(12,2))) AS DOUBLE)
           FROM lineitem)
         SELECT * FROM p ORDER BY column_name""",
    "q80_event_transitions" ->
      """WITH e AS (SELECT user_id, event_type, event_id,
             epoch_us(CAST(ts AS TIMESTAMP)) // 1000 AS ms FROM events),
         s AS (SELECT user_id,
             list(event_type ORDER BY ms, event_id) AS seq
           FROM e GROUP BY 1),
         b AS (SELECT unnest(CASE WHEN len(seq) >= 2
                 THEN list_transform(range(1, len(seq)),
                   i -> seq[i] || ' ' || seq[i + 1])
                 ELSE [] END) AS transition
               FROM s)
         SELECT transition, COUNT(*) AS n FROM b
         GROUP BY 1 ORDER BY n DESC, transition ASC LIMIT 20""",
    "q81_tfidf" ->
      """WITH tf AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                     FROM documents),
         t AS (SELECT doc_id, term, COUNT(*) AS tf FROM tf GROUP BY 1, 2),
         d AS (SELECT term, COUNT(*) AS df FROM t GROUP BY 1),
         sc AS (SELECT t.doc_id, t.term, t.tf, d.df,
             CAST(t.tf AS DOUBLE)
               * (((SELECT CAST(COUNT(*) AS DOUBLE) FROM documents) + 1.0)
                  / (CAST(d.df AS DOUBLE) + 1.0)) AS score
           FROM t JOIN d ON t.term = d.term),
         rk AS (SELECT doc_id, term, tf, df, score,
             CAST(row_number() OVER (PARTITION BY doc_id
               ORDER BY score DESC, term ASC) AS BIGINT) AS rk
           FROM sc)
         SELECT doc_id, rk, term, CAST(tf AS BIGINT) AS tf,
             CAST(df AS BIGINT) AS df, score
         FROM rk WHERE rk <= 3 ORDER BY doc_id, rk""",
    "q82_binary_source" ->
      """SELECT COUNT(*) AS n_files,
             CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
             CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_distinct
         FROM documents""",
    "q83_session_window" ->
      """WITH e AS (SELECT user_id, event_id,
             epoch_us(CAST(ts AS TIMESTAMP)) // 1000 AS ms FROM events),
         g AS (SELECT user_id, ms, event_id,
             CASE WHEN lag(ms) OVER w IS NULL
                    OR ms - lag(ms) OVER w >= 1800000
                  THEN 1 ELSE 0 END AS ns
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
         s AS (SELECT user_id, ms, SUM(ns) OVER
             (PARTITION BY user_id ORDER BY ms, event_id
              ROWS UNBOUNDED PRECEDING) AS session_idx
           FROM g)
         SELECT user_id, MIN(ms) AS session_start_ms,
             COUNT(*) AS n_events, MAX(ms) AS last_event_ms
         FROM s GROUP BY user_id, session_idx
         ORDER BY user_id, session_start_ms""",
    "q84_zorder" -> zorderOracle,
    "q85_source_mix" ->
      """WITH c AS (SELECT source, COUNT(*) AS n_total FROM documents
             WHERE source IS NOT NULL GROUP BY 1),
         m AS (SELECT MIN(n_total) AS mn FROM c),
         t AS (SELECT c.source, c.n_total,
             (m.mn * 10000) // c.n_total AS thr_bp FROM c, m),
         k AS (SELECT d.source, COUNT(*) AS n_kept
           FROM documents d JOIN t ON d.source = t.source
           WHERE CAST('0x' || substr(md5('mix|' ||
                 CAST(d.doc_id AS VARCHAR)), 1, 15) AS BIGINT)
               % 10000 < t.thr_bp
           GROUP BY 1)
         SELECT t.source, t.n_total, t.thr_bp,
             COALESCE(k.n_kept, CAST(0 AS BIGINT)) AS n_kept
         FROM t LEFT JOIN k ON t.source = k.source
         ORDER BY t.source""",
    "q86_token_budget" ->
      s"""$qualityScoredCtes,
         cum AS (SELECT doc_id, lang, n_tok, quality,
             CAST(SUM(n_tok) OVER (ORDER BY quality DESC, doc_id ASC
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tok
           FROM sc)
         SELECT doc_id, lang, n_tok, quality, cum_tok
         FROM cum WHERE cum_tok - n_tok < 20000
         ORDER BY cum_tok""",
    "q87_kmeans" -> kmeansOracle(8, 2),
    "q88_stream_static_join" ->
      """WITH mx AS (SELECT epoch_us(MAX(CAST(ts AS TIMESTAMP))) // 1000
               AS max_ms FROM events),
         b AS (SELECT epoch_ms(time_bucket(INTERVAL 10 MINUTE,
                 CAST(e.ts AS TIMESTAMP), TIMESTAMP '1970-01-01'))
                 AS window_start_ms,
               c.c_mktsegment AS segment, COUNT(*) AS n_events
           FROM events e JOIN customer c ON e.user_id = c.c_custkey
           GROUP BY 1, 2)
         SELECT window_start_ms, segment, n_events FROM b, mx
         WHERE window_start_ms + 600000 <= max_ms - 3600000
         ORDER BY window_start_ms, segment""",
    "q89_scd2" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) // 1000 AS ms FROM events),
         ch AS (SELECT user_id, event_type, ms, event_id,
             lag(event_type) OVER w AS prev,
             lag(ms) OVER w IS NULL AS first
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
         runs AS (SELECT user_id, event_type, ms, event_id FROM ch
           WHERE first OR prev IS DISTINCT FROM event_type),
         iv AS (SELECT user_id, event_type, ms AS valid_from_ms,
             lead(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id)
               AS valid_to_ms
           FROM runs)
         SELECT user_id, event_type, valid_from_ms, valid_to_ms,
             valid_to_ms IS NULL AS is_current
         FROM iv ORDER BY user_id, valid_from_ms""",
    "q90_range_window" ->
      """WITH e AS (SELECT event_id, user_id,
             epoch_us(CAST(ts AS TIMESTAMP)) // 1000 AS ms, value
           FROM events)
         SELECT event_id, user_id, ms,
             COUNT(*) OVER w AS n_1h,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
               AS sum_1h
         FROM e
         WINDOW w AS (PARTITION BY user_id ORDER BY ms
           RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW)
         ORDER BY event_id""",
    "q91_exact_k_sample" ->
      """WITH h AS (SELECT lang, doc_id,
             CAST('0x' || substr(md5('smp|' || CAST(doc_id AS VARCHAR)),
               1, 15) AS BIGINT) AS hv
           FROM documents),
         r AS (SELECT lang, doc_id, CAST(row_number() OVER
             (PARTITION BY lang ORDER BY hv, doc_id) AS BIGINT) AS rk
           FROM h)
         SELECT lang, rk, doc_id FROM r WHERE rk <= 10
         ORDER BY lang, rk""",
    "q92_table_diff" ->
      """WITH b AS (SELECT doc_id,
             CASE WHEN doc_id % 97 = 0 THEN text || 'X' ELSE text END
               AS text, lang, source, n_chars FROM documents),
         sa AS (SELECT CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                 1, 15) AS BIGINT) % 64 AS bucket,
               COUNT(*) AS n,
               SUM(CAST('0x' || substr(md5(concat_ws('|',
                   CAST(doc_id AS VARCHAR), COALESCE(text, chr(1)),
                   COALESCE(lang, chr(1)), COALESCE(source, chr(1)),
                   CAST(n_chars AS VARCHAR))), 1, 15) AS BIGINT)) AS ck
           FROM documents GROUP BY 1),
         sb AS (SELECT CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                 1, 15) AS BIGINT) % 64 AS bucket,
               COUNT(*) AS n,
               SUM(CAST('0x' || substr(md5(concat_ws('|',
                   CAST(doc_id AS VARCHAR), COALESCE(text, chr(1)),
                   COALESCE(lang, chr(1)), COALESCE(source, chr(1)),
                   CAST(n_chars AS VARCHAR))), 1, 15) AS BIGINT)) AS ck
           FROM b GROUP BY 1)
         SELECT COALESCE(sa.bucket, sb.bucket) AS bucket,
             COALESCE(sa.n, 0) AS n_a, COALESCE(sb.n, 0) AS n_b
         FROM sa FULL OUTER JOIN sb ON sa.bucket = sb.bucket
         WHERE sa.n IS DISTINCT FROM sb.n
            OR sa.ck IS DISTINCT FROM sb.ck
         ORDER BY bucket""",
    "q93_winsorize" ->
      """WITH b AS (SELECT l_returnflag,
             quantile_cont(l_quantity, 0.05) AS p05,
             quantile_cont(l_quantity, 0.95) AS p95
           FROM lineitem GROUP BY 1),
         w AS (SELECT l.l_returnflag, l.l_quantity, b.p05, b.p95,
             least(greatest(l.l_quantity, b.p05), b.p95) AS wv
           FROM lineitem l JOIN b USING (l_returnflag))
         SELECT l_returnflag, COUNT(*) AS n,
             MIN(p05) AS p05, MIN(p95) AS p95,
             CAST(SUM(CASE WHEN l_quantity < p05 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_clip_lo,
             CAST(SUM(CASE WHEN l_quantity > p95 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_clip_hi,
             CAST(SUM(CAST(wv AS DECIMAL(12,2))) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS mean_w
         FROM w GROUP BY 1 ORDER BY l_returnflag""",
    "q94_zscore" ->
      """WITH st AS (SELECT event_type, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(value AS DECIMAL(18,2))
               * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s2
           FROM events GROUP BY 1),
         m AS (SELECT event_type, s1 / n AS mean,
             sqrt((CAST(n AS DOUBLE) * s2 - s1 * s1)
               / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) AS sd
           FROM st WHERE n > 1)
         SELECT e.event_id, e.event_type, e.value,
             (e.value - m.mean) / m.sd AS z
         FROM events e JOIN m USING (event_type)
         WHERE m.sd > 0
         ORDER BY e.event_id""",
    "q96_argmax_agg" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) // 1000 AS ms FROM events)
         SELECT user_id, COUNT(*) AS n_events,
             MAX({'ms': ms, 'event_id': event_id,
                  'event_type': event_type}).ms AS last_ms,
             MAX({'ms': ms, 'event_id': event_id,
                  'event_type': event_type}).event_id AS last_event,
             MAX({'ms': ms, 'event_id': event_id,
                  'event_type': event_type}).event_type AS last_type
         FROM e GROUP BY 1 ORDER BY user_id""",
    "q97_semantic_dedup" -> semanticDedupOracle(8, 2),
    "q98_shard_manifest" ->
      s"""$qualityScoredCtes,
         rk AS (SELECT doc_id, text, n_tok,
             CAST(row_number() OVER (ORDER BY quality DESC, doc_id)
               AS BIGINT) AS rk
           FROM sc)
         SELECT (rk - 1) // 64 AS shard, COUNT(*) AS n_docs,
             CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
             CAST(SUM(CAST('0x' || substr(md5(concat_ws('|',
                 CAST(doc_id AS VARCHAR), text)), 1, 15) AS BIGINT))
               % 1099511627776 AS BIGINT) AS checksum
         FROM rk GROUP BY 1 ORDER BY shard""",
    "q99_cross_dedup" -> crossDedupOracle,
    "q100_full_pipeline" ->
      s"""$qualityScoredCtes,
         kept AS (SELECT * FROM sc WHERE quality >= 0.5),
         fp AS (SELECT *, md5(regexp_replace(lower(trim(nfc_normalize(text))),
             '\\s+', ' ', 'g')) AS f FROM kept),
         uq AS (SELECT * FROM (SELECT *, row_number() OVER
             (PARTITION BY f ORDER BY doc_id) AS rn FROM fp)
           WHERE rn = 1),
         cnt AS (SELECT source, COUNT(*) AS n FROM uq GROUP BY 1),
         mn AS (SELECT MIN(n) AS mn FROM cnt),
         thr AS (SELECT cnt.source, (mn.mn * 10000) // cnt.n AS thr
           FROM cnt, mn),
         mixed AS (SELECT uq.doc_id, uq.lang, uq.n_tok, uq.quality
           FROM uq JOIN thr ON uq.source = thr.source
           WHERE CAST('0x' || substr(md5('pipe|' ||
                 CAST(uq.doc_id AS VARCHAR)), 1, 15) AS BIGINT)
               % 10000 < thr.thr),
         cum AS (SELECT doc_id, lang, n_tok, quality,
             CAST(SUM(n_tok) OVER (ORDER BY quality DESC, doc_id ASC
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ct
           FROM mixed),
         sel AS (SELECT * FROM cum WHERE ct - n_tok < 15000)
         SELECT lang, COUNT(*) AS n_docs,
             CAST(SUM(n_tok) AS BIGINT) AS n_tokens
         FROM sel GROUP BY 1 ORDER BY lang""",
    "q101_paragraph_dedup" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
                       FROM documents),
         p AS (SELECT doc_id, i - 1 AS par_idx,
             trim(array_to_string(t[((i-1)*20+1):((i-1)*20+20)], ' '))
               AS para
           FROM toks, unnest(range(1,
             greatest(CAST(ceil(len(t) / 20.0) AS BIGINT), 1) + 1)) u(i)),
         np AS (SELECT * FROM p WHERE para <> ''),
         k AS (SELECT doc_id, par_idx, para,
             (row_number() OVER (PARTITION BY md5(nfc_normalize(para))
                ORDER BY doc_id, par_idx) = 1) AS keep
           FROM np)
         SELECT doc_id, COUNT(*) AS n_paras,
             CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept,
             md5(COALESCE(string_agg(para, ' ' ORDER BY par_idx)
               FILTER (WHERE keep), '')) AS kept_md5
         FROM k GROUP BY doc_id ORDER BY doc_id""",
    "q102_hll_cardinality" ->
      """SELECT 'documents.doc_id' AS column_name, COUNT(*) AS n_rows,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS exact_distinct,
             TRUE AS within_15pct FROM documents
         UNION ALL
         SELECT 'documents.lang', COUNT(*),
             CAST(COUNT(DISTINCT lang) AS BIGINT), TRUE FROM documents
         UNION ALL
         SELECT 'documents.source', COUNT(*),
             CAST(COUNT(DISTINCT source) AS BIGINT), TRUE FROM documents
         UNION ALL
         SELECT 'events.user_id', COUNT(*),
             CAST(COUNT(DISTINCT user_id) AS BIGINT), TRUE FROM events
         UNION ALL
         SELECT 'events.event_type', COUNT(*),
             CAST(COUNT(DISTINCT event_type) AS BIGINT), TRUE FROM events
         ORDER BY column_name""",
    "q103_cross_semantic_dedup" -> crossSemanticDedupOracle(8, 2),
    // q276 SHARES q103's oracle verbatim: disjoint micro-batches, each
    // probing only the static stored history, fold to exactly the
    // batch incremental answer (the q57/q70 stream≡batch discipline).
    "q276_stream_semantic_dedup" -> crossSemanticDedupOracle(8, 2),
    // q281: the self-extending fold — hist + earlier-batch arrivals
    // per batch, replayed closed-form from the staging NTILE.
    "q281_stream_semantic_grow" -> growingSemanticDedupOracle(8, 2, 3),
    // q282: per-batch TV drift vs the stored baseline — batch
    // membership via the staging NTILE, the planted corruption
    // boundary closed-form (⌈2n/3⌉ over contiguous ids), all ppm
    // arithmetic in truncating integers.
    "q282_stream_drift_gate" ->
      """WITH nn AS (SELECT COUNT(*) AS n FROM documents),
         src AS (SELECT doc_id,
             CASE WHEN doc_id >= (2 * nn.n + 2) // 3
               THEN regexp_replace(text, '[aeiou]', '0', 'g')
               ELSE text END AS text,
             CAST(NTILE(3) OVER (ORDER BY doc_id) AS BIGINT) AS b
           FROM documents, nn),
         btok AS (SELECT CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT)
               % 256 AS bucket
           FROM (SELECT unnest(list_filter(string_split(text, ' '),
                 t -> t <> '')) AS tok
               FROM documents WHERE doc_id % 5 <> 0)),
         bppm AS (SELECT bucket,
             COUNT(*) * 1000000 // (SELECT COUNT(*) FROM btok) AS ppm
           FROM btok GROUP BY 1),
         stok AS (SELECT b, CAST('0x' || substr(md5(tok), 1, 8)
               AS BIGINT) % 256 AS bucket
           FROM (SELECT b, unnest(list_filter(string_split(text, ' '),
                 t -> t <> '')) AS tok
               FROM src WHERE doc_id % 5 = 0)),
         stot AS (SELECT b, COUNT(*) AS n FROM stok GROUP BY 1),
         sppm AS (SELECT s.b, s.bucket,
             COUNT(*) * 1000000 // any_value(t.n) AS ppm
           FROM stok s JOIN stot t USING (b) GROUP BY s.b, s.bucket),
         allb AS (SELECT DISTINCT bucket FROM
           (SELECT bucket FROM bppm UNION ALL SELECT bucket FROM sppm)),
         grid AS (SELECT ob.b, ab.bucket
           FROM (SELECT DISTINCT b FROM sppm) ob CROSS JOIN allb ab),
         j AS (SELECT g.b,
             abs(COALESCE(s.ppm, 0) - COALESCE(bp.ppm, 0)) AS d
           FROM grid g
           LEFT JOIN sppm s ON s.b = g.b AND s.bucket = g.bucket
           LEFT JOIN bppm bp ON bp.bucket = g.bucket)
         SELECT CAST(j.b - 1 AS BIGINT) AS batch_id,
             CAST(st.n AS BIGINT) AS n_tokens,
             CAST(SUM(CASE WHEN j.d > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS drifted_buckets,
             CAST(SUM(j.d) // 2 AS BIGINT) AS drift_ppm,
             (SUM(j.d) // 2 > 150000) AS drift_alert
         FROM j JOIN stot st ON st.b = j.b
         GROUP BY j.b, st.n ORDER BY batch_id""",
    "q104_approx_percentile" ->
      """SELECT l_returnflag,
             quantile_cont(l_quantity, 0.5) AS exact_p50,
             quantile_cont(l_quantity, 0.95) AS exact_p95,
             TRUE AS within_rank_eps
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q105_vocabulary" ->
      """WITH nt AS (SELECT unnest(string_split(text, ' ')) AS token
                     FROM documents),
         tk AS (SELECT token FROM nt WHERE token <> ''),
         c AS (SELECT token, COUNT(*) AS cnt FROM tk GROUP BY 1),
         tot AS (SELECT COUNT(*) AS total FROM tk),
         r AS (SELECT token, cnt,
             row_number() OVER (ORDER BY cnt DESC, token) AS rank FROM c),
         top AS (SELECT * FROM r WHERE rank <= 30)
         SELECT CAST(rank AS BIGINT) AS rank, token,
             CAST(cnt AS BIGINT) AS cnt,
             CAST(cnt AS DOUBLE) / CAST(tot.total AS DOUBLE) AS share,
             CAST(SUM(cnt) OVER (ORDER BY rank ROWS UNBOUNDED PRECEDING)
               AS DOUBLE) / CAST(tot.total AS DOUBLE) AS cum_share
         FROM top, tot ORDER BY rank""",
    "q106_source_drift" ->
      """WITH d AS (SELECT source, n_chars // 50 AS bin FROM documents),
         sb AS (SELECT source, bin, COUNT(*) AS c_sb FROM d GROUP BY 1, 2),
         b AS (SELECT bin, COUNT(*) AS c_b FROM d GROUP BY 1),
         ns AS (SELECT source, COUNT(*) AS n_s FROM d GROUP BY 1),
         nt AS (SELECT COUNT(*) AS n_all FROM d),
         grid AS (SELECT ns.source, b.bin, ns.n_s, b.c_b,
             COALESCE(sb.c_sb, 0) AS c_sb
           FROM ns CROSS JOIN b
           LEFT JOIN sb ON sb.source = ns.source AND sb.bin = b.bin),
         agg AS (SELECT source, n_s, MAX(n_all) AS n_all,
             SUM(ABS(CAST(c_sb AS HUGEINT) * n_all
               - CAST(c_b AS HUGEINT) * n_s)) AS num_sum
           FROM grid, nt GROUP BY 1, 2)
         SELECT source, CAST(n_s AS BIGINT) AS n_docs,
             CAST(num_sum AS DOUBLE) / (2.0 * CAST(n_s AS DOUBLE)
               * CAST(n_all AS DOUBLE)) AS tv_dist
         FROM agg ORDER BY source""",
    "q107_cluster_representative" ->
      s"""WITH RECURSIVE $dedupClusterCtes,
         qd AS (SELECT doc_id, text, string_split(text, ' ') AS qtoks
                FROM documents),
         qs AS (SELECT doc_id,
             0.5 * least(CAST(len(qtoks) AS DOUBLE) / 100.0, 1.0)
               + 0.3 * (1.0 - CAST(len(list_filter(qtoks,
                     w -> w IN ('the','a','of','and','is'))) AS DOUBLE)
                   / CAST(len(qtoks) AS DOUBLE))
               + 0.2 * least(((CAST(length(text) AS DOUBLE)
                     - (CAST(len(qtoks) AS DOUBLE) - 1.0))
                   / CAST(len(qtoks) AS DOUBLE)) / 8.0, 1.0) AS quality
           FROM qd),
         j AS (SELECT lab.node AS doc_id, lab.cluster_rep, sz.n_members,
             qs.quality
           FROM lab JOIN sz USING (cluster_rep)
                    JOIN qs ON qs.doc_id = lab.node),
         best AS (SELECT *, row_number() OVER (PARTITION BY cluster_rep
             ORDER BY quality DESC, doc_id ASC) AS rn FROM j)
         SELECT cluster_rep, n_members, doc_id AS best_doc,
             quality AS best_quality
         FROM best WHERE rn = 1 ORDER BY cluster_rep""",
    "q108_incr_paragraph_dedup" ->
      """WITH bt AS (SELECT doc_id, string_split(text, ' ') AS t
                     FROM documents WHERE doc_id % 10 <> 0),
         bp AS (SELECT doc_id, i - 1 AS par_idx,
             trim(array_to_string(t[((i-1)*20+1):((i-1)*20+20)], ' '))
               AS para
           FROM bt, unnest(range(1,
             greatest(CAST(ceil(len(t) / 20.0) AS BIGINT), 1) + 1)) u(i)),
         bnp AS (SELECT * FROM bp WHERE para <> ''),
         ht AS (SELECT doc_id, string_split(text, ' ') AS t
                FROM documents WHERE doc_id % 10 = 0),
         hp AS (SELECT doc_id, i - 1 AS par_idx,
             trim(array_to_string(t[((i-1)*20+1):((i-1)*20+20)], ' '))
               AS para
           FROM ht, unnest(range(1,
             greatest(CAST(ceil(len(t) / 20.0) AS BIGINT), 1) + 1)) u(i)),
         hh AS (SELECT DISTINCT md5(nfc_normalize(para)) AS ph FROM hp WHERE para <> ''),
         k AS (SELECT doc_id, par_idx, md5(nfc_normalize(para)) AS ph,
             row_number() OVER (PARTITION BY md5(nfc_normalize(para))
                ORDER BY doc_id, par_idx) AS rn
           FROM bnp),
         m AS (SELECT k.doc_id, k.rn, (hh.ph IS NOT NULL) AS seen
           FROM k LEFT JOIN hh USING (ph))
         SELECT doc_id, COUNT(*) AS n_paras,
             CAST(SUM(CASE WHEN NOT seen AND rn = 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_kept,
             CAST(SUM(CASE WHEN seen THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hist_dups,
             CAST(SUM(CASE WHEN NOT seen AND rn > 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_batch_dups
         FROM m GROUP BY doc_id ORDER BY doc_id""",
    "q109_heavy_hitters" ->
      """WITH nt AS (SELECT unnest(string_split(text, ' ')) AS token
                     FROM documents),
         tk AS (SELECT token FROM nt WHERE token <> ''),
         c AS (SELECT token, COUNT(*) AS cnt FROM tk GROUP BY 1),
         r AS (SELECT token, cnt,
             row_number() OVER (ORDER BY cnt DESC, token) AS rank FROM c)
         SELECT CAST(rank AS BIGINT) AS rank, token,
             CAST(cnt AS BIGINT) AS exact_cnt,
             TRUE AS overestimate_ok, TRUE AS within_eps
         FROM r WHERE rank <= 20 ORDER BY rank""",
    "q110_bloom_contamination" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
                       FROM documents),
         p AS (SELECT doc_id,
             trim(array_to_string(t[((i-1)*20+1):((i-1)*20+20)], ' '))
               AS para
           FROM toks, unnest(range(1,
             greatest(CAST(ceil(len(t) / 20.0) AS BIGINT), 1) + 1)) u(i)),
         np AS (SELECT doc_id, md5(nfc_normalize(para)) AS fp FROM p WHERE para <> ''),
         ev AS (SELECT DISTINCT fp FROM np WHERE doc_id % 17 = 0),
         co AS (SELECT DISTINCT doc_id, fp FROM np WHERE doc_id % 17 <> 0),
         h AS (SELECT doc_id, COUNT(*) AS n_hit_paras FROM co
               WHERE fp IN (SELECT fp FROM ev) GROUP BY 1)
         SELECT doc_id, CAST(n_hit_paras AS BIGINT) AS n_hit_paras,
             TRUE AS bloom_no_false_negatives, TRUE AS fpr_ok
         FROM h ORDER BY doc_id""",
    "q111_pps_sample" ->
      """WITH w AS (SELECT source, doc_id, n_chars,
             CAST('0x' || substr(md5('pps1|' || CAST(doc_id AS VARCHAR)),
               1, 15) AS BIGINT) AS h
           FROM documents
           WHERE doc_id IS NOT NULL AND source IS NOT NULL
             AND n_chars IS NOT NULL AND n_chars > 0),
         c AS (SELECT source, doc_id, n_chars,
             SUM(n_chars) OVER (PARTITION BY source ORDER BY h, doc_id
               ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(n_chars) OVER (PARTITION BY source) AS tot FROM w),
         sel AS (SELECT source, doc_id, n_chars,
             ((cum * 10 + tot - 1) // tot)
               - (((cum - n_chars) * 10 + tot - 1) // tot) AS n_picks
           FROM c)
         SELECT source, doc_id, CAST(n_chars AS BIGINT) AS n_chars,
             CAST(n_picks AS BIGINT) AS n_picks
         FROM sel WHERE n_picks > 0 ORDER BY source, doc_id""",
    "q112_stream_approx_users" ->
      """WITH mx AS (SELECT epoch_us(MAX(CAST(ts AS TIMESTAMP))) // 1000
                       AS max_ms FROM events),
         b AS (SELECT epoch_ms(time_bucket(INTERVAL 10 MINUTE,
                 CAST(ts AS TIMESTAMP), TIMESTAMP '1970-01-01'))
                 AS window_start_ms,
               event_type, COUNT(DISTINCT user_id) AS exact_users
           FROM events GROUP BY 1, 2)
         SELECT window_start_ms, event_type, exact_users,
             TRUE AS within_3rsd FROM b, mx
         WHERE window_start_ms + 600000 <= max_ms - 3600000
         ORDER BY window_start_ms, event_type""",
    "q113_pq_ann" -> pqAnnOracle(4, 16, 2),
    "q114_stream_complete" ->
      """SELECT epoch_ms(time_bucket(INTERVAL 10 MINUTE,
               CAST(ts AS TIMESTAMP), TIMESTAMP '1970-01-01'))
               AS window_start_ms,
             event_type, COUNT(*) AS n_events
         FROM events GROUP BY 1, 2
         ORDER BY window_start_ms, event_type""",
    "q115_ivf_pq" -> pqAnnOracle(4, 16, 2, ivfCells = 8, ivfIters = 2,
      nprobe = 2),
    // q129 shares q115's full retrain-in-SQL pipeline; only the final
    // select differs (stored-model audit columns) — a green row proves
    // the parquet model roundtrip is lossless end-to-end
    "q129_stored_model_ann" -> pqAnnOracle(4, 16, 2, ivfCells = 8,
      ivfIters = 2, nprobe = 2, storedShape = true),
    "q116_bm25" -> bm25Oracle,
    // q136 shares q116's full-recompute oracle: scoring against the
    // MERGED stored stats (history fold + batch) must be bit-identical
    // to scoring a full recompute — the q71/q128/q130 shared-oracle
    // discipline applied to the retrieval index
    "q136_incr_bm25" -> bm25Oracle,
    // q137: one prefix sum over the whole corpus in arrival (doc_id)
    // order with the q86 boundary rule — what the streamed quota fold
    // must reproduce across micro-batch boundaries
    "q137_stream_budget" ->
      """WITH d AS (SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
           FROM documents),
         cum AS (SELECT doc_id, n_tok,
             CAST(SUM(n_tok) OVER (ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tok
           FROM d)
         SELECT doc_id, n_tok, cum_tok
         FROM cum WHERE cum_tok - n_tok < 20000
         ORDER BY doc_id""",
    "q117_boilerplate" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
                       FROM documents),
         p AS (SELECT doc_id, i - 1 AS par_idx,
             trim(array_to_string(t[((i-1)*20+1):((i-1)*20+20)], ' '))
               AS para
           FROM toks, unnest(range(1,
             greatest(CAST(ceil(len(t) / 20.0) AS BIGINT), 1) + 1)) u(i)),
         np AS (SELECT doc_id, par_idx, para, md5(nfc_normalize(para)) AS ph
           FROM p WHERE para <> ''),
         bo AS (SELECT ph FROM (SELECT DISTINCT ph, doc_id FROM np) u
           GROUP BY ph HAVING COUNT(*) >= 2),
         k AS (SELECT np.doc_id, np.par_idx, np.para,
             (bo.ph IS NULL) AS keep
           FROM np LEFT JOIN bo ON np.ph = bo.ph)
         SELECT doc_id, COUNT(*) AS n_paras,
             CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT)
               AS n_boiler,
             md5(COALESCE(string_agg(para, ' ' ORDER BY par_idx)
               FILTER (WHERE keep), '')) AS kept_md5
         FROM k GROUP BY doc_id ORDER BY doc_id""",
    "q118_pagerank" ->
      """WITH e0 AS (SELECT DISTINCT o_custkey * 2 AS src,
             l_suppkey * 2 + 1 AS dst
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         e AS (SELECT src, dst FROM e0
               UNION ALL SELECT dst, src FROM e0),
         d AS (SELECT src AS node, COUNT(*) AS outdeg FROM e GROUP BY 1),
         n AS (SELECT COUNT(*) AS nn FROM d),
         r0 AS (SELECT node, outdeg, 1000000000000 // nn AS r FROM d, n),
         s1 AS (SELECT e.dst AS node, SUM(r0.r // r0.outdeg) AS s
           FROM e JOIN r0 ON e.src = r0.node GROUP BY 1),
         r1 AS (SELECT r0.node, r0.outdeg,
             (15 * (1000000000000 // nn)) // 100
               + (85 * COALESCE(s1.s, 0)) // 100 AS r
           FROM r0 LEFT JOIN s1 USING (node), n),
         s2 AS (SELECT e.dst AS node, SUM(r1.r // r1.outdeg) AS s
           FROM e JOIN r1 ON e.src = r1.node GROUP BY 1),
         r2 AS (SELECT r1.node, r1.outdeg,
             (15 * (1000000000000 // nn)) // 100
               + (85 * COALESCE(s2.s, 0)) // 100 AS r
           FROM r1 LEFT JOIN s2 USING (node), n),
         s3 AS (SELECT e.dst AS node, SUM(r2.r // r2.outdeg) AS s
           FROM e JOIN r2 ON e.src = r2.node GROUP BY 1),
         r3 AS (SELECT r2.node, r2.outdeg,
             (15 * (1000000000000 // nn)) // 100
               + (85 * COALESCE(s3.s, 0)) // 100 AS r
           FROM r2 LEFT JOIN s3 USING (node), n),
         top AS (SELECT node, outdeg, r,
             row_number() OVER (ORDER BY r DESC, node) AS pos
           FROM r3)
         SELECT CAST(pos AS BIGINT) AS pos,
             CASE WHEN node % 2 = 0 THEN 'customer'
                  ELSE 'supplier' END AS node_type,
             node // 2 AS entity_key, outdeg AS degree,
             CAST(r AS BIGINT) AS rank_scaled
         FROM top WHERE pos <= 20 ORDER BY pos""",
    "q119_funnel" ->
      """WITH a AS (SELECT user_id, MIN(ts) AS t1 FROM events
           WHERE event_type = 'view' GROUP BY 1),
         b AS (SELECT e.user_id, MIN(e.ts) AS t2, MIN(a.t1) AS t1
           FROM events e JOIN a USING (user_id)
           WHERE e.event_type = 'click' AND e.ts > a.t1 GROUP BY 1),
         c AS (SELECT e.user_id, MIN(e.ts) AS t3, MIN(b.t1) AS t1
           FROM events e JOIN b USING (user_id)
           WHERE e.event_type = 'purchase' AND e.ts > b.t2 GROUP BY 1)
         SELECT '1_view' AS step, COUNT(*) AS n_users FROM a
         UNION ALL SELECT '2_click', COUNT(*) FROM b
         UNION ALL SELECT '3_purchase', COUNT(*) FROM c
         UNION ALL SELECT '4_within_24h', COUNT(*) FROM c
           WHERE epoch_us(t3) - epoch_us(t1) <= 86400000000
         ORDER BY step""",
    "q120_retention" ->
      """WITH wk AS (SELECT DISTINCT user_id,
             (CAST(ts AS DATE) - DATE '1970-01-01') // 7 AS wk
           FROM events),
         cohort AS (SELECT user_id, MIN(wk) AS cohort_wk FROM wk
           GROUP BY 1),
         sizes AS (SELECT cohort_wk, COUNT(*) AS n_cohort FROM cohort
           GROUP BY 1),
         act AS (SELECT c.cohort_wk, w.wk - c.cohort_wk AS week_offset,
             COUNT(*) AS n_active
           FROM wk w JOIN cohort c USING (user_id) GROUP BY 1, 2)
         SELECT a.cohort_wk, a.week_offset, a.n_active, s.n_cohort,
             CAST(a.n_active AS DOUBLE) / CAST(s.n_cohort AS DOUBLE)
               AS retention
         FROM act a JOIN sizes s USING (cohort_wk)
         ORDER BY cohort_wk, week_offset""",
    "q121_incr_rollup" ->
      """WITH h AS (SELECT event_type, COUNT(*) AS n,
             SUM(CAST(value AS DECIMAL(18,2))) AS v
           FROM events WHERE event_id % 10 < 8 GROUP BY 1),
         b AS (SELECT event_type, COUNT(*) AS n,
             SUM(CAST(value AS DECIMAL(18,2))) AS v
           FROM events WHERE event_id % 10 >= 8 GROUP BY 1),
         m AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS n_events,
             SUM(v) AS tv
           FROM (SELECT * FROM h UNION ALL SELECT * FROM b)
           GROUP BY 1),
         f AS (SELECT event_type, COUNT(*) AS nf,
             SUM(CAST(value AS DECIMAL(18,2))) AS vf
           FROM events GROUP BY 1)
         SELECT m.event_type, m.n_events,
             CAST(m.tv AS DOUBLE) AS total_value,
             (m.n_events = f.nf AND m.tv = f.vf) AS matches_recompute
         FROM m JOIN f USING (event_type) ORDER BY event_type""",
    // q122: update-mode + upsert sink ≡ batch group-by over ALL events
    // (open windows included) — the same equivalence complete mode
    // (q114) satisfies, reached by shipping per-batch DELTAS instead of
    // re-shipping the world; the shared oracle is the q57/q70 pattern.
    "q122_stream_update" ->
      """SELECT epoch_ms(time_bucket(INTERVAL 10 MINUTE,
               CAST(ts AS TIMESTAMP), TIMESTAMP '1970-01-01'))
               AS window_start_ms,
             event_type, COUNT(*) AS n_events
         FROM events GROUP BY 1, 2
         ORDER BY window_start_ms, event_type""",
    // q123: left-outer stream-stream interval join — inner matches (the
    // q57 replay) plus a NULL row per unmatched click whose join
    // horizon (c_ts + lag) closed before the final watermark
    // min(max click ts, max purchase ts) − delay; unmatched clicks
    // still inside the horizon at end-of-input stay unemitted (they
    // remain joinable by a resumed run).
    "q123_stream_outer_join" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) // 1000 AS ms FROM events),
         m AS (SELECT c.event_id AS click_id, v.event_id AS purchase_id,
             CAST(v.ms - c.ms AS BIGINT) AS lag_ms
           FROM e c JOIN e v ON c.user_id = v.user_id
           WHERE c.event_type = 'click' AND v.event_type = 'purchase'
             AND v.ms >= c.ms AND v.ms <= c.ms + 600000),
         wm AS (SELECT least(
             (SELECT MAX(ms) FROM e WHERE event_type = 'click'),
             (SELECT MAX(ms) FROM e WHERE event_type = 'purchase'))
             - 1800000 AS w),
         um AS (SELECT c.event_id AS click_id,
             CAST(NULL AS BIGINT) AS purchase_id,
             CAST(NULL AS BIGINT) AS lag_ms
           FROM e c, wm
           WHERE c.event_type = 'click'
             AND c.event_id NOT IN (SELECT click_id FROM m)
             AND c.ms + 600000 < wm.w)
         SELECT * FROM m UNION ALL SELECT * FROM um
         ORDER BY click_id, purchase_id""",
    "q124_star_join" ->
      """SELECT n_name, COUNT(*) AS n_lineitems,
             CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
               AS DECIMAL(18,6))) AS DOUBLE) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
           AND o_orderdate >= TIMESTAMP '1995-01-01'
           AND o_orderdate < TIMESTAMP '1998-01-01'
         GROUP BY 1 ORDER BY revenue DESC, n_name""",
    "q125_negative_sampling" ->
      s"""WITH $quantCte,
         cnt AS (SELECT COUNT(*) AS c FROM embeddings),
         p0 AS (SELECT e.vec_id, u.j,
             (e.vec_id * 1000003 + u.j * 7919) % cnt.c AS raw
           FROM embeddings e, cnt, (SELECT unnest(range(0, 3)) AS j) u),
         p AS (SELECT p0.vec_id, p0.j,
             CASE WHEN p0.raw = p0.vec_id THEN (p0.raw + 1) % cnt.c
                  ELSE p0.raw END AS neg_id
           FROM p0, cnt),
         d AS (SELECT p.vec_id, p.j, p.neg_id, SUM(a.x * b.x) AS dot
           FROM p JOIN q a ON a.vec_id = p.vec_id
                JOIN q b ON b.vec_id = p.neg_id AND a.i = b.i
           GROUP BY 1, 2, 3)
         SELECT d.vec_id, CAST(d.j AS BIGINT) AS j, d.neg_id,
             CAST(dot AS DOUBLE) / (sqrt(CAST(na.nn AS DOUBLE))
               * sqrt(CAST(nb.nn AS DOUBLE))) AS cos_sim
         FROM d JOIN nrm na ON d.vec_id = na.vec_id
              JOIN nrm nb ON d.neg_id = nb.vec_id
         ORDER BY d.vec_id, d.j""",
    "q126_ewma_rates" -> ewmaOracle,
    // q138 shares q126's batch oracle: the EWMA emitted from the
    // FOLDED bucket state must be bit-identical to smoothing the whole
    // stream at once — the q71/q116 shared-oracle discipline applied
    // to the monitoring statistic
    "q138_stream_ewma" -> ewmaOracle,
    // q139: same pair CTEs as q133, then the unrolled peel — the
    // Spark side's maxRounds = 8 pins the oracle's unroll depth
    "q139_kcore" -> kcoreOracle(k = 2, rounds = 8),
    "q140_grouping_sets" ->
      """SELECT COALESCE(lang, 'ALL') AS lang,
             COALESCE(source, 'ALL') AS source,
             CAST(GROUPING(lang, source) AS BIGINT) AS gid,
             COUNT(*) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS sum_chars
         FROM documents
         GROUP BY GROUPING SETS ((lang, source), (lang), (source))
         ORDER BY gid, lang, source""",
    "q141_mad_outliers" ->
      """WITH med AS (SELECT event_type,
             quantile_cont(value, 0.5) AS med
           FROM events GROUP BY 1),
         dev AS (SELECT e.event_type, ABS(e.value - m.med) AS ad
           FROM events e JOIN med m USING (event_type)),
         mad AS (SELECT event_type, quantile_cont(ad, 0.5) AS mad
           FROM dev GROUP BY 1),
         fl AS (SELECT d.event_type, COUNT(*) AS n_events,
             CAST(SUM(CASE WHEN d.ad > 3.0 * 1.4826 * m.mad
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
           FROM dev d JOIN mad m USING (event_type) GROUP BY 1)
         SELECT f.event_type, me.med, ma.mad, f.n_events, f.n_outliers,
             CAST(f.n_outliers AS DOUBLE) / CAST(f.n_events AS DOUBLE)
               AS outlier_rate
         FROM fl f JOIN med me USING (event_type)
              JOIN mad ma USING (event_type)
         ORDER BY f.event_type""",
    "q142_equidepth_bins" ->
      """WITH b AS (SELECT
             quantile_cont(l_extendedprice, 0.125) AS b1,
             quantile_cont(l_extendedprice, 0.25) AS b2,
             quantile_cont(l_extendedprice, 0.375) AS b3,
             quantile_cont(l_extendedprice, 0.5) AS b4,
             quantile_cont(l_extendedprice, 0.625) AS b5,
             quantile_cont(l_extendedprice, 0.75) AS b6,
             quantile_cont(l_extendedprice, 0.875) AS b7
           FROM lineitem),
         a AS (SELECT l_extendedprice AS v,
             (CASE WHEN l_extendedprice >= b.b1 THEN 1 ELSE 0 END)
             + (CASE WHEN l_extendedprice >= b.b2 THEN 1 ELSE 0 END)
             + (CASE WHEN l_extendedprice >= b.b3 THEN 1 ELSE 0 END)
             + (CASE WHEN l_extendedprice >= b.b4 THEN 1 ELSE 0 END)
             + (CASE WHEN l_extendedprice >= b.b5 THEN 1 ELSE 0 END)
             + (CASE WHEN l_extendedprice >= b.b6 THEN 1 ELSE 0 END)
             + (CASE WHEN l_extendedprice >= b.b7 THEN 1 ELSE 0 END)
               AS bin
           FROM lineitem, b)
         SELECT CAST(bin AS BIGINT) AS bin, COUNT(*) AS n_rows,
             MIN(v) AS min_v, MAX(v) AS max_v
         FROM a GROUP BY bin ORDER BY bin""",
    // q143: q118's CTE chain with the seed-restricted teleport — only
    // whitelist nodes (node % 20 = 0) hold initial mass and re-seed
    "q143_trustrank" ->
      """WITH e0 AS (SELECT DISTINCT o_custkey * 2 AS src,
             l_suppkey * 2 + 1 AS dst
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         e AS (SELECT src, dst FROM e0
               UNION ALL SELECT dst, src FROM e0),
         d AS (SELECT src AS node, COUNT(*) AS outdeg FROM e GROUP BY 1),
         sd AS (SELECT node FROM d WHERE node % 20 = 0),
         ns AS (SELECT COUNT(*) AS ns FROM sd),
         r0 AS (SELECT d.node, d.outdeg,
             CASE WHEN sd.node IS NOT NULL THEN 1 ELSE 0 END AS seed,
             CASE WHEN sd.node IS NOT NULL
                  THEN 1000000000000 // ns ELSE 0 END AS r
           FROM d LEFT JOIN sd USING (node), ns),
         s1 AS (SELECT e.dst AS node, SUM(r0.r // r0.outdeg) AS s
           FROM e JOIN r0 ON e.src = r0.node GROUP BY 1),
         r1 AS (SELECT r0.node, r0.outdeg, r0.seed,
             r0.seed * ((15 * (1000000000000 // ns)) // 100)
               + (85 * COALESCE(s1.s, 0)) // 100 AS r
           FROM r0 LEFT JOIN s1 USING (node), ns),
         s2 AS (SELECT e.dst AS node, SUM(r1.r // r1.outdeg) AS s
           FROM e JOIN r1 ON e.src = r1.node GROUP BY 1),
         r2 AS (SELECT r1.node, r1.outdeg, r1.seed,
             r1.seed * ((15 * (1000000000000 // ns)) // 100)
               + (85 * COALESCE(s2.s, 0)) // 100 AS r
           FROM r1 LEFT JOIN s2 USING (node), ns),
         s3 AS (SELECT e.dst AS node, SUM(r2.r // r2.outdeg) AS s
           FROM e JOIN r2 ON e.src = r2.node GROUP BY 1),
         r3 AS (SELECT r2.node, r2.outdeg, r2.seed,
             r2.seed * ((15 * (1000000000000 // ns)) // 100)
               + (85 * COALESCE(s3.s, 0)) // 100 AS r
           FROM r2 LEFT JOIN s3 USING (node), ns),
         top AS (SELECT node, outdeg, seed, r,
             row_number() OVER (ORDER BY r DESC, node) AS pos
           FROM r3)
         SELECT CAST(pos AS BIGINT) AS pos,
             CASE WHEN node % 2 = 0 THEN 'customer'
                  ELSE 'supplier' END AS node_type,
             node // 2 AS entity_key, outdeg AS degree,
             CAST(seed AS BIGINT) AS is_seed,
             CAST(r AS BIGINT) AS trust_scaled
         FROM top WHERE pos <= 20 ORDER BY pos""",
    // q144: the q86 quality/token CTEs, the same prefix sum, then the
    // integer stage cut on each document's START offset
    "q144_curriculum" ->
      s"""$qualityScoredCtes,
         cum AS (SELECT doc_id, n_tok, quality,
             CAST(SUM(n_tok) OVER (ORDER BY quality DESC, doc_id ASC
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tok
           FROM sc),
         tot AS (SELECT CAST(SUM(n_tok) AS BIGINT) AS tt FROM sc),
         st AS (SELECT doc_id, n_tok, quality,
             ((cum_tok - n_tok) * 4) // tt AS stage
           FROM cum, tot)
         SELECT CAST(stage AS BIGINT) AS stage, COUNT(*) AS n_docs,
             CAST(SUM(n_tok) AS BIGINT) AS stage_tokens,
             MIN(quality) AS min_quality, MAX(quality) AS max_quality
         FROM st GROUP BY stage ORDER BY stage""",
    // q145: floor(sqrt) weights are identical longs on both engines
    // (IEEE sqrt is correctly rounded), quotas are pure integer
    // arithmetic, selection replays the portable md5 bucket
    "q145_temperature_mix" ->
      """WITH c AS (SELECT source, COUNT(*) AS n_total,
             CAST(FLOOR(SQRT(CAST(COUNT(*) AS DOUBLE))) AS BIGINT)
               AS weight
           FROM documents GROUP BY 1),
         w AS (SELECT CAST(SUM(weight) AS BIGINT) AS tw FROM c),
         q AS (SELECT source, n_total, weight,
             (2000 * weight) // tw AS quota FROM c, w),
         b AS (SELECT d.source,
             CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)
               AS BIGINT) % 10000 AS bkt,
             q.n_total, q.quota
           FROM documents d JOIN q USING (source)),
         k AS (SELECT source, COUNT(*) AS n_kept FROM b
           WHERE bkt * n_total < quota * 10000 GROUP BY 1)
         SELECT q.source, q.n_total, q.weight,
             CAST(q.quota AS BIGINT) AS quota,
             COALESCE(k.n_kept, 0) AS n_kept
         FROM q LEFT JOIN k USING (source)
         ORDER BY q.source""",
    // q146: the melt replayed as three UNION ALL legs (engine-portable
    // UNPIVOT), same DECIMAL-before-sum money discipline as q74
    "q146_unpivot" ->
      """WITH w AS (SELECT l_returnflag,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
               AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
               AS sum_price,
             CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE)
               AS sum_disc
           FROM lineitem GROUP BY 1)
         SELECT l_returnflag, measure, value FROM (
           SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value
             FROM w
           UNION ALL
           SELECT l_returnflag, 'sum_price', sum_price FROM w
           UNION ALL
           SELECT l_returnflag, 'sum_disc', sum_disc FROM w) u
         ORDER BY l_returnflag, measure""",
    // q147: the UNCAPPED full inverted-index R⋈S join (q134's oracle
    // split across the arrival/history halves) — green IS the
    // zero-false-negative proof for the cross-corpus prefix filter
    "q147_cross_setsim" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
                     FROM documents),
         g AS (SELECT doc_id, unnest(list_distinct(list_transform(
                 range(1, greatest(len(t) - 2, 1) + 1),
                 i -> array_to_string(t[i:i+2], ' ')))) AS gram
               FROM toks),
         gr AS (SELECT doc_id, gram FROM g WHERE doc_id % 5 = 0),
         gs AS (SELECT doc_id, gram FROM g WHERE doc_id % 5 <> 0),
         nr AS (SELECT doc_id, COUNT(*) AS n FROM gr GROUP BY 1),
         ns AS (SELECT doc_id, COUNT(*) AS n FROM gs GROUP BY 1),
         p AS (SELECT r.doc_id AS id_r, s.doc_id AS id_s,
                 COUNT(*) AS n_shared
               FROM gr r JOIN gs s ON r.gram = s.gram GROUP BY 1, 2)
         SELECT id_r, id_s, CAST(n_shared AS BIGINT) AS n_shared,
             CAST(n_shared AS DOUBLE)
               / CAST(x.n + y.n - n_shared AS DOUBLE) AS jaccard
         FROM p JOIN nr x ON p.id_r = x.doc_id
              JOIN ns y ON p.id_s = y.doc_id
         WHERE CAST(n_shared AS DOUBLE)
               / CAST(x.n + y.n - n_shared AS DOUBLE) >= 0.5
         ORDER BY id_r, id_s""",
    // q148: q110's whole-corpus screen (paragraph md5 ∩ eval fps) —
    // what the streamed per-batch screening must reproduce exactly
    "q148_stream_contamination" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
                       FROM documents),
         p AS (SELECT doc_id,
             trim(array_to_string(t[((i-1)*20+1):((i-1)*20+20)], ' '))
               AS para
           FROM toks, unnest(range(1,
             greatest(CAST(ceil(len(t) / 20.0) AS BIGINT), 1) + 1)) u(i)),
         np AS (SELECT doc_id, md5(nfc_normalize(para)) AS fp FROM p WHERE para <> ''),
         ev AS (SELECT DISTINCT fp FROM np WHERE doc_id % 17 = 0),
         co AS (SELECT DISTINCT doc_id, fp FROM np WHERE doc_id % 17 <> 0),
         h AS (SELECT doc_id, COUNT(*) AS n_hit_paras FROM co
               WHERE fp IN (SELECT fp FROM ev) GROUP BY 1)
         SELECT doc_id, CAST(n_hit_paras AS BIGINT) AS n_hit_paras
         FROM h ORDER BY doc_id""",
    // q149: per-user lag windows — DuckDB's window semantics match
    // Spark's exactly here (full tiebreak on (ts_ms, event_id))
    "q149_seq_examples" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) // 1000 AS ts_ms FROM events),
         l AS (SELECT event_type,
             lag(event_type, 3) OVER w AS ctx1,
             lag(event_type, 2) OVER w AS ctx2,
             lag(event_type, 1) OVER w AS ctx3
           FROM e WINDOW w AS (PARTITION BY user_id
                               ORDER BY ts_ms, event_id))
         SELECT ctx1, ctx2, ctx3, event_type AS label,
             CAST(COUNT(*) AS BIGINT) AS n_examples
         FROM l WHERE ctx1 IS NOT NULL GROUP BY 1, 2, 3, 4
         ORDER BY n_examples DESC, ctx1, ctx2, ctx3, label LIMIT 20""",
    // q150: the oracle mirrors the rank as a per-stratum row_number over
    // the same (md5, doc_id) order — proving the prefix-sum-minus-offset
    // rank ≡ the windowed rank it replaces at scale
    "q150_exact_split" ->
      """WITH h AS (SELECT doc_id, source,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
               AS BIGINT) AS hv
           FROM documents),
         r AS (SELECT source,
             row_number() OVER (PARTITION BY source ORDER BY hv, doc_id)
               - 1 AS rk,
             COUNT(*) OVER (PARTITION BY source) AS n
           FROM h)
         SELECT source,
             CASE WHEN rk * 10 < n * 8 THEN 'train'
                  WHEN rk * 10 < n * 9 THEN 'val'
                  ELSE 'test' END AS split,
             CAST(COUNT(*) AS BIGINT) AS n_docs
         FROM r GROUP BY 1, 2 ORDER BY source, split""",
    // q151: rank replayed as a per-stratum row_number over the same
    // (quality, doc_id) order — prefix-sum-minus-offset ≡ windowed rank
    "q151_quality_deciles" ->
      s"""$qualityScoredCtes,
         r AS (SELECT source, quality,
             row_number() OVER (PARTITION BY source
                                ORDER BY quality, doc_id) - 1 AS rk,
             COUNT(*) OVER (PARTITION BY source) AS n
           FROM sc)
         SELECT source, CAST(rk * 10 // n AS BIGINT) AS decile,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             MIN(quality) AS q_min, MAX(quality) AS q_max
         FROM r GROUP BY 1, 2 ORDER BY source, decile""",
    // q152: the oracle is the FULL O(n²) levenshtein join — green is
    // the zero-false-negative proof for the deletion neighborhood
    "q152_fuzzy_names" ->
      """SELECT a.s_name AS name_a, b.s_name AS name_b,
             CAST(levenshtein(a.s_name, b.s_name) AS BIGINT) AS dist
         FROM supplier a JOIN supplier b ON a.s_name < b.s_name
         WHERE levenshtein(a.s_name, b.s_name) <= 1
         ORDER BY name_a, name_b""",
    "q153_epoch_upsample" ->
      """WITH c AS (SELECT source, COUNT(*) AS n FROM documents
                    GROUP BY 1),
         mx AS (SELECT MAX(n) AS nmax FROM c),
         f AS (SELECT source, least(nmax * 1000 // n, 1000 * 3) AS m
               FROM c, mx),
         k AS (SELECT d.doc_id, d.source,
             CAST(f.m // 1000
               + CASE WHEN CAST('0x' || substr(md5(CAST(d.doc_id
                     AS VARCHAR)), 1, 8) AS BIGINT) % 1000 < f.m % 1000
                 THEN 1 ELSE 0 END AS BIGINT) AS n_copies
           FROM documents d JOIN f ON d.source = f.source),
         e AS (SELECT k.source, k.n_copies, k.doc_id
               FROM k, unnest(range(1, k.n_copies + 1)) u(i))
         SELECT source, n_copies,
             CAST(COUNT(*) AS BIGINT) AS n_rows_out,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
         FROM e GROUP BY 1, 2 ORDER BY source, n_copies""",
    // q154: predicted (Σ cnt²) AND actual join count both replayed —
    // green proves the preflight is exact
    "q154_join_preflight" ->
      """WITH pk AS (SELECT l_partkey, COUNT(*) AS cnt FROM lineitem
                     GROUP BY 1),
         p AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(SUM(cnt * cnt) AS BIGINT) AS predicted_rows
           FROM pk),
         tk AS (SELECT l_partkey AS top_key,
             CAST(cnt AS BIGINT) AS top_key_rows
           FROM pk ORDER BY cnt DESC, l_partkey DESC LIMIT 1),
         a AS (SELECT CAST(COUNT(*) AS BIGINT) AS actual_rows
           FROM lineitem x JOIN lineitem y
             ON x.l_partkey = y.l_partkey)
         SELECT n_keys, predicted_rows, top_key, top_key_rows,
             actual_rows
         FROM p, tk, a""",
    "q155_key_skew" ->
      """WITH pp AS (SELECT l_partkey AS k, COUNT(*) AS cnt
                     FROM lineitem GROUP BY 1),
         sp AS (SELECT l_suppkey AS k, COUNT(*) AS cnt
                FROM lineitem GROUP BY 1),
         a AS (SELECT 'l_partkey' AS key_col,
             CAST(SUM(cnt) AS BIGINT) AS n_rows,
             CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(MAX(cnt) * 10000 // SUM(cnt) AS BIGINT)
               AS top1_share_bp,
             CAST(MAX(cnt) * COUNT(*) * 100 // SUM(cnt) AS BIGINT)
               AS max_over_mean_x100
           FROM pp),
         b AS (SELECT 'l_suppkey' AS key_col,
             CAST(SUM(cnt) AS BIGINT) AS n_rows,
             CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(MAX(cnt) * 10000 // SUM(cnt) AS BIGINT)
               AS top1_share_bp,
             CAST(MAX(cnt) * COUNT(*) * 100 // SUM(cnt) AS BIGINT)
               AS max_over_mean_x100
           FROM sp)
         SELECT * FROM a UNION ALL SELECT * FROM b
         ORDER BY key_col""",
    "q156_fk_audit" ->
      """WITH e AS (
           SELECT 'customer.c_nationkey->nation' AS edge,
             (SELECT COUNT(*) FROM customer) AS n_child_rows,
             (SELECT COUNT(*) FROM customer WHERE c_nationkey NOT IN
               (SELECT n_nationkey FROM nation)) AS n_orphan_rows,
             (SELECT COUNT(*) FROM nation) AS n_parents,
             (SELECT COUNT(*) FROM nation WHERE n_nationkey NOT IN
               (SELECT c_nationkey FROM customer)) AS n_unref_parents
           UNION ALL
           SELECT 'lineitem.l_orderkey->orders',
             (SELECT COUNT(*) FROM lineitem),
             (SELECT COUNT(*) FROM lineitem WHERE l_orderkey NOT IN
               (SELECT o_orderkey FROM orders)),
             (SELECT COUNT(*) FROM orders),
             (SELECT COUNT(*) FROM orders WHERE o_orderkey NOT IN
               (SELECT l_orderkey FROM lineitem))
           UNION ALL
           SELECT 'lineitem.l_suppkey->supplier',
             (SELECT COUNT(*) FROM lineitem),
             (SELECT COUNT(*) FROM lineitem WHERE l_suppkey NOT IN
               (SELECT s_suppkey FROM supplier)),
             (SELECT COUNT(*) FROM supplier),
             (SELECT COUNT(*) FROM supplier WHERE s_suppkey NOT IN
               (SELECT l_suppkey FROM lineitem))
           UNION ALL
           SELECT 'orders.o_custkey->customer',
             (SELECT COUNT(*) FROM orders),
             (SELECT COUNT(*) FROM orders WHERE o_custkey NOT IN
               (SELECT c_custkey FROM customer)),
             (SELECT COUNT(*) FROM customer),
             (SELECT COUNT(*) FROM customer WHERE c_custkey NOT IN
               (SELECT o_custkey FROM orders)))
         SELECT edge, CAST(n_child_rows AS BIGINT) AS n_child_rows,
             CAST(n_orphan_rows AS BIGINT) AS n_orphan_rows,
             CAST(n_parents AS BIGINT) AS n_parents,
             CAST(n_unref_parents AS BIGINT) AS n_unref_parents
         FROM e ORDER BY edge""",
    "q157_bitset_distinct" ->
      """WITH d AS (SELECT event_type,
             row_number() OVER (ORDER BY event_type) - 1 AS ord
           FROM (SELECT DISTINCT event_type FROM events)),
         m AS (SELECT e.user_id,
             epoch_us(CAST(e.ts AS TIMESTAMP)) // 1000 // 86400000
               AS day,
             bit_or(CAST(1 AS BIGINT) << d.ord) AS type_mask
           FROM events e JOIN d USING (event_type) GROUP BY 1, 2)
         SELECT type_mask,
             CAST(bit_count(type_mask) AS BIGINT) AS n_types,
             CAST(COUNT(*) AS BIGINT) AS n_user_days
         FROM m GROUP BY 1 ORDER BY type_mask""",
    "q158_event_runs" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) // 1000 AS ts_ms
           FROM events),
         r AS (SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts_ms, event_id)
               - row_number() OVER (PARTITION BY user_id, event_type
                                    ORDER BY ts_ms, event_id) AS grp
           FROM e),
         runs AS (SELECT user_id, event_type, grp,
             CAST(COUNT(*) AS BIGINT) AS run_len
           FROM r GROUP BY 1, 2, 3)
         SELECT event_type, run_len,
             CAST(COUNT(*) AS BIGINT) AS n_runs
         FROM runs GROUP BY 1, 2 ORDER BY event_type, run_len""",
    "q159_time_weighted_avg" ->
      """WITH e AS (SELECT user_id, event_id, event_type, value,
             epoch_us(CAST(ts AS TIMESTAMP)) // 1000 AS ts_ms
           FROM events),
         g AS (SELECT event_type,
             CAST(floor(value * 1000) AS BIGINT) AS vq,
             lead(ts_ms) OVER (PARTITION BY user_id
                               ORDER BY ts_ms, event_id) - ts_ms AS dur
           FROM e)
         SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_held,
             CAST(SUM(dur) AS BIGINT) AS total_held_ms,
             CAST(SUM(vq * dur) // SUM(dur) AS BIGINT) AS twap_mq
         FROM g WHERE dur IS NOT NULL
         GROUP BY 1 ORDER BY event_type""",
    "q160_cdc_merge" ->
      """WITH o AS (SELECT o_orderkey, o_orderstatus,
             CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders),
         snap AS (SELECT * FROM o WHERE o_orderkey % 10 < 8),
         feed AS (SELECT o_orderkey, o_orderstatus,
             (cents * 110) // 100 AS cents,
             CASE WHEN o_orderkey % 3 = 0 THEN 'D' ELSE 'U' END AS op
           FROM o WHERE o_orderkey % 10 >= 6),
         m AS (SELECT COALESCE(f.o_orderkey, s.o_orderkey) AS k,
             COALESCE(f.o_orderstatus, s.o_orderstatus) AS o_orderstatus,
             COALESCE(f.cents, s.cents) AS cents,
             COALESCE(f.op, 'K') AS op
           FROM snap s FULL OUTER JOIN feed f
             ON s.o_orderkey = f.o_orderkey)
         SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(cents) AS BIGINT) AS total_cents
         FROM m WHERE op <> 'D'
         GROUP BY 1 ORDER BY o_orderstatus""",
    // q161: the STRUCTURALLY OPPOSITE implementation — explicit
    // validity intervals + a range join — proving the Spark side's
    // union-carry-forward computes interval containment exactly
    "q161_pit_join" ->
      """WITH e AS (SELECT user_id, event_id, event_type, value,
             epoch_us(CAST(ts AS TIMESTAMP)) // 1000 AS ms
           FROM events),
         st AS (SELECT user_id, ms, event_id,
             CAST(floor(value / 100) AS BIGINT) AS tier,
             lead(ms) OVER (PARTITION BY user_id
                            ORDER BY ms, event_id) AS to_ms
           FROM e WHERE event_type <> 'purchase'),
         f AS (SELECT user_id, ms,
             CAST(floor(value * 1000) AS BIGINT) AS vq
           FROM e WHERE event_type = 'purchase'),
         j AS (SELECT COALESCE(s.tier, -1) AS tier, f.vq
           FROM f LEFT JOIN st s
             ON f.user_id = s.user_id AND s.ms < f.ms
                AND (s.to_ms IS NULL OR f.ms <= s.to_ms))
         SELECT tier, CAST(COUNT(*) AS BIGINT) AS n_purchases,
             CAST(SUM(vq) AS BIGINT) AS sum_vq
         FROM j GROUP BY 1 ORDER BY tier""",
    "q162_rrf_fusion" ->
      s"""$qualityScoredCtes,
         bl AS (SELECT doc_id, row_number() OVER
               (ORDER BY n_chars DESC, doc_id) AS rank
             FROM documents ORDER BY n_chars DESC, doc_id LIMIT 20),
         bq AS (SELECT doc_id, row_number() OVER
               (ORDER BY quality DESC, doc_id) AS rank
             FROM sc ORDER BY quality DESC, doc_id LIMIT 20),
         u AS (SELECT doc_id, 1000000 // (60 + rank) AS rrf FROM bl
               UNION ALL
               SELECT doc_id, 1000000 // (60 + rank) AS rrf FROM bq)
         SELECT doc_id, CAST(SUM(rrf) AS BIGINT) AS rrf_score,
             CAST(COUNT(*) AS BIGINT) AS n_lists
         FROM u GROUP BY 1
         ORDER BY rrf_score DESC, doc_id LIMIT 10""",
    "q163_dynamic_pruning" ->
      """WITH e AS (SELECT event_id, event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) // 1000 // 86400000 AS day,
             CAST(floor(value * 1000) AS BIGINT) AS vq
           FROM events),
         busiest AS (SELECT day FROM e WHERE event_type = 'purchase'
           GROUP BY day ORDER BY COUNT(*) DESC, day ASC LIMIT 5)
         SELECT e.day, CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(e.vq) AS BIGINT) AS sum_vq
         FROM e JOIN busiest b ON e.day = b.day
         GROUP BY 1 ORDER BY e.day""",
    // q164: the q112 sketch discipline — exact counts replayed, the
    // in-engine sketch-algebra assertions ride as TRUE literals
    "q164_sketch_rollup" ->
      """SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 1000 // 86400000 // 7
             AS week,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS merge_within_1pct, TRUE AS within_3rsd
         FROM events GROUP BY 1 ORDER BY week""",
    "q165_setops_all" ->
      """WITH a AS (SELECT user_id, event_type FROM events
                    WHERE value >= 100),
         b AS (SELECT user_id, event_type FROM events
               WHERE value < 400),
         ex AS (SELECT event_type, COUNT(*) AS n_except_all
           FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
           GROUP BY 1),
         ia AS (SELECT event_type, COUNT(*) AS n_intersect_all
           FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
           GROUP BY 1),
         ks AS (SELECT event_type FROM ex
                UNION SELECT event_type FROM ia)
         SELECT ks.event_type,
             CAST(COALESCE(ex.n_except_all, 0) AS BIGINT)
               AS n_except_all,
             CAST(COALESCE(ia.n_intersect_all, 0) AS BIGINT)
               AS n_intersect_all
         FROM ks LEFT JOIN ex ON ks.event_type = ex.event_type
              LEFT JOIN ia ON ks.event_type = ia.event_type
         ORDER BY ks.event_type""",
    "q166_bucket_pruning" ->
      """WITH k AS (SELECT MAX(l_orderkey) AS key FROM lineitem)
         SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_items,
             CAST(SUM(CAST(floor(l_quantity * 100) AS BIGINT))
               AS BIGINT) AS qty_centi
         FROM lineitem, k WHERE l_orderkey = k.key GROUP BY 1""",
    // q167: q83's batch sessionization (same ≥-gap break rule)
    // restricted to sessions CLOSED before the final watermark —
    // last event + 30 min gap behind max(ts) − 1 h delay
    "q167_stream_session_window" ->
      """WITH e AS (SELECT user_id, event_id,
             epoch_us(CAST(ts AS TIMESTAMP)) // 1000 AS ms FROM events),
         mx AS (SELECT MAX(ms) AS max_ms FROM e),
         g AS (SELECT user_id, ms, event_id,
             CASE WHEN lag(ms) OVER w IS NULL
                    OR ms - lag(ms) OVER w >= 1800000
                  THEN 1 ELSE 0 END AS ns
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
         s AS (SELECT user_id, ms, SUM(ns) OVER
             (PARTITION BY user_id ORDER BY ms, event_id
              ROWS UNBOUNDED PRECEDING) AS session_idx
           FROM g),
         ses AS (SELECT user_id, MIN(ms) AS session_start_ms,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             MAX(ms) AS last_ms
           FROM s GROUP BY user_id, session_idx)
         SELECT session_start_ms, user_id, n_events
         FROM ses, mx
         WHERE last_ms + 1800000 <= max_ms - 3600000
         ORDER BY session_start_ms, user_id""",
    "q168_exchange_reuse" ->
      """WITH cell AS (SELECT source, lang, COUNT(*) AS n_docs
                       FROM documents GROUP BY 1, 2),
         tot AS (SELECT source, SUM(n_docs) AS tot FROM cell
                 GROUP BY 1)
         SELECT cell.source, lang, CAST(n_docs AS BIGINT) AS n_docs,
             CAST(n_docs * 10000 // tot AS BIGINT) AS share_bp
         FROM cell JOIN tot ON cell.source = tot.source
         ORDER BY cell.source, lang""",
    // q169: min=1 / max=n / sum=n(n+1)/2 per phase IS the gap-free +
    // continuation proof
    "q169_incremental_ids" ->
      """WITH d AS (SELECT doc_id,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
               AS BIGINT) AS h
           FROM documents),
         hist AS (SELECT doc_id,
             row_number() OVER (ORDER BY h, doc_id) AS sid
           FROM d WHERE doc_id % 10 < 8),
         mx AS (SELECT MAX(sid) AS m FROM hist),
         arr AS (SELECT doc_id,
             row_number() OVER (ORDER BY h, doc_id) + m AS sid
           FROM d, mx WHERE doc_id % 10 >= 8),
         u AS (SELECT 'history' AS phase, sid FROM hist
               UNION ALL SELECT 'arrival', sid FROM arr)
         SELECT phase, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(MIN(sid) AS BIGINT) AS min_id,
             CAST(MAX(sid) AS BIGINT) AS max_id,
             CAST(SUM(sid) AS BIGINT) AS id_sum
         FROM u GROUP BY 1 ORDER BY phase""",
    "q170_set_digest" ->
      """WITH d AS (SELECT doc_id,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':'
               || md5(text)), 1, 8) AS BIGINT) AS h
           FROM documents)
         SELECT CAST(COUNT(*) AS BIGINT) AS n_full,
             CAST(bit_xor(h) AS BIGINT) AS xor_full,
             CAST(SUM(h) AS BIGINT) AS sum_full,
             TRUE AS xor_composes, TRUE AS sum_composes,
             TRUE AS xor_deletes
         FROM d""",
    "q171_gini" ->
      """WITH c AS (SELECT user_id, COUNT(*) AS x FROM events
                    GROUP BY 1),
         r AS (SELECT x,
             row_number() OVER (ORDER BY x, user_id) AS i FROM c),
         a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(x) AS BIGINT) AS total_events,
             CAST(SUM(i * x) AS BIGINT) AS ix
           FROM r)
         SELECT n_users, total_events,
             CAST(((2 * ix - (n_users + 1) * total_events) * 1000)
               // (n_users * total_events) AS BIGINT) AS gini_milli
         FROM a""",
    // q172: full O(|A|·|H|) levenshtein join — green is the
    // zero-false-negative proof for the streamed deletion index
    "q172_stream_fuzzy_names" ->
      """SELECT a.s_name AS arr_name, h.s_name AS hist_name,
             CAST(levenshtein(a.s_name, h.s_name) AS BIGINT) AS dist
         FROM supplier a JOIN supplier h
           ON a.s_suppkey % 10 >= 8 AND h.s_suppkey % 10 < 8
              AND levenshtein(a.s_name, h.s_name) <= 1
         ORDER BY arr_name, hist_name""",
    // q173: BFS levels unrolled as CTE rounds — NOT IN the union of
    // prior levels IS the first-visit rule
    "q173_bfs_levels" ->
      """WITH e0 AS (SELECT DISTINCT o_custkey * 2 AS src,
             l_suppkey * 2 + 1 AS dst
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         e AS (SELECT src, dst FROM e0
               UNION ALL SELECT dst, src FROM e0),
         nodes AS (SELECT DISTINCT src AS node FROM e),
         l0 AS (SELECT n.node FROM nodes n
           JOIN customer c ON n.node = c.c_custkey * 2
           WHERE c.c_nationkey = 0),
         l1 AS (SELECT DISTINCT e.dst AS node
           FROM e JOIN l0 ON e.src = l0.node
           WHERE e.dst NOT IN (SELECT node FROM l0)),
         l2 AS (SELECT DISTINCT e.dst AS node
           FROM e JOIN l1 ON e.src = l1.node
           WHERE e.dst NOT IN (SELECT node FROM l0
             UNION ALL SELECT node FROM l1)),
         l3 AS (SELECT DISTINCT e.dst AS node
           FROM e JOIN l2 ON e.src = l2.node
           WHERE e.dst NOT IN (SELECT node FROM l0
             UNION ALL SELECT node FROM l1
             UNION ALL SELECT node FROM l2)),
         lv AS (SELECT 0 AS level, node FROM l0
           UNION ALL SELECT 1, node FROM l1
           UNION ALL SELECT 2, node FROM l2
           UNION ALL SELECT 3, node FROM l3),
         allv AS (SELECT * FROM lv
           UNION ALL SELECT -1 AS level, node FROM nodes
             WHERE node NOT IN (SELECT node FROM lv))
         SELECT CAST(level AS BIGINT) AS level,
             CAST(COUNT(*) AS BIGINT) AS n_nodes,
             CAST(SUM(node // 2) AS BIGINT) AS key_sum,
             CAST(SUM(CASE WHEN node % 2 = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_customers
         FROM allv GROUP BY 1 ORDER BY level""",
    // q174: the O(m^2) NOT-EXISTS dominance definition — green proves
    // the two-phase partition-skyline sweep is exactly the frontier
    "q174_skyline" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS t
           FROM documents),
         m AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS x,
             CAST(len(list_distinct(t)) * 10000 // len(t) AS BIGINT)
               AS y
           FROM d),
         p AS (SELECT x, y, COUNT(*) AS n_docs FROM m GROUP BY 1, 2),
         sk AS (SELECT * FROM p pp WHERE NOT EXISTS (SELECT 1 FROM p q
           WHERE q.x >= pp.x AND q.y >= pp.y
             AND (q.x > pp.x OR q.y > pp.y)))
         SELECT x AS n_tok, y AS uniq_bp,
             CAST(n_docs AS BIGINT) AS n_docs
         FROM sk ORDER BY n_tok DESC""",
    // q175: rank window replayed as row_number; candidate count must
    // equal n*w - w(w+1)/2 exactly
    "q175_snm_dedup" ->
      """WITH r AS (SELECT c_custkey AS id, c_name AS k,
             row_number() OVER (ORDER BY c_name, c_custkey) AS rk
           FROM customer),
         cand AS (SELECT a.id AS id_a, a.k AS ka, b.id AS id_b,
             b.k AS kb
           FROM r a JOIN r b ON b.rk > a.rk AND b.rk <= a.rk + 3),
         m AS (SELECT * FROM cand WHERE levenshtein(ka, kb) <= 1)
         SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM cand)
               AS n_candidates,
             CAST(COUNT(*) AS BIGINT) AS n_matches,
             CAST(COALESCE(SUM(id_a), 0) AS BIGINT) AS sum_a,
             CAST(COALESCE(SUM(id_b), 0) AS BIGINT) AS sum_b
         FROM m""",
    // q176: the window row_number form the bounded aggregator replaces
    "q176_topk_agg" ->
      """WITH li AS (SELECT l_suppkey,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
               AS BIGINT) AS cents,
             l_orderkey * 10 + l_linenumber AS lid
           FROM lineitem),
         rk AS (SELECT l_suppkey, cents, lid,
             row_number() OVER (PARTITION BY l_suppkey
               ORDER BY cents DESC, lid) AS rank
           FROM li)
         SELECT l_suppkey, CAST(rank AS BIGINT) AS rank, cents,
             CAST(lid AS BIGINT) AS item_id
         FROM rk WHERE rank <= 3 ORDER BY l_suppkey, rank""",
    // q177: the oracle generates the window pairs the structurally
    // opposite way — a positional self-join over unnested tokens —
    // so green proves the scan-local nested-transform expression
    // equals the join definition of "within ±2 positions".
    "q177_skipgram_pairs" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
                       FROM documents),
         tok AS (SELECT doc_id, i, t[i] AS tk
           FROM toks, unnest(range(1, len(t) + 1)) u(i)),
         p AS (SELECT least(a.tk, b.tk) AS w1,
             greatest(a.tk, b.tk) AS w2
           FROM tok a JOIN tok b ON a.doc_id = b.doc_id
             AND b.i >= a.i + 1 AND b.i <= a.i + 2)
         SELECT w1, w2, COUNT(*) AS n_cooc FROM p GROUP BY 1, 2
         ORDER BY n_cooc DESC, w1, w2 LIMIT 30""",
    // q178: full Bellman–Ford unrolled to 4 union+min rounds — what
    // the delta relaxation must equal at the same depth; -1 sentinels
    // (unreached bucket, its min/max) keep every column int64 with no
    // NULL-driven float64 widening (the q92 coalesce discipline).
    "q178_weighted_paths" ->
      """WITH e0 AS (SELECT o_custkey * 2 AS src,
             l_suppkey * 2 + 1 AS dst,
             CAST(floor(MIN(l_quantity)) AS BIGINT) AS w
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           GROUP BY 1, 2),
         e AS (SELECT src, dst, w FROM e0
               UNION ALL SELECT dst, src, w FROM e0),
         nodes AS (SELECT DISTINCT src AS node FROM e),
         seeds AS (SELECT n.node FROM nodes n
           JOIN customer c ON n.node = c.c_custkey * 2
           WHERE c.c_nationkey = 0),
         d0 AS (SELECT node, CAST(0 AS BIGINT) AS dist FROM seeds),
         d1 AS (SELECT node, MIN(c) AS dist FROM (
             SELECT node, dist AS c FROM d0
             UNION ALL SELECT e.dst, d0.dist + e.w
               FROM e JOIN d0 ON e.src = d0.node) GROUP BY 1),
         d2 AS (SELECT node, MIN(c) AS dist FROM (
             SELECT node, dist AS c FROM d1
             UNION ALL SELECT e.dst, d1.dist + e.w
               FROM e JOIN d1 ON e.src = d1.node) GROUP BY 1),
         d3 AS (SELECT node, MIN(c) AS dist FROM (
             SELECT node, dist AS c FROM d2
             UNION ALL SELECT e.dst, d2.dist + e.w
               FROM e JOIN d2 ON e.src = d2.node) GROUP BY 1),
         d4 AS (SELECT node, MIN(c) AS dist FROM (
             SELECT node, dist AS c FROM d3
             UNION ALL SELECT e.dst, d3.dist + e.w
               FROM e JOIN d3 ON e.src = d3.node) GROUP BY 1),
         j AS (SELECT n.node,
             COALESCE(d4.dist, CAST(-1 AS BIGINT)) AS dist
           FROM nodes n LEFT JOIN d4 ON n.node = d4.node)
         SELECT dist, COUNT(*) AS n_nodes,
           CAST(SUM(node // 2) AS BIGINT) AS key_sum,
           CAST(SUM(CASE WHEN node % 2 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_customers
         FROM j GROUP BY 1 ORDER BY dist""",
    // q179: abs-then-div keeps the basis-point deviation away from
    // signed integer division entirely (both engines truncate — q181
    // measured it — but portability surfaces shouldn't depend on
    // that); the lower median is the exact rank pick rn=(n+1)//2
    // under the full (n_events, day) tiebreak.
    "q179_seasonal_anomaly" ->
      """WITH cells AS (SELECT event_type,
             CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)
               AS day,
             CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS hr,
             COUNT(*) AS n_events
           FROM events GROUP BY 1, 2, 3),
         rk AS (SELECT event_type, hr, day, n_events,
             row_number() OVER (PARTITION BY event_type, hr
               ORDER BY n_events, day) AS rn,
             COUNT(*) OVER (PARTITION BY event_type, hr) AS nc
           FROM cells),
         med AS (SELECT event_type, hr, n_events AS med_baseline
           FROM rk WHERE rn = (nc + 1) // 2)
         SELECT c.event_type, c.day, c.hr, c.n_events, m.med_baseline,
             abs(c.n_events - m.med_baseline) * 10000 // m.med_baseline
               AS dev_bp,
             c.n_events > m.med_baseline AS above
         FROM cells c JOIN med m
           ON c.event_type = m.event_type AND c.hr = m.hr
         WHERE abs(c.n_events - m.med_baseline) * 10000
           // m.med_baseline >= 2500
         ORDER BY c.event_type, c.day, c.hr""",
  )
}
