package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expressions.LongDot
import graft.functions.{QuantizedCentroid, TextFns, TopK}
import graft.ops.{Audio, Video, Bfs, Blooms, Bpe, Cardinality, CharLm, Classifier, Cogrouped, Contamination, Dedup, DedupClusters, DenseId, Drift, Dsir, FreqSketch, FuzzyJoin, GapFill, JoinEstimate, KCenter, KCore, KMeans, Mixing, ModelStore, Multimodal, NearDup, Nested, Packing, PageRank, ParagraphDedup, Paths, Percentiles, PhraseExcise, ProductQuant, Salting, Sampling, Scd, Selection, Sessionize, Sharding, SetSimJoin, Similarity, Skyline, Snm, SpanDedup, TableDiff, TCloseness, Triangles, Winnowing}
import graft.streaming.{BudgetAdmission, EventStream, IncrementalClusters, NearDupIndex, RateMonitor, SemanticDedupScreen, StatefulSessions, VersionedStore}

/** Training-data-pipeline operators (SURVEY §7.2.8) as driver-contract
  * queries: text analysis, exact + near dedup (MinHash/LSH, SimHash,
  * n-gram Jaccard, embedding-cosine), similarity search (brute-force and
  * LSH ANN), multimodal plumbing, streaming windows, sessionization.
  *
  * Every query is deterministic and every number is reproducible in
  * ANSI SQL (md5-based hashing, integer-quantized vector math, explicit
  * tiebreaks) — see the oracle entries. Merged into [[SparkEntry]].
  */
object TrainQueries {
  import TrainQueriesCore._
  import TrainQueriesCuration._
  import TrainQueriesMedia._

  // ---------------------------------------------------------------------
  // Contract maps
  // ---------------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q21_text_stats" -> (qTextStats _),
    "q22_lang_id" -> (qLangId _),
    "q23_fingerprint" -> (qFingerprint _),
    "q24_dedup_exact" -> (qDedupExact _),
    "q25_minhash_lsh" -> (qMinHashLsh _),
    "q26_simhash" -> (qSimHash _),
    "q27_simhash_knn" -> (qSimHashKnn _),
    "q28_cosine_topk" -> (qCosineTopK _),
    "q29_cosine_lsh" -> (qCosineLsh _),
    "q30_multimodal" -> (qMultimodal _),
    "q31_stream_window" -> (qStreamWindow _),
    "q32_sessionize" -> (qSessionize _),
    "q33_cosine_neardup" -> (qCosineNearDup _),
    "q34_salted_join" -> (qSaltedJoin _),
    "q35_stream_sessionize" -> (qStreamSessionize _),
    "q36_embed_centroids" -> (qEmbedCentroids _),
    "q37_ivf_topk" -> (qIvfTopK _),
    "q38_rollup" -> (qRollup _),
    "q39_frame_sample" -> (qFrameSample _),
    "q40_json_roundtrip" -> (qJsonRoundtrip _),
    "q41_bucketed_join" -> (qBucketedJoin _),
    "q42_pivot" -> (qPivot _),
    "q43_stats_moments" -> (qStatsMoments _),
    "q44_histogram" -> (qHistogram _),
    "q45_curation_pipeline" -> (qCurationPipeline _),
    "q46_hash_split" -> (qHashSplit _),
    "q47_percentiles" -> (qPercentiles _),
    "q48_date_dim" -> (qDateDim _),
    "q49_asof_join" -> (qAsofJoin _),
    "q50_stream_dedup" -> ((s: SparkSession, dir: String) =>
      EventStream.streamDedup(s, s"$dir/events.parquet")),
    "q51_ann_recall" -> (qAnnRecall _),
    "q52_pii_scrub" -> (qPiiScrub _),
    "q53_contamination" -> (qContamination _),
    "q54_stratified_sample" -> (qStratifiedSample _),
    "q55_repetition_filter" -> (qRepetitionFilter _),
    "q56_lsh_multiprobe_recall" -> (qLshMultiProbeRecall _),
    "q57_stream_stream_join" -> ((s: SparkSession, dir: String) =>
      EventStream.clickAttribution(s, s"$dir/events.parquet")),
    "q58_stream_sink" -> ((s: SparkSession, dir: String) =>
      EventStream.windowedCountsToParquet(s, s"$dir/events.parquet")),
    "q59_ivf_multiprobe_recall" -> (qIvfMultiProbeRecall _),
    "q60_range_shard" -> (qRangeShard _),
    "q61_resize" -> (qResize _),
    "q62_csv_roundtrip" -> (qCsvRoundtrip _),
    "q63_orc_roundtrip" -> (qOrcRoundtrip _),
    "q64_ngram_jaccard" -> (qNgramJaccard _),
    "q65_top_bigrams" -> (qTopBigrams _),
    "q66_event_lag" -> (qEventLag _),
    "q67_incremental_dedup" -> (qIncrementalDedup _),
    "q68_bpe_tokens" -> (qBpeTokens _),
    "q69_schema_merge" -> (qSchemaMerge _),
    "q70_interval_join" -> (qIntervalJoin _),
    "q71_dedup_clusters" -> (qDedupClusters _),
    "q72_chunking" -> (qChunking _),
    "q73_seq_packing" -> (qSeqPacking _),
    "q74_cube" -> (qCube _),
    "q75_window_dist" -> (qWindowDist _),
    "q76_int8_quant" -> (qInt8Quant _),
    "q77_upsert" -> (qUpsert _),
    "q78_quality_gate" -> (qQualityGate _),
    "q79_profiler" -> (qProfiler _),
    "q80_event_transitions" -> (qEventTransitions _),
    "q81_tfidf" -> (qTfIdf _),
    "q82_binary_source" -> (qBinarySource _),
    "q83_session_window" -> (qSessionWindowBuiltin _),
    "q84_zorder" -> (qZOrder _),
    "q85_source_mix" -> (qSourceMix _),
    "q86_token_budget" -> (qTokenBudget _),
    "q87_kmeans" -> (qKMeans _),
    "q88_stream_static_join" -> ((s: SparkSession, dir: String) =>
      EventStream.streamStaticSegments(s, s"$dir/events.parquet",
        s"$dir/customer.parquet")),
    "q89_scd2" -> (qScd2 _),
    "q90_range_window" -> (qRangeWindow _),
    "q91_exact_k_sample" -> (qExactKSample _),
    "q92_table_diff" -> (qTableDiff _),
    "q93_winsorize" -> (qWinsorize _),
    "q94_zscore" -> (qZScore _),
    "q95_cogroup_asof" -> (qCogroupAsof _),
    "q96_argmax_agg" -> (qArgMax _),
    "q97_semantic_dedup" -> (qSemanticDedup _),
    "q98_shard_manifest" -> (qShardManifest _),
    "q99_cross_dedup" -> (qCrossDedup _),
    "q100_full_pipeline" -> (qFullPipeline _),
    "q101_paragraph_dedup" -> (qParagraphDedup _),
    "q102_hll_cardinality" -> (qHllCardinality _),
    "q103_cross_semantic_dedup" -> (qCrossSemanticDedup _),
    "q104_approx_percentile" -> (qApproxPercentile _),
    "q105_vocabulary" -> (qVocabulary _),
    "q106_source_drift" -> (qSourceDrift _),
    "q107_cluster_representative" -> (qClusterRepresentative _),
    "q108_incr_paragraph_dedup" -> (qIncrementalParagraphDedup _),
    "q109_heavy_hitters" -> (qHeavyHitters _),
    "q110_bloom_contamination" -> (qBloomContamination _),
    "q111_pps_sample" -> (qPpsSample _),
    "q112_stream_approx_users" -> (qStreamApproxUsers _),
    "q113_pq_ann" -> (qPqAnn _),
    "q114_stream_complete" -> (qStreamComplete _),
    "q115_ivf_pq" -> (qIvfPq _),
    "q116_bm25" -> (qBm25 _),
    "q117_boilerplate" -> (qBoilerplate _),
    "q118_pagerank" -> (qPageRank _),
    "q119_funnel" -> (qFunnel _),
    "q120_retention" -> (qRetention _),
    "q121_incr_rollup" -> (qIncrementalRollup _),
    "q122_stream_update" -> ((s: SparkSession, dir: String) =>
      EventStream.windowedCountsUpdate(s, s"$dir/events.parquet")),
    "q123_stream_outer_join" -> ((s: SparkSession, dir: String) =>
      EventStream.clickAttributionOuter(s, s"$dir/events.parquet")),
    "q124_star_join" -> (qStarJoin _),
    "q125_negative_sampling" -> (qNegativeSampling _),
    "q126_ewma_rates" -> (qEwmaRates _),
    "q127_copurchase" -> (qCoPurchase _),
    "q128_incr_clusters" -> (qIncrementalClusters _),
    "q129_stored_model_ann" -> (qStoredModelAnn _),
    "q130_stream_incr_clusters" -> (qStreamIncrClusters _),
    "q131_stream_neardup_index" -> (qStreamNearDupIndex _),
    "q132_group_split" -> (qGroupSplit _),
    "q133_triangles" -> (qTriangles _),
    "q134_setsim_join" -> (qSetSimJoin _),
    "q135_state_time_travel" -> (qStateTimeTravel _),
    "q136_incr_bm25" -> (qIncrBm25 _),
    "q137_stream_budget" -> ((s: SparkSession, dir: String) =>
      BudgetAdmission.run(s, s"$dir/documents.parquet",
        budget = 20000L, chunks = 3)),
    "q138_stream_ewma" -> (qStreamEwma _),
    "q139_kcore" -> (qKCore _),
    "q140_grouping_sets" -> (qGroupingSets _),
    "q141_mad_outliers" -> (qMadOutliers _),
    "q142_equidepth_bins" -> (qEquidepthBins _),
    "q143_trustrank" -> (qTrustRank _),
    "q144_curriculum" -> (qCurriculum _),
    "q145_temperature_mix" -> (qTemperatureMix _),
    "q146_unpivot" -> (qUnpivot _),
    "q147_cross_setsim" -> (qCrossSetSim _),
    "q148_stream_contamination" -> (qStreamContamination _),
    "q149_seq_examples" -> (qSeqExamples _),
    "q150_exact_split" -> (qExactSplit _),
    "q151_quality_deciles" -> (qSourceQualityDeciles _),
    "q152_fuzzy_names" -> (qFuzzyNames _),
    "q153_epoch_upsample" -> (qEpochUpsample _),
    "q154_join_preflight" -> (qJoinPreflight _),
    "q155_key_skew" -> (qKeySkewProfile _),
    "q156_fk_audit" -> (qFkAudit _),
    "q157_bitset_distinct" -> (qBitsetDistinct _),
    "q158_event_runs" -> (qEventRuns _),
    "q159_time_weighted_avg" -> (qTimeWeightedAvg _),
    "q160_cdc_merge" -> (qCdcMerge _),
    "q161_pit_join" -> (qPitJoin _),
    "q162_rrf_fusion" -> (qRrfFusion _),
    "q163_dynamic_pruning" -> (qDynamicPruning _),
    "q164_sketch_rollup" -> (qSketchRollup _),
    "q165_setops_all" -> (qSetopsAll _),
    "q166_bucket_pruning" -> (qBucketPruning _),
    "q167_stream_session_window" -> (qStreamSessionWindow _),
    "q168_exchange_reuse" -> (qExchangeReuse _),
    "q169_incremental_ids" -> (qIncrementalIds _),
    "q170_set_digest" -> (qSetDigest _),
    "q171_gini" -> (qGini _),
    "q172_stream_fuzzy_names" -> (qStreamFuzzyNames _),
    "q173_bfs_levels" -> (qBfsLevels _),
    "q174_skyline" -> (qSkyline _),
    "q175_snm_dedup" -> (qSnmDedup _),
    "q176_topk_agg" -> (qTopKAgg _),
    "q177_skipgram_pairs" -> (qSkipgramPairs _),
    "q178_weighted_paths" -> (qWeightedPaths _),
    "q179_seasonal_anomaly" -> (qSeasonalAnomaly _),
    "q180_kcenter" -> (qKCenter _),
    "q181_class_separation" -> (qClassSeparation _),
    "q182_interval_coverage" -> (qIntervalCoverage _),
    "q183_cross_source_matrix" -> (qCrossSourceMatrix _),
    "q184_gap_fill" -> (qGapFill _),
    "q185_stream_topk" -> (qStreamTopK _),
    "q186_fd_audit" -> (qFdAudit _),
    "q187_stream_skyline" -> (qStreamSkyline _),
    "q188_kmv_sketch" -> (qKmvSketch _),
    "q189_stored_bins" -> (qStoredBins _),
    "q190_group_trend" -> (qGroupTrend _),
    "q191_partition_repair" -> (qPartitionRepair _),
    "q192_lsh_tuning" -> (qLshTuning _),
    "q193_media_neardup" -> (qMediaNearDup _),
    "q194_datagen" -> (qDataGen _),
    "q195_interleave" -> (qInterleave _),
    "q196_multi_horizon" -> (qMultiHorizon _),
    "q197_cusum" -> (qCusum _),
    "q198_stale_pit" -> (qStalePitJoin _),
    "q199_weighted_median" -> (qWeightedMedian _),
    "q200_stream_cusum" -> (qStreamCusum _),
    "q201_refresh_pipeline" -> (qRefreshPipeline _),
    "q202_nested_explode" -> (qNestedExplode _),
    "q203_nested_prune" -> (qNestedPrune _),
    "q204_span_dedup" -> (qSpanDedup _),
    "q205_avro_roundtrip" -> (qAvroRoundtrip _),
    "q206_bpe_train" -> (qBpeTrain _),
    "q207_bpe_apply" -> (qBpeApply _),
    "q208_ppm_decode" -> (qPpmDecode _),
    "q209_nested_scan_agg" -> (qNestedScanAgg _),
    "q210_ppm_resize" -> (qPpmResize _),
    "q211_charlm_train" -> (qCharLmTrain _),
    "q212_charlm_score" -> (qCharLmScore _),
    "q213_stream_lm_screen" -> (qStreamLmScreen _),
    "q214_memorization_audit" -> (qMemorizationAudit _),
    "q215_pmi_collocations" -> (qPmiCollocations _),
    "q216_cluster_sizes" -> (qClusterSizes _),
    "q217_containment_pairs" -> (qContainmentPairs _),
    "q218_diversity_profile" -> (qDiversityProfile _),
    "q219_embargo_split" -> (qEmbargoSplit _),
    "q220_gram_novelty" -> (qGramNovelty _),
    "q221_signal_correlation" -> (qSignalCorrelation _),
    "q222_winnow_contamination" -> (qWinnowContamination _),
    "q223_stream_novelty" -> (qStreamNovelty _),
    "q224_row_diff" -> (qRowDiff _),
    "q225_join_size_estimate" -> (qJoinSizeEstimate _),
    "q226_hrw_sharding" -> (qHrwSharding _),
    "q227_k_anonymity" -> (qKAnonymity _),
    "q228_incr_join_estimate" -> (qIncrJoinEstimate _),
    "q229_span_excision" -> (qSpanExcision _),
    "q230_dsir_selection" -> (qDsirSelection _),
    "q231_hrw_two_level" -> (qHrwTwoLevel _),
    "q232_vocab_drift" -> (qVocabDrift _),
    "q233_pseudonymize" -> (qPseudonymize _),
    "q234_dict_tags" -> (qDictTags _),
    "q235_epoch_order" -> (qEpochOrder _),
    "q236_source_hhi" -> (qSourceHhi _),
    "q237_split_leakage" -> (qSplitLeakage _),
    "q238_length_buckets" -> (qLengthBuckets _),
    "q239_epoch_schedule" -> (qEpochSchedule _),
    "q240_l_diversity" -> (qLDiversity _),
    "q241_session_paths" -> (qSessionPaths _),
    "q242_norm_decontam" -> (qNormDecontam _),
    "q243_dedup_weighted_sample" -> (qDedupWeightedSample _),
    "q244_tokenizer_fertility" -> (qTokenizerFertility _),
    "q245_luhn_screen" -> (qLuhnScreen _),
    "q246_phrase_excise" -> (qPhraseExcise _),
    "q247_mixed_lang_audit" -> (qMixedLangAudit _),
    "q248_tombstone_screen" -> (qTombstoneScreen _),
    "q249_budget_remix" -> (qBudgetRemix _),
    "q250_stopword_discovery" -> (qStopwordDiscovery _),
    "q251_png_decode" -> (qPngDecode _),
    "q252_png_blockhash" -> (qPngBlockhash _),
    "q253_shard_stitch" -> (qShardStitch _),
    "q254_embedding_hygiene" -> (qEmbeddingHygiene _),
    "q255_stream_tombstone" -> (qStreamTombstone _),
    "q256_incr_gram_history" -> (qIncrGramHistory _),
    "q257_source_scorecard" -> (qSourceScorecard _),
    "q258_bot_rate_screen" -> (qBotRateScreen _),
    "q259_bbit_minhash" -> (qBbitMinhash _),
    "q260_canon_policy" -> (qCanonPolicy _),
    "q261_weighted_jaccard" -> (qWeightedJaccard _),
    "q262_byte_shard_plan" -> (qByteShardPlan _),
    "q263_nfc_dedup" -> (qNfcDedup _),
    "q264_jpeg_decode" -> (qJpegDecode _),
    "q265_reencode_dedup" -> (qReencodeDedup _),
    "q266_canon_neardup" -> (qCanonNearDup _),
    "q267_stream_media_screen" -> (qStreamMediaScreen _),
    "q268_winnow_pairs" -> (qWinnowPairs _),
    "q269_repetition_loop" -> (qRepetitionLoop _),
    "q270_vocab_growth" -> (qVocabGrowth _),
    "q271_dedup_impact" -> (qDedupImpact _),
    "q272_decontam_certificate" -> (qDecontamCertificate _),
    "q273_semantic_contam" -> (qSemanticContam _),
    "q274_canon_resolution" -> (qCanonResolution _),
    "q275_semantic_contam_ivf" -> (qSemanticContamIvf _),
    "q276_stream_semantic_dedup" -> (qStreamSemanticDedup _),
    "q277_pair_curation" -> (qPairCuration _),
    "q278_stored_lang_id" -> (qStoredLangId _),
    "q279_t_closeness" -> (qTCloseness _),
    "q280_raster_clusters" -> (qRasterClusters _),
    "q281_stream_semantic_grow" -> (qStreamSemanticDedupGrow _),
    "q282_stream_drift_gate" -> (qStreamDriftGate _),
    "q283_wav_decode" -> (qWavDecode _),
    "q284_y4m_scenes" -> (qY4mScenes _),
    "q285_html_extract" -> (qHtmlExtract _),
    "q286_quality_classifier" -> (qQualityClassifier _),
    "q287_pair_alignment" -> (qPairAlignment _),
    "q288_incr_classifier" -> (qIncrClassifier _),
    "q289_dim_truncation" -> (qDimTruncation _),
    "q290_audio_neardup" -> (qAudioNearDup _),
    "q291_classifier_calibration" -> (qClassifierCalibration _),
    "q292_media_router" -> (qMediaRouter _),
    "q293_stream_media_router" -> (qStreamMediaRouter _),
    "q294_audio_clusters" -> (qAudioClusters _),
    "q295_video_keyframes" -> (qVideoKeyframes _),
    "q296_full_certificate" -> (qFullCertificate _),
    "q297_stream_classifier_gate" -> (qStreamClassifierGate _),
    "q298_wav_stereo" -> (qWavStereo _),
    "q299_stereo_downmix" -> (qStereoDownmixDedup _),
    "q300_video_clusters" -> (qVideoClusters _),
    "q301_audio_landmarks" -> (qAudioLandmarks _),
    "q302_landmark_clusters" -> (qLandmarkClusters _),
    "q303_calibrated_gate" -> (qCalibratedGate _),
    "q304_stream_audio_dedup" -> (qStreamAudioDedup _),
    "q305_video_caption_align" -> (qVideoCaptionAlign _),
    "q306_union_clusters" -> (qUnionClusters _),
    "q307_stream_video_dedup" -> (qStreamVideoDedup _),
    "q308_utterance_stats" -> (qUtteranceStats _),
    "q309_speech_quality" -> (qSpeechQualityScreen _),
    "q310_pad_robust_dedup" -> (qPadRobustDedup _),
    "q311_incr_keyframe_index" -> (qIncrKeyframeIndex _),
    "q312_channel_diarization" -> (qChannelDiarization _),
    "q313_media_dedup_report" -> (qMediaDedupReport _),
    "q314_landmark_tuning" -> (qLandmarkTuning _),
    "q315_audio_takedown" -> (qAudioTakedown _),
    "q316_video_takedown" -> (qVideoTakedown _),
    "q317_audio_transcript_align" -> (qAudioTranscriptAlign _),
    "q318_corpus_dedup_report" -> (qCorpusDedupReport _),
    "q319_landmark_takedown" -> (qLandmarkTakedown _),
    "q320_takedown_report" -> (qTakedownReport _),
    "q321_df_cap_tuning" -> (qDfCapTuning _),
    "q322_verdict_refresh" -> (qVerdictRefresh _),
    "q323_incr_band_index" -> (qIncrBandIndex _),
    "q324_incr_landmark_index" -> (qIncrLandmarkIndex _),
    "q325_verdict_retention" -> (qVerdictRetention _))

  /** Shared by q197 (batch CUSUM) and q200 (streamed bucket fold):
    * the closed form S_t = P_t − min(0, min_{j≤t} P_j) as two running
    * windows — CUSUM's "sequential" recurrence with no recurrence.
    */
  private[graft] val cusumOracle =
    """WITH hourly AS (SELECT event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) // 1000 // 3600000 AS hr,
             COUNT(*) AS n
           FROM events GROUP BY 1, 2),
         tk AS (SELECT event_type, COUNT(*) AS n_buckets,
             CAST(SUM(n) AS BIGINT) // COUNT(*) + 1 AS k
           FROM hourly GROUP BY 1),
         pp AS (SELECT h.event_type, h.hr, h.n, t.k, t.n_buckets,
             CAST(SUM(h.n - t.k) OVER (PARTITION BY h.event_type
               ORDER BY h.hr ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW) AS BIGINT) AS p
           FROM hourly h JOIN tk t ON h.event_type = t.event_type),
         ss AS (SELECT event_type, hr, n, k, n_buckets,
             p - LEAST(0, MIN(p) OVER (PARTITION BY event_type
               ORDER BY hr ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW)) AS s
           FROM pp),
         mx AS (SELECT event_type, s AS max_cusum, hr AS argmax_hr
           FROM (SELECT event_type, s, hr, row_number() OVER
               (PARTITION BY event_type ORDER BY s DESC, hr) AS rn
             FROM ss) WHERE rn = 1),
         ag AS (SELECT event_type,
             CAST(SUM(CASE WHEN s >= 3 * k THEN 1 ELSE 0 END)
               AS BIGINT) AS n_over_3k
           FROM ss GROUP BY 1)
         SELECT tk.event_type, tk.n_buckets, tk.k, mx.max_cusum,
             mx.argmax_hr, ag.n_over_3k
         FROM tk JOIN mx ON tk.event_type = mx.event_type
              JOIN ag ON tk.event_type = ag.event_type
         ORDER BY tk.event_type"""

  /** Shared by q126 (batch EWMA) and q138 (streamed bucket fold): the
    * smoothing over the folded sufficient statistic must equal the
    * smoothing over everything — mirrors [[ewmaFromBuckets]].
    */
  private[graft] val ewmaOracle =
    """WITH hourly AS (SELECT event_type,
           epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS hr,
           COUNT(*) AS cnt
         FROM events GROUP BY 1, 2),
       c AS (SELECT event_type, hr + k AS hr2,
           cnt * (CAST(1 AS BIGINT) << (24 - k)) AS w
         FROM hourly, (SELECT unnest(range(0, 25)) AS k) u),
       e AS (SELECT event_type, hr2 AS hr,
           CAST(SUM(w) AS BIGINT) AS ewma_scaled
         FROM c GROUP BY 1, 2)
       SELECT h.event_type, h.hr, h.cnt, e.ewma_scaled,
           CAST(e.ewma_scaled AS DOUBLE) / 16777216.0 AS ewma
       FROM e JOIN hourly h ON e.event_type = h.event_type
            AND e.hr = h.hr
       ORDER BY h.event_type, h.hr"""

  /** Shared by q116 (full-corpus BM25) and q136 (merged stored stats):
    * the incremental fold must score bit-identically to this full
    * recompute. Mirrors [[bm25TopK]] — fixed per-term sum order,
    * rational idf, Robertson k1=1.2 / b=0.75.
    */
  private[graft] val bm25Oracle =
    """WITH d AS (SELECT doc_id,
           list_filter(string_split(text, ' '), x -> x <> '') AS t
         FROM documents),
       dl AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM d),
       st AS (SELECT COUNT(*) AS n, SUM(dl) AS sumdl FROM dl),
       tok AS (SELECT doc_id, unnest(t) AS term FROM d),
       tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok
         WHERE term IN ('spark', 'merge', 'window') GROUP BY 1, 2),
       dfc AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
       sc AS (SELECT tf.doc_id, tf.term,
           (CAST(tf.tf AS DOUBLE) * 2.2
             / (CAST(tf.tf AS DOUBLE) + 1.2 * (1.0 - 0.75
                 + 0.75 * CAST(dl.dl AS DOUBLE)
                   / (CAST(st.sumdl AS DOUBLE) / CAST(st.n AS DOUBLE)))))
           * ((CAST(st.n AS DOUBLE) - CAST(dfc.df AS DOUBLE) + 0.5)
             / (CAST(dfc.df AS DOUBLE) + 0.5)) AS c
         FROM tf JOIN dl USING (doc_id) JOIN dfc USING (term), st),
       agg AS (SELECT doc_id,
           COALESCE(SUM(c) FILTER (WHERE term = 'spark'), 0.0)
             + COALESCE(SUM(c) FILTER (WHERE term = 'merge'), 0.0)
             + COALESCE(SUM(c) FILTER (WHERE term = 'window'), 0.0)
             AS score,
           COUNT(*) AS n_terms
         FROM sc GROUP BY 1),
       r AS (SELECT doc_id, score, CAST(n_terms AS BIGINT) AS n_terms,
           row_number() OVER (ORDER BY score DESC, doc_id) AS rk
         FROM agg)
       SELECT CAST(rk AS BIGINT) AS rank, doc_id, score, n_terms
       FROM r WHERE rk <= 20 ORDER BY rank"""

  /** Shared by q57 (streaming) and q70 (batch bin-bucketed): the two
    * engines implement the SAME interval-join semantics and must agree
    * with the same replay.
    */
  private[graft] val intervalJoinOracle =
    """WITH e AS (SELECT user_id, event_id, event_type,
           epoch_us(CAST(ts AS TIMESTAMP)) // 1000 AS ms FROM events)
       SELECT c.event_id AS click_id, v.event_id AS purchase_id,
              CAST(v.ms - c.ms AS BIGINT) AS lag_ms
       FROM e c JOIN e v ON c.user_id = v.user_id
       WHERE c.event_type = 'click' AND v.event_type = 'purchase'
         AND v.ms >= c.ms AND v.ms <= c.ms + 600000
       ORDER BY click_id, purchase_id"""

  /** Shared by q64 (pairs) and q71 (clusters over those pairs): the
    * df-capped trigram inverted index — mirrors
    * [[NearDup.ngramJaccardPairs]] (n=3, maxDf=100).
    */
  private[graft] val ngramIdxCte =
    """toks AS (SELECT doc_id, string_split(text, ' ') AS t
                     FROM documents),
       g AS (SELECT doc_id, unnest(list_distinct(list_transform(
               range(1, greatest(len(t) - 2, 1) + 1),
               i -> array_to_string(t[i:i+2], ' ')))) AS gram
             FROM toks),
       keep AS (SELECT gram FROM g GROUP BY gram HAVING count(*) <= 100),
       idx AS (SELECT g.doc_id, g.gram FROM g JOIN keep USING (gram)),
       na AS (SELECT doc_id, count(*) AS n FROM idx GROUP BY 1),
       p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               count(*) AS n_shared
             FROM idx a JOIN idx b
               ON a.gram = b.gram AND a.doc_id < b.doc_id
             GROUP BY 1, 2)"""

  /** q139's oracle: the near-dup edge set (the q133 pair CTEs), then
    * `rounds` UNROLLED simultaneous-removal peel rounds — sound
    * because the k-core fixpoint is unique and rounds past it are
    * no-ops; the Spark side's maxRounds pins the same bound, so an
    * insufficient unroll fails loudly there, never as a silent hash
    * mismatch.
    */
  private[graft] def kcoreOracle(k: Int, rounds: Int): String = {
    // every peel CTE is MATERIALIZED: each e_i is referenced three
    // times by round i+1, so inlining would expand the base scan
    // 3^rounds times (DuckDB ran out of file handles at 8 rounds)
    val peel = (1 to rounds).map { i =>
      s"""d$i AS MATERIALIZED (SELECT node, COUNT(*) AS d FROM
             (SELECT lo AS node FROM e${i - 1}
              UNION ALL SELECT hi FROM e${i - 1}) u$i
           GROUP BY node),
         e$i AS MATERIALIZED (SELECT lo, hi FROM e${i - 1}
           WHERE lo IN (SELECT node FROM d$i WHERE d >= $k)
             AND hi IN (SELECT node FROM d$i WHERE d >= $k))"""
    }.mkString(",\n         ")
    s"""WITH $ngramIdxCte,
       e0 AS MATERIALIZED (SELECT id_a AS lo, id_b AS hi
           FROM p JOIN na x ON p.id_a = x.doc_id
                JOIN na y ON p.id_b = y.doc_id
           WHERE CAST(n_shared AS DOUBLE)
                 / CAST(x.n + y.n - n_shared AS DOUBLE) >= 0.5),
       $peel,
       fd AS (SELECT node, COUNT(*) AS d FROM
           (SELECT lo AS node FROM e$rounds
            UNION ALL SELECT hi FROM e$rounds) uf
         GROUP BY node)
       SELECT node, CAST(d AS BIGINT) AS core_degree
       FROM fd ORDER BY node"""
  }

  /** Shared by the q71 and q107 oracles: q64's df-capped pair CTEs →
    * recursive closure → (node, cluster_rep) labels + component sizes.
    */
  private[graft] val dedupClusterCtes =
    s"""$ngramIdxCte,
         pairs AS (SELECT id_a, id_b
               FROM p JOIN na x ON p.id_a = x.doc_id
                      JOIN na y ON p.id_b = y.doc_id
               WHERE CAST(n_shared AS DOUBLE)
                     / CAST(x.n + y.n - n_shared AS DOUBLE) >= 0.5),
         sym AS (SELECT id_a AS src, id_b AS dst FROM pairs
                 UNION
                 SELECT id_b, id_a FROM pairs),
         r AS (SELECT src AS node, dst AS peer FROM sym
               UNION
               SELECT r.node, s.dst FROM r JOIN sym s ON r.peer = s.src),
         lab AS (SELECT node, LEAST(node, MIN(peer)) AS cluster_rep
                 FROM r GROUP BY node),
         sz AS (SELECT cluster_rep, COUNT(*) AS n_members
                FROM lab GROUP BY 1)"""

  def oracleSql: Map[String, String] = oracleSqlBase +
    ("q313_media_dedup_report" -> mediaDedupReportOracle) +
    ("q318_corpus_dedup_report" -> corpusDedupReportOracle) +
    ("q320_takedown_report" -> takedownReportOracle) +
    ("q322_verdict_refresh" -> verdictRefreshOracle) +
    // q325 retains exactly the latest version of every verdict table,
    // so its contract is q322's VERBATIM: the retained rows are the
    // rows the live chains derive
    ("q325_verdict_retention" -> verdictRefreshOracle)

  /** q313's oracle COMPOSES the three modality cluster oracles as
    * subqueries (DuckDB allows WITH RECURSIVE inside a derived table)
    * and aggregates each into the impact row — the roll-up adds no
    * replay logic of its own, so green means the three chains and the
    * aggregation all agree.
    */
  private[graft] def mediaDedupReportOracle: String = {
    def leg(name: String, key: String) =
      s"""SELECT '$name' AS modality,
           CAST(SUM(n_docs) AS BIGINT) AS n_items,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(n_docs) - COUNT(*) AS BIGINT) AS n_dup_items,
           CAST((SUM(n_docs) - COUNT(*)) * 10000 // SUM(n_docs)
             AS BIGINT) AS dup_rate_bp,
           CAST(MAX(n_docs) AS BIGINT) AS max_cluster
         FROM (${oracleSqlBase(key)}) t"""
    Seq(leg("audio", "q294_audio_clusters"),
      leg("raster", "q280_raster_clusters"),
      leg("video", "q300_video_clusters"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY modality")
  }

  /** q320's oracle: the three takedown oracles as derived-table
    * subqueries (request-id column normalized per leg) plus two
    * closed-form corpus counts — the q313 composition discipline on
    * the compliance axis.
    */
  private[graft] def takedownReportOracle: String = {
    def leg(axis: String, key: String, reqCol: String) =
      s"""SELECT '$axis' AS axis,
           (SELECT CAST(COUNT(DISTINCT doc_id // 3) AS BIGINT)
             FROM documents WHERE (doc_id // 3) % 9 = 0) AS n_requests,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM documents)
             AS n_arrivals,
           CAST(COUNT(DISTINCT t.doc_id) AS BIGINT) AS n_blocked,
           CAST(COUNT(DISTINCT t.rid) AS BIGINT) AS n_hit_requests,
           CAST(COUNT(DISTINCT t.doc_id) * 10000
             // (SELECT COUNT(*) FROM documents) AS BIGINT)
             AS block_rate_bp
         FROM (SELECT doc_id, $reqCol AS rid
               FROM (${oracleSqlBase(key)}) x) t"""
    Seq(leg("audio_envelope", "q315_audio_takedown", "hist_id"),
      leg("audio_landmark", "q319_landmark_takedown", "takedown_id"),
      leg("video_keyframes", "q316_video_takedown", "hist_id"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY axis")
  }

  /** q318's oracle: the q313 composition plus the TEXT leg — the q71
    * recursive closure totalized over every document (the q132 grp
    * pattern) inside a derived table, aggregated with the same five
    * stats. Zero roll-up-specific replay logic on any leg.
    */
  /** The q318 text leg's oracle — q71's recursive closure totalized
    * over every document — shared by the q322 verdict-store count.
    */
  private[graft] def textInner: String =
    s"""WITH RECURSIVE $dedupClusterCtes,
         grp AS (SELECT d.doc_id,
             COALESCE(lab.cluster_rep, d.doc_id) AS cluster_rep
           FROM documents d LEFT JOIN lab ON d.doc_id = lab.node)
         SELECT cluster_rep, CAST(COUNT(*) AS BIGINT) AS n_docs
         FROM grp GROUP BY 1"""

  /** q322's oracle: the seven verdict-table row counts, each the
    * COUNT of its leg's own oracle as a derived-table subquery — the
    * q313/q320 composition discipline on the maintenance job.
    */
  private[graft] def verdictRefreshOracle: String = {
    def leg(name: String, inner: String) =
      s"""SELECT '$name' AS table_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows
         FROM ($inner) t"""
    Seq(leg("audio_clusters", oracleSqlBase("q294_audio_clusters")),
      leg("audio_takedown", oracleSqlBase("q315_audio_takedown")),
      leg("landmark_takedown", oracleSqlBase("q319_landmark_takedown")),
      leg("raster_clusters", oracleSqlBase("q280_raster_clusters")),
      leg("text_clusters", textInner),
      leg("video_clusters", oracleSqlBase("q300_video_clusters")),
      leg("video_takedown", oracleSqlBase("q316_video_takedown")))
      .mkString("", "\nUNION ALL\n", "\nORDER BY table_name")
  }

  private[graft] def corpusDedupReportOracle: String = {
    def leg(name: String, inner: String) =
      s"""SELECT '$name' AS modality,
           CAST(SUM(n_docs) AS BIGINT) AS n_items,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(n_docs) - COUNT(*) AS BIGINT) AS n_dup_items,
           CAST((SUM(n_docs) - COUNT(*)) * 10000 // SUM(n_docs)
             AS BIGINT) AS dup_rate_bp,
           CAST(MAX(n_docs) AS BIGINT) AS max_cluster
         FROM ($inner) t"""
    Seq(leg("audio", oracleSqlBase("q294_audio_clusters")),
      leg("raster", oracleSqlBase("q280_raster_clusters")),
      leg("text", textInner),
      leg("video", oracleSqlBase("q300_video_clusters")))
      .mkString("", "\nUNION ALL\n", "\nORDER BY modality")
  }

  /** Shared oracle CTEs deriving the stored df cap (the q321 choice):
    * per-hash df over the replayed calibration sample at q*, the
    * sample's max df, and the headroom-rule capstar. Requires
    * [[landmarkOpCtes]] spliced first (uses `lmhs`, `lmop`). The
    * engine fails loudly when the headroom rule runs off the grid
    * (`LandmarkTuning.chooseCap`'s require); so does the oracle,
    * instead of degrading the choice into NULLs.
    */
  private[graft] val dfCapCtes: String =
    """capg AS (SELECT CAST(cap AS BIGINT) AS cap
           FROM unnest([1, 2, 4, 8, 16, 32, 64, 128, 256]) tc(cap)),
         chq AS (SELECT did, h FROM lmhs
           WHERE q = (SELECT qstar FROM lmop)),
         cdf AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS dfh
           FROM chq GROUP BY 1),
         cmax AS (SELECT MAX(dfh) AS m FROM cdf),
         ccap AS (SELECT CASE WHEN mn IS NULL
               THEN error('df-cap headroom runs off the swept grid')
               ELSE mn END AS capstar
           FROM (SELECT MIN(cap) AS mn FROM capg
                 WHERE cap >= 16 * (SELECT m FROM cmax)) tmn)"""

  /** Shared oracle CTEs replaying the q314 landmark calibration
    * sample (256 groups x 4 legs, generated from the group index —
    * scale-independent), the per-quantization-level sweep stats, and
    * the operating-point choice rule. No leading WITH; yields
    * `lmstat2` (per-level min twin overlap / max chance overlap) and
    * `lmop` (the chosen (qstar, tstar)). Spliced into the q314 table
    * oracle and the q302/q306 cluster gates so both engines DERIVE
    * the same stored point rather than trusting it.
    */
  private[graft] val landmarkOpCtes: String =
    """lmg AS (SELECT g FROM unnest(range(0, 256)) tg(g)),
         lmdoc AS (SELECT 4 * g + r AS did, g, r,
             CASE WHEN r = 3 THEN 2 * g + 1 ELSE 2 * g END AS sk,
             4000 + (g % 7) * 500 + g % 53 AS n
           FROM lmg, unnest(range(0, 4)) tr(r)),
         lmgi AS (SELECT did, n, sk, r, i,
             (sk * 1024 + 2 * i + 1) * 2654435761 % 4294967296 AS g0,
             xor(g0, g0 >> 16) * 40503 % 4294967296 AS g1,
             150 + xor(g1, g1 >> 13) % 250 AS gap,
             (sk * 1024 + 2 * i + 2) * 2654435761 % 4294967296 AS a0,
             xor(a0, a0 >> 16) * 40503 % 4294967296 AS a1,
             1500 + xor(a1, a1 >> 13) % 8 * 64 AS amp
           FROM lmdoc, unnest(range(0, 45)) u(i)),
         lmps AS (SELECT did,
             (sk * 1024 + 1000) * 2654435761 % 4294967296 AS h0,
             xor(h0, h0 >> 16) * 40503 % 4294967296 AS h1,
             200 + xor(h1, h1 >> 13) % 200 AS p
           FROM lmdoc),
         lmck AS (SELECT lmgi.did, lmgi.r, lmgi.i, lmgi.amp, lmgi.n,
             lmps.p + COALESCE(SUM(3 + lmgi.gap) OVER (
               PARTITION BY lmgi.did ORDER BY lmgi.i
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS pos
           FROM lmgi JOIN lmps ON lmgi.did = lmps.did),
         lmcf AS (SELECT * FROM lmck WHERE pos + 3 <= n - 100),
         lmqs AS (SELECT q FROM unnest([0, 2, 4, 6]) tq(q)),
         lmtr AS (SELECT a.did, a.r, a.i, lmqs.q,
             ((((b.pos - a.pos) >> lmqs.q) * 1048576
                 + ((c.pos - b.pos) >> lmqs.q)) * 256
               + LEAST(b.amp * 8 // a.amp, 15) * 16
               + LEAST(c.amp * 8 // b.amp, 15)) AS h
           FROM lmcf a
           JOIN lmcf b ON a.did = b.did AND b.i = a.i + 1
           JOIN lmcf c ON a.did = c.did AND c.i = a.i + 2, lmqs),
         lmhs AS (SELECT DISTINCT did, q, h FROM lmtr
           WHERE r <> 2 OR i >= 1),
         lmcand AS (SELECT a.q, a.did AS da, b.did AS db,
             CAST(COUNT(*) AS BIGINT) AS shared
           FROM lmhs a JOIN lmhs b
             ON a.q = b.q AND a.h = b.h AND a.did < b.did
           GROUP BY 1, 2, 3),
         lmpos AS (SELECT lmqs.q, 4 * g + ra AS da, 4 * g + rb AS db
           FROM lmg, (VALUES (0, 1), (0, 2), (1, 2)) pp(ra, rb), lmqs),
         lmposj AS (SELECT p.q, COALESCE(c.shared, 0) AS shared
           FROM lmpos p LEFT JOIN lmcand c
             ON p.q = c.q AND p.da = c.da AND p.db = c.db),
         lmneg AS (SELECT c.q, c.shared FROM lmcand c
           WHERE NOT (c.da // 4 = c.db // 4
             AND c.da % 4 < 3 AND c.db % 4 < 3)),
         lmstat AS (SELECT pj.q, MIN(pj.shared) AS minpos FROM lmposj pj
           GROUP BY 1),
         lmstat2 AS (SELECT st.q, st.minpos,
             COALESCE((SELECT MAX(n2.shared) FROM lmneg n2
               WHERE n2.q = st.q), 0) AS maxneg
           FROM lmstat st),
         lmop0 AS (SELECT q AS qstar,
             (maxneg + 2 + minpos) // 2 AS tstar
           FROM lmstat2 WHERE maxneg + 2 <= minpos
           ORDER BY q LIMIT 1),
         -- the engine fails loudly when no level separates
         -- (LandmarkTuning.choose's require) or when t* falls off the
         -- swept grid; the oracle must fail just as loudly instead of
         -- degrading (SELECT ... FROM lmop) scalars into NULLs that
         -- quantize every hash into garbage and produce a confusing
         -- mismatch on a drifted fixture
         lmop AS (SELECT
             CASE WHEN o.qstar IS NULL OR o.tstar > 16
               THEN error('landmark tuning: no separating level or off-grid t*')
               ELSE o.qstar END AS qstar,
             CASE WHEN o.tstar IS NULL OR o.tstar > 16
               THEN error('landmark tuning: no separating level or off-grid t*')
               ELSE o.tstar END AS tstar
           FROM (SELECT 1 AS one) lmone LEFT JOIN lmop0 o ON TRUE)"""

  private[graft] lazy val oracleSqlBase: Map[String, String] =
    TrainOracles1.entries ++ TrainOracles2.entries ++
      TrainOracles3.entries


  /** q87's oracle — Lloyd rounds unrolled into CTE chains with the SAME
    * integer arithmetic as [[graft.ops.KMeans]]: exact quantized
    * distances, (dist, cluster) tie-break, truncating `//` centroid
    * division (DuckDB `//` truncates like Java `/` — measured, not
    * assumed), emptied clusters keeping their previous centroid via the
    * LEFT JOIN + COALESCE.
    */
  private[graft] def kmeansOracle(k: Int, iters: Int): String =
    s"""${kmeansCtes(k, iters)}
         SELECT cluster, COUNT(*) AS n_vecs,
             CAST(SUM(dist) AS BIGINT) AS inertia
         FROM afin GROUP BY 1 ORDER BY cluster"""

  /** q97's oracle: the same Lloyd chain, then exact pairwise cosine
    * restricted to same-cluster pairs (the SemDeDup blocking), zero
    * norms excluded exactly as the Spark side's `qn > 0`.
    */
  private[graft] def semanticDedupOracle(k: Int, iters: Int): String =
    s"""${kmeansCtes(k, iters)},
         $qlistCte,
         nrm AS (SELECT vec_id, SUM(x * x) AS nn FROM q GROUP BY 1
                 HAVING SUM(x * x) > 0),
         pd AS (SELECT aa.vec_id AS id_a, bb.vec_id AS id_b,
             aa.cluster,
             CAST(list_inner_product(qa.xs, qb.xs) AS BIGINT) AS dot
           FROM afin aa
           JOIN afin bb ON aa.cluster = bb.cluster
             AND aa.vec_id < bb.vec_id
           JOIN nrm ea ON ea.vec_id = aa.vec_id
           JOIN nrm eb ON eb.vec_id = bb.vec_id
           JOIN qv qa ON qa.vec_id = aa.vec_id
           JOIN qv qb ON qb.vec_id = bb.vec_id),
         sm AS (SELECT id_a, id_b, cluster,
             CAST(dot AS DOUBLE) / (sqrt(CAST(na.nn AS DOUBLE))
               * sqrt(CAST(nb.nn AS DOUBLE))) AS sim
           FROM pd JOIN nrm na ON pd.id_a = na.vec_id
                   JOIN nrm nb ON pd.id_b = nb.vec_id)
         SELECT id_a, id_b, cluster, sim FROM sm
         WHERE sim >= 0.3 ORDER BY id_a, id_b"""

  /** q103's oracle: the Lloyd chain fitted on the HISTORY subset only,
    * the batch quantized separately (qb) and assigned to the final
    * history centroids, then exact cosine restricted to
    * batch-vs-history pairs within a cell — the same arithmetic as
    * [[semanticDedupOracle]] with the self-join replaced by the
    * incremental two-sided form.
    */
  private[graft] def crossSemanticDedupOracle(k: Int, iters: Int): String =
    s"""${kmeansCtes(k, iters, "WHERE vec_id % 3 <> 0")},
         $qlistCte,
         qb AS (SELECT e.vec_id, i,
             CAST(floor(CAST(embedding[i] AS DOUBLE) * 10000.0 + 0.5)
                  AS BIGINT) AS x
           FROM embeddings e, (SELECT unnest(range(1, 65)) AS i)
           WHERE vec_id % 3 = 0),
         db AS (SELECT qb.vec_id, c.j,
             SUM((qb.x - c.x) * (qb.x - c.x)) AS d
           FROM qb JOIN c$iters c ON qb.i = c.i GROUP BY 1, 2),
         ab AS (SELECT vec_id, j AS cluster FROM (
             SELECT vec_id, j, d, row_number() OVER
               (PARTITION BY vec_id ORDER BY d, j) AS rn FROM db)
           WHERE rn = 1),
         nh AS (SELECT vec_id, SUM(x * x) AS nn FROM q GROUP BY 1
                 HAVING SUM(x * x) > 0),
         nb AS (SELECT vec_id, SUM(x * x) AS nn FROM qb GROUP BY 1
                 HAVING SUM(x * x) > 0),
         pd AS (SELECT bb.vec_id AS new_id, hh.vec_id AS hist_id,
             bb.cluster,
             CAST(list_inner_product(qx.xs, qy.xs) AS BIGINT) AS dot
           FROM ab bb
           JOIN afin hh ON bb.cluster = hh.cluster
           JOIN nb eb ON eb.vec_id = bb.vec_id
           JOIN nh eh ON eh.vec_id = hh.vec_id
           JOIN qv qx ON qx.vec_id = bb.vec_id
           JOIN qv qy ON qy.vec_id = hh.vec_id),
         sm AS (SELECT new_id, hist_id, cluster,
             CAST(dot AS DOUBLE) / (sqrt(CAST(na.nn AS DOUBLE))
               * sqrt(CAST(nb2.nn AS DOUBLE))) AS sim
           FROM pd JOIN nb na ON pd.new_id = na.vec_id
                   JOIN nh nb2 ON pd.hist_id = nb2.vec_id)
         SELECT new_id, hist_id, cluster, sim FROM sm
         WHERE sim >= 0.3 ORDER BY new_id, hist_id"""

  /** q281's oracle: the self-extending fold replayed closed-form —
    * [[crossSemanticDedupOracle]]'s chain plus the staging NTILE
    * (batch membership over ALL embeddings rows, mirroring
    * `Staging.stageSplitAndRead`'s chunk cut), with the probe
    * inventory ranked: stored history at batch −1 (earlier than every
    * arrival), each arrival at its own batch; a pair emits iff the
    * other side's batch is strictly smaller, or equal with a strictly
    * smaller id (the intra-batch members, emitted once, direction
    * deterministic).
    */
  private[graft] def growingSemanticDedupOracle(k: Int, iters: Int,
      chunks: Int): String =
    s"""${kmeansCtes(k, iters, "WHERE vec_id % 3 <> 0")},
         $qlistCte,
         bt AS (SELECT vec_id,
             CAST(NTILE($chunks) OVER (ORDER BY vec_id) AS BIGINT) AS b
           FROM embeddings),
         qb AS (SELECT e.vec_id, i,
             CAST(floor(CAST(embedding[i] AS DOUBLE) * 10000.0 + 0.5)
                  AS BIGINT) AS x
           FROM embeddings e, (SELECT unnest(range(1, 65)) AS i)
           WHERE vec_id % 3 = 0),
         db AS (SELECT qb.vec_id, c.j,
             SUM((qb.x - c.x) * (qb.x - c.x)) AS d
           FROM qb JOIN c$iters c ON qb.i = c.i GROUP BY 1, 2),
         ab AS (SELECT vec_id, j AS cluster FROM (
             SELECT vec_id, j, d, row_number() OVER
               (PARTITION BY vec_id ORDER BY d, j) AS rn FROM db)
           WHERE rn = 1),
         nh AS (SELECT vec_id, SUM(x * x) AS nn FROM q GROUP BY 1
                 HAVING SUM(x * x) > 0),
         nb AS (SELECT vec_id, SUM(x * x) AS nn FROM qb GROUP BY 1
                 HAVING SUM(x * x) > 0),
         qa AS (SELECT vec_id, i, x FROM q
                UNION ALL SELECT vec_id, i, x FROM qb),
         nall AS (SELECT vec_id, nn FROM nh
                  UNION ALL SELECT vec_id, nn FROM nb),
         pv AS (SELECT hh.vec_id, hh.cluster, CAST(-1 AS BIGINT) AS b
             FROM afin hh
           UNION ALL
           SELECT bb.vec_id, bb.cluster, bt.b
             FROM ab bb JOIN bt ON bb.vec_id = bt.vec_id),
         pd AS (SELECT bb.vec_id AS new_id, pv.vec_id AS other_id,
             bb.cluster,
             CAST(list_inner_product(qx.xs, qy.xs) AS BIGINT) AS dot
           FROM ab bb
           JOIN bt bx ON bb.vec_id = bx.vec_id
           JOIN pv ON pv.cluster = bb.cluster
             AND (pv.b < bx.b
                  OR (pv.b = bx.b AND pv.vec_id < bb.vec_id))
           JOIN nb nx ON nx.vec_id = bb.vec_id
           JOIN nall ny ON ny.vec_id = pv.vec_id
           JOIN qv qx ON qx.vec_id = bb.vec_id
           JOIN qv qy ON qy.vec_id = pv.vec_id),
         sm AS (SELECT new_id, other_id, cluster,
             CAST(dot AS DOUBLE) / (sqrt(CAST(na.nn AS DOUBLE))
               * sqrt(CAST(no.nn AS DOUBLE))) AS sim
           FROM pd JOIN nb na ON pd.new_id = na.vec_id
                   JOIN nall no ON pd.other_id = no.vec_id)
         SELECT new_id, other_id, cluster, sim FROM sm
         WHERE sim >= 0.3 ORDER BY new_id, other_id"""

  /** q113's oracle: the FULL PQ pipeline in SQL — m independent
    * sub-codebook k-means runs (the [[kmeansCtes]] construction per
    * dimension slice, same lowest-id seeding / tie-breaks /
    * truncating-division updates), encoding, ADC tables, top-3, and
    * recall vs the exact L2 top-3. All integer arithmetic until the
    * one final division.
    */
  /** With `ivfCells > 0`, the same pipeline COMPOSED with an IVF
    * coarse quantizer (q115): a full-dim k-means cell chain, each
    * query probing its `nprobe` nearest cells, ADC restricted to
    * candidates in probed cells.
    */
  private[graft] def pqAnnOracle(m: Int, ksub: Int, iters: Int,
      ivfCells: Int = 0, ivfIters: Int = 0, nprobe: Int = 0,
      storedShape: Boolean = false): String = {
    val subDim = 64 / m
    val sb = new StringBuilder
    sb ++=
      s"""WITH $quantCte,
         ids AS (SELECT vec_id,
             CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS j
           FROM nrm ORDER BY vec_id LIMIT $ksub)"""
    if (ivfCells > 0) {
      sb ++=
        s""",
         qf AS (SELECT q.vec_id, q.i, q.x FROM q JOIN nrm USING (vec_id)),
         ids_cl AS (SELECT vec_id,
             CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS j
           FROM nrm ORDER BY vec_id LIMIT $ivfCells),
         cl_c0 AS (SELECT ids_cl.j, t.i, t.x FROM qf t
           JOIN ids_cl USING (vec_id))"""
      for (t <- 1 to ivfIters) {
        sb ++=
          s""",
         cl_d$t AS (SELECT t.vec_id, c.j,
             SUM((t.x - c.x) * (t.x - c.x)) AS d
           FROM qf t JOIN cl_c${t - 1} c ON t.i = c.i GROUP BY 1, 2),
         cl_a$t AS (SELECT vec_id, j AS cluster FROM (
             SELECT vec_id, j, row_number() OVER
               (PARTITION BY vec_id ORDER BY d, j) AS rn FROM cl_d$t)
           WHERE rn = 1),
         cl_s$t AS (SELECT a.cluster, t.i, SUM(t.x) AS sx,
             COUNT(*) AS n
           FROM qf t JOIN cl_a$t a USING (vec_id) GROUP BY 1, 2),
         cl_c$t AS (SELECT c.j, c.i,
             CAST(COALESCE(s.sx // s.n, c.x) AS BIGINT) AS x
           FROM cl_c${t - 1} c
           LEFT JOIN cl_s$t s ON c.j = s.cluster AND c.i = s.i)"""
      }
      sb ++=
        s""",
         cl_dfin AS (SELECT t.vec_id, c.j,
             SUM((t.x - c.x) * (t.x - c.x)) AS d
           FROM qf t JOIN cl_c$ivfIters c ON t.i = c.i GROUP BY 1, 2),
         cl_afin AS (SELECT vec_id, j AS cluster FROM (
             SELECT vec_id, j, row_number() OVER
               (PARTITION BY vec_id ORDER BY d, j) AS rn FROM cl_dfin)
           WHERE rn = 1),
         probed AS (SELECT vec_id AS query_id, j AS cell FROM (
             SELECT vec_id, j, row_number() OVER
               (PARTITION BY vec_id ORDER BY d, j) AS rn FROM cl_dfin
             WHERE vec_id < 50)
           WHERE rn <= $nprobe)"""
    }
    for (s <- 0 until m) {
      sb ++=
        s""",
         qs$s AS (SELECT q.vec_id, i - ${s * subDim} AS i, x
           FROM q JOIN nrm USING (vec_id)
           WHERE i > ${s * subDim} AND i <= ${(s + 1) * subDim}),
         c0_$s AS (SELECT ids.j, t.i, t.x FROM qs$s t
           JOIN ids USING (vec_id))"""
      for (t <- 1 to iters) {
        sb ++=
          s""",
         d${t}_$s AS (SELECT t.vec_id, c.j,
             SUM((t.x - c.x) * (t.x - c.x)) AS d
           FROM qs$s t JOIN c${t - 1}_$s c ON t.i = c.i GROUP BY 1, 2),
         a${t}_$s AS (SELECT vec_id, j AS cluster FROM (
             SELECT vec_id, j, row_number() OVER
               (PARTITION BY vec_id ORDER BY d, j) AS rn FROM d${t}_$s)
           WHERE rn = 1),
         s${t}_$s AS (SELECT a.cluster, t.i, SUM(t.x) AS sx,
             COUNT(*) AS n
           FROM qs$s t JOIN a${t}_$s a USING (vec_id) GROUP BY 1, 2),
         c${t}_$s AS (SELECT c.j, c.i,
             CAST(COALESCE(s.sx // s.n, c.x) AS BIGINT) AS x
           FROM c${t - 1}_$s c
           LEFT JOIN s${t}_$s s ON c.j = s.cluster AND c.i = s.i)"""
      }
      sb ++=
        s""",
         ed_$s AS (SELECT t.vec_id, c.j,
             SUM((t.x - c.x) * (t.x - c.x)) AS d
           FROM qs$s t JOIN c${iters}_$s c ON t.i = c.i GROUP BY 1, 2),
         e_$s AS (SELECT vec_id, j AS code FROM (
             SELECT vec_id, j, row_number() OVER
               (PARTITION BY vec_id ORDER BY d, j) AS rn FROM ed_$s)
           WHERE rn = 1),
         qt_$s AS (SELECT vec_id AS query_id, j, d AS td FROM ed_$s
           WHERE vec_id < 50)"""
    }
    val encJoins = (1 until m)
      .map(s => s"JOIN e_$s USING (vec_id)").mkString(" ")
    val tabJoins = (1 until m).map(s =>
      s"JOIN qt_$s t$s ON t$s.query_id = t0.query_id AND t$s.j = e_$s.code")
      .mkString(" ")
    val dSum = (0 until m).map(s => s"t$s.td").mkString(" + ")
    // with IVF, candidates come only from the probed cells, and the
    // query id rides the probe row
    val candFrom =
      if (ivfCells > 0)
        s"""FROM e_0 $encJoins
           JOIN cl_afin ca ON ca.vec_id = e_0.vec_id
           JOIN probed p ON p.cell = ca.cluster
           JOIN qt_0 t0 ON t0.query_id = p.query_id AND t0.j = e_0.code
           $tabJoins
           WHERE e_0.vec_id <> p.query_id"""
      else
        s"""FROM e_0 $encJoins
           JOIN qt_0 t0 ON t0.j = e_0.code $tabJoins
           WHERE e_0.vec_id <> t0.query_id"""
    sb ++=
      s""",
         adc AS (SELECT t0.query_id, e_0.vec_id, $dSum AS d
           $candFrom),
         pqtop AS (SELECT query_id, vec_id FROM (
             SELECT query_id, vec_id, row_number() OVER
               (PARTITION BY query_id ORDER BY d, vec_id) AS rn FROM adc)
           WHERE rn <= 3),
         exd AS (SELECT a.vec_id AS query_id, b.vec_id,
             SUM((a.x - b.x) * (a.x - b.x)) AS d
           FROM q a JOIN nrm na ON a.vec_id = na.vec_id
           JOIN q b ON a.i = b.i
           JOIN nrm nb ON b.vec_id = nb.vec_id
           WHERE a.vec_id < 50 AND b.vec_id <> a.vec_id GROUP BY 1, 2),
         extop AS (SELECT query_id, vec_id FROM (
             SELECT query_id, vec_id, row_number() OVER
               (PARTITION BY query_id ORDER BY d, vec_id) AS rn FROM exd)
           WHERE rn <= 3),
         hits AS (SELECT COUNT(*) AS h FROM extop e
           JOIN pqtop p ON e.query_id = p.query_id
             AND e.vec_id = p.vec_id),
         nq AS (SELECT COUNT(DISTINCT query_id) AS n FROM extop)
         ${if (storedShape)
        // q129's shape: the stored-model audit columns (cell count,
        // codeword count) instead of the config echo — the oracle
        // retrains inline, so matching proves stored ≡ inline
        s"""SELECT 'stored_ivf_pq' AS method,
             CAST($ivfCells AS BIGINT) AS n_cells,
             CAST(${m * ksub} AS BIGINT) AS n_codewords,
             CAST(n AS BIGINT) AS n_queries,
             CAST(h AS DOUBLE) / (3.0 * CAST(n AS DOUBLE)) AS recall
         FROM hits, nq"""
      else
        s"""SELECT '${if (ivfCells > 0) "ivf_pq" else "pq_adc"}' AS method,
             CAST($m AS BIGINT) AS m,
             CAST($ksub AS BIGINT) AS ksub,${
          if (ivfCells > 0) s"\n             CAST($nprobe AS BIGINT) AS nprobe," else ""}
             CAST(n AS BIGINT) AS n_queries,
             CAST(h AS DOUBLE) / (3.0 * CAST(n AS DOUBLE)) AS recall
         FROM hits, nq"""}"""
    sb.toString
  }

  private[graft] def kmeansCtes(k: Int, iters: Int, where: String = ""): String = {
    val sb = new StringBuilder
    sb ++=
      s"""WITH q AS (SELECT e.vec_id, i,
             CAST(floor(CAST(embedding[i] AS DOUBLE) * 10000.0 + 0.5)
                  AS BIGINT) AS x
           FROM embeddings e, (SELECT unnest(range(1, 65)) AS i) $where),
         ids AS (SELECT vec_id,
             CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS j
           FROM embeddings $where ORDER BY vec_id LIMIT $k),
         c0 AS (SELECT ids.j, q.i, q.x FROM q JOIN ids USING (vec_id))"""
    for (t <- 1 to iters) {
      sb ++=
        s""",
         d$t AS (SELECT q.vec_id, c.j,
             SUM((q.x - c.x) * (q.x - c.x)) AS d
           FROM q JOIN c${t - 1} c ON q.i = c.i GROUP BY 1, 2),
         a$t AS (SELECT vec_id, j AS cluster, d AS dist FROM (
             SELECT vec_id, j, d, row_number() OVER
               (PARTITION BY vec_id ORDER BY d, j) AS rn FROM d$t)
           WHERE rn = 1),
         s$t AS (SELECT a$t.cluster, q.i, SUM(q.x) AS s, COUNT(*) AS n
           FROM q JOIN a$t USING (vec_id) GROUP BY 1, 2),
         c$t AS (SELECT c.j, c.i,
             CAST(COALESCE(s.s // s.n, c.x) AS BIGINT) AS x
           FROM c${t - 1} c
           LEFT JOIN s$t s ON c.j = s.cluster AND c.i = s.i)"""
    }
    sb ++=
      s""",
         dfin AS (SELECT q.vec_id, c.j,
             SUM((q.x - c.x) * (q.x - c.x)) AS d
           FROM q JOIN c$iters c ON q.i = c.i GROUP BY 1, 2),
         afin AS (SELECT vec_id, j AS cluster, d AS dist FROM (
             SELECT vec_id, j, d, row_number() OVER
               (PARTITION BY vec_id ORDER BY d, j) AS rn FROM dfin)
           WHERE rn = 1)"""
    sb.toString
  }

  /** q84's oracle — the Morton interleave generated with the SAME
    * shift/mask term shape as [[graft.ops.ZOrder.zValue]] so both
    * engines compute bit-identical z-values (pure integer arithmetic,
    * no float divergence possible).
    */
  private[graft] def zorderOracle: String = {
    val z = (0 until 16).flatMap { i =>
      Seq(s"(((qx >> $i) & 1) << ${2 * i})",
        s"(((qy >> $i) & 1) << ${2 * i + 1})")
    }.mkString("(", " + ", ")")
    s"""WITH q AS (SELECT CAST(floor(l_quantity) AS BIGINT) AS qx,
             CAST(floor(l_extendedprice / 2.0) AS BIGINT) AS qy
           FROM lineitem),
         z AS (SELECT qx, qy, $z AS z FROM q)
         SELECT z >> 28 AS shard, COUNT(*) AS n_rows,
             MIN(qx) AS min_qty, MAX(qx) AS max_qty,
             MIN(qy) AS min_price2, MAX(qy) AS max_price2
         FROM z GROUP BY 1 ORDER BY shard"""
  }
}

