package graft

import graft.meta.MetadataExtractor
import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  * Every entry in `queries` has an exactly-mirrored DuckDB oracle in
  * `oracleSql` (identical column aliases, identical rounding, identical
  * md5-based hashing), so the driver's hash-compare is deterministic.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.2 relational
    "q1_pricing_summary"  -> Relational.q1PricingSummary _,
    "q3_top_unshipped"    -> Relational.q3TopUnshipped _,
    "q5_local_volume"     -> Relational.q5LocalVolume _,
    "q_group_topk_window" -> Relational.qGroupTopkWindow _,
    "q_running_total"     -> Relational.qRunningTotal _,
    "q_semi_join"         -> Relational.qSemiJoin _,
    "q_anti_join"         -> Relational.qAntiJoin _,
    "q_distinct_agg"      -> Relational.qDistinctAgg _,
    "q_set_ops"           -> Relational.qSetOps _,
    "q_sketch_distinct"   -> Relational.qSketchDistinct _,
    "q_sketch_quantile"   -> Relational.qSketchQuantile _,
    "q_conditional_pivot" -> Relational.qConditionalPivot _,
    "q_rollup"            -> Relational.qRollup _,
    "q_percentiles"       -> Relational.qPercentiles _,
    "q_exists_late"       -> Relational.qExistsLate _,
    "q_small_qty_revenue" -> Relational.qSmallQtyRevenue _,
    "q_cust_order_dist"   -> Relational.qCustOrderDist _,
    "q_supplier_share"    -> Relational.qSupplierShare _,
    "q_scd2_dim"          -> Relational.qScd2Dim _,
    "q_scd2_pit"          -> Relational.qScd2Pit _,
    "q_sketch_merge"      -> Relational.qSketchMerge _,
    "q_quantile_merge"    -> Relational.qQuantileMerge _,
    "q_theta_sets"        -> Relational.qThetaSets _,
    "q_grouping_sets"       -> Relational.qGroupingSets _,
    "q_window_range"        -> Relational.qWindowRange _,
    "q_window_battery"      -> Relational.qWindowBattery _,
    "q_idle_capital"        -> Relational.qIdleCapital _,
    "q_join_size_est"       -> Relational.qJoinSizeEst _,
    "q_trend_forecast"      -> Relational.qTrendForecast _,
    "q_forecast_backtest"   -> Relational.qForecastBacktest _,
    "q_topk_native"         -> Relational.qTopkNative _,
    "q_promo_share"         -> Relational.qPromoShare _,
    "q_band_revenue"        -> Relational.qBandRevenue _,
    "q_order_gaps"          -> Relational.qOrderGaps _,
    "q_cohort_ltv"          -> Relational.qCohortLtv _,
    "q_rfm"                 -> Relational.qRfm _,
    "q_nation_trade"        -> Relational.qNationTrade _,
    "q_market_share"        -> Relational.qMarketShare _,
    "q_late_sole_supplier"  -> Relational.qLateSoleSupplier _,
    "q_profit_by_nation_year" -> Relational.qProfitByNationYear _,
    "q_big_orders"          -> Relational.qBigOrders _,
    // robust stats / distribution audits
    "q_mad_outliers" -> Stats.qMadOutliers _,
    "q_histogram"    -> Stats.qHistogram _,
    "q_benford"      -> Stats.qBenford _,
    "q_ks_test"      -> Stats.qKsTest _,
    "q_mutual_info"  -> Stats.qMutualInfo _,
    "q_gini_binned"  -> Stats.qGiniBinned _,
    "q_autocorr"     -> Stats.qAutocorr _,
    "q_cramers_v"    -> Stats.qCramersV _,
    "q_hhi"          -> Stats.qHhi _,
    "q_cusum_changepoint" -> Stats.qCusumChangepoint _,
    "q_corr_matrix"   -> Stats.qCorrMatrix _,
    "q_bootstrap_ci"  -> Stats.qBootstrapCi _,
    "q_ab_welch"      -> Stats.qAbWelch _,
    "q_cuped"         -> Stats.qCuped _,
    "q_survival_km"   -> Stats.qSurvivalKm _,
    // warehouse maintenance & governance
    "q_data_quality"    -> Warehouse.qDataQuality _,
    "q_cdc_apply"       -> Warehouse.qCdcApply _,
    "q_merge_upsert"    -> Warehouse.qMergeUpsert _,
    "q_incremental_agg" -> Warehouse.qIncrementalAgg _,
    "q_snapshot_diff"   -> Warehouse.qSnapshotDiff _,
    // §2.2 events
    "q_events_window_agg" -> EventOps.qEventsWindowAgg _,
    "q_events_sessionize" -> EventOps.qEventsSessionize _,
    "q_session_paths"     -> EventOps.qSessionPaths _,
    "q_active_users"      -> EventOps.qActiveUsers _,
    "q_user_lifecycle"    -> EventOps.qUserLifecycle _,
    "q_burstiness"        -> EventOps.qBurstiness _,
    "q_dwell_time"        -> EventOps.qDwellTime _,
    "q_asof_join"         -> EventOps.qAsofJoin _,
    "q_events_funnel"     -> EventOps.qEventsFunnel _,
    "q_markov_transitions" -> EventOps.qMarkovTransitions _,
    "q_range_join"        -> EventOps.qRangeJoin _,
    "q_retention_cohorts" -> EventOps.qRetentionCohorts _,
    "q_json_props"        -> EventOps.qJsonProps _,
    "q_events_anomaly"    -> EventOps.qEventsAnomaly _,
    "q_events_ewma"       -> EventOps.qEventsEwma _,
    "q_session_window"    -> EventOps.qSessionWindow _,
    "q_time_weighted_avg" -> EventOps.qTimeWeightedAvg _,
    "q_seasonal_profile"  -> EventOps.qSeasonalProfile _,
    "q_stl_decompose"     -> EventOps.qStlDecompose _,
    "q_holt_winters"      -> EventOps.qHoltWinters _,
    // §2.3 dedup
    "q_dedup_exact"         -> Dedup.qDedupExact _,
    "q_dedup_fingerprint"   -> Dedup.qDedupFingerprint _,
    "q_dedup_ngram_jaccard" -> Dedup.qDedupNgramJaccard _,
    "q_dedup_minhash_lsh"   -> Dedup.qDedupMinhashLsh _,
    "q_dedup_clusters"      -> Dedup.qDedupClusters _,
    "q_dedup_verdict"       -> Dedup.qDedupVerdict _,
    "q_dedup_simhash"       -> Dedup.qDedupSimhash _,
    "q_dedup_simhash_pairs" -> Dedup.qDedupSimhashPairs _,
    "q_dedup_embedding"     -> Dedup.qDedupEmbedding _,
    "q_decontaminate"       -> Dedup.qDecontaminate _,
    "q_dedup_recall"        -> Dedup.qDedupRecall _,
    "q_bloom_decontaminate" -> Dedup.qBloomDecontaminate _,
    "q_decontaminate_auto"  -> Dedup.qDecontaminateAuto _,
    "q_split_leakage"       -> Dedup.qSplitLeakage _,
    "q_segment_dedup"       -> Dedup.qSegmentDedup _,
    "q_dedup_by_source"     -> Dedup.qDedupBySource _,
    "q_source_overlap"      -> Dedup.qSourceOverlap _,
    "q_dedup_soft"          -> Dedup.qDedupSoft _,
    "q_dedup_substring"     -> Dedup.qDedupSubstring _,
    "q_dedup_spans"         -> Dedup.qDedupSpans _,
    "q_span_scrub"          -> Dedup.qSpanScrub _,
    "q_dedup_incremental"   -> Dedup.qDedupIncremental _,
    "q_dedup_editdist"      -> Dedup.qDedupEditdist _,
    "q_text_containment"    -> Dedup.qTextContainment _,
    // §2.4 similarity
    "q_knn_brute"    -> Similarity.qKnnBrute _,
    "q_knn_lsh"      -> Similarity.qKnnLsh _,
    "q_knn_centroid" -> Similarity.qKnnCentroid _,
    "q_knn_ivf"      -> Similarity.qKnnIvf _,
    "q_knn_recall"   -> Similarity.qKnnRecall _,
    "q_knn_nprobe"   -> Similarity.qKnnNprobe _,
    "q_semdedup_sweep" -> Similarity.qSemdedupSweep _,
    "q_knn_pq"       -> Similarity.qKnnPq _,
    "q_embedding_profile" -> Similarity.qEmbeddingProfile _,
    "q_knn_ivfpq"    -> Similarity.qKnnIvfPq _,
    "q_embedding_jl"    -> Similarity.qEmbeddingJl _,
    "q_embedding_probe" -> Similarity.qEmbeddingProbe _,
    "q_uncertainty_sample" -> Similarity.qUncertaintySample _,
    "q_gains_curve"     -> Similarity.qGainsCurve _,
    "q_embedding_sq"    -> Similarity.qEmbeddingSq _,
    "q_kmeans_profile"  -> Similarity.qKmeansProfile _,
    "q_embedding_pca"   -> Similarity.qEmbeddingPca _,
    // §2.5 text analysis
    "q_text_tokens"       -> TextAnalysis.qTextTokens _,
    "q_text_quality"      -> TextAnalysis.qTextQuality _,
    "q_text_langid"       -> TextAnalysis.qTextLangid _,
    "q_text_ngrams"       -> TextAnalysis.qTextNgrams _,
    "q_text_rolling_hash" -> TextAnalysis.qTextRollingHash _,
    "q_text_repetition"   -> TextAnalysis.qTextRepetition _,
    "q_inverted_index"    -> TextAnalysis.qInvertedIndex _,
    "q_tfidf_top"         -> TextAnalysis.qTfidfTop _,
    "q_heavy_hitters"     -> TextAnalysis.qHeavyHitters _,
    "q_text_winnow"       -> TextAnalysis.qTextWinnow _,
    "q_text_collocations" -> TextAnalysis.qTextCollocations _,
    "q_tokenize_bpe"      -> TextAnalysis.qTokenizeBpe _,
    "q_bpe_train"         -> TextAnalysis.qBpeTrain _,
    "q_text_lm_score"     -> TextAnalysis.qTextLmScore _,
    "q_bm25"              -> TextAnalysis.qBm25 _,
    "q_text_entropy"      -> TextAnalysis.qTextEntropy _,
    "q_zipf_fit"          -> TextAnalysis.qZipfFit _,
    "q_chi2_terms"        -> TextAnalysis.qChi2Terms _,
    "q_dedup_winnow"      -> Dedup.qDedupWinnow _,
    "q_lsh_tune"          -> Dedup.qLshTune _,
    "q_pii_redact"        -> Privacy.qPiiRedact _,
    "q_k_anonymity"       -> Privacy.qKAnonymity _,
    "q_t_closeness"       -> Privacy.qTCloseness _,
    // §2.6 multimodal + §2.1 metadata/lineage
    "q_multimodal_meta"    -> Multimodal.qMultimodalMeta _,
    "q_media_header"       -> Multimodal.qMediaHeader _,
    "q_media_frames"       -> Multimodal.qMediaFrames _,
    "q_media_phash"        -> Multimodal.qMediaPhash _,
    "q_media_thumbnail"    -> Multimodal.qMediaThumbnail _,
    "q_meta_profile"       -> ((s, d) => MetadataExtractor.qMetaProfile(s, d)),
    "q_lineage_selfcheck"  -> ((s, d) => graft.lineage.SelfCheck.qLineageSelfcheck(s, d)),
    // sources: non-parquet formats, value-fidelity round-trips
    "q_source_csv"  -> ((s, d) => graft.sources.Sources.qSourceCsv(s, d)),
    "q_source_json" -> ((s, d) => graft.sources.Sources.qSourceJson(s, d)),
    "q_source_orc"  -> ((s, d) => graft.sources.Sources.qSourceOrc(s, d)),
    // scale patterns + pipeline composition
    "q_pagerank"          -> Graph.qPagerank _,
    "q_kcore"             -> Graph.qKcore _,
    "q_graph_bfs"         -> Graph.qGraphBfs _,
    "q_label_prop"        -> Graph.qLabelProp _,
    "q_graph_modularity"  -> Graph.qGraphModularity _,
    "q_hits"              -> Graph.qHits _,
    "q_target_encode"     -> MlPrep.qTargetEncode _,
    "q_feature_hash"      -> MlPrep.qFeatureHash _,
    "q_assoc_rules"       -> MlPrep.qAssocRules _,
    "q_auc_probe"         -> Similarity.qAucProbe _,
    "q_hard_negatives"    -> Similarity.qHardNegatives _,
    "q_calibration"       -> Similarity.qCalibration _,
    "q_mmr_rerank"        -> Similarity.qMmrRerank _,
    "q_rrf_fusion"        -> MlPrep.qRrfFusion _,
    "q_winsorize"         -> MlPrep.qWinsorize _,
    "q_coreset_kcenter"   -> Similarity.qCoresetKcenter _,
    "q_dedup_semantic"    -> Similarity.qDedupSemantic _,
    "q_segment_scrub"     -> Dedup.qSegmentScrub _,
    "q_graph_triangles"   -> Graph.qGraphTriangles _,
    "q_skew_salted_join"  -> SkewOps.qSkewSaltedJoin _,
    "q_skew_report"       -> SkewOps.qSkewReport _,
    "q_zorder_layout"     -> Layout.qZorderLayout _,
    "q_corpus_curate"     -> Pipeline.qCorpusCurate _,
    "q_sample_stratified" -> Pipeline.qSampleStratified _,
    "q_sample_balanced"   -> Pipeline.qSampleBalanced _,
    "q_sample_importance" -> Pipeline.qSampleImportance _,
    "q_sample_fixed"      -> Pipeline.qSampleFixed _,
    "q_sample_reservoir"  -> Pipeline.qSampleReservoir _,
    "q_corpus_drift"      -> Pipeline.qCorpusDrift _,
    "q_js_divergence"     -> Pipeline.qJsDivergence _,
    "q_psi"               -> Pipeline.qPsi _,
    "q_quality_sweep"     -> Pipeline.qQualitySweep _,
    "q_quality_probe"     -> Pipeline.qQualityProbe _,
    "q_corpus_mixture"    -> Pipeline.qCorpusMixture _,
    "q_sample_temperature" -> Pipeline.qSampleTemperature _,
    "q_curriculum"        -> Pipeline.qCurriculum _,
    "q_ngram_novelty"     -> TextAnalysis.qNgramNovelty _,
    "q_pack_sequences"    -> Pipeline.qPackSequences _,
    "q_chunk_overlap"     -> Pipeline.qChunkOverlap _,
    "q_attribution"       -> EventOps.qAttribution _,
    "q_group_kfold"       -> MlPrep.qGroupKfold _,
    "q_woe_iv"            -> MlPrep.qWoeIv _,
    "q_knn_outlier"       -> Similarity.qKnnOutlier _,
    "q_erasure_audit"     -> Privacy.qErasureAudit _,
    "q_link_predict"      -> Graph.qLinkPredict _,
    "q_degree_dist"       -> Graph.qDegreeDist _,
    "q_entity_resolution" -> Dedup.qEntityResolution _,
    "q_dp_release"        -> Privacy.qDpRelease _,
    "q_label_noise"       -> Similarity.qLabelNoise _
  )

  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_base_price,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        | round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        | round(avg(l_quantity), 4) AS avg_qty,
        | round(avg(l_extendedprice), 4) AS avg_price,
        | round(avg(l_discount), 6) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_top_unshipped" ->
      """SELECT l_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        | o_orderdate, o_orderpriority
        |FROM customer JOIN orders ON c_custkey = o_custkey
        | JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        | AND o_orderdate < TIMESTAMP '1998-03-15' AND l_shipdate > TIMESTAMP '1998-03-15'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""".stripMargin,

    "q5_local_volume" ->
      """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        | JOIN lineitem ON l_orderkey = o_orderkey
        | JOIN supplier ON l_suppkey = s_suppkey
        | JOIN nation ON s_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,

    "q_group_topk_window" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn FROM (
        | SELECT o_orderpriority, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS rn
        | FROM orders) t
        |WHERE rn <= 3 ORDER BY o_orderpriority, rn""".stripMargin,

    "q_running_total" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        | round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |   ROWS UNBOUNDED PRECEDING), 2) AS running_spend
        |FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,

    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        |ORDER BY c_custkey""".stripMargin,

    "q_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        |ORDER BY c_custkey""".stripMargin,

    "q_distinct_agg" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS distinct_parts,
        | count(DISTINCT l_suppkey) AS distinct_supps, count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_set_ops" -> Relational.oracleSetOps,

    "q_exists_late"       -> Relational.oracleExistsLate,
    "q_small_qty_revenue" -> Relational.oracleSmallQtyRevenue,
    "q_cust_order_dist"   -> Relational.oracleCustOrderDist,
    "q_supplier_share"    -> Relational.oracleSupplierShare,
    "q_scd2_dim"          -> Relational.oracleScd2Dim,
    "q_scd2_pit"          -> Relational.oracleScd2Pit,
    "q_sketch_merge"      -> Relational.oracleSketchMerge,
    "q_quantile_merge"    -> Relational.oracleQuantileMerge,
    "q_theta_sets"        -> Relational.oracleThetaSets,
    "q_grouping_sets"      -> Relational.oracleGroupingSets,
    "q_window_range"       -> Relational.oracleWindowRange,
    "q_window_battery"     -> Relational.oracleWindowBattery,
    "q_idle_capital"       -> Relational.oracleIdleCapital,
    "q_join_size_est"      -> Relational.oracleJoinSizeEst,
    "q_trend_forecast"     -> Relational.oracleTrendForecast,
    "q_forecast_backtest"  -> Relational.oracleForecastBacktest,
    "q_topk_native"        -> Relational.oracleTopkNative,
    "q_promo_share"        -> Relational.oraclePromoShare,
    "q_band_revenue"       -> Relational.oracleBandRevenue,
    "q_order_gaps"         -> Relational.oracleOrderGaps,
    "q_cohort_ltv"         -> Relational.oracleCohortLtv,
    "q_rfm"                -> Relational.oracleRfm,
    "q_nation_trade"       -> Relational.oracleNationTrade,
    "q_market_share"       -> Relational.oracleMarketShare,
    "q_late_sole_supplier" -> Relational.oracleLateSoleSupplier,
    "q_profit_by_nation_year" -> Relational.oracleProfitByNationYear,
    "q_big_orders"         -> Relational.oracleBigOrders,
    "q_mad_outliers" -> Stats.oracleMadOutliers,
    "q_histogram"    -> Stats.oracleHistogram,
    "q_benford"      -> Stats.oracleBenford,
    "q_ks_test"      -> Stats.oracleKsTest,
    "q_mutual_info"  -> Stats.oracleMutualInfo,
    "q_gini_binned"  -> Stats.oracleGiniBinned,
    "q_autocorr"     -> Stats.oracleAutocorr,
    "q_cramers_v"    -> Stats.oracleCramersV,
    "q_hhi"          -> Stats.oracleHhi,
    "q_cusum_changepoint" -> Stats.oracleCusumChangepoint,
    "q_corr_matrix"   -> Stats.oracleCorrMatrix,
    "q_bootstrap_ci"  -> Stats.oracleBootstrapCi,
    "q_ab_welch"      -> Stats.oracleAbWelch,
    "q_cuped"         -> Stats.oracleCuped,
    "q_survival_km"   -> Stats.oracleSurvivalKm,
    "q_data_quality"      -> Warehouse.oracleDataQuality,
    "q_cdc_apply"         -> Warehouse.oracleCdcApply,
    "q_merge_upsert"      -> Warehouse.oracleMergeUpsert,
    "q_incremental_agg"   -> Warehouse.oracleIncrementalAgg,
    "q_snapshot_diff"     -> Warehouse.oracleSnapshotDiff,

    "q_conditional_pivot" ->
      """SELECT o_orderpriority,
        | count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_open,
        | count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_filled,
        | count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_partial,
        | round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0.0 END), 2) AS open_value
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag, coalesce(l_linestatus, 'ALL') AS linestatus,
        | round(sum(l_extendedprice), 2) AS sum_price, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,

    "q_percentiles" ->
      """SELECT l_returnflag,
        | round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        | round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
        | round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_events_window_agg" ->
      """SELECT date_trunc('hour', make_timestamp(epoch_ns(ts) // 1000)) AS hour_start,
        | event_type, count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_events_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, value, make_timestamp(epoch_ns(ts) // 1000) AS ts FROM events),
        |x AS (SELECT user_id, event_id, value, ts,
        |  CASE WHEN lag(ts) OVER w IS NULL OR epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS new_sess
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT user_id, event_id, value, ts,
        |  CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_id
        |  FROM x)
        |SELECT user_id, sess_id, count(*) AS n_events,
        | round(epoch(max(ts)) - epoch(min(ts)), 6) AS duration_sec,
        | round(sum(value), 2) AS sum_value
        |FROM s GROUP BY user_id, sess_id ORDER BY user_id, sess_id""".stripMargin,

    "q_session_paths" -> EventOps.oracleSessionPaths,
    "q_active_users"  -> EventOps.oracleActiveUsers,
    "q_user_lifecycle" -> EventOps.oracleUserLifecycle,
    "q_burstiness"     -> EventOps.oracleBurstiness,
    "q_dwell_time"     -> EventOps.oracleDwellTime,

    "q_asof_join" ->
      """WITH e AS (SELECT event_id, user_id, event_type, make_timestamp(epoch_ns(ts) // 1000) AS ts FROM events),
        |v AS (SELECT user_id, ts, event_id AS view_id FROM e WHERE event_type = 'view'),
        |p AS (SELECT user_id, ts, event_id AS purchase_id FROM e WHERE event_type = 'purchase')
        |SELECT p.purchase_id, p.user_id, v.view_id,
        | round(epoch(p.ts) - epoch(v.ts), 6) AS lag_sec
        |FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND v.ts <= p.ts
        |ORDER BY p.purchase_id""".stripMargin,

    "q_events_funnel"   -> EventOps.oracleEventsFunnel,
    "q_markov_transitions" -> EventOps.oracleMarkovTransitions,
    "q_range_join"      -> EventOps.oracleRangeJoin,
    "q_retention_cohorts" -> EventOps.oracleRetentionCohorts,
    "q_json_props"        -> EventOps.oracleJsonProps,
    "q_events_anomaly"    -> EventOps.oracleEventsAnomaly,
    "q_events_ewma"       -> EventOps.oracleEventsEwma,
    "q_session_window"    -> EventOps.oracleSessionWindow,
    "q_time_weighted_avg" -> EventOps.oracleTimeWeightedAvg,
    "q_seasonal_profile"  -> EventOps.oracleSeasonalProfile,
    "q_stl_decompose"     -> EventOps.oracleStlDecompose,
    "q_holt_winters"      -> EventOps.oracleHoltWinters,
    "q_sketch_distinct" -> Relational.oracleSketchDistinct,
    "q_sketch_quantile" -> Relational.oracleSketchQuantile,

    "q_dedup_exact"         -> Dedup.oracleExact,
    "q_dedup_fingerprint"   -> Dedup.oracleFingerprint,
    "q_dedup_ngram_jaccard" -> Dedup.oracleNgramJaccard,
    "q_dedup_minhash_lsh"   -> Dedup.oracleMinhashLsh,
    "q_dedup_clusters"      -> Dedup.oracleClusters,
    "q_dedup_verdict"       -> Dedup.oracleDedupVerdict,
    "q_dedup_simhash"       -> Dedup.oracleSimhash,
    "q_dedup_simhash_pairs" -> Dedup.oracleSimhashPairs,
    "q_dedup_embedding"     -> Dedup.oracleEmbedding,
    "q_decontaminate"       -> Dedup.oracleDecontaminate,
    "q_dedup_recall"        -> Dedup.oracleDedupRecall,
    "q_bloom_decontaminate" -> Dedup.oracleDecontaminate,
    "q_decontaminate_auto"  -> Dedup.oracleDecontaminate,
    "q_split_leakage"       -> Dedup.oracleSplitLeakage,
    "q_segment_dedup"       -> Dedup.oracleSegmentDedup,
    "q_dedup_by_source"     -> Dedup.oracleDedupBySource,
    "q_source_overlap"      -> Dedup.oracleSourceOverlap,
    "q_dedup_soft"          -> Dedup.oracleDedupSoft,
    "q_dedup_substring"     -> Dedup.oracleDedupSubstring,
    "q_dedup_spans"         -> Dedup.oracleDedupSpans,
    "q_span_scrub"          -> Dedup.oracleSpanScrub,
    "q_dedup_incremental"   -> Dedup.oracleDedupIncremental,
    "q_dedup_editdist"      -> Dedup.oracleDedupEditdist,
    "q_text_containment"    -> Dedup.oracleTextContainment,

    "q_knn_brute"    -> Similarity.oracleKnnBrute,
    "q_knn_lsh"      -> Similarity.oracleKnnLsh,
    "q_knn_centroid" -> Similarity.oracleKnnCentroid,
    "q_knn_ivf"      -> Similarity.oracleKnnIvf,
    "q_knn_recall"   -> Similarity.oracleKnnRecall,
    "q_knn_nprobe"   -> Similarity.oracleKnnNprobe,
    "q_semdedup_sweep" -> Similarity.oracleSemdedupSweep,
    "q_knn_pq"       -> Similarity.oracleKnnPq,
    "q_embedding_profile" -> Similarity.oracleEmbeddingProfile,
    "q_knn_ivfpq"    -> Similarity.oracleKnnIvfPq,
    "q_embedding_jl"    -> Similarity.oracleEmbeddingJl,
    "q_embedding_probe" -> Similarity.oracleEmbeddingProbe,
    "q_uncertainty_sample" -> Similarity.oracleUncertaintySample,
    "q_gains_curve"     -> Similarity.oracleGainsCurve,
    "q_embedding_sq"    -> Similarity.oracleEmbeddingSq,
    "q_kmeans_profile"  -> Similarity.oracleKmeansProfile,
    "q_embedding_pca"   -> Similarity.oracleEmbeddingPca,

    "q_text_tokens"       -> TextAnalysis.oracleTokens,
    "q_text_quality"      -> TextAnalysis.oracleQuality,
    "q_text_langid"       -> TextAnalysis.oracleLangid,
    "q_text_ngrams"       -> TextAnalysis.oracleNgrams,
    "q_text_rolling_hash" -> TextAnalysis.oracleRollingHash,
    "q_text_repetition"   -> TextAnalysis.oracleRepetition,
    "q_inverted_index"    -> TextAnalysis.oracleInvertedIndex,
    "q_tfidf_top"         -> TextAnalysis.oracleTfidfTop,
    "q_heavy_hitters"     -> TextAnalysis.oracleHeavyHitters,
    "q_text_winnow"       -> TextAnalysis.oracleTextWinnow,
    "q_text_collocations" -> TextAnalysis.oracleTextCollocations,
    "q_tokenize_bpe"      -> TextAnalysis.oracleTokenizeBpe,
    "q_bpe_train"         -> TextAnalysis.oracleBpeTrain,
    "q_text_lm_score"     -> TextAnalysis.oracleTextLmScore,
    "q_bm25"              -> TextAnalysis.oracleBm25,
    "q_text_entropy"      -> TextAnalysis.oracleTextEntropy,
    "q_zipf_fit"          -> TextAnalysis.oracleZipfFit,
    "q_chi2_terms"        -> TextAnalysis.oracleChi2Terms,
    "q_dedup_winnow"      -> Dedup.oracleWinnow,
    "q_lsh_tune"          -> Dedup.oracleLshTune,
    "q_pii_redact"        -> Privacy.oraclePiiRedact,
    "q_k_anonymity"       -> Privacy.oracleKAnonymity,
    "q_t_closeness"       -> Privacy.oracleTCloseness,

    "q_multimodal_meta"   -> Multimodal.oracleMultimodalMeta,
    "q_media_header"      -> Multimodal.oracleMediaHeader,
    "q_media_frames"      -> Multimodal.oracleMediaFrames,
    "q_media_phash"       -> Multimodal.oracleMediaPhash,
    "q_media_thumbnail"   -> Multimodal.oracleMediaThumbnail,
    "q_meta_profile"      -> MetadataExtractor.oracleMetaProfile,
    "q_lineage_selfcheck" -> graft.lineage.SelfCheck.oracleLineageSelfcheck,
    "q_source_csv"        -> graft.sources.Sources.oracleSourceCsv,
    "q_source_json"       -> graft.sources.Sources.oracleSourceJson,
    "q_source_orc"        -> graft.sources.Sources.oracleSourceOrc,
    "q_pagerank"          -> Graph.oraclePagerank,
    "q_kcore"             -> Graph.oracleKcore,
    "q_graph_bfs"         -> Graph.oracleGraphBfs,
    "q_label_prop"        -> Graph.oracleLabelProp,
    "q_graph_modularity"  -> Graph.oracleGraphModularity,
    "q_hits"              -> Graph.oracleHits,
    "q_target_encode"     -> MlPrep.oracleTargetEncode,
    "q_feature_hash"      -> MlPrep.oracleFeatureHash,
    "q_assoc_rules"       -> MlPrep.oracleAssocRules,
    "q_auc_probe"         -> Similarity.oracleAucProbe,
    "q_hard_negatives"    -> Similarity.oracleHardNegatives,
    "q_calibration"       -> Similarity.oracleCalibration,
    "q_mmr_rerank"        -> Similarity.oracleMmrRerank,
    "q_rrf_fusion"        -> MlPrep.oracleRrfFusion,
    "q_winsorize"         -> MlPrep.oracleWinsorize,
    "q_coreset_kcenter"   -> Similarity.oracleCoresetKcenter,
    "q_dedup_semantic"    -> Similarity.oracleDedupSemantic,
    "q_segment_scrub"     -> Dedup.oracleSegmentScrub,
    "q_graph_triangles"   -> Graph.oracleGraphTriangles,
    "q_skew_salted_join"  -> SkewOps.oracleSkewSaltedJoin,
    "q_skew_report"       -> SkewOps.oracleSkewReport,
    "q_zorder_layout"     -> Layout.oracleZorderLayout,
    "q_corpus_curate"     -> Pipeline.oracleCorpusCurate,
    "q_sample_stratified" -> Pipeline.oracleSampleStratified,
    "q_sample_balanced"   -> Pipeline.oracleSampleBalanced,
    "q_sample_importance" -> Pipeline.oracleSampleImportance,
    "q_sample_fixed"      -> Pipeline.oracleSampleFixed,
    "q_sample_reservoir"  -> Pipeline.oracleSampleReservoir,
    "q_corpus_drift"      -> Pipeline.oracleCorpusDrift,
    "q_js_divergence"     -> Pipeline.oracleJsDivergence,
    "q_psi"               -> Pipeline.oraclePsi,
    "q_quality_sweep"     -> Pipeline.oracleQualitySweep,
    "q_quality_probe"     -> Pipeline.oracleQualityProbe,
    "q_corpus_mixture"    -> Pipeline.oracleCorpusMixture,
    "q_sample_temperature" -> Pipeline.oracleSampleTemperature,
    "q_curriculum"        -> Pipeline.oracleCurriculum,
    "q_ngram_novelty"     -> TextAnalysis.oracleNgramNovelty,
    "q_pack_sequences"    -> Pipeline.oraclePackSequences,
    "q_chunk_overlap"     -> Pipeline.oracleChunkOverlap,
    "q_attribution"       -> EventOps.oracleAttribution,
    "q_group_kfold"       -> MlPrep.oracleGroupKfold,
    "q_woe_iv"            -> MlPrep.oracleWoeIv,
    "q_knn_outlier"       -> Similarity.oracleKnnOutlier,
    "q_erasure_audit"     -> Privacy.oracleErasureAudit,
    "q_link_predict"      -> Graph.oracleLinkPredict,
    "q_degree_dist"       -> Graph.oracleDegreeDist,
    "q_entity_resolution" -> Dedup.oracleEntityResolution,
    "q_dp_release"        -> Privacy.oracleDpRelease,
    "q_label_noise"       -> Similarity.oracleLabelNoise
  )
}
