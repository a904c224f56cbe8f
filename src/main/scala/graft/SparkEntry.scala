package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.dedup.Dedup
import graft.multimodal.Multimodal
import graft.operators.{Advanced, Analytics, Diagnostics, Geo, Graph, MLPrep, Relational, TextQueries}
import graft.similarity.Similarity

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY §2 (plus the BASELINE.json
  * extension surface) gets a `queries` entry; entries with a DuckDB-
  * expressible equivalent also get an `oracleSql` entry (hash-compared by the
  * driver at sf0.01). Column names/aliases are kept identical on both sides
  * — the compare sorts columns by name before hashing.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Multi-way broadcast-join + aggregation through the dimension chain. */
  def entry(spark: SparkSession): DataFrame =
    Relational.joinMultiway(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_scan_project" -> (Relational.scanProject(_, _)),
    "q02_filter_eq" -> (Relational.filterEq(_, _)),
    "q03_filter_neq" -> (Relational.filterNeq(_, _)),
    "q04_count_global" -> (Relational.countGlobal(_, _)),
    "q05_clean_chain" -> (Relational.cleanChain(_, _)),
    "q06_project_schema" -> (Relational.projectSchema(_, _)),
    "q07_split_counts" -> (Relational.splitCounts(_, _)),
    "q08_partition_counts" -> (Relational.partitionCounts(_, _)),
    "q09_agg_groupby" -> (Relational.aggGroupBy(_, _)),
    "q10_join_broadcast" -> (Relational.joinBroadcast(_, _)),
    "q11_join_large" -> (Relational.joinLarge(_, _)),
    "q12_join_multiway" -> (Relational.joinMultiway(_, _)),
    "q13_join_anti" -> (Relational.joinAnti(_, _)),
    "q14_join_semi" -> (Relational.joinSemi(_, _)),
    "q15_topk_per_key" -> (Relational.topKPerKey(_, _)),
    "q16_distinct" -> (Relational.distinctKeys(_, _)),
    "q17_orderby_limit" -> (Relational.orderByLimit(_, _)),
    "q18_union_agg" -> (Relational.unionAgg(_, _)),
    "q19_events_windowed" -> (Relational.eventsWindowed(_, _)),
    "q20_count_distinct" -> (Relational.approxDistinct(_, _)),
    "q21_text_stats" -> (TextQueries.textStats(_, _)),
    "q22_langid" -> (TextQueries.langIdConfusion(_, _)),
    "q23_fingerprint" -> (TextQueries.fingerprints(_, _)),
    "q24_dedup_exact" -> (Dedup.exactStats(_, _)),
    "q25_dedup_normalized" -> (Dedup.normalizedDupGroups(_, _)),
    "q26_dedup_ngram_jaccard" -> ((s, d) => Dedup.ngramJaccardPairs(s, d)),
    "q27_dedup_minhash" -> ((s, d) => Dedup.minhashRecallCheck(s, d)),
    "q28_dedup_simhash" -> (Dedup.simhashCoverageCheck(_, _)),
    "q29_embed_neardup" -> ((s, d) => Similarity.cosineNearDupPairs(s, d)),
    "q30_ann_bruteforce" -> ((s, d) => Similarity.bruteForceTopK(s, d)),
    "q31_ann_ivf" -> ((s, d) => Similarity.ivfRecallCheck(s, d)),
    "q32_multimodal_meta" -> (Multimodal.metadata(_, _)),
    "q33_frame_sample" -> ((s, d) => Multimodal.sampleFramesAscii(s, d)),
    "q34_asof_join" -> (Relational.asofJoin(_, _)),
    "q35_rollup" -> (Relational.rollupAgg(_, _)),
    "q36_json_extract" -> (Relational.jsonExtract(_, _)),
    "q37_explode_items" -> (Relational.explodeItems(_, _)),
    "q38_sessionize" -> (graft.streaming.Sessionize.batch(_, _)),
    "q39_percentiles" -> (Relational.percentiles(_, _)),
    "q40_cube" -> (Relational.cubeAgg(_, _)),
    "q41_salted_join" -> (Relational.saltedJoin(_, _)),
    "q42_tfidf" -> (Relational.tfidf(_, _)),
    "q43_intersect" -> (Relational.intersectKeys(_, _)),
    "q44_except" -> (Relational.exceptKeys(_, _)),
    "q45_predicates" -> (Relational.predicates(_, _)),
    "q46_pivot" -> (Relational.pivotAgg(_, _)),
    "q47_dedup_apply" -> ((s, d) => Dedup.dedupApplyCheck(s, d)),
    "q48_approx_distinct" -> (Relational.approxDistinctCheck(_, _)),
    "q49_hotkey_salted_join" -> ((s, d) => Relational.hotKeySaltedJoin(s, d)),
    "q50_window_battery" -> (Advanced.windowBattery(_, _)),
    "q51_grouping_sets" -> (Advanced.groupingSetsAgg(_, _)),
    "q52_range_join" -> (Advanced.rangeJoin(_, _)),
    "q53_corr_subquery" -> (Advanced.correlatedSubquery(_, _)),
    "q54_bucketed_join" -> (Advanced.bucketedJoin(_, _)),
    "q55_regex_extract" -> (Advanced.regexExtractAgg(_, _)),
    "q56_minmax_by" -> (Advanced.minMaxBy(_, _)),
    "q57_histogram" -> (Advanced.histogram(_, _)),
    "q58_format_roundtrip" -> (Advanced.formatRoundtrip(_, _)),
    "q59_fuzzy_levenshtein" -> ((s, d) => Advanced.fuzzyLevenshtein(s, d)),
    "q60_datetime_battery" -> (Advanced.datetimeBattery(_, _)),
    "q61_string_battery" -> (Advanced.stringBattery(_, _)),
    "q62_null_battery" -> (Advanced.nullBattery(_, _)),
    "q63_stratified_sample" -> ((s, d) => Advanced.stratifiedSample(s, d)),
    "q64_shard_pack" -> ((s, d) => Advanced.shardPack(s, d)),
    "q65_percentile_groups" -> (Advanced.percentileGroups(_, _)),
    "q66_funnel" -> (Advanced.funnel(_, _)),
    "q67_cohort_retention" -> (Advanced.cohortRetention(_, _)),
    "q68_array_battery" -> (Advanced.arrayBattery(_, _)),
    "q69_contamination" -> (Advanced.contamination(_, _)),
    "q70_cumulative_users" -> (Advanced.cumulativeUsers(_, _)),
    "q71_rank_battery" -> (Advanced.rankBattery(_, _)),
    "q72_ewma" -> ((s, d) => Advanced.ewmaPerUser(s, d)),
    "q73_hopping_windows" -> (Advanced.hoppingWindows(_, _)),
    "q74_asof_native" -> (Relational.asofJoinNative(_, _)),
    "q75_gopher_quality" -> (TextQueries.gopherQuality(_, _)),
    "q76_dup_spans" -> (TextQueries.dupSpans(_, _)),
    "q77_pii_redact" -> (TextQueries.piiRedact(_, _)),
    "q78_bm25" -> (TextQueries.bm25(_, _)),
    "q79_inverted_index" -> (TextQueries.invertedIndex(_, _)),
    "q80_char_entropy" -> (TextQueries.charEntropy(_, _)),
    "q81_heavy_hitters" -> (TextQueries.heavyHitters(_, _)),
    "q82_column_profile" -> (Advanced.columnProfile(_, _)),
    "q83_rp_lsh_neardup" -> ((s, d) => Similarity.rpLshRecallCheck(s, d)),
    "q84_pq_ann" -> ((s, d) => Similarity.pqRecallCheck(s, d)),
    "q85_gap_fill" -> (Advanced.gapFill(_, _)),
    "q86_pagerank" -> (Graph.pagerank(_, _)),
    "q87_unpivot" -> (Advanced.unpivotBands(_, _)),
    "q88_range_frames" -> (Advanced.rangeFrameWindows(_, _)),
    "q89_lateral_topk" -> (Advanced.lateralTopK(_, _)),
    "q90_outer_joins" -> (Advanced.outerJoins(_, _)),
    "q91_bag_setops" -> (Advanced.bagSetOps(_, _)),
    "q92_asof_forward" -> (Relational.asofJoinForward(_, _)),
    "q93_stats_battery" -> (Advanced.statsBattery(_, _)),
    "q94_session_window" -> (Advanced.sessionWindowAgg(_, _)),
    "q95_asof_sql" -> (Relational.asofJoinSql(_, _)),
    "q96_ivfpq_ann" -> ((s, d) => Similarity.ivfPqRecallCheck(s, d)),
    "q97_scd2_merge" -> (Advanced.scd2Merge(_, _)),
    "q98_bfs_reach" -> ((s, d) => Graph.bfsReachability(s, d)),
    "q99_interval_concurrency" -> ((s, d) => Advanced.intervalConcurrency(s, d)),
    "q100_skyline" -> (Advanced.skyline(_, _)),
    "q101_weighted_sample" -> (Advanced.weightedSample(_, _)),
    "q102_listagg" -> (Advanced.orderedListAgg(_, _)),
    "q103_bloom_join" -> (Relational.bloomPrunedJoin(_, _)),
    "q104_time_range_frames" -> (Advanced.timeRangeFrames(_, _)),
    "q105_filter_aggs" -> (Advanced.filterClauseAggs(_, _)),
    "q106_nullsafe_join" -> (Advanced.nullSafeJoin(_, _)),
    "q107_hof_battery" -> (Advanced.hofBattery(_, _)),
    "q108_moments" -> (Advanced.momentsBattery(_, _)),
    "q109_bitwise_aggs" -> (Advanced.bitwiseAggs(_, _)),
    "q110_recursive_chain" -> (Advanced.recursiveChain(_, _)),
    "q111_sketch_quantiles" -> (Advanced.sketchQuantiles(_, _)),
    "q112_opq_ann" -> ((s, d) => Similarity.opqRecallCheck(s, d)),
    "q113_url_extract" -> (Advanced.urlExtract(_, _)),
    "q114_try_battery" -> (Advanced.tryBattery(_, _)),
    "q115_explode_outer" -> (Advanced.explodeOuter(_, _)),
    "q116_hll_union" -> (Advanced.hllUnionCheck(_, _)),
    "q117_map_battery" -> (Advanced.mapBattery(_, _)),
    "q118_percentile_disc" -> (Advanced.percentileDisc(_, _)),
    "q119_linear_interpolate" -> (Advanced.linearInterpolate(_, _)),
    "q120_hash_battery" -> (Advanced.hashBattery(_, _)),
    "q121_snapshot_diff" -> (Advanced.snapshotDiff(_, _)),
    "q122_equidepth_hist" -> (Advanced.equidepthHistogram(_, _)),
    "q123_zscore" -> (Advanced.zscoreNormalize(_, _)),
    "q124_connected_components" -> ((s, d) => Graph.docDupComponents(s, d)),
    "q125_geo_nearest" -> (Geo.nearestSupplier(_, _)),
    "q126_variant_battery" -> (Advanced.variantBattery(_, _)),
    "q127_bigram_lm" -> (TextQueries.bigramLm(_, _)),
    "q128_robust_scale" -> (Advanced.robustScale(_, _)),
    "q129_seq_pattern" -> (Advanced.sequencePattern(_, _)),
    "q130_running_distinct" -> (Advanced.runningDistinct(_, _)),
    "q131_timezone_battery" -> (Advanced.timezoneBattery(_, _)),
    "q132_weighted_quantiles" -> (Advanced.weightedQuantiles(_, _)),
    "q133_pointer_doubling" -> (Advanced.pointerDoubling(_, _)),
    "q134_prefix_filter_join" -> ((s, d) => Dedup.prefixFilterJaccardPairs(s, d)),
    "q135_chi_square" -> (Advanced.chiSquare(_, _)),
    "q136_mad_outliers" -> (Advanced.madOutliers(_, _)),
    "q137_relational_division" -> (Advanced.relationalDivision(_, _)),
    "q138_bitmap_distinct" -> (Advanced.bitmapDistinct(_, _)),
    "q139_knn_triangles" -> ((s, d) => Graph.knnTriangles(s, d)),
    "q140_incremental_agg" -> (Advanced.incrementalAgg(_, _)),
    "q141_seasonal_decompose" -> (Advanced.seasonalDecompose(_, _)),
    "q142_timed_funnel" -> (Advanced.timedFunnel(_, _)),
    "q143_activity_streaks" -> (Advanced.activityStreaks(_, _)),
    "q144_tpch_q1" -> (graft.operators.TpchClassics.q1(_, _)),
    "q145_tpch_q3" -> (graft.operators.TpchClassics.q3(_, _)),
    "q146_tpch_q5" -> (graft.operators.TpchClassics.q5(_, _)),
    "q147_tpch_q4" -> (graft.operators.TpchClassics.q4(_, _)),
    "q148_tpch_q10" -> (graft.operators.TpchClassics.q10(_, _)),
    "q149_tpch_q13" -> (graft.operators.TpchClassics.q13(_, _)),
    "q150_tpch_q18" -> ((s, d) => graft.operators.TpchClassics.q18(s, d)),
    "q151_tpch_q22" -> (graft.operators.TpchClassics.q22(_, _)),
    "q152_tpch_q7" -> (graft.operators.TpchClassics.q7(_, _)),
    "q153_tpch_q8" -> (graft.operators.TpchClassics.q8(_, _)),
    "q154_tpch_q14" -> (graft.operators.TpchClassics.q14(_, _)),
    "q155_tpch_q19" -> (graft.operators.TpchClassics.q19(_, _)),
    "q156_rolling_wau" -> (Advanced.rollingWau(_, _)),
    "q157_nth_value" -> (Advanced.nthValueBattery(_, _)),
    "q158_codec_battery" -> ((s, d) =>
      Multimodal.codecRoundtrip(Multimodal.assets(s, d), s)),
    "q159_xml_battery" -> (Advanced.xmlBattery(_, _)),
    "q160_group_by_all" -> (Advanced.groupByAll(_, _)),
    "q161_multi_distinct" -> (Advanced.multiDistinct(_, _)),
    "q162_asof_tolerance" -> (Relational.asofJoinTolerance(_, _)),
    "q163_typed_pipeline" -> (Advanced.typedPipeline(_, _)),
    "q164_audio_battery" -> ((s, d) =>
      Multimodal.audioRoundtrip(Multimodal.assets(s, d), s)),
    "q165_kmeans" -> (graft.similarity.Clustering.kmeans(_, _)),
    "q166_label_propagation" -> ((s, d) => Graph.labelPropagation(s, d)),
    "q167_shortest_paths" -> ((s, d) => Graph.shortestPaths(s, d)),
    "q168_repetition_removal" -> (TextQueries.repetitionRemoval(_, _)),
    "q169_allen_intervals" -> (Advanced.allenIntervals(_, _)),
    "q170_mixture_sample" -> (TextQueries.mixtureSample(_, _)),
    "q171_bloom_decontaminate" -> (Advanced.bloomDecontaminate(_, _)),
    "q172_mode_battery" -> (Advanced.modeBattery(_, _)),
    "q173_cm_frequent" -> (TextQueries.cmFrequentBigrams(_, _)),
    "q174_bpe_tokens" -> (TextQueries.bpeLossless(_, _)),
    "q175_global_rownumber" -> (Advanced.globalRowNumber(_, _)),
    "q176_binned_range_join" -> (Advanced.binnedRangeJoin(_, _)),
    "q177_markov_transitions" -> (Advanced.markovTransitions(_, _)),
    "q178_vector_battery" -> (Advanced.vectorBattery(_, _)),
    "q179_fold_assignment" -> ((s, d) => Advanced.foldAssignment(s, d)),
    "q180_autocorrelation" -> ((s, d) => Advanced.autocorrelation(s, d)),
    "q181_reservoir_sample" -> ((s, d) => Advanced.reservoirSample(s, d)),
    "q182_regression_battery" -> (Advanced.regressionBattery(_, _)),
    "q183_jaro_winkler" -> (Advanced.jaroWinklerJoin(_, _)),
    "q184_compression_signal" -> (TextQueries.compressionSignalCheck(_, _)),
    "q185_sparse_cosine" -> (TextQueries.sparseCosine(_, _)),
    "q186_basket_lift" -> (Analytics.basketLift(_, _)),
    "q187_rfm_segments" -> (Analytics.rfmSegments(_, _)),
    "q188_quantile_normalize" -> (Analytics.quantileNormalize(_, _)),
    "q189_fk_audit" -> (Analytics.fkAudit(_, _)),
    "q190_attribution" -> (Analytics.lastTouchAttribution(_, _)),
    "q191_cusum" -> (Analytics.cusumDetect(_, _)),
    "q192_kaplan_meier" -> (Analytics.kaplanMeier(_, _)),
    "q193_gini" -> (Analytics.giniSpend(_, _)),
    "q194_benford" -> (Analytics.benfordAudit(_, _)),
    "q195_path_trigrams" -> (Analytics.pathTrigrams(_, _)),
    "q196_ab_test" -> (Analytics.abTest(_, _)),
    "q197_auc" -> (Analytics.aucRank(_, _)),
    "q198_ks_test" -> (Analytics.ksTest(_, _)),
    "q199_theil_sen" -> (Analytics.theilSen(_, _)),
    "q200_pareto" -> (Analytics.paretoCoverage(_, _)),
    "q201_mutual_info" -> (Analytics.mutualInfo(_, _)),
    "q202_seat_alloc" -> (Analytics.seatAllocation(_, _)),
    "q203_rank_correlation" -> (Analytics.rankCorrelation(_, _)),
    "q204_chunk_dedup" -> (TextQueries.chunkDedup(_, _)),
    "q205_fifo_costing" -> (Analytics.fifoCosting(_, _)),
    "q206_nfc_normalize" -> (TextQueries.unicodeNormalize(_, _)),
    "q207_three_core" -> ((s, d) => Graph.threeCore(s, d)),
    "q208_psi_drift" -> (Analytics.psiDrift(_, _)),
    "q209_price_volume_mix" -> (Analytics.priceVolumeMix(_, _)),
    "q210_adamic_adar" -> ((s, d) => Graph.adamicAdar(s, d)),
    "q211_assortativity" -> ((s, d) => Graph.assortativity(s, d)),
    "q212_pca_power" -> (graft.similarity.PCA.powerIteration(_, _)),
    "q213_bh_fdr" -> (Analytics.bhFdr(_, _)),
    "q214_isotonic_calibration" -> (Analytics.isotonicCalibration(_, _)),
    "q215_zipf_fit" -> (TextQueries.zipfFit(_, _)),
    "q216_sq8_ann" ->
      ((s, d) => graft.similarity.Similarity.sq8TopK(s, d)),
    "q217_wilson_ranking" -> (Analytics.wilsonRanking(_, _)),
    "q218_join_ivm" -> (Analytics.joinIvm(_, _)),
    "q219_feature_hashing" -> (MLPrep.featureHashing(_, _)),
    "q220_target_encoding" -> (MLPrep.targetEncoding(_, _)),
    "q221_woe_iv" -> (MLPrep.woeIv(_, _)),
    "q222_corr_matrix" -> (MLPrep.corrMatrix(_, _)),
    "q223_mann_whitney" -> (MLPrep.mannWhitney(_, _)),
    "q224_changepoint" -> (MLPrep.changepoint(_, _)),
    "q225_rerank_ann" ->
      ((s, d) => graft.similarity.Similarity.rerankTopK(s, d)),
    "q226_hits" -> ((s, d) => Graph.hits(s, d)),
    "q227_grid_dbscan" -> ((s, d) => Graph.gridDbscan(s, d)),
    "q228_hodges_lehmann" -> (MLPrep.hodgesLehmann(_, _)),
    "q229_pmi_collocations" ->
      ((s, d) => TextQueries.pmiCollocations(s, d)),
    "q230_skipgram_cooc" ->
      ((s, d) => TextQueries.skipgramCooc(s, d)),
    "q231_weighted_jaccard" ->
      ((s, d) => TextQueries.weightedJaccard(s, d)),
    "q232_item_cosine" -> ((s, d) => Graph.itemCosine(s, d)),
    "q233_two_hop_reach" -> ((s, d) => Graph.twoHopReach(s, d)),
    "q234_lexical_richness" -> (TextQueries.lexicalRichness(_, _)),
    "q235_tpch_q6" -> (graft.operators.TpchClassics.q6(_, _)),
    "q236_tpch_q15" -> (graft.operators.TpchClassics.q15(_, _)),
    "q237_tpch_q17" -> (graft.operators.TpchClassics.q17(_, _)),
    "q238_calibration_ece" -> (MLPrep.calibrationError(_, _)),
    "q239_ndcg" -> (MLPrep.ndcgAt10(_, _)),
    "q240_shingle_containment" ->
      ((s, d) => TextQueries.shingleContainment(s, d)),
    "q241_tpch_q9" -> (graft.operators.TpchClassics.q9(_, _)),
    "q242_time_decay" -> (MLPrep.timeDecayScore(_, _)),
    "q243_fd_histogram" -> (MLPrep.fdHistogram(_, _)),
    "q244_tpch_q2" -> (graft.operators.TpchClassics.q2(_, _)),
    "q245_tpch_q11" -> ((s, d) => graft.operators.TpchClassics.q11(s, d)),
    "q246_tpch_q12" -> (graft.operators.TpchClassics.q12(_, _)),
    "q247_tpch_q16" -> (graft.operators.TpchClassics.q16(_, _)),
    "q248_tpch_q20" -> (graft.operators.TpchClassics.q20(_, _)),
    "q249_tpch_q21" -> (graft.operators.TpchClassics.q21(_, _)),
    // oracle-exact arm: the q233 wedge-join 2-hop counts; the HLL
    // estimate itself crosses the gate as the est_ok bound boolean
    "q250_hyperanf" -> ((s, d) => Graph.hyperAnfCheck(s, d)),
    "q251_heaps_law" -> (TextQueries.heapsLaw(_, _)),
    "q252_chunk_overlap" -> ((s, d) => TextQueries.chunkOverlap(s, d)),
    "q253_mixture_rebalance" -> (Advanced.mixtureRebalance(_, _)),
    "q254_leakage_safe_split" -> (Advanced.leakageSafeSplit(_, _)),
    "q255_repetition_signals" -> (TextQueries.repetitionSignals(_, _)),
    "q256_semdedup" -> ((s, d) => Similarity.semDedup(s, d)),
    "q257_dsir_weights" -> (TextQueries.dsirWeights(_, _)),
    "q258_pack_contexts" -> (Advanced.packContexts(_, _)),
    "q259_curation_pipeline" -> (Advanced.curationPipeline(_, _)),
    "q260_substring_dedup" -> ((s, d) => Dedup.substringDedup(s, d)),
    "q261_winnowing" -> ((s, d) => TextQueries.winnowing(s, d)),
    "q262_filtered_ann" -> ((s, d) => Similarity.filteredTopK(s, d)),
    "q263_ccnet_buckets" -> ((s, d) => TextQueries.ccnetBuckets(s, d)),
    "q264_embedding_outliers" -> ((s, d) => Similarity.embeddingOutliers(s, d)),
    "q265_source_kl" -> ((s, d) => TextQueries.sourceKl(s, d)),
    "q266_mixture_planner" -> ((s, d) => Advanced.mixturePlanner(s, d)),
    "q267_substring_dedup_apply" ->
      ((s, d) => Dedup.substringDedupApply(s, d)),
    "q268_hashed_drift" -> ((s, d) => TextQueries.hashedDrift(s, d)),
    "q269_ivf_delta_ingest" ->
      ((s, d) => Similarity.ivfDeltaRecallCheck(s, d)),
    "q270_dup_provenance" -> ((s, d) => Dedup.dupProvenance(s, d)),
    "q271_minhash_calibration" ->
      ((s, d) => Dedup.minhashCalibration(s, d)),
    "q272_neardup_provenance" ->
      ((s, d) => Dedup.neardupProvenance(s, d)),
    "q273_snapshot_dedup" -> ((s, d) => Dedup.snapshotDedup(s, d)),
    "q274_filter_ablation" -> ((s, d) => Advanced.filterAblation(s, d)),
    "q275_embedding_health" ->
      ((s, d) => Similarity.embeddingHealth(s, d)),
    "q276_vocab_coverage" -> ((s, d) => TextQueries.vocabCoverage(s, d)),
    "q277_dsir_ess" -> ((s, d) => TextQueries.dsirEss(s, d)),
    "q278_snapshot_neardup" -> ((s, d) => Dedup.snapshotNeardup(s, d)),
    "q279_key_skew" -> ((s, d) => Diagnostics.keySkewAudit(s, d)),
    "q280_sentiment" -> ((s, d) => TextQueries.sentimentBySource(s, d)),
    "q281_ivf_probe_curve" ->
      ((s, d) => Similarity.ivfProbeCurve(s, d)),
    "q282_sq8_distortion" ->
      ((s, d) => Similarity.sq8Distortion(s, d)),
    "q283_pack_efficiency" -> ((s, d) => Advanced.packEfficiency(s, d)),
    "q284_fuzzy_phone_linkage" ->
      ((s, d) => Advanced.fuzzyPhoneLinkage(s, d)),
    "q285_image_neardup_pairs" ->
      ((s, d) => graft.multimodal.ImageNeardup.imageNeardupPairs(s, d)),
    "q286_image_neardup_apply" ->
      ((s, d) => graft.multimodal.ImageNeardup.imageNeardupApply(s, d)),
    "q287_image_neardup_wide" ->
      ((s, d) => graft.multimodal.ImageNeardup.imageNeardupWide(s, d)),
    "q288_audio_neardup_pairs" ->
      ((s, d) => graft.multimodal.AudioNeardup.audioNeardupPairs(s, d)),
    "q289_audio_neardup_apply" ->
      ((s, d) => graft.multimodal.AudioNeardup.audioNeardupApply(s, d)),
    "q290_audio_neardup_wide" ->
      ((s, d) => graft.multimodal.AudioNeardup.audioNeardupWide(s, d)),
    "q291_video_neardup_pairs" ->
      ((s, d) => graft.multimodal.VideoNeardup.videoNeardupPairs(s, d)),
    "q292_video_neardup_apply" ->
      ((s, d) => graft.multimodal.VideoNeardup.videoNeardupApply(s, d)),
    "q293_video_neardup_gif" ->
      ((s, d) => graft.multimodal.VideoNeardup.videoNeardupPairsGif(s, d)),
    "q294_video_neardup_gif_apply" ->
      ((s, d) => graft.multimodal.VideoNeardup.videoNeardupApplyGif(s, d)),
    "q295_video_neardup_mjpeg" ->
      ((s, d) => graft.multimodal.VideoNeardup.videoNeardupPairsMjpeg(s, d)),
    "q296_video_neardup_mjpeg_apply" ->
      ((s, d) => graft.multimodal.VideoNeardup.videoNeardupApplyMjpeg(s, d)),
  )

  /** DuckDB equivalents, same column names (aliased identically on both
    * sides). Omitted where not SQL-expressible. */
  def oracleSql: Map[String, String] = Map(
    "q01_scan_project" ->
      "SELECT l_orderkey, l_extendedprice FROM lineitem",
    "q02_filter_eq" ->
      "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderstatus = 'F'",
    "q03_filter_neq" ->
      "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderstatus <> 'F'",
    "q04_count_global" ->
      "SELECT count(*) AS cnt FROM lineitem",
    "q05_clean_chain" ->
      "SELECT p_partkey, regexp_replace(lower(regexp_replace(p_name, ':$', '')), '[?%&]', '', 'g') AS cleaned_name, '1' AS new_col FROM part",
    "q06_project_schema" ->
      "SELECT cast(o_orderkey AS varchar) AS order_id, cast(o_custkey AS varchar) AS customer_id, o_orderstatus AS status, strftime(o_orderdate, '%Y-%m-%d') AS order_date FROM orders",
    "q07_split_counts" ->
      "SELECT o_orderstatus, count(*) AS n FROM orders GROUP BY o_orderstatus",
    "q08_partition_counts" ->
      "SELECT cast(o_orderdate AS date) AS d, count(*) AS n FROM orders GROUP BY 1",
    "q09_agg_groupby" ->
      "SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty, round(sum(l_extendedprice), 2) AS sum_price, round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price, round(avg(l_discount), 6) AS avg_disc, count(*) AS cnt FROM lineitem GROUP BY l_returnflag, l_linestatus",
    "q10_join_broadcast" ->
      "SELECT c_mktsegment, count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY c_mktsegment",
    "q11_join_large" ->
      "SELECT o_orderstatus, count(*) AS n_items, round(sum(l_extendedprice), 2) AS total_price FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY o_orderstatus",
    "q12_join_multiway" ->
      "SELECT r_name, round(sum(l_extendedprice), 2) AS revenue, count(*) AS n FROM lineitem JOIN supplier ON l_suppkey = s_suppkey JOIN nation ON s_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey GROUP BY r_name",
    "q13_join_anti" ->
      "SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)",
    "q14_join_semi" ->
      "SELECT p_partkey, p_brand FROM part WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)",
    "q15_topk_per_key" ->
      "SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice, cast(rk AS int) AS rk FROM (SELECT o_custkey, o_orderkey, o_totalprice, row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk FROM orders) WHERE rk <= 3",
    "q16_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "q17_orderby_limit" ->
      "SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice FROM (SELECT * FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 25)",
    "q18_union_agg" ->
      "SELECT o_orderstatus, band, count(*) AS n FROM (SELECT o_orderstatus, 'hi' AS band FROM orders WHERE o_totalprice > 200000 UNION ALL SELECT o_orderstatus, 'lo' AS band FROM orders WHERE o_totalprice <= 200000) GROUP BY o_orderstatus, band",
    "q19_events_windowed" ->
      "SELECT cast(ts AS date) AS day, cast(hour(ts) AS int) AS hr, event_type, count(*) AS n, round(sum(value), 2) AS total_value FROM events GROUP BY 1, 2, 3",
    "q20_count_distinct" ->
      "SELECT count(DISTINCT l_partkey) AS exact_parts, count(*) AS cnt FROM lineitem",
    "q21_text_stats" ->
      ("SELECT doc_id, " +
        "len(list_filter(string_split(text,' '), x -> x <> '')) AS n_tokens, " +
        "CAST(ceil(length(text)/4.0) AS INT) AS bpe_est, " +
        "round((length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g'))) / nullif(CAST(length(text) AS DOUBLE), 0), 4) AS punct_ratio, " +
        "round(len(list_filter(list_filter(string_split(text,' '), x -> x <> ''), t -> t='the' OR t='a' OR t='of' OR t='and' OR t='to' OR t='in' OR t='is')) / nullif(CAST(len(list_filter(string_split(text,' '), x -> x <> '')) AS DOUBLE), 0), 4) AS stop_ratio, " +
        "round((1.0 - (length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g'))) / nullif(CAST(length(text) AS DOUBLE), 0)) * 0.5 " +
        "+ (len(list_filter(list_filter(string_split(text,' '), x -> x <> ''), t -> t='the' OR t='a' OR t='of' OR t='and' OR t='to' OR t='in' OR t='is')) / nullif(CAST(len(list_filter(string_split(text,' '), x -> x <> '')) AS DOUBLE), 0)) * 0.3 " +
        "+ least(1.0, len(list_filter(string_split(text,' '), x -> x <> '')) / 100.0) * 0.2, 4) AS quality " +
        "FROM documents"),
    "q22_langid" ->
      ("SELECT lang, pred_lang, count(*) AS n FROM (" +
        "SELECT lang, CASE " +
        "WHEN c_en > 0 AND c_en >= c_es AND c_en >= c_de AND c_en >= c_fr AND c_en >= c_zh THEN 'en' " +
        "WHEN c_es > 0 AND c_es >= c_de AND c_es >= c_fr AND c_es >= c_zh THEN 'es' " +
        "WHEN c_de > 0 AND c_de >= c_fr AND c_de >= c_zh THEN 'de' " +
        "WHEN c_fr > 0 AND c_fr >= c_zh THEN 'fr' " +
        "WHEN c_zh > 0 THEN 'zh' ELSE 'unknown' END AS pred_lang FROM (" +
        "SELECT lang, " +
        "len(list_filter(toks, t -> t='the' OR t='and' OR t='of' OR t='is')) AS c_en, " +
        "len(list_filter(toks, t -> t='el' OR t='la' OR t='de' OR t='que')) AS c_es, " +
        "len(list_filter(toks, t -> t='der' OR t='die' OR t='und' OR t='das')) AS c_de, " +
        "len(list_filter(toks, t -> t='le' OR t='les' OR t='et' OR t='une')) AS c_fr, " +
        "len(list_filter(toks, t -> t='的' OR t='是' OR t='不' OR t='在')) AS c_zh " +
        "FROM (SELECT lang, list_filter(string_split(text,' '), x -> x <> '') AS toks FROM documents))) " +
        "GROUP BY lang, pred_lang"),
    "q23_fingerprint" ->
      ("SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        "list_transform(string_split(text,''), c -> CAST(ascii(c) AS BIGINT))), " +
        "(h, x) -> (h*31 + x) % 1000000007) AS fp FROM documents"),
    "q24_dedup_exact" ->
      "SELECT source, count(*) AS n_docs, count(DISTINCT text) AS n_distinct FROM documents GROUP BY source",
    "q25_dedup_normalized" ->
      ("SELECT keep_id, n_copies FROM (" +
        "SELECT min(doc_id) AS keep_id, count(*) AS n_copies FROM (" +
        "SELECT doc_id, array_to_string(list_sort(list_distinct(" +
        "list_filter(string_split(text,' '), x -> x <> ''))), ' ') AS canon " +
        "FROM documents) GROUP BY canon) WHERE n_copies > 1"),
    "q26_dedup_ngram_jaccard" ->
      ("SELECT doc_a, doc_b, round(jac, 4) AS jaccard FROM (" +
        "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, " +
        "CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) / " +
        "(len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) AS jac " +
        "FROM (SELECT doc_id, list_distinct(list_filter(string_split(text,' '), x -> x <> '')) AS toks FROM documents WHERE doc_id % 4 = 0) a " +
        "JOIN (SELECT doc_id, list_distinct(list_filter(string_split(text,' '), x -> x <> '')) AS toks FROM documents WHERE doc_id % 4 = 0) b " +
        "ON a.doc_id < b.doc_id) WHERE jac >= 0.6"),
    "q27_dedup_minhash" ->
      ("WITH ws AS (SELECT doc_id, list_filter(string_split(text, ' '), " +
        "x -> x <> '') AS w FROM documents WHERE doc_id % 4 = 0), " +
        "sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i + 1] || ' ' || " +
        "w[i + 2] AS sh FROM (SELECT doc_id, w, " +
        "unnest(range(1, len(w) - 1)) AS i FROM ws WHERE len(w) >= 3)), " +
        "sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1), " +
        "inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, " +
        "count(*) AS cap FROM sh a JOIN sh b ON a.sh = b.sh " +
        "AND a.doc_id < b.doc_id GROUP BY 1, 2), " +
        "t AS (SELECT count(*) AS c FROM inter " +
        "JOIN sz sa ON doc_a = sa.doc_id " +
        "JOIN sz sb ON doc_b = sb.doc_id " +
        "WHERE cap * 5 >= (sa.sz + sb.sz - cap) * 4) " +
        "SELECT CAST(c AS BIGINT) AS n_true_pairs, true AS recall_ok " +
        "FROM t"),
    "q28_dedup_simhash" ->
      ("WITH canon AS (SELECT doc_id, array_to_string(list_sort(" +
        "list_distinct(list_filter(string_split(text, ' '), " +
        "x -> x <> ''))), ' ') AS c FROM documents " +
        "WHERE length(trim(text)) > 0), " +
        "g AS (SELECT c FROM canon GROUP BY c HAVING count(*) > 1), " +
        "t AS (SELECT count(*) AS n FROM canon JOIN g USING (c)) " +
        "SELECT CAST(n AS BIGINT) AS n_exact_dup_docs, " +
        "true AS all_exact_dups_grouped FROM t"),
    "q29_embed_neardup" ->
      ("SELECT vec_a, vec_b, round(sim, 4) AS sim FROM (" +
        "SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, " +
        "list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) AS sim " +
        "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id " +
        "WHERE a.vec_id % 10 = 0 AND b.vec_id % 10 = 0) WHERE sim >= 0.25"),
    "q30_ann_bruteforce" ->
      ("SELECT query_id, neighbor_id, sim, rk FROM (" +
        "SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id, " +
        "round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(v.embedding AS DOUBLE[])), 6) AS sim, " +
        "CAST(row_number() OVER (PARTITION BY q.vec_id ORDER BY round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(v.embedding AS DOUBLE[])), 6) DESC, v.vec_id) AS INT) AS rk " +
        "FROM embeddings q JOIN embeddings v ON q.vec_id <> v.vec_id " +
        "WHERE q.vec_id % (SELECT greatest(100, (count(*) + 127) // 128) FROM embeddings) = 0) WHERE rk <= 5"),
    "q31_ann_ivf" ->
      ("SELECT CAST(count(DISTINCT vec_id) AS BIGINT) AS n_queries, " +
        "true AS recall_ok FROM embeddings WHERE vec_id % (SELECT greatest(100, (count(*) + 127) // 128) FROM embeddings) = 0"),
    "q32_multimodal_meta" ->
      ("SELECT doc_id AS asset_id, 'text/plain' AS mime, " +
        "CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, " +
        "md5(text) AS checksum FROM documents"),
    "q33_frame_sample" ->
      ("SELECT doc_id AS asset_id, CAST(fi AS INT) AS frame_idx, " +
        "CAST(fi * 64 AS BIGINT) AS byte_offset, " +
        "md5(substring(text, CAST(fi*64+1 AS INT), 64)) AS frame_checksum FROM (" +
        "SELECT doc_id, text, unnest(range(0, " +
        "GREATEST(CAST(floor(octet_length(encode(text))/64.0) AS BIGINT), 1), 4)) AS fi " +
        "FROM documents WHERE octet_length(encode(text)) = length(text))"),
    "q34_asof_join" ->
      ("SELECT e.event_id, e.user_id, epoch_ms(e.ts) AS ts_ms, " +
        "(SELECT max(epoch_ms(p.ts)) FROM events p WHERE p.user_id = e.user_id " +
        "AND p.event_type = 'purchase' AND epoch_ms(p.ts) <= epoch_ms(e.ts)) AS last_purchase_ms, " +
        "(SELECT count(*) FROM events p WHERE p.user_id = e.user_id " +
        "AND p.event_type = 'purchase' AND epoch_ms(p.ts) <= epoch_ms(e.ts)) AS n_purchases_before " +
        "FROM events e WHERE e.event_type = 'error'"),
    "q35_rollup" ->
      ("SELECT o_orderstatus, o_orderpriority, count(*) AS n, " +
        "round(sum(o_totalprice), 2) AS revenue FROM orders " +
        "GROUP BY ROLLUP (o_orderstatus, o_orderpriority)"),
    "q36_json_extract" ->
      ("SELECT event_type, count(*) AS n, " +
        "CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k, " +
        "max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k " +
        "FROM events GROUP BY event_type"),
    "q37_explode_items" ->
      ("SELECT word, count(*) AS n FROM (" +
        "SELECT unnest(string_split(p_name, ' ')) AS word FROM part) " +
        "WHERE word <> '' GROUP BY word"),
    "q38_sessionize" ->
      ("SELECT user_id, session_id, min(ts_ms) AS session_start_ms, " +
        "max(ts_ms) AS session_end_ms, count(*) AS n_events FROM (" +
        "SELECT user_id, ts_ms, CAST(sum(new_session) OVER (" +
        "PARTITION BY user_id ORDER BY ts_ms " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id FROM (" +
        "SELECT user_id, ts_ms, CASE WHEN prev_ms IS NULL OR ts_ms - prev_ms > 1800000 " +
        "THEN 1 ELSE 0 END AS new_session FROM (" +
        "SELECT user_id, epoch_ms(ts) AS ts_ms, " +
        "lag(epoch_ms(ts), 1) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts)) AS prev_ms " +
        "FROM events))) GROUP BY user_id, session_id"),
    "q39_percentiles" ->
      ("SELECT round(quantile_cont(o_totalprice, 0.25), 2) AS p25, " +
        "round(quantile_cont(o_totalprice, 0.5), 2) AS p50, " +
        "round(quantile_cont(o_totalprice, 0.75), 2) AS p75, " +
        "round(max(o_totalprice), 2) AS p100 FROM orders"),
    "q40_cube" ->
      ("SELECT o_orderstatus, o_orderpriority, count(*) AS n FROM orders " +
        "GROUP BY CUBE (o_orderstatus, o_orderpriority)"),
    "q41_salted_join" ->
      ("SELECT o_orderpriority, count(*) AS n_items, " +
        "round(sum(l_extendedprice), 2) AS total_price " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "GROUP BY o_orderpriority"),
    "q42_tfidf" ->
      ("SELECT p.doc_id, p.word, p.tf, " +
        "round(p.tf * (ln((n.nd + 1.0) / (d.df + 1.0)) + 1.0), 4) AS tfidf " +
        "FROM (SELECT doc_id, word, count(*) AS tf FROM (" +
        "SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word " +
        "FROM documents) GROUP BY doc_id, word) p " +
        "JOIN (SELECT word, count(*) AS df FROM (" +
        "SELECT DISTINCT doc_id, word FROM (" +
        "SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word " +
        "FROM documents)) GROUP BY word) d ON p.word = d.word " +
        "CROSS JOIN (SELECT count(*) AS nd FROM documents) n"),
    "q43_intersect" ->
      ("SELECT o_custkey FROM orders WHERE o_totalprice > 150000 " +
        "INTERSECT " +
        "SELECT o_custkey FROM orders WHERE o_totalprice <= 150000"),
    "q44_except" ->
      ("SELECT o_custkey FROM orders WHERE o_totalprice > 150000 " +
        "EXCEPT " +
        "SELECT o_custkey FROM orders WHERE o_totalprice <= 150000"),
    "q45_predicates" ->
      ("SELECT p_partkey, p_brand, " +
        "CASE WHEN p_size < 20 THEN 'small' ELSE 'large' END AS size_band " +
        "FROM part WHERE p_name LIKE '%al%' " +
        "AND p_brand IN ('Brand#1', 'Brand#2', 'Brand#3') " +
        "AND p_size BETWEEN 5 AND 40 AND p_retailprice IS NOT NULL"),
    "q46_pivot" ->
      ("SELECT o_orderstatus, " +
        "count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent, " +
        "count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS n_high, " +
        "count(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')) AS n_other " +
        "FROM orders GROUP BY o_orderstatus"),
    "q47_dedup_apply" ->
      ("WITH a AS (SELECT source, count(*) AS n_docs FROM documents " +
        "GROUP BY source), " +
        "t AS (SELECT source, CAST(count(*) - count(DISTINCT text) " +
        "AS BIGINT) AS min_dropped FROM documents " +
        "WHERE length(trim(text)) > 0 GROUP BY source) " +
        "SELECT a.source, n_docs, min_dropped, true AS dedup_ok " +
        "FROM a JOIN t ON a.source = t.source"),
    "q48_approx_distinct" ->
      ("SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts, " +
        "true AS within_5pct FROM lineitem"),
    "q49_hotkey_salted_join" ->
      ("SELECT o_orderpriority, count(*) AS n_items, " +
        "round(sum(l_extendedprice), 2) AS total_price " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "GROUP BY o_orderpriority"),
    "q50_window_battery" ->
      ("SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price, " +
        "round(lag(o_totalprice, 1) OVER w, 2) AS prev_price, " +
        "round(lead(o_totalprice, 1) OVER w, 2) AS next_price, " +
        "round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run_total, " +
        "round(avg(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey " +
        "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS mov_avg3 " +
        "FROM orders WHERE o_custkey % 50 = 0 " +
        "WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)"),
    "q51_grouping_sets" ->
      ("SELECT o_orderstatus, o_orderpriority, count(*) AS n, " +
        "round(sum(o_totalprice), 2) AS revenue, " +
        "CAST(grouping(o_orderstatus, o_orderpriority) AS BIGINT) AS gid " +
        "FROM orders " +
        "GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())"),
    "q52_range_join" ->
      ("SELECT band_id, count(*) AS n, round(sum(o_totalprice), 2) AS total " +
        "FROM orders JOIN (SELECT i AS band_id, i*50000.0 AS lo, " +
        "(i+1)*50000.0 AS hi FROM range(0, 10) t(i)) b " +
        "ON o_totalprice >= lo AND o_totalprice < hi GROUP BY band_id"),
    "q53_corr_subquery" ->
      ("SELECT c_custkey, c_mktsegment, " +
        "(SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders, " +
        "round(coalesce((SELECT sum(o_totalprice) FROM orders o " +
        "WHERE o.o_custkey = c.c_custkey), 0.0), 2) AS total_spent " +
        "FROM customer c WHERE c_custkey % 10 = 0"),
    "q54_bucketed_join" ->
      ("SELECT o_orderpriority, count(*) AS n_items, " +
        "round(sum(l_quantity), 2) AS total_qty " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "GROUP BY o_orderpriority"),
    "q55_regex_extract" ->
      ("SELECT CAST(regexp_extract(p_brand, 'Brand#(\\d+)', 1) AS INT) AS brand_num, " +
        "count(*) AS n, round(avg(p_retailprice), 2) AS avg_price " +
        "FROM part GROUP BY 1"),
    "q56_minmax_by" ->
      ("WITH r AS (SELECT o_orderstatus, o_orderkey, o_totalprice, " +
        "row_number() OVER (PARTITION BY o_orderstatus " +
        "ORDER BY o_totalprice DESC, o_orderkey DESC) AS rmax, " +
        "row_number() OVER (PARTITION BY o_orderstatus " +
        "ORDER BY o_totalprice ASC, o_orderkey ASC) AS rmin FROM orders) " +
        "SELECT s.o_orderstatus, mx.o_orderkey AS max_order, " +
        "mn.o_orderkey AS min_order, round(s.maxp, 2) AS max_price, " +
        "round(s.minp, 2) AS min_price " +
        "FROM (SELECT o_orderstatus, max(o_totalprice) AS maxp, " +
        "min(o_totalprice) AS minp FROM orders GROUP BY o_orderstatus) s " +
        "JOIN (SELECT o_orderstatus, o_orderkey FROM r WHERE rmax = 1) mx " +
        "USING (o_orderstatus) " +
        "JOIN (SELECT o_orderstatus, o_orderkey FROM r WHERE rmin = 1) mn " +
        "USING (o_orderstatus)"),
    "q57_histogram" ->
      ("SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket, " +
        "count(*) AS n FROM orders GROUP BY 1"),
    "q58_format_roundtrip" ->
      ("SELECT 'json' AS fmt, count(*) AS n, round(sum(o_totalprice), 2) AS total " +
        "FROM orders WHERE o_orderkey % 10 = 0 " +
        "UNION ALL SELECT 'csv' AS fmt, count(*) AS n, round(sum(o_totalprice), 2) AS total " +
        "FROM orders WHERE o_orderkey % 10 = 0 " +
        "UNION ALL SELECT 'orc' AS fmt, count(*) AS n, round(sum(o_totalprice), 2) AS total " +
        "FROM orders WHERE o_orderkey % 10 = 0"),
    "q59_fuzzy_levenshtein" ->
      ("SELECT key_a, key_b, CAST(dist AS INT) AS dist FROM (" +
        "SELECT a.p_partkey AS key_a, b.p_partkey AS key_b, " +
        "levenshtein(a.p_name, b.p_name) AS dist " +
        "FROM part a JOIN part b ON a.p_partkey < b.p_partkey " +
        "WHERE a.p_partkey % 20 = 0 AND b.p_partkey % 20 = 0) WHERE dist <= 2"),
    "q60_datetime_battery" ->
      ("SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d, " +
        "CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS yr, " +
        "CAST(quarter(CAST(o_orderdate AS DATE)) AS INT) AS qtr, " +
        "CAST(month(CAST(o_orderdate AS DATE)) AS INT) AS mo, " +
        "CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE) AS month_start, " +
        "last_day(CAST(o_orderdate AS DATE)) AS month_end, " +
        "CAST(isodow(CAST(o_orderdate AS DATE)) - 1 AS INT) AS wd, " +
        "CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1995-06-01') AS INT) AS days_to_mid95, " +
        "CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m " +
        "FROM orders WHERE o_orderkey % 20 = 0"),
    "q61_string_battery" ->
      ("SELECT p_partkey, upper(p_name) AS up_name, " +
        "substring(p_name, 1, 5) AS prefix5, reverse(p_name) AS rev_name, " +
        "lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded_key, " +
        "translate(p_name, 'aeiou', 'AEIOU') AS trans_name, " +
        "split_part(p_name, ' ', 1) AS first_word, " +
        "CAST(length(p_name) AS INT) AS name_len, " +
        "replace(p_name, ' ', '_') AS snake_name, " +
        "concat_ws('|', p_brand, p_type) AS brand_type " +
        "FROM part WHERE p_partkey % 10 = 0"),
    "q62_null_battery" ->
      ("SELECT c_custkey, " +
        "coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg, " +
        "round(greatest(c_acctbal, 0.0), 2) AS bal_floor, " +
        "round(least(c_acctbal, 1000.0), 2) AS bal_cap, " +
        "CASE WHEN c_acctbal < 0 THEN NULL ELSE round(c_acctbal, 2) END AS pos_bal " +
        "FROM customer WHERE c_custkey % 10 = 0"),
    "q63_stratified_sample" ->
      ("SELECT lang, doc_id, CAST(rk AS INT) AS rk FROM (" +
        "SELECT lang, doc_id, row_number() OVER (PARTITION BY lang " +
        "ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk " +
        "FROM documents) WHERE rk <= 20"),
    "q64_shard_pack" ->
      ("SELECT shard, count(*) AS n_docs, " +
        "CAST(sum(ntok) AS BIGINT) AS shard_tokens FROM (" +
        "SELECT doc_id, ntok, CAST(floor((sum(ntok) OVER (ORDER BY doc_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - ntok) / 10000.0) AS BIGINT) AS shard " +
        "FROM (SELECT doc_id, len(list_filter(string_split(text, ' '), x -> x <> '')) AS ntok " +
        "FROM documents)) GROUP BY shard"),
    "q65_percentile_groups" ->
      ("SELECT o_orderstatus, " +
        "round(quantile_cont(o_totalprice, 0.25), 2) AS p25, " +
        "round(quantile_cont(o_totalprice, 0.5), 2) AS p50, " +
        "round(quantile_cont(o_totalprice, 0.75), 2) AS p75, " +
        "count(*) AS n FROM orders GROUP BY o_orderstatus"),
    "q66_funnel" ->
      ("WITH ev AS (SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events), " +
        "v AS (SELECT user_id, min(ms) AS v_ms FROM ev WHERE event_type = 'view' GROUP BY user_id), " +
        "c AS (SELECT ev.user_id, min(ms) AS c_ms FROM ev JOIN v USING (user_id) " +
        "WHERE event_type = 'click' AND ms > v_ms GROUP BY ev.user_id), " +
        "p AS (SELECT ev.user_id, min(ms) AS p_ms FROM ev JOIN c USING (user_id) " +
        "WHERE event_type = 'purchase' AND ms > c_ms GROUP BY ev.user_id) " +
        "SELECT '1_view' AS stage, count(*) AS n_users FROM v " +
        "UNION ALL SELECT '2_view_click' AS stage, count(*) AS n_users FROM c " +
        "UNION ALL SELECT '3_view_click_purchase' AS stage, count(*) AS n_users FROM p"),
    "q67_cohort_retention" ->
      ("WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events), " +
        "f AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY user_id) " +
        "SELECT cohort_day, " +
        "CAST(date_diff('day', cohort_day, day) AS INT) AS day_offset, " +
        "count(DISTINCT e.user_id) AS n_users " +
        "FROM e JOIN f USING (user_id) " +
        "WHERE date_diff('day', cohort_day, day) <= 7 " +
        "GROUP BY cohort_day, day_offset"),
    "q68_array_battery" ->
      ("SELECT doc_id, CAST(len(toks) AS INT) AS n, " +
        "array_to_string(list_slice(toks, 1, 3), ',') AS first3, " +
        "list_contains(toks, 'the') AS has_the, " +
        "CAST(nullif(list_position(toks, 'the'), 0) AS INT) AS the_pos, " +
        "array_to_string(list_slice(list_sort(toks), 1, 2), ',') AS sorted2, " +
        "CAST(len(list_distinct(toks)) AS INT) AS n_distinct, " +
        "toks[-1] AS last_tok FROM (" +
        "SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks " +
        "FROM documents WHERE doc_id % 10 = 0)"),
    "q69_contamination" ->
      ("WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks FROM documents), " +
        "g AS (SELECT DISTINCT doc_id, array_to_string(list_slice(toks, CAST(u.i AS INT), CAST(u.i AS INT) + 7), ' ') AS g " +
        "FROM t, unnest(range(1, len(toks) - 6)) AS u(i) WHERE len(toks) >= 8), " +
        "b AS (SELECT doc_id AS bdoc, g FROM g WHERE doc_id % 7 = 0 AND doc_id < 3500), " +
        "c AS (SELECT doc_id, g FROM g WHERE NOT (doc_id % 7 = 0 AND doc_id < 3500)) " +
        "SELECT c.doc_id, count(DISTINCT c.g) AS n_shared, " +
        "count(DISTINCT b.bdoc) AS n_bench_docs " +
        "FROM c JOIN b ON c.g = b.g GROUP BY c.doc_id"),
    "q70_cumulative_users" ->
      ("WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS first_day " +
        "FROM events GROUP BY user_id), " +
        "p AS (SELECT first_day AS day, count(*) AS new_users FROM f " +
        "GROUP BY first_day) " +
        "SELECT day, new_users, CAST(sum(new_users) OVER (ORDER BY day " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users " +
        "FROM p"),
    "q71_rank_battery" ->
      ("SELECT o_orderkey, o_orderstatus, " +
        "CAST(floor(o_totalprice / 100000) AS BIGINT) AS bucket, " +
        "CAST(rank() OVER wt AS INT) AS rk, " +
        "CAST(dense_rank() OVER wt AS INT) AS drk, " +
        "round(percent_rank() OVER wt, 6) AS prk, " +
        "round(cume_dist() OVER wt, 6) AS cd, " +
        "CAST(ntile(4) OVER wo AS INT) AS quartile " +
        "FROM orders WHERE o_custkey % 25 = 0 " +
        "WINDOW wt AS (PARTITION BY o_orderstatus " +
        "ORDER BY floor(o_totalprice / 100000) DESC), " +
        "wo AS (PARTITION BY o_orderstatus " +
        "ORDER BY o_totalprice DESC, o_orderkey)"),
    "q72_ewma" ->
      ("SELECT user_id, CAST(len(vs) AS INT) AS n_events, " +
        "round(list_reduce(vs, (acc, v) -> 0.3 * v + 0.7 * acc), 4) AS ewma " +
        "FROM (SELECT user_id, list_transform(list_sort(" +
        "list(struct_pack(ms := epoch_ms(ts), v := value))), x -> x.v) AS vs " +
        "FROM events GROUP BY user_id)"),
    "q73_hopping_windows" ->
      ("SELECT ws_ms, event_type, count(*) AS n, " +
        "round(sum(value), 2) AS total_value FROM (" +
        "SELECT unnest([epoch_ms(ts) - epoch_ms(ts) % 1800000, " +
        "epoch_ms(ts) - epoch_ms(ts) % 1800000 - 1800000]) AS ws_ms, " +
        "event_type, value FROM events) " +
        "GROUP BY ws_ms, event_type"),
    "q74_asof_native" ->
      ("WITH ev AS (SELECT event_id, user_id, event_type, epoch_ms(ts) AS ts_ms, value FROM events), " +
        "c AS (SELECT event_id, user_id, ts_ms FROM ev WHERE event_type = 'click'), " +
        "v AS (SELECT user_id, ts_ms, round(max(value), 2) AS view_value " +
        "FROM ev WHERE event_type = 'view' GROUP BY user_id, ts_ms) " +
        "SELECT c.event_id, c.user_id, c.ts_ms, v.ts_ms AS view_ms, v.view_value " +
        "FROM c ASOF LEFT JOIN v ON c.user_id = v.user_id AND c.ts_ms >= v.ts_ms"),
    "q75_gopher_quality" ->
      ("WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws FROM documents), " +
        "s AS (SELECT doc_id, CAST(len(ws) AS INT) AS n_words, " +
        "list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(ws, w -> CAST(length(w) AS BIGINT))), (a, b) -> a + b) AS char_sum, " +
        "CAST(len(list_distinct(ws)) AS INT) AS n_distinct, " +
        "CAST(list_max(list_transform(list_distinct(ws), w -> len(list_filter(ws, x -> x = w)))) AS INT) AS top_cnt, " +
        "CAST(CASE WHEN len(ws) > 1 THEN len(list_distinct(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i + 1]))) ELSE 0 END AS INT) AS d2 " +
        "FROM t WHERE len(ws) >= 1) " +
        "SELECT doc_id, n_words, " +
        "round(char_sum / CAST(n_words AS DOUBLE), 4) AS mean_word_len, " +
        "round(n_distinct / CAST(n_words AS DOUBLE), 4) AS ttr, " +
        "round(top_cnt / CAST(n_words AS DOUBLE), 4) AS top_word_frac, " +
        "round(1.0 - d2 / CAST(nullif(n_words - 1, 0) AS DOUBLE), 4) AS dup_2gram_frac, " +
        "(n_words >= 30 AND char_sum / CAST(n_words AS DOUBLE) >= 2.0 " +
        "AND char_sum / CAST(n_words AS DOUBLE) <= 10.0 " +
        "AND top_cnt / CAST(n_words AS DOUBLE) <= 0.2 " +
        "AND (1.0 - d2 / CAST(nullif(n_words - 1, 0) AS DOUBLE)) <= 0.6) AS keep " +
        "FROM s"),
    "q76_dup_spans" ->
      ("WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws FROM documents), " +
        "g AS (SELECT doc_id, unnest(list_transform(range(1, len(ws) - 3), " +
        "i -> array_to_string(list_slice(ws, CAST(i AS INT), CAST(i AS INT) + 4), ' '))) AS g " +
        "FROM t WHERE len(ws) >= 5), " +
        "d AS (SELECT g FROM (SELECT g, count(DISTINCT doc_id) AS nd FROM g GROUP BY g) WHERE nd >= 2) " +
        "SELECT g.doc_id, count(*) AS n_grams, CAST(count(d.g) AS BIGINT) AS n_dup, " +
        "round(count(d.g) / CAST(count(*) AS DOUBLE), 4) AS dup_frac " +
        "FROM g LEFT JOIN d ON g.g = d.g GROUP BY g.doc_id"),
    "q77_pii_redact" ->
      ("WITH t AS (SELECT c_custkey, 'reach ' || c_name || " +
        "CASE WHEN c_custkey % 3 = 0 THEN ' at user' || c_custkey || '@mail.example.com' ELSE '' END || " +
        "CASE WHEN c_custkey % 4 = 0 THEN ' call 555-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') || '-' || lpad(CAST(c_nationkey AS VARCHAR), 4, '0') ELSE '' END || " +
        "' end' AS text FROM customer) " +
        "SELECT c_custkey, " +
        "CAST(len(regexp_extract_all(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}')) AS INT) AS n_emails, " +
        "CAST(len(regexp_extract_all(text, '555-[0-9]{4}-[0-9]{4}')) AS INT) AS n_phones, " +
        "regexp_replace(regexp_replace(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}', '[EMAIL]', 'g'), '555-[0-9]{4}-[0-9]{4}', '[PHONE]', 'g') AS redacted " +
        "FROM t"),
    "q78_bm25" ->
      ("WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws FROM documents), " +
        "b AS (SELECT doc_id, CAST(len(ws) AS INT) AS dl, " +
        "CAST(len(list_filter(ws, x -> x = 'spark')) AS INT) AS tf0, " +
        "CAST(len(list_filter(ws, x -> x = 'table')) AS INT) AS tf1, " +
        "CAST(len(list_filter(ws, x -> x = 'join')) AS INT) AS tf2 FROM t), " +
        "s AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl, " +
        "CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df0, " +
        "CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df1, " +
        "CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df2 FROM b) " +
        "SELECT doc_id, dl, tf0, tf1, tf2, " +
        "round(ln(1.0 + (n_docs - df0 + 0.5) / (df0 + 0.5)) * (tf0 * 2.2) / (tf0 + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)) " +
        "+ ln(1.0 + (n_docs - df1 + 0.5) / (df1 + 0.5)) * (tf1 * 2.2) / (tf1 + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)) " +
        "+ ln(1.0 + (n_docs - df2 + 0.5) / (df2 + 0.5)) * (tf2 * 2.2) / (tf2 + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)), 4) AS bm25 " +
        "FROM b, s WHERE tf0 > 0 OR tf1 > 0 OR tf2 > 0"),
    "q79_inverted_index" ->
      ("SELECT word, count(*) AS df, " +
        "array_to_string(list_sort(list(doc_id)), ',') AS postings FROM (" +
        "SELECT doc_id, unnest(list_distinct(list_filter(string_split(text, ' '), x -> x <> ''))) AS word " +
        "FROM documents) GROUP BY word"),
    "q80_char_entropy" ->
      ("WITH t AS (SELECT doc_id, text, string_split(text, '') AS ch, " +
        "list_sort(list_distinct(string_split(text, ''))) AS cs " +
        "FROM documents WHERE length(text) > 0) " +
        "SELECT doc_id, CAST(length(text) AS INT) AS n_chars, " +
        "CAST(len(cs) AS INT) AS n_distinct_chars, " +
        "round(-list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
        "list_transform(cs, c -> " +
        "(len(list_filter(ch, x -> x = c)) / CAST(length(text) AS DOUBLE)) * " +
        "log2(len(list_filter(ch, x -> x = c)) / CAST(length(text) AS DOUBLE)))), " +
        "(a, x) -> a + x), 4) AS entropy FROM t"),
    "q81_heavy_hitters" ->
      ("WITH w AS (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word FROM documents), " +
        "n AS (SELECT count(*) AS n FROM w) " +
        "SELECT word, count(*) AS cnt, " +
        "round(count(*) / CAST(n.n AS DOUBLE), 4) AS frac " +
        "FROM w, n GROUP BY word, n.n HAVING count(*) > n.n * 0.01"),
    "q82_column_profile" ->
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority").map(c =>
        s"SELECT '$c' AS column_name, count(*) AS n_rows, " +
          s"count($c) AS n_non_null, count(DISTINCT $c) AS n_distinct, " +
          s"CAST(min($c) AS VARCHAR) AS min_value, " +
          s"CAST(max($c) AS VARCHAR) AS max_value FROM orders")
        .mkString(" UNION ALL "),
    "q83_rp_lsh_neardup" ->
      ("WITH v0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb " +
        "FROM embeddings), " +
        "pl AS (SELECT vec_id + 1000000 AS vec_id, " +
        "list_transform(emb, (x, i) -> CASE WHEN (i - 1) % 2 = 0 " +
        "THEN x * 1.02 ELSE x * 0.98 END) AS emb FROM v0), " +
        "v AS (SELECT vec_id, emb FROM (SELECT vec_id, emb FROM v0 " +
        "UNION ALL SELECT vec_id, emb FROM pl) WHERE (vec_id % 1000000) % " +
        "(SELECT greatest(5, (count(*) + 1279) // 1280) FROM embeddings) " +
        "= 0), " +
        "t AS (SELECT count(*) AS c FROM v a JOIN v b " +
        "ON a.vec_id < b.vec_id " +
        "WHERE list_cosine_similarity(a.emb, b.emb) >= 0.9) " +
        "SELECT CAST(c AS BIGINT) AS n_true_pairs, true AS recall_ok " +
        "FROM t"),
    "q84_pq_ann" ->
      ("SELECT CAST(count(DISTINCT vec_id) AS BIGINT) AS n_queries, " +
        "true AS recall_ok FROM embeddings WHERE vec_id % (SELECT greatest(100, (count(*) + 127) // 128) FROM embeddings) = 0"),
    "q85_gap_fill" ->
      ("WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n, " +
        "round(sum(value), 2) AS day_value FROM events GROUP BY user_id, CAST(ts AS DATE)), " +
        "spine AS (SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day " +
        "FROM (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY user_id)) " +
        "SELECT s.user_id, s.day, coalesce(d.n, 0) AS n_events, " +
        "(d.n IS NULL) AS filled, " +
        "last_value(d.day_value IGNORE NULLS) OVER (PARTITION BY s.user_id ORDER BY s.day " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ffill_value " +
        "FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day"),
    "q86_pagerank" -> {
      def iter(prev: String, cur: String): String =
        s"$cur AS (SELECT e.dst AS node, " +
          s"round(0.15 / nn.n + 0.85 * sum($prev.pr / deg.outdeg), 8) AS pr " +
          s"FROM e JOIN $prev ON e.src = $prev.node " +
          s"JOIN deg ON e.src = deg.src, nn GROUP BY e.dst, nn.n)"
      "WITH uk AS (SELECT DISTINCT 'u' || user_id AS a, " +
        "'k' || CAST(json_extract_string(props, '$.k') AS INT) AS b " +
        "FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL), " +
        "e AS (SELECT a AS src, b AS dst FROM uk UNION ALL SELECT b, a FROM uk), " +
        "deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src), " +
        "nn AS (SELECT count(DISTINCT src) AS n FROM e), " +
        "p0 AS (SELECT DISTINCT e.src AS node, round(1.0 / nn.n, 8) AS pr FROM e, nn), " +
        (1 to 5).map(i => iter(s"p${i - 1}", s"p$i")).mkString(", ") +
        " SELECT node, round(pr, 6) AS pr FROM p5"
    },
    "q87_unpivot" ->
      ("WITH w AS (SELECT o_orderstatus, " +
        "count(*) FILTER (WHERE o_totalprice < 100000) AS lo, " +
        "count(*) FILTER (WHERE o_totalprice >= 100000 AND o_totalprice < 250000) AS mid, " +
        "count(*) FILTER (WHERE o_totalprice >= 250000) AS hi " +
        "FROM orders GROUP BY o_orderstatus) " +
        "SELECT o_orderstatus, 'lo' AS band, lo AS n FROM w " +
        "UNION ALL SELECT o_orderstatus, 'mid' AS band, mid AS n FROM w " +
        "UNION ALL SELECT o_orderstatus, 'hi' AS band, hi AS n FROM w"),
    "q88_range_frames" ->
      ("SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price, " +
        "count(*) OVER nearw AS n_near, " +
        "round(avg(o_totalprice) OVER nearw, 4) AS avg_near, " +
        "count(*) OVER upw AS n_cheaper_eq, " +
        "round(min(o_totalprice) OVER upw, 2) AS min_price " +
        "FROM orders WHERE o_custkey % 40 = 0 " +
        "WINDOW nearw AS (PARTITION BY o_custkey ORDER BY o_totalprice " +
        "RANGE BETWEEN 10000 PRECEDING AND 10000 FOLLOWING), " +
        "upw AS (PARTITION BY o_custkey ORDER BY o_totalprice " +
        "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"),
    "q89_lateral_topk" ->
      ("SELECT c.c_custkey, t.o_orderkey, round(t.o_totalprice, 2) AS price " +
        "FROM customer c, LATERAL (" +
        "SELECT o_orderkey, o_totalprice FROM orders " +
        "WHERE o_custkey = c.c_custkey " +
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t " +
        "WHERE c.c_custkey % 10 = 0"),
    "q90_outer_joins" ->
      ("WITH c AS (SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey % 3 = 0), " +
        "o AS (SELECT o_custkey, o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 250000) " +
        "SELECT CASE WHEN c_custkey IS NOT NULL AND o_custkey IS NOT NULL THEN 'both' " +
        "WHEN c_custkey IS NOT NULL THEN 'customer_only' ELSE 'order_only' END AS side, " +
        "coalesce(c_mktsegment, '?') AS seg, count(*) AS n " +
        "FROM c FULL OUTER JOIN o ON c_custkey = o_custkey " +
        "GROUP BY side, seg"),
    "q91_bag_setops" ->
      ("WITH hi AS (SELECT o_custkey FROM orders WHERE o_totalprice > 150000), " +
        "lo AS (SELECT o_custkey FROM orders WHERE o_totalprice <= 150000) " +
        "SELECT o_custkey, count(*) AS n, 'intersect_all' AS op FROM " +
        "(SELECT o_custkey FROM hi INTERSECT ALL SELECT o_custkey FROM lo) GROUP BY o_custkey " +
        "UNION ALL " +
        "SELECT o_custkey, count(*) AS n, 'except_all' AS op FROM " +
        "(SELECT o_custkey FROM hi EXCEPT ALL SELECT o_custkey FROM lo) GROUP BY o_custkey"),
    "q92_asof_forward" ->
      ("WITH ev AS (SELECT event_id, user_id, event_type, epoch_ms(ts) AS ts_ms FROM events), " +
        "e AS (SELECT event_id, user_id, ts_ms FROM ev WHERE event_type = 'error'), " +
        "p AS (SELECT DISTINCT user_id, ts_ms FROM ev WHERE event_type = 'purchase') " +
        "SELECT e.event_id, e.user_id, e.ts_ms, p.ts_ms AS next_purchase_ms, " +
        "p.ts_ms - e.ts_ms AS gap_ms " +
        "FROM e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts_ms <= p.ts_ms"),
    "q93_stats_battery" ->
      ("SELECT o_orderstatus, count(*) AS n, " +
        "round(stddev_samp(o_totalprice), 4) AS sd, " +
        "round(var_samp(o_totalprice) / 1e6, 4) AS var_m, " +
        "round(corr(o_totalprice, o_custkey), 6) AS r, " +
        "round(covar_samp(o_totalprice, o_custkey) / 1e6, 4) AS cov_m, " +
        "round(regr_slope(o_totalprice, o_custkey), 6) AS slope, " +
        "round(regr_intercept(o_totalprice, o_custkey), 4) AS intercept " +
        "FROM orders GROUP BY o_orderstatus"),
    "q94_session_window" ->
      ("SELECT user_id, min(ts_ms) AS session_start_ms, " +
        "max(ts_ms) AS session_end_ms, count(*) AS n_events FROM (" +
        "SELECT user_id, ts_ms, CAST(sum(new_session) OVER (" +
        "PARTITION BY user_id ORDER BY ts_ms " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id FROM (" +
        "SELECT user_id, ts_ms, CASE WHEN prev_ms IS NULL OR ts_ms - prev_ms > 1800000 " +
        "THEN 1 ELSE 0 END AS new_session FROM (" +
        "SELECT user_id, epoch_ms(ts) AS ts_ms, " +
        "lag(epoch_ms(ts), 1) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts)) AS prev_ms " +
        "FROM events))) GROUP BY user_id, session_id"),
    "q95_asof_sql" ->
      ("WITH ev AS (SELECT event_id, user_id, event_type, epoch_ms(ts) AS ts_ms, value FROM events), " +
        "c AS (SELECT event_id, user_id, ts_ms FROM ev WHERE event_type = 'click'), " +
        "v AS (SELECT user_id, ts_ms, round(max(value), 2) AS view_value " +
        "FROM ev WHERE event_type = 'view' GROUP BY user_id, ts_ms) " +
        "SELECT c.event_id, c.user_id, c.ts_ms, v.ts_ms AS view_ms, v.view_value " +
        "FROM c ASOF LEFT JOIN v ON c.user_id = v.user_id AND c.ts_ms >= v.ts_ms"),
    "q96_ivfpq_ann" ->
      ("SELECT CAST(count(DISTINCT vec_id) AS BIGINT) AS n_queries, " +
        "true AS recall_ok FROM embeddings WHERE vec_id % (SELECT greatest(100, (count(*) + 127) // 128) FROM embeddings) = 0"),
    "q97_scd2_merge" ->
      ("WITH ch AS (SELECT user_id, epoch_ms(ts) AS valid_from_ms, event_id, " +
        "round(value, 2) AS attr_value FROM events WHERE event_type = 'purchase') " +
        "SELECT user_id, valid_from_ms, event_id, attr_value, " +
        "lead(valid_from_ms) OVER (PARTITION BY user_id ORDER BY valid_from_ms, event_id) AS valid_to_ms, " +
        "(lead(valid_from_ms) OVER (PARTITION BY user_id ORDER BY valid_from_ms, event_id) IS NULL) AS is_current " +
        "FROM ch"),
    "q98_bfs_reach" ->
      ("WITH RECURSIVE uk AS (SELECT DISTINCT user_id, 'u' || user_id AS a, " +
        "'k' || CAST(json_extract_string(props, '$.k') AS INT) AS b " +
        "FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL), " +
        "e AS (SELECT a AS src, b AS dst FROM uk UNION ALL SELECT b, a FROM uk), " +
        "seeds AS (SELECT DISTINCT a AS node FROM uk WHERE user_id % 100 = 0), " +
        "bfs AS (SELECT node, 0 AS dist FROM seeds " +
        "UNION SELECT e.dst AS node, b.dist + 1 AS dist FROM bfs b " +
        "JOIN e ON e.src = b.node WHERE b.dist < 4) " +
        "SELECT node, CAST(min(dist) AS INT) AS dist FROM bfs GROUP BY node"),
    "q99_interval_concurrency" ->
      ("WITH iv AS (SELECT event_id, epoch_ms(ts) AS s, " +
        "epoch_ms(ts) + 3600000 AS e FROM events WHERE event_type = 'purchase') " +
        "SELECT a.event_id, a.s AS start_ms, CAST(count(*) AS INT) AS n_overlap " +
        "FROM iv a JOIN iv b ON b.s <= a.s AND a.s < b.e " +
        "GROUP BY a.event_id, a.s"),
    "q100_skyline" ->
      ("WITH o AS (SELECT o_orderkey, o_orderdate, round(o_totalprice, 2) AS price " +
        "FROM orders WHERE o_custkey % 5 = 0) " +
        "SELECT a.o_orderkey, a.o_orderdate, a.price FROM o a " +
        "WHERE NOT EXISTS (SELECT 1 FROM o b " +
        "WHERE b.o_orderdate <= a.o_orderdate AND b.price <= a.price " +
        "AND (b.o_orderdate < a.o_orderdate OR b.price < a.price))"),
    "q101_weighted_sample" ->
      ("WITH o AS (SELECT o_orderkey, o_totalprice / " +
        "(SELECT max(o_totalprice) FROM orders) AS p FROM orders) " +
        "SELECT o_orderkey, round(p, 6) AS p FROM o " +
        "WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8) < " +
        "printf('%08x', CAST(least(floor(p * 4294967296), 4294967295) AS BIGINT))"),
    "q102_listagg" ->
      ("SELECT o_custkey, " +
        "string_agg(lpad(CAST(o_orderkey AS VARCHAR), 12, '0'), ',' " +
        "ORDER BY lpad(CAST(o_orderkey AS VARCHAR), 12, '0')) AS order_keys, " +
        "string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses, " +
        "count(*) AS n " +
        "FROM orders WHERE o_custkey % 500 = 0 GROUP BY o_custkey"),
    "q103_bloom_join" ->
      ("SELECT l_orderkey, count(*) AS n_items, round(sum(l_quantity), 2) AS qty " +
        "FROM lineitem WHERE l_orderkey IN (" +
        "SELECT o_orderkey FROM orders " +
        "WHERE o_orderpriority = '1-URGENT' AND o_custkey % 7 = 0) " +
        "GROUP BY l_orderkey"),
    "q104_time_range_frames" ->
      ("SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, " +
        "count(1) OVER (PARTITION BY user_id ORDER BY ts " +
        "RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW) AS n_7d, " +
        "round(sum(value) OVER (PARTITION BY user_id ORDER BY ts " +
        "RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW), 2) AS sum_7d, " +
        "count(1) OVER (PARTITION BY user_id ORDER BY ts " +
        "RANGE BETWEEN CURRENT ROW AND INTERVAL 24 HOUR FOLLOWING) AS n_next24h " +
        "FROM events WHERE user_id % 25 = 0"),
    "q105_filter_aggs" ->
      ("SELECT o_orderpriority, count(*) AS n, " +
        "count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f, " +
        "round(coalesce(sum(o_totalprice) FILTER (WHERE o_totalprice > 150000), 0.0), 2) AS big_total, " +
        "round(avg(o_totalprice) FILTER (WHERE o_orderdate >= TIMESTAMP '1995-01-01'), 4) AS recent_avg " +
        "FROM orders GROUP BY o_orderpriority"),
    "q106_nullsafe_join" ->
      ("WITH l AS (SELECT CASE WHEN o_orderkey % 97 = 0 THEN NULL " +
        "ELSE o_orderkey % 50 END AS k, count(*) AS nl FROM orders " +
        "WHERE o_custkey % 3 = 0 GROUP BY 1), " +
        "r AS (SELECT CASE WHEN o_orderkey % 97 = 0 THEN NULL " +
        "ELSE o_orderkey % 50 END AS k, count(*) AS nr FROM orders " +
        "WHERE o_custkey % 5 = 0 GROUP BY 1) " +
        "SELECT l.k AS k, l.nl, r.nr FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k"),
    "q107_hof_battery" ->
      ("SELECT doc_id, CAST(len(toks) AS INT) AS n_toks, " +
        "array_to_string(list_transform(toks, t -> upper(t)), ',') AS caps, " +
        "CAST(len(list_filter(toks, t -> length(t) > 5)) AS INT) AS n_long, " +
        "len(list_filter(toks, t -> length(t) > 7)) > 0 AS has_long, " +
        "len(list_filter(toks, t -> t <> lower(t))) = 0 AS all_lower, " +
        "CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        "list_transform(toks, t -> CAST(length(t) AS BIGINT))), (a, b) -> a + b) AS INT) AS total_chars, " +
        "CASE WHEN len(toks) >= 1 THEN toks[1] || ':' || length(toks[1]) END AS first_pair " +
        "FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks " +
        "FROM documents WHERE doc_id % 20 = 0)"),
    "q108_moments" ->
      ("WITH m AS (SELECT o_orderstatus, avg(o_totalprice) AS mu FROM orders GROUP BY 1) " +
        "SELECT o.o_orderstatus, count(*) AS n, " +
        "round(median(o_totalprice), 2) AS med, " +
        "round(avg(pow(o_totalprice - mu, 3)) / pow(avg(pow(o_totalprice - mu, 2)), 1.5), 6) AS skew, " +
        "round(avg(pow(o_totalprice - mu, 4)) / pow(avg(pow(o_totalprice - mu, 2)), 2) - 3, 6) AS kurt " +
        "FROM orders o JOIN m USING (o_orderstatus) GROUP BY o.o_orderstatus"),
    "q109_bitwise_aggs" ->
      ("SELECT o_orderpriority, bit_and(k) AS ba, bit_or(k) AS bo, " +
        "bit_xor(k) AS bx, count(*) AS n FROM (" +
        "SELECT o_orderpriority, (o_orderkey % 65536) | 1 AS k FROM orders) " +
        "GROUP BY o_orderpriority"),
    "q110_recursive_chain" ->
      ("WITH RECURSIVE " +
        "ch AS (SELECT o_custkey, o_orderkey, o_totalprice, " +
        "lead(o_orderkey) OVER (PARTITION BY o_custkey " +
        "ORDER BY o_orderdate, o_orderkey) AS next_key, " +
        "row_number() OVER (PARTITION BY o_custkey " +
        "ORDER BY o_orderdate, o_orderkey) AS rn " +
        "FROM orders WHERE o_custkey % 20 = 0), " +
        "walk AS (" +
        "SELECT o_custkey, o_orderkey, next_key, 1 AS step, " +
        "o_totalprice AS run_total FROM ch WHERE rn = 1 " +
        "UNION ALL " +
        "SELECT c.o_custkey, c.o_orderkey, c.next_key, w.step + 1 AS step, " +
        "w.run_total + c.o_totalprice AS run_total " +
        "FROM walk w JOIN ch c ON c.o_orderkey = w.next_key) " +
        "SELECT o_custkey, o_orderkey, CAST(step AS INT) AS step, " +
        "round(run_total, 2) AS run_total FROM walk"),
    "q111_sketch_quantiles" ->
      ("SELECT l_returnflag, " +
        "round(quantile_cont(l_extendedprice, 0.1), 2) AS p10, " +
        "round(quantile_cont(l_extendedprice, 0.5), 2) AS p50, " +
        "round(quantile_cont(l_extendedprice, 0.9), 2) AS p90, " +
        "count(l_extendedprice) AS n FROM lineitem GROUP BY l_returnflag"),
    "q112_opq_ann" ->
      ("SELECT CAST(count(DISTINCT vec_id) AS BIGINT) AS n_queries, " +
        "true AS recall_ok FROM embeddings WHERE vec_id % (SELECT greatest(100, (count(*) + 127) // 128) FROM embeddings) = 0"),
    "q113_url_extract" ->
      ("WITH u AS (SELECT c_custkey, 'https://' || lower(c_mktsegment) || " +
        "'.example.com/user/' || c_custkey || '?ref=' || c_nationkey AS url " +
        "FROM customer WHERE c_custkey % 10 = 0) " +
        "SELECT c_custkey, " +
        "regexp_extract(url, '^https?://([^/?#]+)', 1) AS host, " +
        "regexp_extract(url, '^https?://[^/?#]+(/[^?#]*)', 1) AS path, " +
        "regexp_extract(url, 'ref=([^&#]+)', 1) AS ref FROM u"),
    "q114_try_battery" ->
      ("SELECT o_orderkey, " +
        "round(o_totalprice / nullif(o_custkey % 5, 0), 4) AS per_bucket, " +
        "TRY_CAST(o_orderstatus AS INT) AS bad_int, " +
        "TRY_CAST(substr(o_orderpriority, 1, 1) AS INT) AS prio_num, " +
        "string_split(o_orderpriority, '-')[5] AS missing_part " +
        "FROM orders WHERE o_custkey % 20 = 0"),
    "q115_explode_outer" ->
      ("SELECT d.doc_id, u.tok FROM (" +
        "SELECT doc_id, list_filter(list_filter(string_split(text, ' '), " +
        "x -> x <> ''), t -> length(t) > 9) AS toks " +
        "FROM documents WHERE doc_id % 10 = 0) d " +
        "LEFT JOIN LATERAL (SELECT unnest(d.toks) AS tok) u ON true"),
    "q116_hll_union" ->
      ("SELECT o_orderstatus AS scope, " +
        "CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_custkeys, " +
        "true AS est_ok FROM orders GROUP BY 1 " +
        "UNION ALL SELECT 'ALL', " +
        "CAST(count(DISTINCT o_custkey) AS BIGINT), true FROM orders"),
    "q117_map_battery" ->
      ("WITH wc AS (SELECT doc_id, word, count(*) AS cnt FROM (" +
        "SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word " +
        "FROM documents WHERE doc_id % 25 = 0) GROUP BY doc_id, word) " +
        "SELECT doc_id, CAST(count(*) AS INT) AS n_distinct_words, " +
        "max(CASE WHEN word = 'the' THEN cnt END) AS the_cnt, " +
        "string_agg(word || ':' || cnt, ',' ORDER BY word) AS entries " +
        "FROM wc GROUP BY doc_id"),
    "q118_percentile_disc" ->
      ("SELECT o_orderstatus, " +
        "round(quantile_disc(o_totalprice, 0.5), 2) AS med_disc, " +
        "round(quantile_cont(o_totalprice, 0.5), 2) AS med_cont, " +
        "round(quantile_disc(o_totalprice, 0.9), 2) AS p90_disc, " +
        "count(*) AS n FROM orders GROUP BY o_orderstatus"),
    "q119_linear_interpolate" ->
      ("WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS day, " +
        "round(sum(value), 2) AS v FROM events GROUP BY 1, 2), " +
        "spine AS (SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day " +
        "FROM (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY user_id)), " +
        "j AS (SELECT s.user_id, s.day, d.v FROM spine s LEFT JOIN daily d " +
        "ON s.user_id = d.user_id AND s.day = d.day), " +
        "w AS (SELECT user_id, day, v, " +
        "last_value(v IGNORE NULLS) OVER wb AS pv, " +
        "last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER wb AS pd, " +
        "first_value(v IGNORE NULLS) OVER wf AS nv, " +
        "first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER wf AS nd " +
        "FROM j WINDOW " +
        "wb AS (PARTITION BY user_id ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), " +
        "wf AS (PARTITION BY user_id ORDER BY day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) " +
        "SELECT user_id, day, (v IS NOT NULL) AS obs, " +
        "round(CASE WHEN v IS NOT NULL THEN v " +
        "WHEN pv IS NULL THEN nv WHEN nv IS NULL THEN pv " +
        "ELSE pv + (nv - pv) * date_diff('day', pd, day) / " +
        "CAST(date_diff('day', pd, nd) AS DOUBLE) END, 4) AS interp FROM w"),
    "q120_hash_battery" ->
      ("SELECT doc_id, md5(text) AS md5, sha256(text) AS sha256, " +
        "substr(sha256(text), 1, 16) || '-' || length(text) AS content_addr " +
        "FROM documents WHERE doc_id % 10 = 0"),
    "q121_snapshot_diff" ->
      ("WITH v1 AS (SELECT o_orderkey AS k, round(o_totalprice, 2) AS p1, " +
        "o_orderstatus AS st1 FROM orders), " +
        "v2 AS (SELECT o_orderkey AS k, CASE WHEN o_orderkey % 13 = 0 " +
        "THEN round(o_totalprice * 2, 2) ELSE round(o_totalprice, 2) END AS p2, " +
        "o_orderstatus AS st2 FROM orders WHERE o_orderkey % 97 <> 0 " +
        "UNION ALL SELECT o_orderkey + 10000000 AS k, round(o_totalprice, 2) AS p2, " +
        "o_orderstatus AS st2 FROM orders WHERE o_orderkey % 89 = 0) " +
        "SELECT CASE WHEN p1 IS NULL THEN 'added' WHEN p2 IS NULL THEN 'removed' " +
        "WHEN p1 <> p2 OR st1 <> st2 THEN 'changed' ELSE 'same' END AS diff_class, " +
        "count(*) AS n, round(sum(coalesce(abs(p2 - p1), 0.0)), 2) AS drift " +
        "FROM v1 FULL OUTER JOIN v2 USING (k) GROUP BY diff_class"),
    "q122_equidepth_hist" ->
      ("SELECT bucket, count(*) AS n, round(min(o_totalprice), 2) AS lo, " +
        "round(max(o_totalprice), 2) AS hi FROM (" +
        "SELECT o_totalprice, CAST(ntile(10) OVER (" +
        "ORDER BY o_totalprice, o_orderkey) AS INT) AS bucket FROM orders) " +
        "GROUP BY bucket"),
    "q123_zscore" ->
      ("WITH st AS (SELECT o_orderstatus, avg(o_totalprice) AS mu, " +
        "stddev_samp(o_totalprice) AS sd FROM orders GROUP BY o_orderstatus) " +
        "SELECT o_orderkey, o.o_orderstatus, " +
        "round((o_totalprice - mu) / sd, 4) AS z " +
        "FROM orders o JOIN st ON o.o_orderstatus = st.o_orderstatus " +
        "WHERE o_custkey % 25 = 0"),
    "q124_connected_components" ->
      ("WITH RECURSIVE toks AS (SELECT doc_id, " +
        "list_distinct(list_filter(string_split(text, ' '), x -> x <> '')) AS t " +
        "FROM documents WHERE doc_id % 4 = 0), " +
        "pairs AS (SELECT a.doc_id AS da, b.doc_id AS db FROM toks a " +
        "JOIN toks b ON a.doc_id < b.doc_id " +
        "WHERE CAST(len(list_intersect(a.t, b.t)) AS DOUBLE) / " +
        "(len(a.t) + len(b.t) - len(list_intersect(a.t, b.t))) >= 0.8), " +
        "e AS (SELECT da AS src, db AS dst FROM pairs " +
        "UNION ALL SELECT db, da FROM pairs), " +
        "walk AS (SELECT doc_id AS node, doc_id AS label FROM toks " +
        "UNION SELECT e.dst, w.label FROM walk w JOIN e ON e.src = w.node) " +
        "SELECT node AS doc_id, min(label) AS comp FROM walk GROUP BY node"),
    "q125_geo_nearest" ->
      ("WITH c AS (SELECT c_custkey, ((c_custkey*37)%1200)/10.0 - 60.0 AS clat, " +
        "((c_custkey*73)%3600)/10.0 - 180.0 AS clon FROM customer), " +
        "s AS (SELECT s_suppkey, ((s_suppkey*41)%1200)/10.0 - 60.0 AS slat, " +
        "((s_suppkey*89)%3600)/10.0 - 180.0 AS slon FROM supplier), " +
        "d AS (SELECT c_custkey, s_suppkey, round(2*6371.0*asin(sqrt(" +
        "sin(radians(slat-clat)/2)*sin(radians(slat-clat)/2) + " +
        "cos(radians(clat))*cos(radians(slat))*" +
        "sin(radians(slon-clon)/2)*sin(radians(slon-clon)/2))), 4) AS dist_km " +
        "FROM c CROSS JOIN s), " +
        "f AS (SELECT *, row_number() OVER (PARTITION BY c_custkey " +
        "ORDER BY dist_km, s_suppkey) AS rk FROM d WHERE dist_km <= 500.0) " +
        "SELECT c_custkey, s_suppkey AS nearest_supp, dist_km FROM f WHERE rk = 1"),
    "q126_variant_battery" ->
      ("SELECT doc_id, doc_id AS vid, lang AS vlang, n_chars AS vn, " +
        "source AS vtag0, CAST(NULL AS BIGINT) AS vmissing, " +
        "CAST(NULL AS BIGINT) AS vbad " +
        "FROM documents WHERE doc_id % 4 = 0"),
    "q127_bigram_lm" ->
      ("WITH ws AS (SELECT doc_id, list_filter(string_split(lower(text), ' '), " +
        "x -> x <> '') AS w FROM documents), " +
        "big AS (SELECT doc_id, unnest(list_zip(w[1:len(w)-1], w[2:len(w)])) AS bg " +
        "FROM ws WHERE len(w) >= 2), " +
        "bigf AS (SELECT doc_id, bg[1] AS w1, bg[2] AS w2 FROM big), " +
        "dbg AS (SELECT doc_id, w1, w2, count(*) AS k FROM bigf GROUP BY doc_id, w1, w2), " +
        "cnt AS (SELECT w1, w2, sum(k) AS c12 FROM dbg GROUP BY w1, w2), " +
        "uni AS (SELECT w1, sum(c12) AS c1 FROM cnt GROUP BY w1), " +
        "voc AS (SELECT count(DISTINCT w2) AS v FROM bigf), " +
        "sc AS (SELECT d.doc_id, d.k, -log2((c.c12 + 1.0) / (u.c1 + voc.v)) AS nll " +
        "FROM dbg d JOIN cnt c ON d.w1 = c.w1 AND d.w2 = c.w2 " +
        "JOIN uni u ON d.w1 = u.w1, voc) " +
        "SELECT doc_id, round(sum(k * nll) / sum(k), 4) AS bits_per_bigram, " +
        "CAST(sum(k) AS BIGINT) AS n_bigrams FROM sc GROUP BY doc_id"),
    "q128_robust_scale" ->
      ("WITH st AS (SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) AS med, " +
        "quantile_cont(l_extendedprice, 0.25) AS q1, " +
        "quantile_cont(l_extendedprice, 0.75) AS q3, " +
        "min(l_extendedprice) AS mn, max(l_extendedprice) AS mx " +
        "FROM lineitem GROUP BY l_returnflag) " +
        "SELECT l_orderkey, l_linenumber, l.l_returnflag, " +
        "round((l_extendedprice - med) / (q3 - q1), 4) AS robust, " +
        "round((l_extendedprice - mn) / (mx - mn), 4) AS minmax " +
        "FROM lineitem l JOIN st ON l.l_returnflag = st.l_returnflag " +
        "WHERE l_orderkey % 101 = 0"),
    "q129_seq_pattern" ->
      ("SELECT user_id, CAST(length(seq) AS INT) AS seq_len, " +
        "CAST(len(regexp_extract_all(seq, 'vc*p')) AS INT) AS n_funnels FROM (" +
        "SELECT user_id, string_agg(substr(event_type, 1, 1), '' " +
        "ORDER BY ts, event_id) AS seq FROM events GROUP BY user_id)"),
    "q130_running_distinct" ->
      ("SELECT event_id, user_id, " +
        "count(DISTINCT event_type) OVER (PARTITION BY user_id ORDER BY ts) " +
        "AS running_distinct FROM events WHERE user_id % 7 = 0"),
    "q131_timezone_battery" ->
      ("SELECT event_id, " +
        "strftime(timezone('America/New_York', ts2 AT TIME ZONE 'UTC'), " +
        "'%Y-%m-%d %H:%M:%S') AS ny_wall, " +
        "CAST((epoch(timezone('America/New_York', ts2 AT TIME ZONE 'UTC')) - " +
        "epoch(ts2)) / 60 AS INT) AS ny_off_min, " +
        "CAST(hour(timezone('Asia/Kolkata', ts2 AT TIME ZONE 'UTC')) AS INT) " +
        "AS kolkata_hour, " +
        "strftime(timezone('Asia/Tokyo', ts2 AT TIME ZONE 'UTC'), '%Y-%m-%d') " +
        "AS tokyo_date FROM (SELECT event_id, " +
        "ts + to_days(CAST(event_id % 330 AS INT)) AS ts2 " +
        "FROM events WHERE event_id % 17 = 0)"),
    "q132_weighted_quantiles" ->
      ("WITH pv AS (SELECT l_returnflag AS g, l_extendedprice AS v, " +
        "sum(l_quantity) AS w FROM lineitem GROUP BY 1, 2), " +
        "c AS (SELECT g, v, sum(w) OVER (PARTITION BY g ORDER BY v " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw FROM pv), " +
        "t AS (SELECT g, v, cw, max(cw) OVER (PARTITION BY g) AS tw FROM c) " +
        "SELECT g AS l_returnflag, " +
        "round(min(CASE WHEN cw >= 0.25 * tw THEN v END), 2) AS wp25, " +
        "round(min(CASE WHEN cw >= 0.5 * tw THEN v END), 2) AS wp50, " +
        "round(min(CASE WHEN cw >= 0.75 * tw THEN v END), 2) AS wp75 " +
        "FROM t GROUP BY g"),
    "q133_pointer_doubling" ->
      // q110's sequential walk with an exact DECIMAL accumulator: the
      // pointer-doubling re-plan reassociates additions, so the compare
      // runs on a ring where reassociation is lossless
      ("WITH RECURSIVE " +
        "ch AS (SELECT o_custkey, o_orderkey, o_totalprice, " +
        "lead(o_orderkey) OVER (PARTITION BY o_custkey " +
        "ORDER BY o_orderdate, o_orderkey) AS next_key, " +
        "row_number() OVER (PARTITION BY o_custkey " +
        "ORDER BY o_orderdate, o_orderkey) AS rn " +
        "FROM orders WHERE o_custkey % 20 = 0), " +
        "walk AS (" +
        "SELECT o_custkey, o_orderkey, next_key, 1 AS step, " +
        "CAST(o_totalprice AS DECIMAL(18,2)) AS run_total FROM ch WHERE rn = 1 " +
        "UNION ALL " +
        "SELECT c.o_custkey, c.o_orderkey, c.next_key, w.step + 1 AS step, " +
        "CAST(w.run_total + CAST(c.o_totalprice AS DECIMAL(18,2)) " +
        "AS DECIMAL(18,2)) AS run_total " +
        "FROM walk w JOIN ch c ON c.o_orderkey = w.next_key) " +
        "SELECT o_custkey, o_orderkey, CAST(step AS INT) AS step, " +
        "round(CAST(run_total AS DOUBLE), 2) AS run_total FROM walk"),
    "q134_prefix_filter_join" ->
      // q26's brute-force oracle verbatim: the prefix-filtered join must
      // reproduce the all-pairs result exactly
      ("SELECT doc_a, doc_b, round(jac, 4) AS jaccard FROM (" +
        "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, " +
        "CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) / " +
        "(len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) AS jac " +
        "FROM (SELECT doc_id, list_distinct(list_filter(string_split(text,' '), x -> x <> '')) AS toks FROM documents WHERE doc_id % 4 = 0) a " +
        "JOIN (SELECT doc_id, list_distinct(list_filter(string_split(text,' '), x -> x <> '')) AS toks FROM documents WHERE doc_id % 4 = 0) b " +
        "ON a.doc_id < b.doc_id) WHERE jac >= 0.6"),
    "q135_chi_square" ->
      ("WITH joint AS (SELECT event_type, CAST(dayofweek(ts) + 1 AS INT) AS dow, " +
        "count(*) AS obs FROM events GROUP BY 1, 2), " +
        "rm AS (SELECT event_type, CAST(sum(obs) AS BIGINT) AS rn FROM joint GROUP BY 1), " +
        "cm AS (SELECT dow, CAST(sum(obs) AS BIGINT) AS cn FROM joint GROUP BY 1), " +
        "tt AS (SELECT CAST(sum(obs) AS BIGINT) AS n FROM joint) " +
        "SELECT j.event_type, j.dow, j.obs, " +
        "round(CAST(rn AS DOUBLE) * cn / n, 4) AS expected, " +
        "round(pow(j.obs - CAST(rn AS DOUBLE) * cn / n, 2) / " +
        "(CAST(rn AS DOUBLE) * cn / n), 6) AS chi2_term, " +
        "round(log2(CAST(j.obs AS DOUBLE) * n / (CAST(rn AS DOUBLE) * cn)), 6) " +
        "AS pmi FROM joint j JOIN rm USING (event_type) JOIN cm USING (dow), tt"),
    "q136_mad_outliers" ->
      ("WITH med AS (SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) " +
        "AS med FROM lineitem GROUP BY 1), " +
        "mad AS (SELECT l.l_returnflag, any_value(med) AS med, " +
        "quantile_cont(abs(l_extendedprice - med), 0.5) AS mad " +
        "FROM lineitem l JOIN med USING (l_returnflag) GROUP BY 1) " +
        "SELECT l.l_returnflag, round(any_value(med), 2) AS med, " +
        "round(any_value(mad), 2) AS mad, " +
        "CAST(sum(CASE WHEN abs(l_extendedprice - med) > mad * (3 * 1.4826) " +
        "THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers, " +
        "count(*) AS n FROM lineitem l JOIN mad USING (l_returnflag) GROUP BY 1"),
    "q137_relational_division" ->
      ("WITH u AS (SELECT count(DISTINCT o_orderpriority) AS u FROM orders) " +
        "SELECT o_custkey, count(*) AS n_orders FROM orders, u " +
        "GROUP BY o_custkey, u.u " +
        "HAVING count(DISTINCT o_orderpriority) = u.u"),
    "q138_bitmap_distinct" ->
      // the oracle runs the shuffle-distinct the bitmap path avoids
      "SELECT event_type, count(DISTINCT user_id) AS n_users FROM events GROUP BY 1",
    "q139_knn_triangles" ->
      ("WITH mm AS (SELECT greatest(2, (count(*) + 999) // 1000) AS m " +
        "FROM embeddings), " +
        "v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e " +
        "FROM embeddings, mm WHERE vec_id % mm.m = 0), " +
        "knn AS (SELECT src, dst FROM (SELECT a.vec_id AS src, b.vec_id AS dst, " +
        "row_number() OVER (PARTITION BY a.vec_id ORDER BY " +
        "round(list_cosine_similarity(a.e, b.e), 6) DESC, b.vec_id) AS rk " +
        "FROM v a JOIN v b ON a.vec_id <> b.vec_id) WHERE rk <= 3), " +
        "und AS (SELECT DISTINCT least(src, dst) AS x, greatest(src, dst) AS y FROM knn), " +
        "deg AS (SELECT vv, count(*) AS dg FROM " +
        "(SELECT x AS vv FROM und UNION ALL SELECT y FROM und) GROUP BY 1), " +
        "tri AS (SELECT count(*) AS nt FROM und e1 " +
        "JOIN und e2 ON e1.y = e2.x " +
        "JOIN und e3 ON e3.x = e1.x AND e3.y = e2.y) " +
        "SELECT (SELECT count(*) FROM deg) AS n_nodes, " +
        "(SELECT count(*) FROM und) AS n_edges, " +
        "(SELECT CAST(sum((dg * (dg - 1)) // 2) AS BIGINT) FROM deg) AS n_wedges, " +
        "(SELECT nt FROM tri) AS n_triangles, " +
        "round((SELECT nt FROM tri) * 3.0 / " +
        "(SELECT sum((dg * (dg - 1)) // 2) FROM deg), 6) AS clustering"),
    "q140_incremental_agg" ->
      ("SELECT o_orderstatus, count(*) AS n_orders, " +
        "round(sum(o_totalprice), 2) AS total FROM orders GROUP BY 1"),
    "q141_seasonal_decompose" ->
      ("WITH b AS (SELECT event_id, value, CAST(hour(ts) AS INT) AS hod, " +
        "CAST(dayofweek(ts) + 1 AS INT) AS dow FROM events), " +
        "hm AS (SELECT hod, avg(value) AS hm FROM b GROUP BY 1), " +
        "wm AS (SELECT dow, avg(value) AS wm FROM b GROUP BY 1), " +
        "g AS (SELECT avg(value) AS gm FROM b) " +
        "SELECT event_id, hod, dow, round(hm + wm - gm, 4) AS expected, " +
        "round(value - (hm + wm - gm), 4) AS residual " +
        "FROM b JOIN hm USING (hod) JOIN wm USING (dow), g " +
        "WHERE event_id % 13 = 0"),
    "q142_timed_funnel" ->
      ("WITH v AS (SELECT user_id, min(ts) AS v1 FROM events " +
        "WHERE event_type = 'view' GROUP BY 1), " +
        "c AS (SELECT e.user_id, min(ts) AS c1 FROM events e JOIN v USING (user_id) " +
        "WHERE event_type = 'click' AND ts > v1 " +
        "AND ts <= v1 + INTERVAL 24 HOUR GROUP BY 1), " +
        "p AS (SELECT e.user_id, min(ts) AS p1 FROM events e JOIN c USING (user_id) " +
        "WHERE event_type = 'purchase' AND ts > c1 " +
        "AND ts <= c1 + INTERVAL 24 HOUR GROUP BY 1) " +
        "SELECT v.user_id, epoch_us(v1) AS v_us, epoch_us(c1) AS c_us, " +
        "epoch_us(p1) AS p_us FROM v LEFT JOIN c USING (user_id) " +
        "LEFT JOIN p USING (user_id)"),
    "q143_activity_streaks" ->
      ("WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events), " +
        "isl AS (SELECT user_id, day - CAST(row_number() OVER (" +
        "PARTITION BY user_id ORDER BY day) AS INT) AS anchor FROM days), " +
        "runs AS (SELECT user_id, anchor, count(*) AS len FROM isl GROUP BY 1, 2) " +
        "SELECT user_id, CAST(sum(len) AS BIGINT) AS active_days, " +
        "count(*) AS n_streaks, max(len) AS max_streak " +
        "FROM runs GROUP BY user_id"),
    "q144_tpch_q1" ->
      ("SELECT l_returnflag, l_linestatus, " +
        "round(sum(l_quantity), 2) AS sum_qty, " +
        "CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_base_price, " +
        "CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS sum_disc_price, " +
        "CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))), 2) AS DOUBLE) AS sum_charge, " +
        "round(avg(l_quantity), 4) AS avg_qty, " +
        "round(avg(l_extendedprice), 4) AS avg_price, " +
        "round(avg(l_discount), 4) AS avg_disc, " +
        "count(*) AS count_order " +
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' " +
        "GROUP BY l_returnflag, l_linestatus"),
    "q145_tpch_q3" ->
      ("SELECT l_orderkey, revenue, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, " +
        "o_orderpriority FROM (" +
        "SELECT l_orderkey, o_orderdate, o_orderpriority, " +
        "CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue " +
        "FROM customer JOIN orders ON c_custkey = o_custkey " +
        "JOIN lineitem ON l_orderkey = o_orderkey " +
        "WHERE c_mktsegment = 'BUILDING' " +
        "AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00' " +
        "AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00' " +
        "GROUP BY l_orderkey, o_orderdate, o_orderpriority) " +
        "ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10"),
    "q146_tpch_q5" ->
      ("SELECT n_name, CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue " +
        "FROM region JOIN nation ON n_regionkey = r_regionkey " +
        "JOIN customer ON c_nationkey = n_nationkey " +
        "JOIN orders ON o_custkey = c_custkey " +
        "JOIN lineitem ON l_orderkey = o_orderkey " +
        "JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey " +
        "WHERE r_name = 'ASIA' " +
        "AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' " +
        "AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00' " +
        "GROUP BY n_name"),
    "q147_tpch_q4" ->
      ("SELECT o_orderpriority, count(*) AS order_count FROM orders " +
        "WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00' " +
        "AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00' " +
        "AND EXISTS (SELECT 1 FROM lineitem " +
        "WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate) " +
        "GROUP BY o_orderpriority"),
    "q148_tpch_q10" ->
      ("SELECT c_custkey, c_name, c_acctbal, n_name, revenue FROM (" +
        "SELECT c_custkey, c_name, c_acctbal, n_name, " +
        "CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation ON c_nationkey = n_nationkey " +
        "WHERE l_returnflag = 'R' " +
        "AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' " +
        "AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00' " +
        "GROUP BY c_custkey, c_name, c_acctbal, n_name) " +
        "ORDER BY revenue DESC, c_custkey LIMIT 20"),
    "q149_tpch_q13" ->
      ("SELECT c_count, count(*) AS custdist FROM (" +
        "SELECT c_custkey, count(o_orderkey) AS c_count " +
        "FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey " +
        "GROUP BY c_custkey) GROUP BY c_count"),
    "q150_tpch_q18" ->
      ("SELECT c_custkey, c_name, o_orderkey, " +
        "strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, " +
        "round(o_totalprice, 2) AS o_totalprice, total_qty " +
        "FROM (SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty " +
        "FROM lineitem GROUP BY l_orderkey HAVING round(sum(l_quantity), 2) > 250) " +
        "JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey"),
    "q151_tpch_q22" ->
      ("WITH c AS (SELECT c_custkey, c_acctbal, " +
        "CAST(c_custkey % 7 + 10 AS INT) AS cntrycode FROM customer), " +
        "ab AS (SELECT avg(c_acctbal) AS ab FROM c WHERE c_acctbal > 0) " +
        "SELECT cntrycode, count(*) AS numcust, " +
        "round(sum(c_acctbal), 2) AS totacctbal " +
        "FROM c, ab WHERE c_acctbal > ab " +
        "AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) " +
        "GROUP BY cntrycode"),
    "q152_tpch_q7" ->
      ("SELECT supp_nation, cust_nation, CAST(year(l_shipdate) AS INT) AS l_year, " +
        "CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
        "(1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN (SELECT s_suppkey, n_name AS supp_nation FROM supplier " +
        "JOIN nation ON s_nationkey = n_nationkey) ON l_suppkey = s_suppkey " +
        "JOIN (SELECT c_custkey, n_name AS cust_nation FROM customer " +
        "JOIN nation ON c_nationkey = n_nationkey) ON o_custkey = c_custkey " +
        "WHERE (supp_nation = 'NATION_3' AND cust_nation = 'NATION_7') " +
        "OR (supp_nation = 'NATION_7' AND cust_nation = 'NATION_3') " +
        "GROUP BY supp_nation, cust_nation, CAST(year(l_shipdate) AS INT)"),
    "q153_tpch_q8" ->
      ("WITH vol AS (SELECT CAST(year(o_orderdate) AS INT) AS o_year, " +
        "CAST(l_extendedprice AS DECIMAL(18,2)) * " +
        "(1 - CAST(l_discount AS DECIMAL(18,2))) AS v, n_name " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation ON c_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'ASIA') " +
        "SELECT o_year, round(CAST(sum(CASE WHEN n_name = 'NATION_2' THEN v " +
        "ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) / " +
        "CAST(sum(v) AS DOUBLE), 6) AS mkt_share FROM vol GROUP BY o_year"),
    "q154_tpch_q14" ->
      ("SELECT round(CAST(sum(CASE WHEN p_name LIKE '%red%' THEN " +
        "CAST(l_extendedprice AS DECIMAL(18,2)) * " +
        "(1 - CAST(l_discount AS DECIMAL(18,2))) " +
        "ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) * 100.0 / " +
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
        "(1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 6) AS promo_revenue " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey " +
        "WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00' " +
        "AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'"),
    "q155_tpch_q19" ->
      ("SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
        "(1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue, " +
        "count(*) AS n_items " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey " +
        "WHERE (p_partkey % 5 = 1 AND l_quantity BETWEEN 1 AND 11) " +
        "OR (p_partkey % 5 = 2 AND l_quantity BETWEEN 10 AND 20) " +
        "OR (p_partkey % 5 = 3 AND l_quantity BETWEEN 20 AND 30)"),
    "q156_rolling_wau" ->
      ("WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events), " +
        "mx AS (SELECT max(day) AS mx FROM ud) " +
        "SELECT day, count(DISTINCT user_id) AS wau FROM (" +
        "SELECT user_id, day + CAST(i AS INT) AS day FROM ud, " +
        "(SELECT unnest(range(7)) AS i)), mx WHERE day <= mx " +
        "GROUP BY day"),
    "q157_nth_value" ->
      ("SELECT o_custkey, o_orderkey, " +
        "round(nth_value(o_totalprice, 2) OVER w, 2) AS nv2, " +
        "round(first_value(CASE WHEN o_orderkey % 3 <> 0 THEN o_totalprice END " +
        "IGNORE NULLS) OVER w, 2) AS fv_nn, " +
        "round(last_value(o_totalprice) OVER (PARTITION BY o_custkey " +
        "ORDER BY o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND " +
        "UNBOUNDED FOLLOWING), 2) AS lv, " +
        "round(coalesce(lag(o_totalprice, 1) OVER w, -1.0), 2) AS lag_def, " +
        "round(coalesce(lead(o_totalprice, 2) OVER w, -1.0), 2) AS lead_def " +
        "FROM orders WHERE o_custkey % 40 = 0 " +
        "WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)"),
    "q158_codec_battery" ->
      ("SELECT CASE doc_id % 4 WHEN 0 THEN 'image/bmp' " +
        "WHEN 1 THEN 'image/png' WHEN 2 THEN 'image/jpeg' " +
        "ELSE 'image/gif' END AS mime, count(*) AS n, 16 AS w, " +
        "12 AS h, true AS roundtrip_ok FROM documents GROUP BY 1"),
    "q159_xml_battery" ->
      ("SELECT doc_id, doc_id AS vid, lang AS vlang, n_chars AS vn, " +
        "CAST(NULL AS VARCHAR) AS vmissing " +
        "FROM documents WHERE doc_id % 4 = 0"),
    // the oracle IS the engine query: one SQL text, two engines
    "q160_group_by_all" -> graft.operators.Advanced.GroupByAllSql,
    "q161_multi_distinct" ->
      ("SELECT event_type, count(DISTINCT user_id) AS n_users, " +
        "count(DISTINCT CAST(ts AS DATE)) AS n_days, " +
        "count(DISTINCT CAST(json_extract_string(props, '$.k') AS INT)) AS n_keys, " +
        "count(*) AS n_events, round(sum(value), 2) AS total_value " +
        "FROM events GROUP BY event_type"),
    "q162_asof_tolerance" ->
      ("WITH ev AS (SELECT event_id, user_id, event_type, epoch_ms(ts) AS ts_ms, value FROM events), " +
        "c AS (SELECT event_id, user_id, ts_ms FROM ev WHERE event_type = 'click'), " +
        "v AS (SELECT user_id, ts_ms, round(max(value), 2) AS view_value " +
        "FROM ev WHERE event_type = 'view' GROUP BY user_id, ts_ms), " +
        "j AS (SELECT c.event_id, c.user_id, c.ts_ms, v.ts_ms AS vm, v.view_value AS vv " +
        "FROM c ASOF LEFT JOIN v ON c.user_id = v.user_id AND c.ts_ms >= v.ts_ms) " +
        "SELECT event_id, user_id, ts_ms, " +
        "CASE WHEN ts_ms - vm <= 3600000 THEN vm END AS view_ms, " +
        "CASE WHEN ts_ms - vm <= 3600000 THEN vv END AS view_value FROM j"),
    "q163_typed_pipeline" ->
      ("SELECT o_orderstatus, o_custkey % 3 AS bucket, count(*) AS n, " +
        "round(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) " +
        "/ 100.0, 2) AS total, max(o_orderkey) AS max_key " +
        "FROM orders WHERE o_custkey % 10 = 0 " +
        "GROUP BY o_orderstatus, o_custkey % 3"),
    "q164_audio_battery" ->
      ("SELECT rate, channels, count(*) AS n, 400 AS n_frames, " +
        "round(round(400000000.0 / rate) / 1000.0, 3) AS avg_dur_ms, " +
        "true AS roundtrip_ok FROM (" +
        "SELECT CAST(8000 * (1 + doc_id % 3) AS INT) AS rate, " +
        "CAST(1 + doc_id % 2 AS INT) AS channels FROM documents) " +
        "GROUP BY rate, channels"),
    "q165_kmeans" -> {
      // same per-round re-quantization as the Spark plan: distances fold
      // in index order and round to 6 before the argmin; centroid means
      // accumulate in DECIMAL (order-independent) and round to 7
      def d2(c: String): String =
        "round(list_sum(list_transform(range(1, len(v.emb)+1), " +
          s"i -> (v.emb[i]-$c.cent[i])*(v.emb[i]-$c.cent[i]))), 6)"
      def assign(cs: String, out: String): String =
        s"$out AS (SELECT vec_id, emb, cid, d2 FROM (" +
          s"SELECT v.vec_id, v.emb, $cs.cid, ${d2(cs)} AS d2, " +
          "row_number() OVER (PARTITION BY v.vec_id " +
          s"ORDER BY ${d2(cs)}, $cs.cid) AS rk " +
          s"FROM v CROSS JOIN $cs) WHERE rk = 1)"
      "WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings), " +
        "c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid, " +
        "emb AS cent FROM (SELECT * FROM v ORDER BY vec_id LIMIT 8)), " +
        assign("c0", "a1") + ", " +
        "m1 AS (SELECT cid, pos, " +
        "round(CAST(sum(CAST(x AS DECIMAL(30,12))) AS DOUBLE)/count(*), 7) AS m " +
        "FROM (SELECT cid, unnest(range(1, len(emb)+1)) AS pos, unnest(emb) AS x " +
        "FROM a1) GROUP BY cid, pos), " +
        "c1 AS (SELECT cid, list(m ORDER BY pos) AS cent FROM m1 GROUP BY cid), " +
        assign("c1", "a2") +
        " SELECT vec_id, cid, d2 FROM a2"
    },
    "q166_label_propagation" -> {
      // one synchronous vote round: mode over labeled neighbors
      // (count desc, label asc), seeds clamped via coalesce
      def rnd(prev: String, cur: String): String =
        s"$cur AS (SELECT n.node, coalesce(n.seed, m.nl) AS lbl, n.seed " +
          "FROM nodes n LEFT JOIN (SELECT dst AS node, vl AS nl FROM (" +
          "SELECT dst, vl, row_number() OVER (PARTITION BY dst " +
          "ORDER BY c DESC, vl) AS rk FROM (" +
          s"SELECT e.dst, l.lbl AS vl, count(*) AS c FROM e JOIN $prev l " +
          "ON e.src = l.node WHERE l.lbl IS NOT NULL " +
          "GROUP BY e.dst, l.lbl)) WHERE rk = 1) m ON n.node = m.node)"
      "WITH uk AS (SELECT DISTINCT 'u' || user_id AS a, " +
        "'k' || CAST(json_extract_string(props, '$.k') AS INT) AS b FROM events " +
        "WHERE json_extract_string(props, '$.k') IS NOT NULL), " +
        "e AS (SELECT a AS src, b AS dst FROM uk UNION ALL SELECT b, a FROM uk), " +
        "nodes AS (SELECT src AS node, CASE WHEN src LIKE 'k%' AND " +
        "CAST(substr(src, 2) AS INT) % 3 = 0 " +
        "THEN CAST(substr(src, 2) AS INT) END AS seed " +
        "FROM (SELECT DISTINCT src FROM e)), " +
        "l0 AS (SELECT node, seed AS lbl, seed FROM nodes), " +
        (1 to 3).map(i => rnd(s"l${i - 1}", s"l$i")).mkString(", ") +
        " SELECT node, lbl FROM l3"
    },
    "q167_shortest_paths" -> {
      // one Bellman-Ford relax round; MIN is reassociation-safe so no
      // per-round quantization is needed (unlike q86's rank sums)
      def relax(prev: String, cur: String): String =
        s"$cur AS (SELECT node, min(dist) AS dist FROM (" +
          s"SELECT node, dist FROM $prev UNION ALL " +
          s"SELECT e.dst AS node, $prev.dist + e.w AS dist " +
          s"FROM e JOIN $prev ON e.src = $prev.node) GROUP BY node)"
      "WITH uk AS (SELECT 'u' || user_id AS a, " +
        "'k' || CAST(json_extract_string(props, '$.k') AS INT) AS b, user_id " +
        "FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL), " +
        "pair AS (SELECT a, b, round(CAST(1.0 AS DOUBLE) / count(*), 6) AS w " +
        "FROM uk GROUP BY a, b), " +
        "e AS (SELECT a AS src, b AS dst, w FROM pair " +
        "UNION ALL SELECT b, a, w FROM pair), " +
        "d0 AS (SELECT DISTINCT a AS node, CAST(0.0 AS DOUBLE) AS dist " +
        "FROM uk WHERE user_id % 100 = 0), " +
        (1 to 6).map(i => relax(s"d${i - 1}", s"d$i")).mkString(", ") +
        " SELECT node, round(dist, 6) AS dist FROM d6"
    },
    "q168_repetition_removal" ->
      // Spark's array_distinct keeps first-occurrence order; DuckDB's
      // list_distinct doesn't, so the oracle rebuilds it positionally
      ("WITH w AS (SELECT doc_id, list_filter(string_split(text, ' '), " +
        "x -> x <> '') AS w FROM documents), " +
        "pos AS (SELECT doc_id, unnest(w) AS x, " +
        "unnest(range(1, len(w)+1)) AS p FROM w), " +
        "firsts AS (SELECT doc_id, x, min(p) AS fp FROM pos GROUP BY doc_id, x), " +
        "nd AS (SELECT doc_id, CAST(count(*) AS INT) AS n_distinct " +
        "FROM firsts GROUP BY doc_id), " +
        "pref AS (SELECT doc_id, string_agg(x, ' ' ORDER BY fp) AS dedup_prefix " +
        "FROM (SELECT doc_id, x, fp, row_number() OVER (PARTITION BY doc_id " +
        "ORDER BY fp) AS rk FROM firsts) WHERE rk <= 10 GROUP BY doc_id), " +
        "consec AS (SELECT doc_id, CAST(sum(dd) AS INT) AS n_consec_dups FROM (" +
        "SELECT doc_id, CASE WHEN x = lag(x) OVER (PARTITION BY doc_id " +
        "ORDER BY p) THEN 1 ELSE 0 END AS dd FROM pos) GROUP BY doc_id) " +
        "SELECT w.doc_id, CAST(len(w.w) AS INT) AS n_words, " +
        "coalesce(nd.n_distinct, 0) AS n_distinct, " +
        "coalesce(consec.n_consec_dups, 0) AS n_consec_dups, " +
        "coalesce(pref.dedup_prefix, '') AS dedup_prefix " +
        "FROM w LEFT JOIN nd USING (doc_id) LEFT JOIN pref USING (doc_id) " +
        "LEFT JOIN consec USING (doc_id)"),
    "q169_allen_intervals" ->
      // the CASE text is Advanced.AllenCaseSql VERBATIM — one classifier,
      // two engines (q160's pattern)
      ("WITH iv AS (SELECT event_id, user_id, epoch_ms(ts) // 3600000 AS st, " +
        "epoch_ms(ts) // 3600000 + 1 + CAST(floor(value) AS BIGINT) // 60 AS en " +
        "FROM events WHERE user_id % 5 = 0), " +
        "pairs AS (SELECT a.st AS sa, a.en AS ea, b.st AS sb, b.en AS eb " +
        "FROM iv a JOIN iv b ON a.user_id = b.user_id " +
        "AND a.event_id % 2 = 0 AND b.event_id % 2 = 1) " +
        s"SELECT ${graft.operators.Advanced.AllenCaseSql} AS rel, " +
        "count(*) AS n FROM pairs GROUP BY rel"),
    "q170_mixture_sample" ->
      ("WITH docs AS (SELECT doc_id, source, " +
        "CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS toks " +
        "FROM documents), " +
        "bysrc AS (SELECT source, sum(toks) AS src_toks FROM docs GROUP BY source), " +
        "tot AS (SELECT sum(src_toks) AS total, " +
        "sum(sqrt(CAST(src_toks AS DOUBLE))) AS wsum FROM bysrc), " +
        "rates AS (SELECT source, src_toks, round(least(CAST(1.0 AS DOUBLE), " +
        "0.5 * total * sqrt(CAST(src_toks AS DOUBLE)) / wsum / src_toks), 7) AS rate " +
        "FROM bysrc, tot) " +
        "SELECT d.source, count(*) AS n_kept, " +
        "CAST(sum(d.toks) AS BIGINT) AS toks_kept, max(r.rate) AS rate " +
        "FROM docs d JOIN rates r ON d.source = r.source " +
        "WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) < " +
        "printf('%08x', CAST(least(floor(r.rate * 4294967296), 4294967295) AS BIGINT)) " +
        "GROUP BY d.source"),
    "q171_bloom_decontaminate" ->
      // the EXACT anti-join formulation — the bloom probe on the Spark
      // side must be transparent (no false negatives + exact verify)
      ("WITH t AS (SELECT doc_id, source, " +
        "list_filter(string_split(text, ' '), x -> x <> '') AS toks FROM documents), " +
        "g AS (SELECT DISTINCT doc_id, array_to_string(list_slice(toks, " +
        "CAST(u.i AS INT), CAST(u.i AS INT) + 7), ' ') AS g " +
        "FROM t, unnest(range(1, len(toks) - 6)) AS u(i) WHERE len(toks) >= 8), " +
        "b AS (SELECT DISTINCT g FROM g WHERE doc_id % 7 = 0 AND doc_id < 3500), " +
        "bad AS (SELECT DISTINCT g.doc_id FROM g JOIN b ON g.g = b.g " +
        "WHERE NOT (g.doc_id % 7 = 0 AND g.doc_id < 3500)), " +
        "corpus AS (SELECT doc_id, source, CAST(len(toks) AS BIGINT) AS ntok " +
        "FROM t WHERE NOT (doc_id % 7 = 0 AND doc_id < 3500)) " +
        "SELECT source, count(*) AS n_docs, CAST(sum(ntok) AS BIGINT) AS n_tokens " +
        "FROM corpus WHERE NOT EXISTS (SELECT 1 FROM bad WHERE bad.doc_id = corpus.doc_id) " +
        "GROUP BY source"),
    "q172_mode_battery" ->
      ("WITH counts AS (SELECT o_orderpriority AS grp, o_orderstatus AS v, " +
        "count(*) AS c FROM orders GROUP BY 1, 2), " +
        "md AS (SELECT grp, v AS mode_status, c AS mode_n FROM (" +
        "SELECT grp, v, c, row_number() OVER (PARTITION BY grp " +
        "ORDER BY c DESC, v) AS rk FROM counts) WHERE rk = 1), " +
        "aggs AS (SELECT o_orderpriority AS grp, " +
        "count(*) FILTER (WHERE o_totalprice > 200000) AS n_big, " +
        "bool_and(o_totalprice > 0) AS all_pos, " +
        "bool_or(o_orderstatus = 'F') AS any_f, count(*) AS n " +
        "FROM orders GROUP BY 1) " +
        "SELECT a.grp, a.n_big, a.all_pos, a.any_f, a.n, " +
        "m.mode_status, m.mode_n FROM aggs a JOIN md m ON a.grp = m.grp"),
    "q173_cm_frequent" ->
      // the sketch is invisible in the semantics: plain exact HAVING
      ("WITH t AS (SELECT list_filter(string_split(text, ' '), x -> x <> '') AS w " +
        "FROM documents), " +
        "bg AS (SELECT w[CAST(u.i AS INT)] || ' ' || w[CAST(u.i AS INT) + 1] AS tok " +
        "FROM t, unnest(range(1, len(w))) AS u(i) WHERE len(w) >= 2), " +
        "tot AS (SELECT count(*) AS total FROM bg) " +
        "SELECT tok, count(*) AS n FROM bg, tot GROUP BY tok, tot.total " +
        "HAVING count(*) >= tot.total / 1000.0"),
    "q174_bpe_tokens" ->
      ("WITH v AS (SELECT count(DISTINCT tok) AS nw FROM (" +
        "SELECT unnest(list_filter(string_split(text, ' '), " +
        "x -> x <> '')) AS tok FROM documents)) " +
        "SELECT CAST(nw AS BIGINT) AS n_words, " +
        "CAST(nw AS BIGINT) AS n_lossless, true AS all_lossless FROM v"),
    "q175_global_rownumber" ->
      ("SELECT o_orderkey, CAST(row_number() OVER (ORDER BY o_orderkey) " +
        "AS BIGINT) AS rn FROM orders"),
    "q176_binned_range_join" ->
      // the plain non-equi formulation — binning must be transparent
      ("WITH ev AS (SELECT event_id, event_type, " +
        "epoch_ms(ts) // 3600000 AS st, " +
        "epoch_ms(ts) // 3600000 + 1 + CAST(floor(value) AS BIGINT) // 60 AS en " +
        "FROM events), " +
        "iv AS (SELECT st AS lo, en AS hi FROM ev WHERE event_type = 'view'), " +
        "pts AS (SELECT event_id, st AS p FROM ev WHERE event_type = 'click') " +
        "SELECT p.event_id, count(i.lo) AS n_overlap " +
        "FROM pts p LEFT JOIN iv i ON p.p >= i.lo AND p.p < i.hi " +
        "GROUP BY p.event_id"),
    "q177_markov_transitions" ->
      ("WITH seq AS (SELECT event_type, lead(event_type, 1) OVER (" +
        "PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS next_type " +
        "FROM events), " +
        "trans AS (SELECT event_type, next_type, count(*) AS n FROM seq " +
        "WHERE next_type IS NOT NULL GROUP BY event_type, next_type), " +
        "tot AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS tot FROM trans " +
        "GROUP BY event_type) " +
        "SELECT t.event_type, t.next_type, t.n, " +
        "round(CAST(t.n AS DOUBLE) / tt.tot, 6) AS p " +
        "FROM trans t JOIN tot tt ON t.event_type = tt.event_type"),
    "q178_vector_battery" ->
      ("SELECT vec_id, " +
        "round(sqrt(list_sum(list_transform(e, x -> x * x))), 6) AS l2, " +
        "round(list_sum(e), 6) AS sum_el, " +
        "round(list_max(e), 6) AS max_el, " +
        "CAST(list_position(e, list_max(e)) AS BIGINT) AS argmax_idx, " +
        "round(e[1] / sqrt(list_sum(list_transform(e, x -> x * x))), 6) AS unit_first " +
        "FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e " +
        "FROM embeddings WHERE vec_id % 3 = 0)"),
    "q179_fold_assignment" ->
      ("SELECT CAST((strpos('0123456789abcdef', " +
        "substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) % 4 AS INT) AS fold, " +
        "count(*) AS n_docs, " +
        "CAST(sum(len(list_filter(string_split(text, ' '), x -> x <> ''))) AS BIGINT) AS n_tokens, " +
        "CAST(count(DISTINCT source) AS BIGINT) AS n_sources " +
        "FROM documents GROUP BY 1"),
    "q180_autocorrelation" ->
      // cents sums keep the daily series engine-order-independent
      ("WITH daily AS (SELECT CAST(ts AS DATE) AS day, " +
        "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100 AS v " +
        "FROM events GROUP BY 1), " +
        "lags(k) AS (VALUES (1), (7)) " +
        "SELECT k AS lag, count(*) AS n, round(corr(a.v, b.v), 6) AS r " +
        "FROM lags, daily a JOIN daily b ON a.day + k = b.day GROUP BY k"),
    "q181_reservoir_sample" ->
      // fixed-width hex sorts lexicographically == numerically, so the
      // window ORDER BY matches the kernel's negated-hash heap order
      ("SELECT source, doc_id, CAST(rk AS INT) AS rk FROM (" +
        "SELECT source, doc_id, row_number() OVER (PARTITION BY source " +
        "ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 8), doc_id) AS rk " +
        "FROM documents) WHERE rk <= 5"),
    "q182_regression_battery" ->
      ("SELECT o_orderstatus, regr_count(o_totalprice, o_custkey) AS n, " +
        "round(regr_avgx(o_totalprice, o_custkey), 4) AS avgx, " +
        "round(regr_avgy(o_totalprice, o_custkey), 2) AS avgy, " +
        "round(regr_r2(o_totalprice, o_custkey), 6) AS r2, " +
        "round(regr_sxx(o_totalprice, o_custkey) / 1e9, 4) AS sxx_b, " +
        "round(regr_syy(o_totalprice, o_custkey) / 1e12, 4) AS syy_t, " +
        "round(regr_sxy(o_totalprice, o_custkey) / 1e9, 4) AS sxy_b " +
        "FROM orders GROUP BY o_orderstatus"),
    "q183_jaro_winkler" ->
      // DuckDB's jaro_winkler_similarity is an independent implementation
      // of the same standard algorithm — the hash match pins semantics
      ("WITH mm AS (SELECT greatest(37, (count(*) + 599) // 600) AS ma, " +
        "greatest(53, (count(*) + 399) // 400) AS mb FROM part) " +
        "SELECT ka, kb, sim FROM (SELECT a.p_partkey AS ka, " +
        "b.p_partkey AS kb, " +
        "round(jaro_winkler_similarity(a.p_name, b.p_name), 5) AS sim " +
        "FROM part a, part b, mm WHERE a.p_partkey % mm.ma = 0 " +
        "AND b.p_partkey % mm.mb = 0 AND a.p_partkey < b.p_partkey) " +
        "WHERE sim >= 0.85"),
    "q184_compression_signal" ->
      ("SELECT source, count(*) AS n_docs, true AS ratios_ok " +
        "FROM documents GROUP BY source"),
    "q185_sparse_cosine" ->
      // weights quantized to 4 BEFORE norms/dots on both engines
      ("WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0), " +
        "tok AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '), " +
        "x -> x <> '')) AS word FROM d), " +
        "tf AS (SELECT doc_id, word, count(*) AS tf FROM tok GROUP BY doc_id, word), " +
        "df AS (SELECT word, count(*) AS df FROM tf GROUP BY word), " +
        "nd AS (SELECT count(*) AS nd FROM d), " +
        "w AS (SELECT tf.doc_id, tf.word, CAST(round(" +
        "round(tf.tf * (ln((nd.nd + 1.0) / (df.df + 1.0)) + 1.0), 4) " +
        "* 10000) AS BIGINT) AS wi " +
        "FROM tf JOIN df USING (word), nd), " +
        // integer norm² / dot — the 1e-4 scale cancels in the cosine,
        // and integer sums are order-independent on both engines.
        // Spark accumulates these as LONG (ANSI ARITHMETIC_OVERFLOW
        // past 2^63); the outer BIGINT cast here makes DuckDB's
        // HUGEINT sum fail at the same point (Conversion Error) instead
        // of silently continuing where Spark would have errored.
        "nrm AS (SELECT doc_id, CAST(sum(CAST(wi AS HUGEINT) * wi) " +
        "AS BIGINT) AS n2 FROM w GROUP BY doc_id), " +
        "dt AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, " +
        "CAST(sum(CAST(a.wi AS HUGEINT) * b.wi) AS BIGINT) AS dotl " +
        "FROM w a JOIN w b ON a.word = b.word AND a.doc_id < b.doc_id " +
        "GROUP BY a.doc_id, b.doc_id) " +
        "SELECT doc_a, doc_b, cos FROM (" +
        "SELECT doc_a, doc_b, round(CAST(dotl AS DOUBLE) / " +
        "(sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))), 5) " +
        "AS cos " +
        "FROM dt JOIN nrm na ON dt.doc_a = na.doc_id " +
        "JOIN nrm nb ON dt.doc_b = nb.doc_id) WHERE cos >= 0.8"),
    "q186_basket_lift" ->
      ("WITH ob AS (SELECT DISTINCT l_orderkey, p_brand FROM lineitem " +
        "JOIN part ON l_partkey = p_partkey), " +
        "n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM ob), " +
        "bc AS (SELECT p_brand, count(*) AS c FROM ob GROUP BY 1), " +
        "pr AS (SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, " +
        "count(*) AS n_ab FROM ob a JOIN ob b " +
        "ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand " +
        "GROUP BY 1, 2 HAVING count(*) >= 5) " +
        "SELECT brand_a, brand_b, n_ab, " +
        "round(n_ab * 1.0 / n.n_orders, 5) AS support, " +
        "round(n_ab * 1.0 / ca.c, 5) AS confidence, " +
        "round(n_ab * 1.0 * n.n_orders / (ca.c * cb.c), 5) AS lift " +
        "FROM pr CROSS JOIN n " +
        "JOIN bc ca ON pr.brand_a = ca.p_brand " +
        "JOIN bc cb ON pr.brand_b = cb.p_brand"),
    "q187_rfm_segments" ->
      ("WITH anchor AS (SELECT max(o_orderdate) AS a FROM orders), " +
        "rfm AS (SELECT o_custkey, " +
        "datediff('day', max(o_orderdate), (SELECT a FROM anchor)) AS r, " +
        "count(*) AS f, round(sum(o_totalprice), 2) AS m " +
        "FROM orders GROUP BY 1), " +
        "tiled AS (SELECT r, f, m, " +
        "ntile(4) OVER (ORDER BY r, o_custkey) AS r_q, " +
        "ntile(4) OVER (ORDER BY f DESC, o_custkey) AS f_q, " +
        "ntile(4) OVER (ORDER BY m DESC, o_custkey) AS m_q FROM rfm) " +
        "SELECT r_q, f_q, m_q, count(*) AS n_customers, " +
        "round(avg(m), 2) AS avg_monetary, " +
        "round(avg(f), 4) AS avg_frequency " +
        "FROM tiled GROUP BY 1, 2, 3"),
    "q188_quantile_normalize" ->
      ("SELECT c_nationkey, count(*) AS n, " +
        "round(avg(q), 5) AS avg_q, round(min(q), 5) AS min_q, " +
        "round(max(q), 5) AS max_q FROM (" +
        "SELECT c_nationkey, " +
        "percent_rank() OVER (ORDER BY c_acctbal) AS q FROM customer " +
        "WHERE c_acctbal IS NOT NULL) " +
        "GROUP BY 1"),
    "q189_fk_audit" ->
      ("SELECT edge, n_child, n_orphan, " +
        "round(n_orphan * 100.0 / n_child, 4) AS orphan_pct FROM (" +
        "SELECT 'lineitem.l_orderkey->orders' AS edge, " +
        "(SELECT count(*) FROM lineitem) AS n_child, " +
        "(SELECT count(*) FROM lineitem WHERE l_orderkey NOT IN " +
        "(SELECT o_orderkey FROM orders)) AS n_orphan " +
        "UNION ALL SELECT 'lineitem.l_partkey->part', " +
        "(SELECT count(*) FROM lineitem), " +
        "(SELECT count(*) FROM lineitem WHERE l_partkey NOT IN " +
        "(SELECT p_partkey FROM part)) " +
        "UNION ALL SELECT 'lineitem.l_suppkey->supplier', " +
        "(SELECT count(*) FROM lineitem), " +
        "(SELECT count(*) FROM lineitem WHERE l_suppkey NOT IN " +
        "(SELECT s_suppkey FROM supplier)) " +
        "UNION ALL SELECT 'orders.o_custkey->customer', " +
        "(SELECT count(*) FROM orders), " +
        "(SELECT count(*) FROM orders WHERE o_custkey NOT IN " +
        "(SELECT c_custkey FROM customer)) " +
        "UNION ALL SELECT 'customer.c_nationkey->nation', " +
        "(SELECT count(*) FROM customer), " +
        "(SELECT count(*) FROM customer WHERE c_nationkey NOT IN " +
        "(SELECT n_nationkey FROM nation)) " +
        "UNION ALL SELECT 'supplier.s_nationkey->nation', " +
        "(SELECT count(*) FROM supplier), " +
        "(SELECT count(*) FROM supplier WHERE s_nationkey NOT IN " +
        "(SELECT n_nationkey FROM nation)))"),
    "q191_cusum" ->
      ("WITH daily AS (SELECT user_id, ts::date AS day, " +
        "round(sum(value), 2) AS x FROM events GROUP BY 1, 2), " +
        "st AS (SELECT round(avg(x), 6) AS mu, " +
        "round(stddev_pop(x), 6) AS sigma FROM daily), " +
        "r AS (SELECT user_id, day, x, sigma, " +
        "sum(x::decimal(18,2) - mu::decimal(18,6)) OVER (" +
        "PARTITION BY user_id ORDER BY day " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r " +
        "FROM daily CROSS JOIN st), " +
        "m AS (SELECT user_id, day, x, sigma, r, " +
        "min(r) OVER (PARTITION BY user_id ORDER BY day " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mr " +
        "FROM r), " +
        "c AS (SELECT user_id, day, x, sigma, " +
        "CASE WHEN mr < 0 THEN r - mr ELSE r END AS cusum FROM m) " +
        "SELECT user_id, day, round(x, 2) AS x, " +
        "cast(round(cusum, 4) AS double) AS cusum " +
        "FROM c WHERE cusum > cast(round(4 * sigma, 6) AS decimal(18,6))"),
    "q192_kaplan_meier" ->
      ("WITH u AS (SELECT user_id, min(ts::date) AS d0, " +
        "max(ts::date) AS d1 FROM events GROUP BY 1), " +
        "hz AS (SELECT max(ts::date) AS hz FROM events), " +
        "life AS (SELECT datediff('day', d0, d1) AS t, " +
        "CASE WHEN d1 < hz.hz THEN 1 ELSE 0 END AS died " +
        "FROM u CROSS JOIN hz), " +
        "byt AS (SELECT t, count(*) AS n_ending, sum(died) AS d " +
        "FROM life GROUP BY 1), " +
        "k AS (SELECT t, d, cast(sum(n_ending) OVER () - " +
        "coalesce(sum(n_ending) OVER (ORDER BY t ROWS BETWEEN " +
        "UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bigint) AS n_risk " +
        "FROM byt) " +
        "SELECT t, n_risk, cast(d AS bigint) AS d, " +
        "round(exp(sum(ln(greatest(1 - d * 1.0 / n_risk, 1e-300))) " +
        "OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND " +
        "CURRENT ROW)), 5) AS surv FROM k"),
    "q193_gini" ->
      ("WITH spend AS (SELECT c_mktsegment, o_custkey, " +
        "round(sum(o_totalprice), 2) AS x FROM orders " +
        "JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2), " +
        "rk AS (SELECT c_mktsegment, x, row_number() OVER (" +
        "PARTITION BY c_mktsegment ORDER BY x, o_custkey) AS i " +
        "FROM spend) " +
        "SELECT c_mktsegment, count(*) AS n, " +
        "round(sum(x), 2) AS total_spend, " +
        "round(2.0 * sum(i * x) / (count(*) * sum(x)) - " +
        "(count(*) + 1.0) / count(*), 5) AS gini " +
        "FROM rk GROUP BY 1"),
    "q194_benford" ->
      ("WITH bd AS (SELECT o_orderpriority, " +
        "cast(floor(o_totalprice / power(10, floor(log10(o_totalprice)))) " +
        "AS int) AS digit, count(*) AS n FROM orders " +
        "WHERE o_totalprice > 0 GROUP BY 1, 2), " +
        "g AS (SELECT o_orderpriority, digit, n, " +
        "cast(sum(n) OVER (PARTITION BY o_orderpriority) AS bigint) " +
        "AS n_grp, log(10, 1.0 + 1.0 / digit) AS expected_p FROM bd) " +
        "SELECT o_orderpriority, max(n_grp) AS n_orders, " +
        "round(sum(power(n * 1.0 / n_grp - expected_p, 2) / expected_p) " +
        "* max(n_grp), 4) AS chi2 FROM g GROUP BY 1"),
    "q195_path_trigrams" ->
      ("SELECT e1, e2, e3, n FROM (SELECT e1, e2, e3, count(*) AS n " +
        "FROM (SELECT event_type AS e1, " +
        "lead(event_type, 1) OVER (PARTITION BY user_id " +
        "ORDER BY ts, event_id) AS e2, " +
        "lead(event_type, 2) OVER (PARTITION BY user_id " +
        "ORDER BY ts, event_id) AS e3 FROM events) " +
        "WHERE e2 IS NOT NULL AND e3 IS NOT NULL GROUP BY 1, 2, 3) " +
        "ORDER BY n DESC, e1, e2, e3 LIMIT 20"),
    "q196_ab_test" ->
      ("WITH pu AS (SELECT user_id % 2 AS variant, " +
        "round(sum(CASE WHEN event_type = 'purchase' THEN value " +
        "ELSE 0.0 END), 2) AS m FROM events GROUP BY user_id), " +
        "v AS (SELECT variant, count(*) AS n, avg(m) AS mean, " +
        "var_samp(m) / count(*) AS se2 FROM pu GROUP BY 1), " +
        "a AS (SELECT n AS n_a, mean AS mean_a, se2 AS se2_a FROM v " +
        "WHERE variant = 0), " +
        "b AS (SELECT n AS n_b, mean AS mean_b, se2 AS se2_b FROM v " +
        "WHERE variant = 1) " +
        "SELECT n_a, n_b, round(mean_a, 4) AS mean_a, " +
        "round(mean_b, 4) AS mean_b, " +
        "round((mean_b - mean_a) / sqrt(se2_a + se2_b), 4) AS z " +
        "FROM a CROSS JOIN b"),
    "q197_auc" ->
      ("WITH bs AS (SELECT value AS score, count(*) AS n, " +
        "sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p " +
        "FROM events GROUP BY 1), " +
        "r AS (SELECT n, p, coalesce(sum(n) OVER (ORDER BY score " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) " +
        "AS cum_prev FROM bs), " +
        "a AS (SELECT sum(p) AS n_pos, sum(n) - sum(p) AS n_neg, " +
        "sum(p * (2 * cum_prev + n + 1)) AS r2, " +
        "sum(n * n * n - n) AS ties FROM r) " +
        "SELECT cast(n_pos AS bigint) AS n_pos, " +
        "cast(n_neg AS bigint) AS n_neg, " +
        "round((r2 - n_pos * (n_pos + 1)) / (2.0 * n_pos * n_neg), 6) " +
        "AS auc, " +
        "round(((r2 - n_pos * (n_pos + 1)) / 2.0 - " +
        "n_pos * n_neg / 2.0) / " +
        "sqrt(n_pos * n_neg / 12.0 * ((n_pos + n_neg + 1) - " +
        "ties / ((n_pos + n_neg) * (n_pos + n_neg - 1.0)))), 4) AS z " +
        "FROM a"),
    "q198_ks_test" ->
      ("WITH bs AS (SELECT value AS score, " +
        "sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) " +
        "AS na, count(*) - sum(CASE WHEN event_type = 'purchase' " +
        "THEN 1 ELSE 0 END) AS nb FROM events GROUP BY 1), " +
        "t AS (SELECT na, nb, " +
        "sum(na) OVER (ORDER BY score ROWS BETWEEN UNBOUNDED " +
        "PRECEDING AND CURRENT ROW) AS ca, " +
        "sum(nb) OVER (ORDER BY score ROWS BETWEEN UNBOUNDED " +
        "PRECEDING AND CURRENT ROW) AS cb, " +
        "sum(na) OVER () AS tot_a, sum(nb) OVER () AS tot_b FROM bs), " +
        "a AS (SELECT max(tot_a) AS n_a, max(tot_b) AS n_b, " +
        "max(abs(ca / tot_a - cb / tot_b)) AS d_raw FROM t) " +
        "SELECT cast(n_a AS bigint) AS n_a, cast(n_b AS bigint) AS n_b, " +
        "round(d_raw, 6) AS d, " +
        "round(d_raw * sqrt(n_a * n_b / cast(n_a + n_b AS double)), 4) " +
        "AS ks_stat, " +
        "round(2.0 * exp(-2.0 * d_raw * d_raw * " +
        "(n_a * n_b / cast(n_a + n_b AS double))), 4) AS p_approx " +
        "FROM a"),
    "q199_theil_sen" ->
      ("WITH daily AS (SELECT c_mktsegment, " +
        "datediff('day', DATE '1970-01-01', o_orderdate::date) AS t, " +
        "round(sum(o_totalprice), 2) AS x FROM orders " +
        "JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2), " +
        "sl AS (SELECT a.c_mktsegment AS c_mktsegment, " +
        "(b.x - a.x) / (b.t - a.t) AS slope FROM daily a " +
        "JOIN daily b ON a.c_mktsegment = b.c_mktsegment " +
        "AND a.t < b.t), " +
        "med AS (SELECT c_mktsegment, quantile_cont(slope, 0.5) AS m, " +
        "count(*) AS n_pairs FROM sl GROUP BY 1) " +
        "SELECT c_mktsegment, count(*) AS n_days, " +
        "max(n_pairs) AS n_pairs, round(max(m), 6) AS slope, " +
        "round(quantile_cont(x - m * t, 0.5), 4) AS intercept " +
        "FROM daily JOIN med USING (c_mktsegment) GROUP BY 1"),
    "q200_pareto" ->
      ("WITH spend AS (SELECT c_mktsegment, o_custkey, " +
        "cast(round(sum(o_totalprice) * 100, 0) AS bigint) AS cents " +
        "FROM orders JOIN customer ON o_custkey = c_custkey " +
        "GROUP BY 1, 2), " +
        "r AS (SELECT c_mktsegment, cents, " +
        "coalesce(sum(cents) OVER (PARTITION BY c_mktsegment " +
        "ORDER BY cents DESC, o_custkey ROWS BETWEEN UNBOUNDED " +
        "PRECEDING AND 1 PRECEDING), 0) AS cum_prev, " +
        "sum(cents) OVER (PARTITION BY c_mktsegment) AS total " +
        "FROM spend) " +
        "SELECT c_mktsegment, count(*) AS n_customers, " +
        "cast(sum(CASE WHEN 10 * cum_prev < 8 * total THEN 1 ELSE 0 " +
        "END) AS bigint) AS k_top, " +
        "round(sum(CASE WHEN 10 * cum_prev < 8 * total THEN 1 ELSE 0 " +
        "END) * 100.0 / count(*), 4) AS pct_top FROM r GROUP BY 1"),
    "q201_mutual_info" ->
      ("WITH j AS (SELECT c_mktsegment, o_orderpriority, " +
        "count(*) AS nij FROM orders " +
        "JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2), " +
        "e AS (SELECT nij, sum(nij) OVER () AS n, " +
        "sum(nij) OVER (PARTITION BY c_mktsegment) AS ni, " +
        "sum(nij) OVER (PARTITION BY o_orderpriority) AS nj FROM j), " +
        "a AS (SELECT max(n) AS n, " +
        "-sum(nij / n * ln(ni / n)) AS hx, " +
        "-sum(nij / n * ln(nj / n)) AS hy, " +
        "-sum(nij / n * ln(nij / n)) AS hxy FROM e) " +
        "SELECT cast(n AS bigint) AS n, round(hx, 6) AS h_segment, " +
        "round(hy, 6) AS h_priority, round(hxy, 6) AS h_joint, " +
        "round(hx + hy - hxy, 6) AS mi FROM a"),
    "q202_seat_alloc" ->
      ("WITH c AS (SELECT c_mktsegment, " +
        "cast(round(sum(o_totalprice) * 100, 0) AS bigint) AS cents " +
        "FROM orders JOIN customer ON o_custkey = c_custkey " +
        "GROUP BY 1), " +
        "t AS (SELECT c_mktsegment, cents, " +
        "sum(cents) OVER () AS total, " +
        "(10000 * cents) // sum(cents) OVER () AS base, " +
        "(10000 * cents) % sum(cents) OVER () AS rem FROM c), " +
        "r AS (SELECT c_mktsegment, cents, total, base, rem, " +
        "10000 - sum(base) OVER () AS residual, " +
        "row_number() OVER (ORDER BY rem DESC, c_mktsegment) AS rk " +
        "FROM t) " +
        "SELECT c_mktsegment, cents, " +
        "round(cents * 100.0 / total, 4) AS share_pct, " +
        "cast(base + CASE WHEN rk <= residual THEN 1 ELSE 0 END " +
        "AS bigint) AS seats FROM r"),
    "q190_attribution" ->
      ("SELECT channel, count(*) AS n_purchases, " +
        "round(sum(value), 2) AS revenue, " +
        "count(DISTINCT user_id) AS n_users FROM (" +
        "SELECT coalesce(last_value(CASE WHEN event_type <> 'purchase' " +
        "THEN event_type END IGNORE NULLS) OVER (" +
        "PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 'direct') " +
        "AS channel, event_type, user_id, value FROM events) " +
        "WHERE event_type = 'purchase' GROUP BY 1"),
    "q203_rank_correlation" ->
      ("WITH li AS (SELECT l_returnflag AS g, " +
        "cast(round(l_extendedprice * 100, 0) AS bigint) AS x, " +
        "cast(l_quantity AS bigint) AS y FROM lineitem), " +
        "rk AS (SELECT g, " +
        "2 * rank() OVER (PARTITION BY g ORDER BY x) + " +
        "count(*) OVER (PARTITION BY g, x) - 1 AS ra, " +
        "2 * rank() OVER (PARTITION BY g ORDER BY y) + " +
        "count(*) OVER (PARTITION BY g, y) - 1 AS rb, " +
        "count(*) OVER (PARTITION BY g) AS n FROM li), " +
        "dev AS (SELECT g, cast(ra - n - 1 AS decimal(19,0)) AS dx, " +
        "cast(rb - n - 1 AS decimal(19,0)) AS dy FROM rk), " +
        "sp AS (SELECT 'spearman' AS stat, g AS grp, " +
        "round(cast(sum(dx * dy) AS double) / " +
        "(sqrt(cast(sum(dx * dx) AS double)) * " +
        "sqrt(cast(sum(dy * dy) AS double))), 6) AS value " +
        "FROM dev GROUP BY g), " +
        "pts AS (SELECT n_name, count(*) AS x, " +
        "cast(round(sum(c_acctbal) * 100, 0) AS bigint) AS y " +
        "FROM customer JOIN nation ON c_nationkey = n_nationkey " +
        "GROUP BY n_name), " +
        "pr AS (SELECT a.x AS xa, a.y AS ya, b.x AS xb, b.y AS yb " +
        "FROM pts a JOIN pts b ON a.n_name < b.n_name), " +
        "kd AS (SELECT 'kendall_tau_b' AS stat, 'nation' AS grp, " +
        "round((count(*) FILTER (WHERE (xa < xb AND ya < yb) OR " +
        "(xa > xb AND ya > yb)) - count(*) FILTER (WHERE (xa < xb AND " +
        "ya > yb) OR (xa > xb AND ya < yb))) / " +
        "sqrt((count(*) - count(*) FILTER (WHERE xa = xb)) * " +
        "(count(*) - count(*) FILTER (WHERE ya = yb))), 6) AS value " +
        "FROM pr) " +
        "SELECT * FROM sp UNION ALL SELECT * FROM kd"),
    "q204_chunk_dedup" ->
      ("WITH toks AS (SELECT doc_id, source, " +
        "list_filter(string_split(text, ' '), tk -> tk <> '') AS t " +
        "FROM documents), " +
        "ch AS (SELECT doc_id, source, i AS chunk_idx, " +
        "array_to_string(t[i * 20 + 1 : i * 20 + 20], ' ') AS chunk " +
        "FROM toks, unnest(range(0, " +
        "cast(ceil(len(t) / 20.0) AS bigint))) AS u(i) " +
        "WHERE len(t) > 0), " +
        "k AS (SELECT source, doc_id, chunk_idx, row_number() OVER (" +
        "PARTITION BY chunk ORDER BY doc_id, chunk_idx) AS rn FROM ch) " +
        "SELECT source, count(DISTINCT doc_id) AS n_docs, " +
        "count(*) AS n_chunks, " +
        "count(*) FILTER (WHERE rn = 1) AS n_kept, " +
        "round((count(*) FILTER (WHERE rn = 1)) / " +
        "cast(count(*) AS double), 5) AS pct_kept " +
        "FROM k GROUP BY source"),
    "q205_fifo_costing" ->
      ("WITH li AS (SELECT l_partkey, l_orderkey, l_linenumber, " +
        "l_shipdate, cast(l_quantity AS bigint) AS qty, " +
        "cast(round(l_extendedprice * 100, 0) AS bigint) AS pc " +
        "FROM lineitem), " +
        "r AS (SELECT l_partkey, qty AS rq, pc, hi - qty AS rlo, " +
        "hi AS rhi FROM (SELECT l_partkey, qty, pc, " +
        "sum(qty) OVER (PARTITION BY l_partkey " +
        "ORDER BY l_shipdate, l_orderkey, l_linenumber " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hi " +
        "FROM li WHERE l_orderkey % 2 = 0)), " +
        "i AS (SELECT l_partkey, hi - qty AS ilo, hi AS ihi " +
        "FROM (SELECT l_partkey, qty, " +
        "sum(qty) OVER (PARTITION BY l_partkey " +
        "ORDER BY l_shipdate, l_orderkey, l_linenumber " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hi " +
        "FROM li WHERE l_orderkey % 2 = 1)) " +
        "SELECT l_partkey, CAST(sum(m) AS BIGINT) AS matched_qty, " +
        "round(sum(m * pc * 1000 // rq) / 100000.0, 2) AS cogs FROM (" +
        "SELECT r.l_partkey, least(rhi, ihi) - greatest(rlo, ilo) AS m, " +
        "rq, pc FROM r JOIN i ON r.l_partkey = i.l_partkey " +
        "AND rlo < ihi AND ilo < rhi) GROUP BY l_partkey"),
    "q206_nfc_normalize" ->
      ("WITH b AS (SELECT p_partkey, " +
        "lower(p_name) || ' e' || chr(769) || 'a' || chr(776) || " +
        "'A' || chr(778) AS dc, " +
        "lower(p_name) || ' ' || chr(233) || chr(228) || chr(197) " +
        "AS comp FROM part) " +
        "SELECT p_partkey, nfc_normalize(dc) AS nfc_str, " +
        "length(dc) AS len_raw, " +
        "length(nfc_normalize(dc)) AS len_nfc, " +
        "nfc_normalize(dc) = comp AS composed_ok, " +
        "nfc_normalize(comp) = comp AS idempotent_ok FROM b"),
    "q207_three_core" -> {
      // MATERIALIZED: each round references the previous one three
      // times; inlined CTEs would expand the plan 3^15-fold.
      val rounds = (1 to 15).map { r =>
        s"n$r AS MATERIALIZED (SELECT src FROM e${r - 1} GROUP BY src " +
          "HAVING count(*) >= 3), " +
          s"e$r AS MATERIALIZED (SELECT e.src, e.dst FROM e${r - 1} e " +
          s"JOIN n$r a ON e.src = a.src JOIN n$r b ON e.dst = b.src)"
      }.mkString(", ")
      "WITH uk AS MATERIALIZED (SELECT DISTINCT 'u' || user_id AS a, " +
        "'k' || CAST(json_extract_string(props, '$.k') AS INT) AS b " +
        "FROM events WHERE json_extract_string(props, '$.k') " +
        "IS NOT NULL), " +
        "e0 AS (SELECT a AS src, b AS dst FROM uk " +
        "UNION ALL SELECT b, a FROM uk), " + rounds +
        " SELECT src AS node, count(*) AS core_deg FROM e15 GROUP BY src"
    },
    "q208_psi_drift" ->
      ("WITH o AS (SELECT c_mktsegment AS seg, " +
        "year(o_orderdate) <= 1997 AS is_base, " +
        "least(cast(floor(round(o_totalprice * 100, 0) / 5000000) " +
        "AS bigint), 9) AS bin " +
        "FROM orders JOIN customer ON o_custkey = c_custkey), " +
        "cnt AS (SELECT seg, bin, " +
        "count(*) FILTER (WHERE is_base) AS cb, " +
        "count(*) FILTER (WHERE NOT is_base) AS cc " +
        "FROM o GROUP BY seg, bin), " +
        "uni AS (SELECT seg, i AS bin FROM " +
        "(SELECT DISTINCT seg FROM o), unnest(range(0, 10)) AS u(i)), " +
        "f AS (SELECT uni.seg, uni.bin, coalesce(cb, 0) AS cb, " +
        "coalesce(cc, 0) AS cc FROM uni LEFT JOIN cnt " +
        "ON uni.seg = cnt.seg AND uni.bin = cnt.bin), " +
        "tot AS (SELECT seg, sum(cb) AS n_base, sum(cc) AS n_curr " +
        "FROM f GROUP BY seg) " +
        "SELECT f.seg, CAST(n_base AS BIGINT) AS n_base, " +
        "CAST(n_curr AS BIGINT) AS n_curr, " +
        "round(sum(((cb + 1) / (n_base + 10) - " +
        "(cc + 1) / (n_curr + 10)) * " +
        "ln(((cb + 1) / (n_base + 10)) / " +
        "((cc + 1) / (n_curr + 10)))), 6) AS psi " +
        "FROM f JOIN tot ON f.seg = tot.seg " +
        "GROUP BY f.seg, n_base, n_curr"),
    "q209_price_volume_mix" ->
      ("WITH pp AS (SELECT l_partkey, " +
        "sum(CASE WHEN year(l_shipdate) = 1997 THEN l_quantity " +
        "ELSE 0 END) AS q1, " +
        "sum(CASE WHEN year(l_shipdate) = 1998 THEN l_quantity " +
        "ELSE 0 END) AS q2, " +
        "sum(CASE WHEN year(l_shipdate) = 1997 THEN " +
        "CAST(round(l_extendedprice * 100, 0) AS BIGINT) ELSE 0 END) " +
        "AS r1, " +
        "sum(CASE WHEN year(l_shipdate) = 1998 THEN " +
        "CAST(round(l_extendedprice * 100, 0) AS BIGINT) ELSE 0 END) " +
        "AS r2 FROM lineitem WHERE year(l_shipdate) IN (1997, 1998) " +
        "GROUP BY l_partkey), " +
        "j AS (SELECT p_brand, q1, q2, r1, r2, " +
        "(r1 / 100.0) / q1 AS p1, (r2 / 100.0) / q2 AS p2, " +
        "q1 > 0 AND q2 > 0 AS b FROM pp " +
        "JOIN part ON l_partkey = p_partkey), " +
        "g AS (SELECT p_brand, " +
        "sum(r1) / 100.0 AS rev1, sum(r2) / 100.0 AS rev2, " +
        "sum(CASE WHEN q1 = 0 THEN r2 ELSE 0 END) / 100.0 AS new_eff, " +
        "-sum(CASE WHEN q2 = 0 THEN r1 ELSE 0 END) / 100.0 AS lost_eff, " +
        "sum(CASE WHEN b THEN CAST(q2 * (p2 - p1) AS DECIMAL(30,12)) " +
        "ELSE CAST(0 AS DECIMAL(30,12)) END) AS price_dec, " +
        "CAST(sum(CASE WHEN b THEN " +
        "CAST((q2 - q1) * p1 AS DECIMAL(30,12)) " +
        "ELSE CAST(0 AS DECIMAL(30,12)) END) AS DOUBLE) AS volmix, " +
        "sum(CASE WHEN b THEN q1 ELSE 0 END) AS q1b, " +
        "sum(CASE WHEN b THEN q2 ELSE 0 END) AS q2b, " +
        "sum(CASE WHEN b THEN r1 ELSE 0 END) AS r1b FROM j " +
        "GROUP BY p_brand) " +
        "SELECT p_brand, rev1, rev2, new_eff, lost_eff, " +
        "CAST(round(price_dec, 4) AS DOUBLE) AS price_eff, " +
        "round(CASE WHEN q1b > 0 THEN (q2b - q1b) * " +
        "((r1b / 100.0) / q1b) ELSE 0.0 END, 4) AS volume_eff, " +
        "round(volmix - CASE WHEN q1b > 0 THEN (q2b - q1b) * " +
        "((r1b / 100.0) / q1b) ELSE 0.0 END, 4) AS mix_eff FROM g"),
    "q210_adamic_adar" ->
      ("WITH uk AS (SELECT DISTINCT user_id AS u, " +
        "CAST(json_extract_string(props, '$.k') AS INT) AS k " +
        "FROM events WHERE json_extract_string(props, '$.k') " +
        "IS NOT NULL), " +
        "deg AS (SELECT k, round(1.0 / ln(count(*)), 9) AS term FROM uk " +
        "GROUP BY k HAVING count(*) >= 2), " +
        "qs AS (SELECT DISTINCT u FROM uk ORDER BY u LIMIT 25), " +
        "qi AS (SELECT uk.u AS q, uk.k, term FROM uk " +
        "JOIN qs ON uk.u = qs.u JOIN deg ON uk.k = deg.k), " +
        "pairs AS (SELECT q, c.u AS cand, " +
        "sum(CAST(term AS DECIMAL(30,12))) AS aa_exact, " +
        "count(*) AS common FROM qi JOIN uk c ON qi.k = c.k " +
        "AND qi.q <> c.u GROUP BY q, c.u) " +
        "SELECT q, cand, rk, common, " +
        "CAST(round(aa_exact, 6) AS DOUBLE) AS aa FROM " +
        "(SELECT *, row_number() OVER (PARTITION BY q " +
        "ORDER BY aa_exact DESC, cand) AS rk FROM pairs) " +
        "WHERE rk <= 5"),
    "q211_assortativity" ->
      ("WITH uk AS (SELECT DISTINCT 'u' || user_id AS a, " +
        "'k' || CAST(json_extract_string(props, '$.k') AS INT) AS b " +
        "FROM events WHERE json_extract_string(props, '$.k') " +
        "IS NOT NULL), " +
        "e AS (SELECT a AS src, b AS dst FROM uk " +
        "UNION ALL SELECT b, a FROM uk), " +
        "deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src), " +
        "m AS (SELECT count(*) AS n, sum(x.deg) AS sx, " +
        "sum(y.deg) AS sy, sum(x.deg * x.deg) AS sxx, " +
        "sum(y.deg * y.deg) AS syy, sum(x.deg * y.deg) AS sxy " +
        "FROM e JOIN deg x ON e.src = x.src " +
        "JOIN deg y ON e.dst = y.src) " +
        "SELECT n AS n_edges, " +
        "round((n * sxy - sx * sy) / " +
        "(sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) * " +
        "sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS assortativity, " +
        "round(sx / CAST(n AS DOUBLE), 4) AS avg_deg FROM m"),
    "q212_pca_power" -> {
      // MATERIALIZED rounds: each round reads the previous twice
      // (mat-vec + norm); inlined CTEs would recompute exponentially
      val rounds = (1 to 6).map { r =>
        s"w$r AS MATERIALIZED (SELECT cov.i, " +
          "CAST(sum(CAST(c * v AS DECIMAL(30,12))) AS DOUBLE) AS w " +
          s"FROM cov JOIN v${r - 1} ON cov.j = v${r - 1}.j " +
          "GROUP BY cov.i), " +
          s"n$r AS MATERIALIZED (SELECT " +
          "sqrt(CAST(sum(CAST(w * w AS DECIMAL(30,12))) AS DOUBLE)) " +
          s"AS nrm FROM w$r), " +
          s"v$r AS MATERIALIZED (SELECT i AS j, round(w / nrm, 9) AS v " +
          s"FROM w$r, n$r)"
      }.mkString(", ")
      "WITH ve AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb " +
        "FROM embeddings), " +
        "px AS (SELECT vec_id, unnest(range(0, len(emb))) AS i, " +
        "unnest(emb) AS x FROM ve), " +
        "lin AS (SELECT i, sum(t // 1000000000) AS shi, " +
        "sum(t % 1000000000) AS slo, count(*) AS n FROM " +
        "(SELECT i, CAST(floor(x * 1e9) AS BIGINT) AS t FROM px) " +
        "GROUP BY i), " +
        "m AS (SELECT i, CAST(CAST(shi AS DECIMAL(38,0)) * 1000000000 " +
        "+ slo AS DOUBLE) / 1e9 / n AS m FROM lin), " +
        "sxy AS (SELECT i, j, sum(t // 1000000000) AS shi, " +
        "sum(t % 1000000000) AS slo, count(*) AS n FROM " +
        "(SELECT a.i AS i, b.i AS j, " +
        "CAST(floor(a.x * b.x * 1e9) AS BIGINT) AS t " +
        "FROM px a JOIN px b ON a.vec_id = b.vec_id) GROUP BY i, j), " +
        "cov AS MATERIALIZED (SELECT sxy.i, sxy.j, " +
        "round(CAST(CAST(sxy.shi AS DECIMAL(38,0)) * 1000000000 " +
        "+ sxy.slo AS DOUBLE) / 1e9 / sxy.n - mi.m * mj.m, 9) AS c " +
        "FROM sxy JOIN m mi ON sxy.i = mi.i JOIN m mj ON sxy.j = mj.i), " +
        "v0 AS (SELECT i AS j, CAST(0.125 AS DOUBLE) AS v FROM m), " +
        rounds +
        " SELECT v6.j AS pos, v6.v AS loading, " +
        "round(n6.nrm, 6) AS eigenvalue FROM v6, n6"
    },
    "q213_bh_fdr" ->
      ("WITH o AS (SELECT n_name, o_totalprice AS v, " +
        "count(*) FILTER (WHERE year(o_orderdate) = 1997) AS na, " +
        "count(*) FILTER (WHERE year(o_orderdate) = 1998) AS nb " +
        "FROM orders JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation ON c_nationkey = n_nationkey " +
        "WHERE year(o_orderdate) IN (1997, 1998) " +
        "GROUP BY n_name, o_totalprice), " +
        "c AS (SELECT n_name, " +
        "sum(na) OVER w AS ca, sum(nb) OVER w AS cb, " +
        "sum(na) OVER (PARTITION BY n_name) AS ta, " +
        "sum(nb) OVER (PARTITION BY n_name) AS tb FROM o " +
        "WINDOW w AS (PARTITION BY n_name ORDER BY v " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), " +
        "pn AS (SELECT n_name, max(ta) AS n_a, max(tb) AS n_b, " +
        "max(abs(ca / ta - cb / tb)) AS dr FROM c GROUP BY n_name), " +
        "p AS (SELECT n_name, n_a, n_b, dr, least(1.0, 2.0 * " +
        "exp(-2.0 * dr * dr * (n_a * n_b / " +
        "CAST(n_a + n_b AS DOUBLE)))) AS p FROM pn), " +
        "r AS (SELECT *, count(*) OVER () AS m, " +
        "row_number() OVER (ORDER BY p, n_name) AS rk FROM p), " +
        "a AS (SELECT *, least(1.0, min(p * m / rk) OVER " +
        "(ORDER BY rk DESC ROWS BETWEEN UNBOUNDED PRECEDING AND " +
        "CURRENT ROW)) AS padj FROM r) " +
        "SELECT n_name, CAST(n_a AS BIGINT) AS n_a, " +
        "CAST(n_b AS BIGINT) AS n_b, round(dr, 6) AS d, rk, " +
        "round(p, 8) AS p_raw, round(padj, 8) AS p_adj, " +
        "padj <= 0.1 AS significant FROM a"),
    "q214_isotonic_calibration" ->
      ("WITH e AS (SELECT CAST(user_id % 3 AS INT) AS model, " +
        "CAST(least(floor(CAST(round(value * 100, 0) AS BIGINT) " +
        "/ 2500), 19) AS INT) AS bin, " +
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y " +
        "FROM events), " +
        "c AS (SELECT model, bin, count(*) AS n, sum(y) AS pos " +
        "FROM e GROUP BY model, bin), " +
        "idx AS (SELECT *, row_number() OVER (PARTITION BY model " +
        "ORDER BY bin) AS i FROM c), " +
        "pre AS (SELECT *, sum(n) OVER (PARTITION BY model " +
        "ORDER BY i) AS cn, sum(pos) OVER (PARTITION BY model " +
        "ORDER BY i) AS cp FROM idx), " +
        "trip AS (SELECT i.model, i.i AS i, j.i AS j, " +
        "min((k.cp - (j.cp - j.pos)) / " +
        "CAST(k.cn - (j.cn - j.n) AS DOUBLE)) AS mr " +
        "FROM pre i JOIN pre j ON j.model = i.model AND j.i <= i.i " +
        "JOIN pre k ON k.model = i.model AND k.i >= i.i " +
        "GROUP BY i.model, i.i, j.i), " +
        "fit AS (SELECT model, i, max(mr) AS iso FROM trip " +
        "GROUP BY model, i) " +
        "SELECT c.model, c.bin, c.n, CAST(c.pos AS BIGINT) AS pos, " +
        "round(c.pos / CAST(c.n AS DOUBLE), 6) AS rate_raw, " +
        "round(fit.iso, 6) AS rate_iso FROM idx c JOIN fit " +
        "ON c.model = fit.model AND c.i = fit.i"),
    "q215_zipf_fit" ->
      ("WITH tk AS (SELECT unnest(list_filter(string_split(text, ' '), " +
        "x -> x <> '')) AS tok FROM documents), " +
        "cnt AS (SELECT tok, count(*) AS freq FROM tk GROUP BY tok), " +
        "top AS (SELECT round(ln(rk), 9) AS x, round(ln(freq), 9) AS y " +
        "FROM (SELECT freq, row_number() OVER " +
        "(ORDER BY freq DESC, tok) AS rk FROM cnt) WHERE rk <= 100), " +
        "mo AS (SELECT count(*) AS n, " +
        "CAST(sum(CAST(x AS DECIMAL(30,12))) AS DOUBLE) AS sx, " +
        "CAST(sum(CAST(y AS DECIMAL(30,12))) AS DOUBLE) AS sy, " +
        "CAST(sum(CAST(round(x * x, 9) AS DECIMAL(30,12))) AS DOUBLE) " +
        "AS sxx, " +
        "CAST(sum(CAST(round(y * y, 9) AS DECIMAL(30,12))) AS DOUBLE) " +
        "AS syy, " +
        "CAST(sum(CAST(round(x * y, 9) AS DECIMAL(30,12))) AS DOUBLE) " +
        "AS sxy FROM top), " +
        "tot AS (SELECT sum(freq) AS total_tokens, count(*) AS vocab " +
        "FROM cnt) " +
        "SELECT CAST(total_tokens AS BIGINT) AS total_tokens, vocab, n, " +
        "round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope, " +
        "round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) " +
        "/ n, 6) AS intercept, " +
        "round((n * sxy - sx * sy) * (n * sxy - sx * sy) / " +
        "((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2 " +
        "FROM mo, tot"),
    "q216_sq8_ann" ->
      ("WITH ve AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb " +
        "FROM embeddings), " +
        "px AS (SELECT vec_id, unnest(range(0, len(emb))) AS i, " +
        "unnest(emb) AS x FROM ve), " +
        "mm AS (SELECT i, min(x) AS mn, max(x) AS mx FROM px GROUP BY i), " +
        "mml AS (SELECT list(mn ORDER BY i) AS mns, " +
        "list(mx ORDER BY i) AS mxs FROM mm), " +
        "dq AS (SELECT vec_id, list_transform(range(1, len(emb) + 1), " +
        "i -> CASE WHEN mxs[i] > mns[i] THEN mns[i] + " +
        "(least(floor((emb[i] - mns[i]) / (mxs[i] - mns[i]) * 256), " +
        "255) + 0.5) * (mxs[i] - mns[i]) / 256 " +
        "ELSE mns[i] END) AS deq FROM ve, mml) " +
        "SELECT query_id, neighbor_id, sim, rk FROM (" +
        "SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, " +
        "round(list_sum(list_transform(range(1, len(q.emb) + 1), " +
        "i -> q.emb[i] * c.deq[i])), 6) AS sim, " +
        "CAST(row_number() OVER (PARTITION BY q.vec_id ORDER BY " +
        "round(list_sum(list_transform(range(1, len(q.emb) + 1), " +
        "i -> q.emb[i] * c.deq[i])), 6) DESC, c.vec_id) AS INT) AS rk " +
        "FROM ve q JOIN dq c ON q.vec_id <> c.vec_id " +
        "WHERE q.vec_id % (SELECT greatest(100, (count(*) + 127) // 128) FROM embeddings) = 0) WHERE rk <= 5"),
    "q217_wilson_ranking" ->
      ("WITH b AS (SELECT p_brand, count(*) AS n, " +
        "count(*) FILTER (WHERE l_returnflag = 'R') AS pos " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey " +
        "GROUP BY p_brand) " +
        "SELECT p_brand, n, pos, round(pos / n, 6) AS rate, " +
        "round((pos / n + 3.8416 / (2 * n) - 1.96 * " +
        "sqrt((pos / n * (1.0 - pos / n) + 3.8416 / (4 * n)) / n)) / " +
        "(1.0 + 3.8416 / n), 6) AS wilson_lower, " +
        "CAST(row_number() OVER (ORDER BY " +
        "round((pos / n + 3.8416 / (2 * n) - 1.96 * " +
        "sqrt((pos / n * (1.0 - pos / n) + 3.8416 / (4 * n)) / n)) / " +
        "(1.0 + 3.8416 / n), 6) DESC, p_brand) AS INT) AS rk FROM b"),
    "q218_join_ivm" ->
      ("WITH li AS (SELECT l_orderkey, " +
        "CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents, " +
        "l_orderkey % 10 = 0 AS dl FROM lineitem), " +
        "o AS (SELECT o_orderkey, o_orderpriority, " +
        "o_custkey % 7 = 0 AS dr FROM orders), " +
        "f AS (SELECT o_orderpriority, count(*) AS n_full, " +
        "sum(cents) AS rev_full FROM li JOIN o " +
        "ON l_orderkey = o_orderkey GROUP BY 1), " +
        "pc AS (SELECT o_orderpriority, count(*) AS n, sum(cents) AS rev " +
        "FROM li JOIN o ON l_orderkey = o_orderkey " +
        "WHERE NOT dl AND NOT dr GROUP BY 1 " +
        "UNION ALL SELECT o_orderpriority, count(*), sum(cents) " +
        "FROM li JOIN o ON l_orderkey = o_orderkey " +
        "WHERE dl AND NOT dr GROUP BY 1 " +
        "UNION ALL SELECT o_orderpriority, count(*), sum(cents) " +
        "FROM li JOIN o ON l_orderkey = o_orderkey " +
        "WHERE NOT dl AND dr GROUP BY 1 " +
        "UNION ALL SELECT o_orderpriority, count(*), sum(cents) " +
        "FROM li JOIN o ON l_orderkey = o_orderkey " +
        "WHERE dl AND dr GROUP BY 1), " +
        "i AS (SELECT o_orderpriority, sum(n) AS n_incr, " +
        "sum(rev) AS rev_incr FROM pc GROUP BY 1) " +
        "SELECT coalesce(f.o_orderpriority, i.o_orderpriority) " +
        "AS o_orderpriority, n_full, " +
        "CAST(rev_full AS BIGINT) AS rev_full, " +
        "CAST(n_incr AS BIGINT) AS n_incr, " +
        "CAST(rev_incr AS BIGINT) AS rev_incr, " +
        "n_full = n_incr AND rev_full = rev_incr AS consistent " +
        "FROM f FULL JOIN i ON f.o_orderpriority = i.o_orderpriority"),
    "q219_feature_hashing" ->
      ("WITH tk AS (SELECT doc_id, " +
        "unnest(list_filter(string_split(lower(text), ' '), " +
        "x -> x <> '')) AS tok FROM documents WHERE doc_id % 25 = 0), " +
        "h AS (SELECT doc_id, " +
        "('0x' || substring(md5(tok), 1, 6))::BIGINT % 64 AS bucket, " +
        "CASE WHEN ('0x' || substring(md5(tok), 7, 1))::BIGINT % 2 = 0 " +
        "THEN 1 ELSE -1 END AS sgn FROM tk) " +
        "SELECT doc_id, bucket, CAST(sum(sgn) AS BIGINT) AS w FROM h " +
        "GROUP BY doc_id, bucket"),
    "q220_target_encoding" ->
      ("WITH b AS (SELECT c_mktsegment AS seg, o_orderkey % 5 AS fold, " +
        "CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y " +
        "FROM orders JOIN customer ON o_custkey = c_custkey), " +
        "cf AS (SELECT seg, fold, count(*) AS n, sum(y) AS pos " +
        "FROM b GROUP BY seg, fold) " +
        "SELECT seg, fold, " +
        "CAST(sum(n) OVER (PARTITION BY seg) - n AS BIGINT) AS n_of, " +
        "CAST(sum(pos) OVER (PARTITION BY seg) - pos AS BIGINT) " +
        "AS pos_of, " +
        "round(((sum(pos) OVER (PARTITION BY seg) - pos) + 10.0 * " +
        "((sum(pos) OVER () - sum(pos) OVER (PARTITION BY fold)) / " +
        "(sum(n) OVER () - sum(n) OVER (PARTITION BY fold)))) / " +
        "((sum(n) OVER (PARTITION BY seg) - n) + 10), 6) AS enc FROM cf"),
    "q221_woe_iv" ->
      ("WITH c AS (SELECT CAST(floor(p_size / 10) AS INT) AS bin, " +
        "sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS pos, " +
        "count(*) - sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) " +
        "AS neg FROM lineitem JOIN part ON l_partkey = p_partkey " +
        "GROUP BY 1), " +
        "t AS (SELECT bin, pos, neg, " +
        "(pos + 0.5) / (sum(pos) OVER ()) AS dp, " +
        "(neg + 0.5) / (sum(neg) OVER ()) AS dn FROM c) " +
        "SELECT bin, CAST(pos AS BIGINT) AS pos, " +
        "CAST(neg AS BIGINT) AS neg, round(ln(dp / dn), 6) AS woe, " +
        "round(sum((dp - dn) * ln(dp / dn)) OVER (), 6) AS iv FROM t"),
    "q222_corr_matrix" -> {
      val feats = Seq("qty", "price", "disc", "tax")
      val arms = feats.combinations(2).map { case Seq(a, b) =>
        s"SELECT '$a' AS feat_a, '$b' AS feat_b, n, " +
          s"(n * sp_${a}_$b - s_$a * s_$b) / " +
          s"sqrt((n * ss_$a - s_$a * s_$a) * " +
          s"(n * ss_$b - s_$b * s_$b)) AS corr FROM m"
      }.mkString(" UNION ALL ")
      "WITH b AS (SELECT CAST(l_quantity AS BIGINT) AS qty, " +
        "CAST(round(l_extendedprice, 0) AS BIGINT) AS price, " +
        "CAST(round(l_discount * 100, 0) AS BIGINT) AS disc, " +
        "CAST(round(l_tax * 100, 0) AS BIGINT) AS tax FROM lineitem), " +
        "m AS (SELECT CAST(count(*) AS DOUBLE) AS n, " +
        feats.map(f => s"CAST(sum($f) AS DOUBLE) AS s_$f, " +
          s"CAST(sum($f * $f) AS DOUBLE) AS ss_$f").mkString(", ") + ", " +
        feats.combinations(2).map { case Seq(a, b) =>
          s"CAST(sum($a * $b) AS DOUBLE) AS sp_${a}_$b"
        }.mkString(", ") + " FROM b) " +
        "SELECT feat_a, feat_b, CAST(n AS BIGINT) AS n, " +
        s"round(corr, 6) AS corr FROM ($arms)"
    },
    "q223_mann_whitney" ->
      ("WITH c AS (SELECT CAST(l_quantity AS BIGINT) AS v, " +
        "sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS na, " +
        "count(*) - sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) " +
        "AS nb FROM lineitem WHERE l_returnflag IN ('R', 'N') " +
        "GROUP BY 1), " +
        "w AS (SELECT v, na, nb, coalesce(sum(na + nb) OVER " +
        "(ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), " +
        "0) AS below FROM c), " +
        "st AS (SELECT sum(na) AS n1, sum(nb) AS n2, " +
        "sum(na * (2 * below + na + nb + 1)) AS r1x2, " +
        "sum((na + nb) * (na + nb) * (na + nb) - (na + nb)) AS tie " +
        "FROM w) " +
        "SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2, " +
        "CAST(r1x2 - n1 * (n1 + 1) AS DOUBLE) / 2 AS u1, " +
        "round((CAST(r1x2 - n1 * (n1 + 1) AS DOUBLE) / 2 - " +
        "CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2) / " +
        "sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12 * " +
        "((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) + 1) - " +
        "CAST(tie AS DOUBLE) / " +
        "((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) * " +
        "(CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 1)))), 6) AS z " +
        "FROM st"),
    "q224_changepoint" ->
      ("WITH daily AS (SELECT c_mktsegment AS seg, o_orderdate AS day, " +
        "sum(CAST(round(o_totalprice, 0) AS BIGINT)) AS rev " +
        "FROM orders JOIN customer ON o_custkey = c_custkey " +
        "WHERE year(o_orderdate) = 1997 GROUP BY 1, 2), " +
        "pre AS (SELECT seg, day, rev, " +
        "row_number() OVER (PARTITION BY seg ORDER BY day) AS k, " +
        "sum(rev) OVER (PARTITION BY seg ORDER BY day " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s, " +
        "sum(rev * rev) OVER (PARTITION BY seg ORDER BY day " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ss, " +
        "count(*) OVER (PARTITION BY seg) AS dn, " +
        "sum(rev) OVER (PARTITION BY seg) AS st, " +
        "sum(rev * rev) OVER (PARTITION BY seg) AS sst FROM daily), " +
        "costed AS (SELECT *, " +
        "(CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / " +
        "CAST(k AS DOUBLE)) + (CAST(sst - ss AS DOUBLE) - " +
        "CAST(st - s AS DOUBLE) * CAST(st - s AS DOUBLE) / " +
        "CAST(dn - k AS DOUBLE)) AS cost FROM pre WHERE k < dn), " +
        "best AS (SELECT *, row_number() OVER (PARTITION BY seg " +
        "ORDER BY cost, k) AS rn FROM costed) " +
        "SELECT seg, day AS split_day, k, " +
        "round(1.0 - cost / (CAST(sst AS DOUBLE) - CAST(st AS DOUBLE) * " +
        "CAST(st AS DOUBLE) / CAST(dn AS DOUBLE)), 6) AS var_red, " +
        "round(CAST(st - s AS DOUBLE) / CAST(dn - k AS DOUBLE) - " +
        "CAST(s AS DOUBLE) / CAST(k AS DOUBLE), 4) AS delta_mean " +
        "FROM best WHERE rn = 1"),
    "q225_rerank_ann" ->
      ("SELECT query_id, neighbor_id, sim, rk FROM (" +
        "SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id, " +
        "round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), " +
        "CAST(v.embedding AS DOUBLE[])), 6) AS sim, " +
        "CAST(row_number() OVER (PARTITION BY q.vec_id ORDER BY " +
        "round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), " +
        "CAST(v.embedding AS DOUBLE[])), 6) DESC, v.vec_id) AS INT) " +
        "AS rk FROM embeddings q JOIN embeddings v " +
        "ON q.vec_id <> v.vec_id WHERE q.vec_id % (SELECT greatest(100, (count(*) + 127) // 128) FROM embeddings) = 0) " +
        "WHERE rk <= 5"),
    "q226_hits" -> {
      def half(src: String, dst: String, prev: String, cur: String,
          outCol: String, prevCol: String): String =
        s"$cur AS (SELECT e.$dst AS node, sum($prev.$prevCol) " +
          s"AS $outCol FROM e JOIN $prev ON e.$src = $prev.node " +
          s"GROUP BY e.$dst)"
      "WITH uk AS (SELECT DISTINCT 'u' || user_id AS a, " +
        "'k' || CAST(json_extract_string(props, '$.k') AS INT) AS b " +
        "FROM events WHERE json_extract_string(props, '$.k') " +
        "IS NOT NULL), " +
        "e AS (SELECT a AS src, b AS dst FROM uk " +
        "UNION ALL SELECT b, a FROM uk), " +
        "h0 AS (SELECT DISTINCT src AS node, CAST(1 AS BIGINT) AS h " +
        "FROM e), " +
        (1 to 3).map { i =>
          half("src", "dst", s"h${i - 1}", s"a$i", "a", "h") + ", " +
            half("dst", "src", s"a$i", s"h$i", "h", "a")
        }.mkString(", ") +
        ", j AS (SELECT a3.node, a3.a AS auth_raw, h3.h AS hub_raw " +
        "FROM a3 JOIN h3 ON a3.node = h3.node) " +
        "SELECT node, CAST(auth_raw AS BIGINT) AS auth_raw, " +
        "CAST(hub_raw AS BIGINT) AS hub_raw, " +
        "round(auth_raw / (SELECT max(auth_raw) FROM j), 6) AS auth, " +
        "round(hub_raw / (SELECT max(hub_raw) FROM j), 6) AS hub FROM j"
    },
    "q227_grid_dbscan" ->
      ("WITH RECURSIVE c AS (SELECT o_custkey, " +
        "CAST(sum(round(o_totalprice, 0)) AS BIGINT) AS spend, " +
        "count(*) AS n FROM orders GROUP BY 1), " +
        "g AS (SELECT spend // 50000 AS cx, n // 2 AS cy, " +
        "count(*) AS pts FROM c GROUP BY 1, 2), " +
        "core AS (SELECT cx * 1000 + cy AS id, cx, cy, pts FROM g " +
        "WHERE pts >= 12), " +
        "e AS (SELECT a.id AS src, b.id AS dst FROM core a " +
        "JOIN core b ON abs(a.cx - b.cx) <= 1 " +
        "AND abs(a.cy - b.cy) <= 1 AND a.id <> b.id), " +
        "reach(id, r) AS (SELECT id, id FROM core " +
        "UNION SELECT e.dst, reach.r FROM reach " +
        "JOIN e ON e.src = reach.id), " +
        "lbl AS (SELECT id, min(r) AS cluster FROM reach GROUP BY id) " +
        "SELECT cluster, count(*) AS n_cells, " +
        "CAST(sum(pts) AS BIGINT) AS n_pts, " +
        "min(cx) AS cx_min, max(cx) AS cx_max, " +
        "min(cy) AS cy_min, max(cy) AS cy_max " +
        "FROM core JOIN lbl USING (id) GROUP BY cluster"),
    "q228_hodges_lehmann" ->
      ("WITH vc AS (SELECT CAST(l_quantity AS BIGINT) AS v, " +
        "count(*) AS c FROM lineitem WHERE l_returnflag = 'R' " +
        "GROUP BY 1), " +
        "walsh AS (SELECT a.v + b.v AS w2, " +
        "sum(CASE WHEN a.v = b.v THEN a.c * (a.c + 1) // 2 " +
        "ELSE a.c * b.c END) AS wt " +
        "FROM vc a JOIN vc b ON a.v <= b.v GROUP BY 1), " +
        "r AS (SELECT w2, sum(wt) OVER (ORDER BY w2 " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum, " +
        "sum(wt) OVER () AS t FROM walsh) " +
        "SELECT CAST(t AS BIGINT) AS n_walsh, w2 / 2.0 AS hl FROM r " +
        "WHERE cum >= (t + 1) // 2 ORDER BY w2 LIMIT 1"),
    "q229_pmi_collocations" ->
      ("WITH dt AS (SELECT DISTINCT doc_id, " +
        "unnest(list_filter(string_split(lower(text), ' '), " +
        "x -> x <> '')) AS tok FROM documents), " +
        "df AS (SELECT tok, count(*) AS df FROM dt GROUP BY 1 " +
        "HAVING count(*) >= 50), " +
        "ft AS (SELECT dt.doc_id, dt.tok, df.df FROM dt " +
        "JOIN df ON dt.tok = df.tok), " +
        "nd AS (SELECT count(*) AS n_docs FROM documents), " +
        "p AS (SELECT a.tok AS tok_a, b.tok AS tok_b, " +
        "a.df AS c_a, b.df AS c_b, count(*) AS c_ab " +
        "FROM ft a JOIN ft b ON a.doc_id = b.doc_id " +
        "AND a.tok < b.tok GROUP BY 1, 2, 3, 4) " +
        "SELECT tok_a, tok_b, c_a, c_b, c_ab, " +
        "round(ln(CAST(c_ab * n_docs AS DOUBLE) / " +
        "CAST(c_a * c_b AS DOUBLE)), 6) AS pmi " +
        "FROM p, nd WHERE c_ab >= 20"),
    "q230_skipgram_cooc" ->
      ("WITH ws AS (SELECT list_filter(string_split(lower(text), ' '), " +
        "x -> x <> '') AS w FROM documents), " +
        "px AS (SELECT w, unnest(range(1, len(w) + 1)) AS i FROM ws), " +
        "pr AS (SELECT w[i] AS w_a, w[i + 1] AS w_b, 1 AS dist " +
        "FROM px WHERE i + 1 <= len(w) " +
        "UNION ALL SELECT w[i], w[i + 2], 2 FROM px " +
        "WHERE i + 2 <= len(w)) " +
        "SELECT w_a, w_b, count(*) AS c, " +
        "sum(2 // dist) / 2.0 AS w FROM pr GROUP BY w_a, w_b " +
        "HAVING count(*) >= 50"),
    "q231_weighted_jaccard" ->
      ("WITH tf AS (SELECT doc_id, tok AS word, count(*) AS tf FROM (" +
        "SELECT doc_id, unnest(list_filter(string_split(lower(text), " +
        "' '), x -> x <> '')) AS tok FROM documents " +
        "WHERE doc_id % 5 = 0) GROUP BY doc_id, tok), " +
        "tot AS (SELECT doc_id, sum(tf) AS t FROM tf GROUP BY doc_id), " +
        "inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, " +
        "sum(least(a.tf, b.tf)) AS smin FROM tf a JOIN tf b " +
        "ON a.word = b.word AND a.doc_id < b.doc_id " +
        "GROUP BY a.doc_id, b.doc_id) " +
        "SELECT doc_a, doc_b, round(smin / " +
        "CAST(ta.t + tb.t - smin AS DOUBLE), 6) AS jw FROM inter " +
        "JOIN tot ta ON doc_a = ta.doc_id " +
        "JOIN tot tb ON doc_b = tb.doc_id " +
        "WHERE round(smin / CAST(ta.t + tb.t - smin AS DOUBLE), 6) " +
        ">= 0.3"),
    "q232_item_cosine" ->
      // per-user incidence capped to the 64 most recent items (max ts
      // desc, item asc) BEFORE the pair join — mirrors the Spark
      // side's enforced degree cap; degrees come from the same capped
      // incidence
      ("WITH g AS (SELECT user_id AS u, " +
        "CAST(json_extract_string(props, '$.k') AS INT) AS item, " +
        "max(ts) AS last_ts FROM events " +
        "WHERE json_extract_string(props, '$.k') IS NOT NULL " +
        "GROUP BY 1, 2), " +
        "uk AS (SELECT u, item FROM (SELECT u, item, " +
        "row_number() OVER (PARTITION BY u " +
        "ORDER BY last_ts DESC, item) AS rn FROM g) WHERE rn <= 64), " +
        "deg AS (SELECT item, count(*) AS deg FROM uk GROUP BY item), " +
        "p AS (SELECT a.item AS i, b.item AS j, count(*) AS c " +
        "FROM uk a JOIN uk b ON a.u = b.u AND a.item <> b.item " +
        "GROUP BY 1, 2), " +
        "sc AS (SELECT i, j, c, round(c / sqrt(CAST(di.deg * dj.deg " +
        "AS DOUBLE)), 6) AS sim FROM p " +
        "JOIN deg di ON p.i = di.item JOIN deg dj ON p.j = dj.item) " +
        "SELECT i, j, c, sim, rk FROM (SELECT *, " +
        "CAST(row_number() OVER (PARTITION BY i " +
        "ORDER BY sim DESC, j) AS INT) AS rk FROM sc) WHERE rk <= 5"),
    "q233_two_hop_reach" ->
      ("WITH uk AS (SELECT DISTINCT 'u' || user_id AS a, " +
        "'k' || CAST(json_extract_string(props, '$.k') AS INT) AS b " +
        "FROM events WHERE json_extract_string(props, '$.k') " +
        "IS NOT NULL), " +
        "e AS (SELECT a AS src, b AS dst FROM uk " +
        "UNION ALL SELECT b, a FROM uk), " +
        "s AS (SELECT src, dst FROM e WHERE src LIKE '%0'), " +
        "o AS (SELECT src AS node, count(*) AS n_1hop FROM s " +
        "GROUP BY 1), " +
        "r2 AS (SELECT a, c FROM (SELECT x.src AS a, y.dst AS c " +
        "FROM s x JOIN e y ON x.dst = y.src WHERE x.src <> y.dst " +
        "UNION SELECT src, dst FROM s)), " +
        "t AS (SELECT a AS node, count(*) AS n_2hop FROM r2 " +
        "GROUP BY 1) " +
        "SELECT o.node, n_1hop, n_2hop FROM o JOIN t ON o.node = t.node"),
    "q234_lexical_richness" ->
      ("WITH tc AS (SELECT source, tok, count(*) AS c FROM (" +
        "SELECT source, unnest(list_filter(string_split(lower(text), " +
        "' '), x -> x <> '')) AS tok FROM documents) " +
        "GROUP BY source, tok), " +
        "agg AS (SELECT source, sum(c) AS n_tokens, " +
        "count(*) AS vocab, " +
        "count(*) FILTER (WHERE c = 1) AS hapax FROM tc " +
        "GROUP BY source) " +
        "SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens, " +
        "vocab, hapax, " +
        "round(vocab / CAST(n_tokens AS DOUBLE), 6) AS ttr, " +
        "round(hapax / CAST(vocab AS DOUBLE), 6) AS hapax_frac, " +
        "round(ln(CAST(vocab AS DOUBLE)) / " +
        "ln(CAST(n_tokens AS DOUBLE)), 6) AS herdan_c FROM agg"),
    "q235_tpch_q6" ->
      ("SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
        "CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue " +
        "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-01-01' " +
        "AND l_shipdate < TIMESTAMP '1998-01-01' " +
        "AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"),
    "q236_tpch_q15" ->
      ("WITH r AS (SELECT l_suppkey AS supplier_no, " +
        "sum(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
        "(1 - CAST(l_discount AS DECIMAL(18,2)))) AS tr FROM lineitem " +
        "WHERE l_shipdate >= TIMESTAMP '1997-01-01' " +
        "AND l_shipdate < TIMESTAMP '1997-04-01' GROUP BY 1) " +
        "SELECT s_suppkey, s_name, " +
        "CAST(tr AS DOUBLE) AS total_revenue " +
        "FROM supplier JOIN r ON s_suppkey = supplier_no " +
        "WHERE tr = (SELECT max(tr) FROM r)"),
    "q237_tpch_q17" ->
      ("WITH lim AS (SELECT l_partkey AS pk, " +
        "CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) / " +
        "(5.0 * count(*)) AS lim FROM lineitem GROUP BY 1) " +
        "SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) " +
        "AS DOUBLE) / 7.0 AS avg_yearly FROM lineitem " +
        "JOIN part ON l_partkey = p_partkey " +
        "JOIN lim ON l_partkey = pk " +
        "WHERE p_brand = 'Brand#23' AND l_quantity < lim"),
    "q238_calibration_ece" ->
      ("WITH sc AS (SELECT ('0x' || substring(md5(" +
        "CAST(event_id AS VARCHAR)), 1, 4))::BIGINT AS c16, " +
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y " +
        "FROM events), " +
        "b AS (SELECT least(c16 * 10 // 65536, 9) AS bin, " +
        "count(*) AS n, sum(y) AS pos, sum(c16) AS sc16 FROM sc " +
        "GROUP BY 1), " +
        "l AS (SELECT bin, n, pos, " +
        "round(sc16 / (n * 65536.0), 6) AS conf, " +
        "round(pos / CAST(n AS DOUBLE), 6) AS acc, " +
        "n / CAST(sum(n) OVER () AS DOUBLE) * " +
        "abs(pos / CAST(n AS DOUBLE) - sc16 / (n * 65536.0)) AS gt " +
        "FROM b) " +
        "SELECT bin, n, CAST(pos AS BIGINT) AS pos, conf, acc, " +
        "round(sum(gt) OVER (), 6) AS ece FROM l"),
    "q239_ndcg" ->
      ("WITH ui AS (SELECT user_id AS u, " +
        "CAST(json_extract_string(props, '$.k') AS INT) AS item, " +
        "count(*) AS rel FROM events " +
        "WHERE json_extract_string(props, '$.k') IS NOT NULL " +
        "GROUP BY 1, 2), " +
        "deg AS (SELECT item, count(*) AS deg FROM ui GROUP BY 1), " +
        "r AS (SELECT u, rel, " +
        "row_number() OVER (PARTITION BY u " +
        "ORDER BY deg DESC, ui.item) AS pp, " +
        "row_number() OVER (PARTITION BY u " +
        "ORDER BY rel DESC, ui.item) AS ip " +
        "FROM ui JOIN deg ON ui.item = deg.item) " +
        "SELECT u, count(*) AS n_items, " +
        "round(sum(CASE WHEN pp <= 10 THEN rel / log2(pp + 1) " +
        "ELSE 0.0 END) / sum(CASE WHEN ip <= 10 THEN " +
        "rel / log2(ip + 1) ELSE 0.0 END), 6) AS ndcg10 " +
        "FROM r GROUP BY u"),
    "q240_shingle_containment" ->
      ("WITH ws AS (SELECT doc_id, " +
        "list_filter(string_split(lower(text), ' '), x -> x <> '') " +
        "AS w FROM documents WHERE doc_id % 5 = 0), " +
        "sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i + 1] || " +
        "' ' || w[i + 2] AS sh FROM (SELECT doc_id, w, " +
        "unnest(range(1, len(w) - 1)) AS i FROM ws " +
        "WHERE len(w) >= 3)), " +
        "sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1), " +
        "inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, " +
        "count(*) AS cap FROM sh a JOIN sh b ON a.sh = b.sh " +
        "AND a.doc_id < b.doc_id GROUP BY 1, 2) " +
        "SELECT doc_a, doc_b, cap, " +
        "round(cap / CAST(sa.sz AS DOUBLE), 6) AS c_ab, " +
        "round(cap / CAST(sb.sz AS DOUBLE), 6) AS c_ba FROM inter " +
        "JOIN sz sa ON doc_a = sa.doc_id " +
        "JOIN sz sb ON doc_b = sb.doc_id " +
        "WHERE round(cap / CAST(sa.sz AS DOUBLE), 6) >= 0.05 " +
        "OR round(cap / CAST(sb.sz AS DOUBLE), 6) >= 0.05"),
    "q241_tpch_q9" ->
      ("SELECT n_name AS nation, year(o_orderdate) AS o_year, " +
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
        "(1 - CAST(l_discount AS DECIMAL(18,2))) - " +
        "CAST(p_retailprice AS DECIMAL(18,2)) * " +
        "CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_profit " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey " +
        "JOIN supplier ON l_suppkey = s_suppkey " +
        "JOIN nation ON s_nationkey = n_nationkey " +
        "JOIN orders ON l_orderkey = o_orderkey " +
        "WHERE p_name LIKE '%blue%' " +
        "GROUP BY n_name, year(o_orderdate)"),
    "q242_time_decay" ->
      ("WITH ev AS (SELECT user_id, value, CAST(ts AS DATE) AS day " +
        "FROM events), " +
        "mx AS (SELECT max(day) AS mxd FROM ev) " +
        "SELECT user_id, count(*) AS n_events, " +
        "sum(CAST(round(round(value * 100, 0) * " +
        "round(pow(2.0, -date_diff('day', day, mxd) / 30.0), 9) " +
        "* 10000, 0) AS BIGINT)) / 1000000.0 AS decayed_value " +
        "FROM ev, mx GROUP BY user_id"),
    "q243_fd_histogram" ->
      ("WITH v AS (SELECT o_totalprice AS x FROM orders), " +
        "st AS (SELECT count(*) AS n, min(x) AS mn, max(x) AS mx, " +
        "round(2.0 * (quantile_disc(x, 0.75) - quantile_disc(x, 0.25)) " +
        "/ cbrt(count(*)), 6) AS h FROM v) " +
        "SELECT bin, round(mn + bin * h, 2) AS lo, h, count(*) AS n " +
        "FROM (SELECT CAST(least(floor((x - mn) / h), " +
        "ceil((mx - mn) / h) - 1) AS BIGINT) AS bin, h, mn FROM v, st) " +
        "GROUP BY bin, h, mn"),
    "q244_tpch_q2" ->
      ("WITH supply AS (SELECT l_partkey, l_suppkey, " +
        "min(CAST(round(l_extendedprice * 100, 0) AS BIGINT) // " +
        "CAST(l_quantity AS BIGINT)) AS cost FROM lineitem " +
        "GROUP BY 1, 2), " +
        "rs AS (SELECT s_suppkey, s_name, s_acctbal, n_name " +
        "FROM supplier JOIN nation ON s_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey " +
        "WHERE r_name = 'EUROPE'), " +
        "p AS (SELECT p_partkey, p_name FROM part WHERE p_size = 15), " +
        "cand AS (SELECT * FROM supply " +
        "JOIN p ON l_partkey = p_partkey " +
        "JOIN rs ON l_suppkey = s_suppkey), " +
        "mc AS (SELECT p_partkey AS pk, min(cost) AS m FROM cand " +
        "GROUP BY 1) " +
        "SELECT round(s_acctbal, 2) AS s_acctbal, s_name, n_name, " +
        "p_partkey, p_name, cost / 100.0 AS supply_cost FROM cand " +
        "JOIN mc ON p_partkey = pk AND cost = m"),
    "q245_tpch_q11" ->
      ("WITH sup AS (SELECT s_suppkey FROM supplier " +
        "JOIN nation ON s_nationkey = n_nationkey " +
        "WHERE n_name = 'NATION_9'), " +
        "v AS (SELECT l_partkey, " +
        "sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS val " +
        "FROM lineitem JOIN sup ON l_suppkey = s_suppkey GROUP BY 1), " +
        "t AS (SELECT sum(val) AS tot FROM v) " +
        "SELECT l_partkey, val / 100.0 AS value FROM v, t " +
        "WHERE val > 0.001 * tot"),
    "q246_tpch_q12" ->
      ("SELECT CASE WHEN l_suppkey % 3 = 0 THEN 'MAIL' ELSE 'SHIP' END " +
        "AS shipmode, " +
        "count(*) FILTER (WHERE o_orderpriority IN " +
        "('1-URGENT', '2-HIGH')) AS high_line_count, " +
        "count(*) FILTER (WHERE o_orderpriority NOT IN " +
        "('1-URGENT', '2-HIGH')) AS low_line_count " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "WHERE year(l_shipdate) = 1997 AND l_suppkey % 3 IN (0, 1) " +
        "AND l_shipdate > o_orderdate GROUP BY 1"),
    "q247_tpch_q16" ->
      ("WITH sp AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem " +
        "WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier " +
        "WHERE s_acctbal < 0)) " +
        "SELECT p_brand, p_type, p_size, " +
        "count(DISTINCT l_suppkey) AS supplier_cnt FROM sp " +
        "JOIN part ON l_partkey = p_partkey " +
        "WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO' " +
        "AND p_size IN (1, 5, 15, 25, 35, 45) " +
        "GROUP BY 1, 2, 3"),
    "q248_tpch_q20" ->
      ("WITH q97 AS (SELECT l_partkey, l_suppkey, " +
        "sum(CAST(l_quantity AS BIGINT)) AS q FROM lineitem " +
        "WHERE year(l_shipdate) = 1997 GROUP BY 1, 2), " +
        "qt AS (SELECT l_partkey AS pk, sum(q) AS tot FROM q97 " +
        "GROUP BY 1), " +
        "dom AS (SELECT DISTINCT l_suppkey FROM q97 " +
        "JOIN qt ON l_partkey = pk " +
        "JOIN part ON l_partkey = p_partkey " +
        "WHERE q > 0.5 * tot AND p_name LIKE '%red%') " +
        "SELECT s_suppkey, s_name FROM dom " +
        "JOIN supplier ON l_suppkey = s_suppkey " +
        "JOIN nation ON s_nationkey = n_nationkey " +
        "WHERE n_name = 'NATION_9'"),
    "q249_tpch_q21" ->
      ("WITH sl AS (SELECT DISTINCT l_orderkey AS ok, " +
        "l_suppkey AS sk FROM lineitem), " +
        "late AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem " +
        "JOIN orders ON l_orderkey = o_orderkey " +
        "WHERE o_orderstatus = 'F' AND l_shipdate > o_orderdate), " +
        "ho AS (SELECT l_orderkey, l_suppkey FROM late " +
        "WHERE EXISTS (SELECT 1 FROM sl WHERE ok = l_orderkey " +
        "AND sk <> l_suppkey)), " +
        "w AS (SELECT l_orderkey, l_suppkey FROM ho h " +
        "WHERE NOT EXISTS (SELECT 1 FROM late o " +
        "WHERE o.l_orderkey = h.l_orderkey " +
        "AND o.l_suppkey <> h.l_suppkey)) " +
        "SELECT s_suppkey, s_name, count(*) AS numwait FROM w " +
        "JOIN supplier ON l_suppkey = s_suppkey " +
        "GROUP BY 1, 2"),
    "q250_hyperanf" ->
      ("WITH uk AS (SELECT DISTINCT 'u' || user_id AS a, " +
        "'k' || CAST(json_extract_string(props, '$.k') AS INT) AS b " +
        "FROM events WHERE json_extract_string(props, '$.k') " +
        "IS NOT NULL), " +
        "e AS (SELECT a AS src, b AS dst FROM uk " +
        "UNION ALL SELECT b, a FROM uk), " +
        "s AS (SELECT src, dst FROM e WHERE src LIKE '%0'), " +
        "r2 AS (SELECT a, c FROM (SELECT x.src AS a, y.dst AS c " +
        "FROM s x JOIN e y ON x.dst = y.src WHERE x.src <> y.dst " +
        "UNION SELECT src, dst FROM s)), " +
        "t AS (SELECT a AS node, count(*) AS n_2hop FROM r2 " +
        "GROUP BY 1) " +
        "SELECT node, n_2hop, true AS est_ok FROM t"),
    "q251_heaps_law" ->
      ("WITH docs AS (SELECT doc_id, " +
        "list_filter(string_split(text, ' '), x -> x <> '') AS ws " +
        "FROM documents), " +
        "dd AS (SELECT doc_id, ntile(10) OVER (ORDER BY doc_id) " +
        "AS dec FROM docs), " +
        "bounds AS (SELECT dec, max(doc_id) AS hi FROM dd GROUP BY dec), " +
        "ncum AS (SELECT b.dec, CAST(sum(len(d.ws)) AS BIGINT) " +
        "AS n_tokens_cum FROM docs d, bounds b " +
        "WHERE d.doc_id <= b.hi GROUP BY b.dec), " +
        "fs AS (SELECT tok, min(doc_id) AS fd FROM " +
        "(SELECT doc_id, unnest(ws) AS tok FROM docs) GROUP BY tok), " +
        "vcum AS (SELECT b.dec, count(*) AS vocab_cum " +
        "FROM fs f, bounds b WHERE f.fd <= b.hi GROUP BY b.dec), " +
        "pts AS (SELECT n.dec, n_tokens_cum, vocab_cum, " +
        "round(ln(n_tokens_cum), 9) AS x, " +
        "round(ln(vocab_cum), 9) AS y " +
        "FROM ncum n JOIN vcum v ON n.dec = v.dec), " +
        "fit AS (SELECT count(*) AS n, " +
        "CAST(sum(CAST(x AS DECIMAL(30,12))) AS DOUBLE) AS sx, " +
        "CAST(sum(CAST(y AS DECIMAL(30,12))) AS DOUBLE) AS sy, " +
        "CAST(sum(CAST(round(x * x, 9) AS DECIMAL(30,12))) AS DOUBLE) " +
        "AS sxx, " +
        "CAST(sum(CAST(round(x * y, 9) AS DECIMAL(30,12))) AS DOUBLE) " +
        "AS sxy FROM pts) " +
        "SELECT p.dec AS decile, p.n_tokens_cum, p.vocab_cum, " +
        "round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS beta, " +
        "round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) " +
        "/ n, 6) AS log_k " +
        "FROM pts p, fit"),
    "q252_chunk_overlap" ->
      ("WITH t AS (SELECT doc_id, " +
        "list_filter(string_split(text, ' '), x -> x <> '') AS ws " +
        "FROM documents), " +
        "k AS (SELECT doc_id, ws, " +
        "CASE WHEN len(ws) <= 64 THEN 1 " +
        "ELSE ((len(ws) - 64 + 47) // 48) + 1 END AS nchunks FROM t), " +
        "e AS (SELECT doc_id, ws, " +
        "unnest(range(nchunks)) AS chunk_id FROM k), " +
        "c AS (SELECT doc_id, chunk_id, " +
        "list_slice(ws, chunk_id * 48 + 1, chunk_id * 48 + 64) AS ch " +
        "FROM e) " +
        "SELECT doc_id, chunk_id, len(ch) AS chunk_tokens, " +
        "md5(array_to_string(ch, ' ')) AS chunk_md5 FROM c"),
    "q253_mixture_rebalance" ->
      ("WITH c AS (SELECT lang, count(*) AS n_l FROM documents " +
        "GROUP BY lang), " +
        "m AS (SELECT min(n_l) AS minc FROM c), " +
        "r AS (SELECT lang, CAST(minc AS DOUBLE) / n_l AS rate " +
        "FROM c, m) " +
        "SELECT d.doc_id, d.lang FROM documents d " +
        "JOIN r ON d.lang = r.lang " +
        // rate >= 1 bypasses the hash draw (keep-all), mirroring the
        // Spark side — the capped strict compare would drop an
        // md5-prefix-ffffffff doc in the smallest language
        "WHERE rate >= 1.0 OR " +
        "substr(md5(CAST(d.doc_id AS VARCHAR) || ':' || d.lang), " +
        "1, 8) < printf('%08x', " +
        "CAST(least(floor(rate * 4294967296), 4294967295) AS BIGINT))"),
    "q254_leakage_safe_split" ->
      ("WITH e AS (SELECT CASE " +
        "WHEN substr(md5('split:' || CAST(user_id AS VARCHAR)), 1, 8) " +
        "< 'cccccccc' THEN 'train' " +
        "WHEN substr(md5('split:' || CAST(user_id AS VARCHAR)), 1, 8) " +
        "< 'e6666666' THEN 'val' ELSE 'test' END AS split, " +
        "user_id, value FROM events), " +
        "p AS (SELECT split, count(DISTINCT user_id) AS n_users, " +
        "count(*) AS n_events, round(CAST(sum(CAST(round(value, 2) " +
        "AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_value " +
        "FROM e GROUP BY split), " +
        "t AS (SELECT count(DISTINCT user_id) AS n_all FROM events) " +
        "SELECT split, n_users, n_events, total_value, " +
        "CAST(sum(n_users) OVER () AS BIGINT) = n_all AS no_leakage " +
        "FROM p, t"),
    "q255_repetition_signals" ->
      // integer-arithmetic flag (max_bg·100 > total_bg·18) and single
      // output-edge divisions — no float accumulation on either engine
      ("WITH base AS (SELECT doc_id, " +
        "list_filter(string_split(lower(text), ' '), x -> x <> '') AS w " +
        "FROM documents WHERE doc_id % 10 = 0), " +
        "ws AS (SELECT doc_id, w FROM base WHERE len(w) >= 2), " +
        "tc AS (SELECT doc_id, unnest(w) AS tok FROM ws), " +
        "tg AS (SELECT doc_id, tok, count(*) AS c FROM tc GROUP BY 1, 2), " +
        "ts AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tok, " +
        "count(*) AS n_distinct FROM tg GROUP BY 1), " +
        "bg AS (SELECT doc_id, w[i] || ' ' || w[i + 1] AS bg " +
        "FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i FROM ws)), " +
        "bc AS (SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY 1, 2), " +
        "bs AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS total_bg, " +
        "max(c) AS max_bg FROM bc GROUP BY 1) " +
        "SELECT ts.doc_id, n_tok, n_distinct, total_bg, max_bg, " +
        "round(max_bg / CAST(total_bg AS DOUBLE), 6) AS top2_frac, " +
        "round((n_tok - n_distinct) / CAST(n_tok AS DOUBLE), 6) " +
        "AS dup_tok_frac, " +
        "max_bg * 100 > total_bg * 18 AS flagged " +
        "FROM ts JOIN bs ON ts.doc_id = bs.doc_id"),
    "q256_semdedup" ->
      // assignment + dup decision both rank/compare the 6-dp-ROUNDED
      // cosine (the q30 discipline); one Lloyd refinement round rebuilds
      // centroids as DECIMAL per-dim means re-quantized to 7 dp (the
      // q165 rule), so both engines assign against identical arrays
      ("WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb " +
        "FROM embeddings), " +
        "seeds AS (SELECT vec_id AS cid, emb AS cemb FROM v " +
        "WHERE vec_id % 97 = 0 ORDER BY vec_id LIMIT 1024), " +
        "a0 AS (SELECT vec_id, emb, cid FROM (" +
        "SELECT v.vec_id, v.emb, s.cid, row_number() OVER (" +
        "PARTITION BY v.vec_id ORDER BY " +
        "round(list_cosine_similarity(v.emb, s.cemb), 6) DESC, s.cid) " +
        "AS rk FROM v CROSS JOIN seeds s) WHERE rk = 1), " +
        "m1 AS (SELECT cid, pos, " +
        "round(CAST(sum(CAST(x AS DECIMAL(30,12))) AS DOUBLE)/count(*), 7) " +
        "AS m FROM (SELECT cid, unnest(range(1, len(emb)+1)) AS pos, " +
        "unnest(emb) AS x FROM a0) GROUP BY cid, pos), " +
        "c1 AS (SELECT cid, list(m ORDER BY pos) AS cemb FROM m1 " +
        "GROUP BY cid), " +
        "asg AS (SELECT vec_id, emb, cid FROM (" +
        "SELECT v.vec_id, v.emb, c.cid, row_number() OVER (" +
        "PARTITION BY v.vec_id ORDER BY " +
        "round(list_cosine_similarity(v.emb, c.cemb), 6) DESC, c.cid) " +
        "AS rk FROM v CROSS JOIN c1 c) WHERE rk = 1), " +
        "anchors AS (SELECT cid, vec_id AS lo_id, emb AS lo_emb FROM (" +
        "SELECT cid, vec_id, emb, row_number() OVER (" +
        "PARTITION BY cid ORDER BY vec_id) AS arn FROM asg) " +
        "WHERE arn <= 256), " +
        "ms AS (SELECT b.vec_id, " +
        "max(round(list_cosine_similarity(b.emb, a.lo_emb), 6)) " +
        "AS max_sim_lower FROM asg b JOIN anchors a " +
        "ON a.cid = b.cid AND a.lo_id < b.vec_id GROUP BY 1) " +
        "SELECT asg.vec_id, asg.cid AS cluster_id, ms.max_sim_lower, " +
        "coalesce(ms.max_sim_lower >= 0.3, false) AS is_dup " +
        "FROM asg LEFT JOIN ms ON asg.vec_id = ms.vec_id"),
    "q257_dsir_weights" ->
      // ln (not DuckDB's log = log10); 4-dp round BEFORE the output
      // AND the target_like compare so sum-order noise can't flip either
      ("WITH dtf AS (SELECT doc_id, lang, substr(md5(tok), 1, 2) AS f, " +
        "count(*) AS c FROM (" +
        "SELECT doc_id, lang, unnest(list_filter(" +
        "string_split(lower(text), ' '), x -> x <> '')) AS tok " +
        "FROM documents) GROUP BY 1, 2, 3), " +
        "raw AS (SELECT f, CAST(sum(c) AS BIGINT) AS r_f FROM dtf " +
        "GROUP BY 1), " +
        "tgt AS (SELECT f, CAST(sum(c) AS BIGINT) AS t_f FROM dtf " +
        "WHERE lang = 'en' GROUP BY 1), " +
        "tot AS (SELECT CAST(sum(c) AS BIGINT) AS big_r, " +
        "CAST(sum(CASE WHEN lang = 'en' THEN c ELSE 0 END) AS BIGINT) " +
        "AS big_t FROM dtf), " +
        "lam AS (SELECT raw.f, " +
        "ln((coalesce(t_f, 0) + 1) / CAST(big_t + 256 AS DOUBLE)) - " +
        "ln((r_f + 1) / CAST(big_r + 256 AS DOUBLE)) AS lam " +
        "FROM raw LEFT JOIN tgt ON raw.f = tgt.f CROSS JOIN tot) " +
        "SELECT doc_id, lang, CAST(sum(c) AS BIGINT) AS n_tok, " +
        "round(sum(c * lam), 4) AS log_weight, " +
        "round(sum(c * lam), 4) > 0 AS target_like " +
        "FROM dtf JOIN lam ON dtf.f = lam.f GROUP BY 1, 2"),
    "q258_pack_contexts" ->
      // concat-and-split packing manifest: pure integer arithmetic off
      // one global running sum (doc tokens + 1 EOS per doc, cut at 512)
      ("SELECT doc_id, ntok, cum_before // 512 AS first_example, " +
        "cum_before % 512 AS offset_in_example, " +
        "(cum_before + ntok - 1) // 512 - cum_before // 512 + 1 " +
        "AS n_examples, " +
        "(cum_before + ntok - 1) // 512 - cum_before // 512 + 1 > 1 " +
        "AS crosses FROM (" +
        "SELECT doc_id, ntok, CAST(sum(ntok + 1) OVER (ORDER BY doc_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) " +
        "- ntok - 1 AS BIGINT) AS cum_before FROM (" +
        "SELECT doc_id, len(list_filter(string_split(text, ' '), " +
        "x -> x <> '')) AS ntok FROM documents) WHERE ntok >= 1)"),
    "q259_curation_pipeline" ->
      // composed q255 signals → q25 canonical dedup → q253 draw; every
      // stage filter is integer/string arithmetic, so the funnel counts
      // reproduce exactly
      ("WITH d0 AS (SELECT doc_id, lang, text FROM documents), " +
        "w0 AS (SELECT doc_id, lang, list_filter(" +
        "string_split(lower(text), ' '), x -> x <> '') AS w FROM d0), " +
        "ws AS (SELECT doc_id, lang, w FROM w0 WHERE len(w) >= 2), " +
        "tg AS (SELECT doc_id, tok, count(*) AS c FROM (" +
        "SELECT doc_id, unnest(w) AS tok FROM ws) GROUP BY 1, 2), " +
        "ts AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tok, " +
        "count(*) AS n_distinct FROM tg GROUP BY 1), " +
        "bc AS (SELECT doc_id, bg, count(*) AS c FROM (" +
        "SELECT doc_id, w[i] || ' ' || w[i + 1] AS bg FROM (" +
        "SELECT doc_id, w, unnest(range(1, len(w))) AS i FROM ws)) " +
        "GROUP BY 1, 2), " +
        "bs AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS total_bg, " +
        "max(c) AS max_bg FROM bc GROUP BY 1), " +
        "qual AS (SELECT ws.doc_id, ws.lang, n_tok, " +
        "array_to_string(list_sort(list_distinct(w)), ' ') AS canon " +
        "FROM ws JOIN ts ON ws.doc_id = ts.doc_id " +
        "JOIN bs ON ws.doc_id = bs.doc_id " +
        "WHERE n_tok >= 10 AND NOT (max_bg * 100 > total_bg * 18) " +
        "AND NOT ((n_tok - n_distinct) * 10 > n_tok * 7)), " +
        "ded AS (SELECT min(doc_id) AS doc_id FROM qual " +
        "GROUP BY canon), " +
        "uniq AS (SELECT q.doc_id, q.lang, q.n_tok FROM qual q " +
        "JOIN ded ON q.doc_id = ded.doc_id), " +
        "c AS (SELECT lang, count(*) AS n_l FROM uniq GROUP BY 1), " +
        "m AS (SELECT min(n_l) AS minc FROM c), " +
        "r AS (SELECT lang, CAST(minc AS DOUBLE) / n_l AS rate " +
        "FROM c, m), " +
        "kept AS (SELECT u.doc_id, u.lang, u.n_tok FROM uniq u " +
        "JOIN r ON u.lang = r.lang WHERE rate >= 1.0 OR " +
        "substr(md5(CAST(u.doc_id AS VARCHAR) || ':' || u.lang), " +
        "1, 8) < printf('%08x', CAST(least(floor(rate * 4294967296), " +
        "4294967295) AS BIGINT))) " +
        // LEFT joins from raw: a language with zero survivors at any
        // stage reports 0, not a missing row (mirrors the Spark side)
        "SELECT raw.lang, n_raw, coalesce(n_quality, 0) AS n_quality, " +
        "coalesce(n_unique, 0) AS n_unique, " +
        "coalesce(n_kept, 0) AS n_kept, " +
        "coalesce(tok_kept, 0) AS tok_kept FROM " +
        "(SELECT lang, count(*) AS n_raw FROM d0 GROUP BY 1) raw " +
        "LEFT JOIN (SELECT lang, count(*) AS n_quality FROM qual " +
        "GROUP BY 1) qq USING (lang) " +
        "LEFT JOIN (SELECT lang, count(*) AS n_unique FROM uniq " +
        "GROUP BY 1) uu USING (lang) " +
        "LEFT JOIN (SELECT lang, count(*) AS n_kept, " +
        "CAST(sum(n_tok) AS BIGINT) AS tok_kept FROM kept " +
        "GROUP BY 1) kk USING (lang)"),
    "q260_substring_dedup" ->
      // duplicated K-token windows (corpus-wide count ≥ 2 on the md5 of
      // the window content), per-doc interval-union coverage via lead();
      // the flag is integer arithmetic (dup_tokens·5 > n_tok)
      ("WITH bs AS (SELECT doc_id, w, CAST(len(w) AS BIGINT) AS n_tok " +
        "FROM (SELECT doc_id, list_filter(string_split(lower(text), ' '), " +
        "x -> x <> '') AS w FROM documents) WHERE len(w) >= 8), " +
        "wins AS (SELECT doc_id, n_tok, i, " +
        "md5(array_to_string(w[i+1:i+8], ' ')) AS h FROM (" +
        "SELECT doc_id, n_tok, w, unnest(range(0, n_tok - 7)) AS i " +
        "FROM bs)), " +
        "dup AS (SELECT h FROM wins GROUP BY h HAVING count(*) >= 2), " +
        "occ AS (SELECT doc_id, i FROM wins JOIN dup USING (h)), " +
        "cov AS (SELECT doc_id, CAST(count(*) AS BIGINT) " +
        "AS n_dup_windows, CAST(sum(CASE WHEN nxt IS NULL THEN 8 " +
        "ELSE least(8, nxt - i) END) AS BIGINT) AS dup_tokens FROM (" +
        "SELECT doc_id, i, lead(i) OVER (PARTITION BY doc_id " +
        "ORDER BY i) AS nxt FROM occ) GROUP BY 1) " +
        "SELECT bs.doc_id, n_tok, " +
        "coalesce(n_dup_windows, 0) AS n_dup_windows, " +
        "coalesce(dup_tokens, 0) AS dup_tokens, " +
        "round(coalesce(dup_tokens, 0) / CAST(n_tok AS DOUBLE), 6) " +
        "AS dup_frac, " +
        "coalesce(dup_tokens, 0) * 5 > n_tok AS flagged " +
        "FROM bs LEFT JOIN cov USING (doc_id)"),
    "q261_winnowing" ->
      // 8-hex-char md5-prefix gram hashes compared as ASCII strings —
      // binary collation on both engines, so window minima reproduce
      ("WITH g AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tok, " +
        "list_transform(range(0, len(t) - 3), i -> " +
        "substr(md5(array_to_string(t[i+1:i+4], ' ')), 1, 8)) AS g " +
        "FROM (SELECT doc_id, list_filter(string_split(lower(text), ' '), " +
        "x -> x <> '') AS t FROM documents) WHERE len(t) >= 8), " +
        "f AS (SELECT doc_id, n_tok, CAST(len(g) AS BIGINT) AS n_kgrams, " +
        "list_distinct(list_transform(range(0, len(g) - 4), j -> " +
        "list_aggregate(g[j+1:j+5], 'min'))) AS fps FROM g) " +
        "SELECT doc_id, n_tok, n_kgrams, n_kgrams - 4 AS n_windows, " +
        "CAST(len(fps) AS BIGINT) AS n_fingerprints, " +
        "list_aggregate(fps, 'min') AS min_fp, " +
        "list_aggregate(fps, 'max') AS max_fp, " +
        "round(len(fps) / CAST(n_kgrams - 4 AS DOUBLE), 6) AS density " +
        "FROM f"),
    "q262_filtered_ann" ->
      // exact arm reproduces in SQL (same-label brute force, rounded
      // cosine + vec_id order); the filtered-IVF recall boolean is
      // computed in-query against that exact arm → literal true here
      ("SELECT query_id, neighbor_id, sim, rk, true AS ivf_recall_ok " +
        "FROM (SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id, " +
        "round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), " +
        "CAST(v.embedding AS DOUBLE[])), 6) AS sim, " +
        "CAST(row_number() OVER (PARTITION BY q.vec_id ORDER BY " +
        "round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), " +
        "CAST(v.embedding AS DOUBLE[])), 6) DESC, v.vec_id) AS INT) " +
        "AS rk FROM embeddings q JOIN embeddings v " +
        "ON q.label = v.label AND q.vec_id <> v.vec_id " +
        "WHERE q.vec_id % (SELECT greatest(100, (count(*) + 127) // 128) FROM embeddings) = 0) WHERE rk <= 5"),
    "q263_ccnet_buckets" ->
      // q127's Laplace LM trained on the en slice only; unseen mass via
      // left joins (coalesce 0); terciles are rank-free cumulative
      // counts over DISTINCT rounded scores, bucket by integer compare
      ("WITH ws AS (SELECT doc_id, lang, list_filter(" +
        "string_split(lower(text), ' '), x -> x <> '') AS w " +
        "FROM documents), " +
        "bigf AS (SELECT doc_id, lang, bg[1] AS w1, bg[2] AS w2 FROM (" +
        "SELECT doc_id, lang, unnest(list_zip(w[1:len(w)-1], " +
        "w[2:len(w)])) AS bg FROM ws WHERE len(w) >= 2)), " +
        "dbg AS (SELECT doc_id, lang, w1, w2, count(*) AS k FROM bigf " +
        "GROUP BY 1, 2, 3, 4), " +
        "cnt AS (SELECT w1, w2, sum(k) AS c12 FROM dbg " +
        "WHERE lang = 'en' GROUP BY 1, 2), " +
        "uni AS (SELECT w1, sum(c12) AS c1 FROM cnt GROUP BY 1), " +
        // v floors at 1 (empty-en guard, mirrors the Spark side)
        "voc AS (SELECT greatest(count(DISTINCT w2), 1) AS v FROM cnt), " +
        "sc AS (SELECT d.doc_id, d.lang, " +
        "round(sum(d.k * (-log2((coalesce(c.c12, 0) + 1.0) / " +
        "(coalesce(u.c1, 0) + voc.v)))) / sum(d.k), 4) " +
        "AS bits_per_bigram, CAST(sum(d.k) AS BIGINT) AS n_bigrams " +
        "FROM dbg d LEFT JOIN cnt c ON d.w1 = c.w1 AND d.w2 = c.w2 " +
        "LEFT JOIN uni u ON d.w1 = u.w1, voc GROUP BY 1, 2), " +
        "vc AS (SELECT lang, bits_per_bigram, count(*) AS c FROM sc " +
        "GROUP BY 1, 2), " +
        "cum AS (SELECT lang, bits_per_bigram, CASE " +
        "WHEN cum * 3 <= n THEN 'head' " +
        "WHEN cum * 3 <= n * 2 THEN 'middle' ELSE 'tail' END " +
        "AS ppl_bucket FROM (" +
        "SELECT lang, bits_per_bigram, sum(c) OVER (PARTITION BY lang " +
        "ORDER BY bits_per_bigram ROWS BETWEEN UNBOUNDED PRECEDING " +
        "AND CURRENT ROW) AS cum, sum(c) OVER (PARTITION BY lang) AS n " +
        "FROM vc)) " +
        "SELECT sc.doc_id, sc.lang, sc.bits_per_bigram, sc.n_bigrams, " +
        "cum.ppl_bucket FROM sc JOIN cum ON sc.lang = cum.lang " +
        "AND sc.bits_per_bigram = cum.bits_per_bigram"),
    "q264_embedding_outliers" ->
      // centroid means accumulate in DECIMAL (order-independent, q165
      // discipline) and round to 7; cosines round to 6; the low/mid/high
      // cut is rank-free cumulative counts over DISTINCT rounded sims
      ("WITH v AS (SELECT vec_id, label, " +
        "CAST(embedding AS DOUBLE[]) AS emb FROM embeddings), " +
        "m AS (SELECT label, pos, " +
        "round(CAST(sum(CAST(x AS DECIMAL(30,12))) AS DOUBLE)/count(*), 7) " +
        "AS m FROM (SELECT label, unnest(range(1, len(emb)+1)) AS pos, " +
        "unnest(emb) AS x FROM v) GROUP BY 1, 2), " +
        "c AS (SELECT label, list(m ORDER BY pos) AS cent FROM m " +
        "GROUP BY 1), " +
        "s AS (SELECT vec_id, v.label, " +
        "round(list_cosine_similarity(emb, cent), 6) AS centroid_sim " +
        "FROM v JOIN c ON v.label = c.label), " +
        "vc AS (SELECT label, centroid_sim, count(*) AS c FROM s " +
        "GROUP BY 1, 2), " +
        "cum AS (SELECT label, centroid_sim, CASE " +
        "WHEN cum * 3 <= n THEN 'low' " +
        "WHEN cum * 3 <= n * 2 THEN 'mid' ELSE 'high' END AS sim_bucket " +
        "FROM (SELECT label, centroid_sim, sum(c) OVER (" +
        "PARTITION BY label ORDER BY centroid_sim " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum, " +
        "sum(c) OVER (PARTITION BY label) AS n FROM vc)) " +
        "SELECT s.vec_id, s.label, s.centroid_sim, cum.sim_bucket, " +
        "cum.sim_bucket = 'low' AS outlier FROM s JOIN cum " +
        "ON s.label = cum.label AND s.centroid_sim = cum.centroid_sim"),
    "q265_source_kl" ->
      // exact integer counts; log2 on exact integers term-by-term (no
      // integer products — overflow-free at any corpus size); 4-dp round
      // after the per-source sum; sums CAST AS BIGINT (HUGEINT rule)
      ("WITH tok AS (SELECT source, unnest(list_filter(" +
        "string_split(lower(text), ' '), x -> x <> '')) AS w " +
        "FROM documents), " +
        "csw AS (SELECT source, w, count(*) AS k FROM tok GROUP BY 1, 2), " +
        "cw AS (SELECT w, sum(k) AS cw FROM csw GROUP BY 1), " +
        "ns AS (SELECT source, sum(k) AS ns FROM csw GROUP BY 1), " +
        "nt AS (SELECT sum(k) AS nn FROM csw) " +
        "SELECT c.source, CAST(n.ns AS BIGINT) AS n_tokens, " +
        "count(*) AS vocab, " +
        "round(sum((c.k / CAST(n.ns AS DOUBLE)) * " +
        "(log2(c.k) + log2(t.nn) - log2(n.ns) - log2(w.cw))), 4) " +
        "AS kl_bits FROM csw c JOIN cw w USING (w) " +
        "JOIN ns n USING (source), nt t GROUP BY 1, 2"),
    "q266_mixture_planner" ->
      // exact integer token counts; shares re-quantize to 4 dp before
      // every downstream use; the >4 flag compares the ROUNDED epochs
      ("WITH tl AS (SELECT lang, CAST(sum(len(list_filter(" +
        "string_split(lower(text), ' '), x -> x <> ''))) AS BIGINT) " +
        "AS n_tokens FROM documents GROUP BY 1), " +
        "tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS nn, " +
        "sum(pow(CAST(n_tokens AS DOUBLE), 0.3)) AS sp FROM tl), " +
        "sh AS (SELECT lang, n_tokens, nn * 4 AS budget, " +
        "round(pow(CAST(n_tokens AS DOUBLE), 0.3) / sp, 4) AS share " +
        "FROM tl, tot) " +
        "SELECT lang, n_tokens, share, " +
        "round(share * budget, 2) AS target_tokens, " +
        "round(share * budget / n_tokens, 4) AS epochs, " +
        "round(share * budget / n_tokens, 4) > 4.0 AS over_four_epochs " +
        "FROM sh"),
    "q267_substring_dedup_apply" ->
      // covered positions explode K rows per duplicated occurrence;
      // the rebuild is string_agg ORDER BY pos; short docs pass through
      // verbatim (they can never contain a K-window)
      ("WITH base AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tok, w " +
        "FROM (SELECT doc_id, list_filter(string_split(lower(text), ' '), " +
        "x -> x <> '') AS w FROM documents)), " +
        "wins AS (SELECT doc_id, i, " +
        "md5(array_to_string(w[i+1:i+8], ' ')) AS h FROM (" +
        "SELECT doc_id, w, unnest(range(0, len(w) - 7)) AS i " +
        "FROM base WHERE len(w) >= 8)), " +
        "dup AS (SELECT h FROM wins GROUP BY h HAVING count(*) >= 2), " +
        "cov AS (SELECT DISTINCT doc_id, i + x AS pos FROM (" +
        "SELECT doc_id, i, unnest(range(0, 8)) AS x " +
        "FROM wins JOIN dup USING (h))), " +
        "toks AS (SELECT doc_id, i AS pos, w[i+1] AS tok FROM (" +
        "SELECT doc_id, w, unnest(range(0, len(w))) AS i FROM base)), " +
        "keptt AS (SELECT t.doc_id, count(*) AS n_kept, " +
        "string_agg(t.tok, ' ' ORDER BY t.pos) AS kept_text " +
        "FROM toks t LEFT JOIN cov c " +
        "ON t.doc_id = c.doc_id AND t.pos = c.pos " +
        "WHERE c.doc_id IS NULL GROUP BY 1) " +
        "SELECT b.doc_id, b.n_tok, coalesce(n_kept, 0) AS n_kept, " +
        "b.n_tok - coalesce(n_kept, 0) AS removed_tokens, " +
        "md5(coalesce(kept_text, '')) AS kept_fp " +
        "FROM base b LEFT JOIN keptt USING (doc_id)"),
    "q268_hashed_drift" ->
      // 256 md5-prefix buckets; Laplace-smoothed reference; log2 on
      // exact integers term-by-term; 4-dp round after the sum
      ("WITH tok AS (SELECT source, substr(md5(w), 1, 2) AS b FROM (" +
        "SELECT source, unnest(list_filter(string_split(lower(text), ' '), " +
        "x -> x <> '')) AS w FROM documents)), " +
        "csb AS (SELECT source, b, count(*) AS k FROM tok GROUP BY 1, 2), " +
        "ref AS (SELECT b, CAST(sum(k) AS BIGINT) AS cr FROM csb " +
        "GROUP BY 1), " +
        "nt AS (SELECT CAST(sum(cr) AS BIGINT) AS nr FROM ref), " +
        "ns AS (SELECT source, CAST(sum(k) AS BIGINT) AS ns FROM csb " +
        "GROUP BY 1) " +
        "SELECT c.source, n.ns AS n_tokens, " +
        "round(sum((c.k / CAST(n.ns AS DOUBLE)) * " +
        "(log2(c.k) + log2(t.nr + 256) - log2(n.ns) - log2(r.cr + 1))), 4) " +
        "AS kl_bits FROM csb c JOIN ref r USING (b) " +
        "JOIN ns n USING (source), nt t GROUP BY 1, 2"),
    "q269_ivf_delta_ingest" ->
      // exact truth counts reproduce in SQL (full-corpus brute force,
      // rounded cosine + vec_id order); both recall booleans are
      // computed in-query against that exact arm → literal true here
      ("WITH bf AS (SELECT query_id, neighbor_id FROM (" +
        "SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id, " +
        "row_number() OVER (PARTITION BY q.vec_id ORDER BY " +
        "round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), " +
        "CAST(v.embedding AS DOUBLE[])), 6) DESC, v.vec_id) AS rk " +
        "FROM embeddings q JOIN embeddings v ON q.vec_id <> v.vec_id " +
        "WHERE q.vec_id % (SELECT greatest(100, (count(*) + 127) // 128) FROM embeddings) = 0) WHERE rk <= 5) " +
        "SELECT CAST(count(DISTINCT query_id) AS BIGINT) AS n_queries, " +
        "count(*) AS n_truth, " +
        "CAST(count(*) FILTER (WHERE neighbor_id % 7 = 3) AS BIGINT) " +
        "AS delta_truth, true AS recall_ok, true AS delta_recall_ok " +
        "FROM bf"),
    "q270_dup_provenance" ->
      // per-(cluster, source) counts, never materialized pairs; exact
      // integer pair arithmetic; sums CAST AS BIGINT (HUGEINT rule)
      ("WITH d AS (SELECT source, md5(array_to_string(list_sort(" +
        "list_distinct(list_filter(string_split(lower(text), ' '), " +
        "x -> x <> ''))), ' ')) AS h FROM documents), " +
        "cs AS (SELECT h, source, count(*) AS n FROM d GROUP BY 1, 2) " +
        "SELECT a.source AS source_a, b.source AS source_b, " +
        "CAST(sum(CASE WHEN a.source = b.source " +
        "THEN (a.n * (a.n - 1)) // 2 ELSE a.n * b.n END) AS BIGINT) " +
        "AS n_pairs FROM cs a JOIN cs b ON a.h = b.h " +
        "AND a.source <= b.source GROUP BY 1, 2 " +
        "HAVING n_pairs > 0"),
    "q271_minhash_calibration" ->
      // exact 3-gram Jaccard over the fixed 100-doc panel; the
      // signature-agreement estimate is judged in-query against this
      // exact arm (binomial 6-sigma bound) → literal true here
      ("WITH p AS (SELECT doc_id, list_distinct(list_transform(" +
        "range(0, len(t) - 2), i -> array_to_string(t[i+1:i+3], ' '))) " +
        "AS g FROM (SELECT doc_id, list_filter(" +
        "string_split(lower(text), ' '), x -> x <> '') AS t " +
        "FROM documents WHERE doc_id < 100) WHERE len(t) >= 3) " +
        "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, " +
        "round(CAST(len(list_intersect(a.g, b.g)) AS DOUBLE) / " +
        "(len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))), 6) " +
        "AS j_exact, true AS est_within_bound " +
        "FROM p a JOIN p b ON a.doc_id < b.doc_id"),
    "q272_neardup_provenance" ->
      // the q26 exact >= 0.6 pair table joined to sources, grouped by
      // the normalized (least, greatest) source pair
      ("WITH t AS (SELECT doc_id, source, list_distinct(list_filter(" +
        "string_split(text, ' '), x -> x <> '')) AS toks " +
        "FROM documents WHERE doc_id % 4 = 0), " +
        "pr AS (SELECT a.source AS sa, b.source AS sb, " +
        "round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) / " +
        "(len(a.toks) + len(b.toks) - " +
        "len(list_intersect(a.toks, b.toks))), 4) AS jaccard " +
        "FROM t a JOIN t b ON a.doc_id < b.doc_id " +
        "WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) / " +
        "(len(a.toks) + len(b.toks) - " +
        "len(list_intersect(a.toks, b.toks))) >= 0.6) " +
        "SELECT least(sa, sb) AS source_a, greatest(sa, sb) AS source_b, " +
        "count(*) AS n_pairs, round(avg(jaccard), 4) AS avg_jaccard " +
        "FROM pr GROUP BY 1, 2"),
    "q273_snapshot_dedup" ->
      // arriving batch (doc_id % 5 == 4) classified against the frozen
      // registry of the rest on q25's canonical token-set key
      ("WITH c AS (SELECT doc_id, lang, md5(array_to_string(list_sort(" +
        "list_distinct(list_filter(string_split(lower(text), ' '), " +
        "x -> x <> ''))), ' ')) AS canon FROM documents), " +
        "b AS (SELECT * FROM c WHERE doc_id % 5 = 4), " +
        "r AS (SELECT canon, min(doc_id) AS reg_id FROM c " +
        "WHERE doc_id % 5 <> 4 GROUP BY 1), " +
        "m AS (SELECT canon, min(doc_id) AS batch_min FROM b GROUP BY 1) " +
        "SELECT b.doc_id, b.lang, CASE " +
        "WHEN reg_id IS NOT NULL THEN 'dup_of_existing' " +
        "WHEN batch_min < b.doc_id THEN 'dup_in_batch' " +
        "ELSE 'new' END AS status, " +
        "coalesce(reg_id, batch_min) AS keep_id " +
        "FROM b LEFT JOIN r USING (canon) JOIN m USING (canon)"),
    "q274_filter_ablation" ->
      // every doc scored against all three q259 gate rules; mask census
      // partitions the raw corpus (sub-2-token docs: no-bigram rule
      // false); counts exact, sums CAST AS BIGINT (HUGEINT rule)
      ("WITH w0 AS (SELECT doc_id, lang, list_filter(" +
        "string_split(lower(text), ' '), x -> x <> '') AS w " +
        "FROM documents), " +
        "tg AS (SELECT doc_id, tok, count(*) AS c FROM (" +
        "SELECT doc_id, unnest(w) AS tok FROM w0) GROUP BY 1, 2), " +
        "ts AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tok, " +
        "count(*) AS n_distinct FROM tg GROUP BY 1), " +
        "bc AS (SELECT doc_id, bg, count(*) AS c FROM (" +
        "SELECT doc_id, w[i] || ' ' || w[i + 1] AS bg FROM (" +
        "SELECT doc_id, w, unnest(range(1, len(w))) AS i FROM w0 " +
        "WHERE len(w) >= 2)) GROUP BY 1, 2), " +
        "bs AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS total_bg, " +
        "max(c) AS max_bg FROM bc GROUP BY 1) " +
        "SELECT lang, coalesce(max_bg * 100 > total_bg * 18, false) " +
        "AS fail_repetition, " +
        "coalesce((n_tok - n_distinct) * 10 > n_tok * 7, false) " +
        "AS fail_dupfrac, coalesce(n_tok, 0) < 10 AS fail_short, " +
        "count(*) AS n_docs, " +
        "CAST(sum(coalesce(n_tok, 0)) AS BIGINT) AS n_tokens " +
        "FROM w0 LEFT JOIN ts USING (doc_id) LEFT JOIN bs USING (doc_id) " +
        "GROUP BY 1, 2, 3, 4"),
    "q275_embedding_health" ->
      // per-dim mean/variance: DECIMAL(30,12) sums (x² quantized to
      // 12 dp first — one IEEE multiply, engine-identical), mean rounds
      // to 7, variance uses the ROUNDED mean, total variance sums the
      // 7-dp variances exactly in DECIMAL, shares round to 6
      ("WITH x AS (SELECT unnest(range(0, len(emb))) AS dim, " +
        "unnest(emb) AS x FROM (SELECT CAST(embedding AS DOUBLE[]) " +
        "AS emb FROM embeddings)), " +
        "st AS (SELECT dim, round(CAST(sum(CAST(x AS DECIMAL(30,12))) " +
        "AS DOUBLE) / count(*), 7) AS mean_v, " +
        "CAST(sum(CAST(round(x * x, 12) AS DECIMAL(30,12))) AS DOUBLE) " +
        "/ count(*) AS m2 FROM x GROUP BY 1), " +
        "v AS (SELECT dim, mean_v, CAST(round(m2 - mean_v * mean_v, 7) " +
        "AS DECIMAL(20,7)) AS var_v FROM st), " +
        "t AS (SELECT sum(var_v) AS tot_var, max(var_v) AS max_var " +
        "FROM v) " +
        "SELECT dim, mean_v, CAST(var_v AS DOUBLE) AS var_v, " +
        "round(CAST(var_v AS DOUBLE) / CAST(tot_var AS DOUBLE), 6) " +
        "AS var_share, CAST(var_v AS DOUBLE) < 1e-6 AS dead_dim, " +
        "var_v = max_var AS dominant_dim FROM v, t"),
    "q276_vocab_coverage" ->
      // types rank by (freq desc, tok asc) — a total order, so the
      // curve is tie-deterministic; sums CAST AS BIGINT (HUGEINT rule)
      ("WITH tf AS (SELECT tok, count(*) AS freq FROM (" +
        "SELECT unnest(list_filter(string_split(lower(text), ' '), " +
        "x -> x <> '')) AS tok FROM documents) GROUP BY 1), " +
        "r AS (SELECT tok, freq, " +
        "row_number() OVER (ORDER BY freq DESC, tok) AS rnk, " +
        "CAST(sum(freq) OVER (ORDER BY freq DESC, tok " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) " +
        "AS cum FROM tf), " +
        "t AS (SELECT CAST(sum(freq) AS BIGINT) AS n_tokens FROM tf) " +
        "SELECT v, max(rnk) AS n_types, max(cum) AS covered, " +
        "round(CAST(max(cum) AS DOUBLE) / max(n_tokens), 6) AS coverage " +
        "FROM r, (VALUES (4), (8), (16), (32), (64)) s(v), t " +
        "WHERE rnk <= v GROUP BY v"),
    "q277_dsir_ess" ->
      // q257's 4-dp log-weights → per-lang max-stabilized exp → 8-dp w,
      // 12-dp w² → DECIMAL sums → ESS = (Σw)²/Σw²; ratios divide
      // ROUNDED values (re-quantize rule)
      ("WITH dtf AS (SELECT doc_id, lang, substr(md5(tok), 1, 2) AS f, " +
        "count(*) AS c FROM (" +
        "SELECT doc_id, lang, unnest(list_filter(" +
        "string_split(lower(text), ' '), x -> x <> '')) AS tok " +
        "FROM documents) GROUP BY 1, 2, 3), " +
        "raw AS (SELECT f, CAST(sum(c) AS BIGINT) AS r_f FROM dtf " +
        "GROUP BY 1), " +
        "tgt AS (SELECT f, CAST(sum(c) AS BIGINT) AS t_f FROM dtf " +
        "WHERE lang = 'en' GROUP BY 1), " +
        "tot AS (SELECT CAST(sum(c) AS BIGINT) AS big_r, " +
        "CAST(sum(CASE WHEN lang = 'en' THEN c ELSE 0 END) AS BIGINT) " +
        "AS big_t FROM dtf), " +
        "lam AS (SELECT raw.f, " +
        "ln((coalesce(t_f, 0) + 1) / CAST(big_t + 256 AS DOUBLE)) - " +
        "ln((r_f + 1) / CAST(big_r + 256 AS DOUBLE)) AS lam " +
        "FROM raw LEFT JOIN tgt ON raw.f = tgt.f CROSS JOIN tot), " +
        "lw AS (SELECT doc_id, lang, round(sum(c * lam), 4) AS lw " +
        "FROM dtf JOIN lam ON dtf.f = lam.f GROUP BY 1, 2), " +
        "mx AS (SELECT lang, max(lw) AS mx FROM lw GROUP BY 1), " +
        "w AS (SELECT lw.lang, round(exp(lw - mx), 8) AS w " +
        "FROM lw JOIN mx USING (lang)), " +
        "agg AS (SELECT lang, count(*) AS n_docs, " +
        "CAST(sum(CAST(w AS DECIMAL(30,12))) AS DOUBLE) AS sw, " +
        "CAST(sum(CAST(round(w * w, 12) AS DECIMAL(30,12))) AS DOUBLE) " +
        "AS sww FROM w GROUP BY 1) " +
        "SELECT lang, n_docs, round(pow(sw, 2) / sww, 4) AS ess, " +
        "round(round(pow(sw, 2) / sww, 4) / n_docs, 6) AS ess_ratio, " +
        "round(round(pow(sw, 2) / sww, 4) / n_docs, 6) < 0.5 " +
        "AS degenerate FROM agg"),
    "q278_snapshot_neardup" ->
      // exact arm only (the LSH probe aggregates into the provably-held
      // recall bound → literal true): scale-capped panel (modulus from
      // the exact count), inverted trigram-md5 join, jac rounds to 4 dp
      // BEFORE ranking, ties break on the lower existing id
      ("WITH mm AS (SELECT greatest(20, (count(*) + 99) // 100) AS m " +
        "FROM documents), " +
        "b3 AS (SELECT doc_id, list_filter(string_split(lower(text), " +
        "' '), x -> x <> '') AS w FROM documents " +
        "WHERE len(list_filter(string_split(lower(text), ' '), " +
        "x -> x <> '')) >= 3), " +
        "tri AS (SELECT doc_id, unnest(list_distinct(list_transform(" +
        "range(0, len(w) - 2), i -> md5(array_to_string(w[i+1:i+3], " +
        "' '))))) AS g FROM b3), " +
        "p AS (SELECT doc_id AS p_id, g FROM tri, mm " +
        "WHERE doc_id % m = 4), " +
        "e AS (SELECT doc_id AS e_id, g FROM tri, mm " +
        "WHERE doc_id % m <> 4), " +
        "sp AS (SELECT p_id, count(*) AS sp FROM p GROUP BY 1), " +
        "se AS (SELECT e_id, count(*) AS se FROM e GROUP BY 1), " +
        "sc AS (SELECT p_id, e_id, round(CAST(i AS DOUBLE) / " +
        "(sp + se - i), 4) AS jac FROM (" +
        "SELECT p_id, e_id, count(*) AS i FROM p JOIN e USING (g) " +
        "GROUP BY 1, 2) JOIN sp USING (p_id) JOIN se USING (e_id)), " +
        "best AS (SELECT p_id, e_id AS best_id, jac AS best_jac FROM (" +
        "SELECT *, row_number() OVER (PARTITION BY p_id " +
        "ORDER BY jac DESC, e_id) AS rk FROM sc) WHERE rk = 1), " +
        "pd AS (SELECT doc_id FROM b3, mm WHERE doc_id % m = 4) " +
        "SELECT pd.doc_id, coalesce(best_jac >= 0.6, false) " +
        "AS has_neardup, coalesce(best_id, -1) AS best_id, " +
        "coalesce(best_jac, 0.0) AS best_jac, true AS lsh_recall_ok " +
        "FROM pd LEFT JOIN best ON pd.doc_id = best.p_id"),
    "q279_key_skew" ->
      // percentiles round to 2 dp (q39 convention), the skew ratio
      // divides the ROUNDED median, top-8 orders by (freq desc, key asc)
      {
        def block(table: String, key: String): String =
          s"(WITH c AS (SELECT CAST($key AS VARCHAR) AS k, count(*) AS n " +
            s"FROM $table GROUP BY 1), " +
            "t AS (SELECT CAST(sum(n) AS BIGINT) AS top8 FROM (" +
            "SELECT n FROM c ORDER BY n DESC, k LIMIT 8)) " +
            s"SELECT '$table.$key' AS key_name, " +
            "CAST(sum(n) AS BIGINT) AS n_rows, count(*) AS n_keys, " +
            "max(n) AS max_freq, " +
            "round(quantile_cont(n, 0.99), 2) AS p99_freq, " +
            "round(quantile_cont(n, 0.5), 2) AS median_freq, " +
            "round(max(n) / round(quantile_cont(n, 0.5), 2), 4) " +
            "AS skew_ratio, " +
            "round(top8 / CAST(sum(n) AS DOUBLE), 6) AS top8_share, " +
            "max(n) * 32 > CAST(sum(n) AS BIGINT) AS needs_salting " +
            "FROM c, t GROUP BY top8)"
        block("events", "user_id") + " UNION ALL " +
          block("lineitem", "l_orderkey") + " UNION ALL " +
          block("orders", "o_custkey")
      },
    "q280_sentiment" ->
      // integer lexicon fold per doc, |sources|-grain rollup; sums CAST
      // AS BIGINT (HUGEINT rule); the one mean rounds to 4 dp
      ("WITH sc AS (SELECT source, CAST(coalesce(list_sum(" +
        "list_transform(list_filter(string_split(lower(text), ' '), " +
        "x -> x <> ''), t -> CASE WHEN t = 'fast' OR t = 'big' THEN 1 " +
        "WHEN t = 'slow' OR t = 'small' THEN -1 ELSE 0 END)), 0) " +
        "AS BIGINT) AS score FROM documents) " +
        "SELECT source, count(*) AS n_docs, " +
        "CAST(sum(CASE WHEN score > 0 THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS n_pos, " +
        "CAST(sum(CASE WHEN score < 0 THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS n_neg, " +
        "CAST(sum(CASE WHEN score = 0 THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS n_neutral, CAST(sum(score) AS BIGINT) AS total_score, " +
        "round(CAST(sum(score) AS DOUBLE) / count(*), 4) AS mean_score " +
        "FROM sc GROUP BY 1"),
    "q281_ivf_probe_curve" ->
      // exact columns from the q30 brute-force truth (panel size, truth
      // pair count, DECIMAL mean top-1 sim); the two booleans hold by
      // construction (nested probe sets / the committed NProbe bound)
      ("WITH bf AS (SELECT query_id, sim, rk FROM (" +
        "SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id, " +
        "round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), " +
        "CAST(v.embedding AS DOUBLE[])), 6) AS sim, " +
        "CAST(row_number() OVER (PARTITION BY q.vec_id ORDER BY " +
        "round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), " +
        "CAST(v.embedding AS DOUBLE[])), 6) DESC, v.vec_id) AS INT) " +
        "AS rk FROM embeddings q JOIN embeddings v " +
        "ON q.vec_id <> v.vec_id WHERE q.vec_id % (SELECT greatest(100, (count(*) + 127) // 128) FROM embeddings) = 0) " +
        "WHERE rk <= 5), " +
        "st AS (SELECT CAST(count(DISTINCT query_id) AS BIGINT) " +
        "AS n_queries, count(*) AS truth_pairs, " +
        "round(CAST(avg(CASE WHEN rk = 1 THEN " +
        "CAST(sim AS DECIMAL(18,6)) END) AS DOUBLE), 6) " +
        "AS mean_true_top1 FROM bf) " +
        "SELECT v AS nprobe, n_queries, truth_pairs, mean_true_top1, " +
        "true AS recall_nondecreasing, true AS recall_ok " +
        "FROM st, (VALUES (1), (2), (4), (6)) s(v)"),
    "q282_sq8_distortion" ->
      // closed-form quantizer mirrored op-for-op (q216 discipline);
      // errors quantize to 12 dp before the DECIMAL sum; mse rounds to 9
      ("WITH xs AS (SELECT unnest(range(0, len(emb))) AS dim, " +
        "unnest(emb) AS x FROM (SELECT CAST(embedding AS DOUBLE[]) " +
        "AS emb FROM embeddings)), " +
        "mm AS (SELECT dim, min(x) AS mn, max(x) AS mx FROM xs " +
        "GROUP BY 1), " +
        "e AS (SELECT xs.dim, mn, mx, round(abs(x - (CASE " +
        "WHEN mx > mn THEN mn + (least(floor((x - mn) / (mx - mn) " +
        "* 256), 255) + 0.5) * (mx - mn) / 256 ELSE mn END)), 12) " +
        "AS e FROM xs JOIN mm ON xs.dim = mm.dim) " +
        "SELECT dim, mn, mx, max(e) AS max_abs_err, " +
        "round(CAST(sum(CAST(round(e * e, 12) AS DECIMAL(30,12))) " +
        "AS DOUBLE) / count(*), 9) AS mse, " +
        "max(e) <= (mx - mn) / 256 / 2 + 1e-12 AS within_bound " +
        "FROM e GROUP BY 1, 2, 3"),
    "q283_pack_efficiency" ->
      // exact integer example/waste accounting; the one ratio rounds
      // to 6; sums CAST AS BIGINT (HUGEINT rule)
      ("WITH t AS (SELECT CAST(len(list_filter(string_split(text, ' '), " +
        "x -> x <> '')) AS BIGINT) AS ntok FROM documents), " +
        "a AS (SELECT count(*) AS n_docs, " +
        "CAST(sum(ntok + 1) AS BIGINT) AS stream_tokens, " +
        "CAST(sum((ntok + 512) // 512) AS BIGINT) AS padded_examples " +
        "FROM t WHERE ntok >= 1) " +
        "SELECT CAST(512 AS BIGINT) AS context_len, n_docs, " +
        "stream_tokens, (stream_tokens + 511) // 512 " +
        "AS packed_examples, padded_examples, " +
        "(stream_tokens + 511) // 512 * 512 - stream_tokens " +
        "AS packed_waste, " +
        "padded_examples * 512 - stream_tokens AS padded_waste, " +
        "round(1.0 - ((stream_tokens + 511) // 512) / " +
        "CAST(padded_examples AS DOUBLE), 6) AS example_savings FROM a"),
    "q284_fuzzy_phone_linkage" ->
      // same corpus construction (phone book + deterministic deletion
      // aliases at key+10^7), then brute-force levenshtein — the
      // kernel's PassJoin output must be identical
      ("WITH ph AS (SELECT c_custkey, " +
        "lpad(CAST((c_custkey // 10000) % 100 AS VARCHAR), 2, '0') || '-' || " +
        "lpad(CAST((c_custkey * 313) % 1000 AS VARCHAR), 3, '0') || '-' || " +
        "lpad(CAST((c_custkey * 677) % 1000 AS VARCHAR), 3, '0') || '-' || " +
        "lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') AS phone " +
        "FROM customer), " +
        "base AS (SELECT c_custkey AS key, phone AS name FROM ph), " +
        "dirty AS (SELECT c_custkey + 10000000 AS key, " +
        "concat(substr(phone, 1, CAST(c_custkey % 12 AS INT)), " +
        "substr(phone, CAST(c_custkey % 12 + 2 AS INT))) AS name " +
        "FROM ph WHERE c_custkey % 20 = 0), " +
        "n AS (SELECT * FROM base UNION ALL SELECT * FROM dirty) " +
        "SELECT a.key AS key_a, b.key AS key_b, " +
        "CAST(levenshtein(a.name, b.name) AS INT) AS dist " +
        "FROM n a JOIN n b ON a.key < b.key " +
        "WHERE levenshtein(a.name, b.name) <= 1"),
    // corpus + dHash arithmetic rebuilt in SQL; brute-force HUGEINT
    // xor/bit_count pair join — the Spark side must match bit-for-bit
    // through the full render→encode→decode→hash path
    "q285_image_neardup_pairs" ->
      graft.multimodal.ImageNeardup.PairsOracleSql,
    "q286_image_neardup_apply" ->
      graft.multimodal.ImageNeardup.ApplyOracleSql,
    // the 256-bit scale-path hash: four HUGEINT words, summed bit_count
    "q287_image_neardup_wide" ->
      graft.multimodal.ImageNeardup.WideOracleSql,
    // audio: PCM synth + Haitsma-Kalker band-energy sign bits rebuilt in
    // SQL; the Spark side must match bit-for-bit through the full
    // synth→WAV-encode→decode→fingerprint path on every clip
    "q288_audio_neardup_pairs" ->
      graft.multimodal.AudioNeardup.PairsOracleSql,
    "q289_audio_neardup_apply" ->
      graft.multimodal.AudioNeardup.ApplyOracleSql,
    "q290_audio_neardup_wide" ->
      graft.multimodal.AudioNeardup.WideOracleSql,
    // video: per-(doc,frame) md5 luma grids rebuilt in SQL, per-frame
    // dHash words brute-forced; the Spark side must match bit-for-bit
    // through render→frame-encode→container→decode→hash on every arm
    "q291_video_neardup_pairs" ->
      graft.multimodal.VideoNeardup.PairsOracleSql,
    "q292_video_neardup_apply" ->
      graft.multimodal.VideoNeardup.ApplyOracleSql,
    // the animated-GIF89a container (round 12): the fingerprint
    // contract is container-independent — same per-(doc,frame) luma
    // grids, same planted variants — so the oracle SQL is q291/q292's
    // VERBATIM while the Spark side goes through multi-frame GIF
    // encode → strict composed decode → per-frame hash; a container
    // or composition bug diverges the hashes and fails this gate
    "q293_video_neardup_gif" ->
      graft.multimodal.VideoNeardup.PairsOracleSql,
    "q294_video_neardup_gif_apply" ->
      graft.multimodal.VideoNeardup.ApplyOracleSql,
    // the MJPEG (lossy) container (round 13): DuckDB cannot run a JPEG
    // decode, so the oracle is the round-6 invariant pattern — the
    // no-tie margin corpus pins the detected pair set to EXACTLY the
    // planted set, which IS pure SQL over documents; a quantization
    // bit-flip breaking the margin (false or missed pair) diverges the
    // rows and fails this gate
    "q295_video_neardup_mjpeg" ->
      graft.multimodal.VideoNeardup.MjpegPairsOracleSql,
    "q296_video_neardup_mjpeg_apply" ->
      graft.multimodal.VideoNeardup.MjpegApplyOracleSql,
  )
}
