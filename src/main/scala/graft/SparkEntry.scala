package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.analytics.Olap
import graft.imaging.ImagingOps
import graft.ops.{DedupOps, EventOps, TextOps, VectorOps}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ImagingOps.globalMeta(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "img_dataset_search" -> (ImagingOps.datasetSearch(_, _)),
    "img_serial_datetime" -> (ImagingOps.serialDatetime(_, _)),
    "img_frames_subset" -> (ImagingOps.framesSubset(_, _)),
    "img_frames_meta" -> (ImagingOps.framesMeta(_, _)),
    "img_filenames" -> (ImagingOps.filenames(_, _)),
    "img_global_meta" -> (ImagingOps.globalMeta(_, _)),
    "img_meta_search" -> (ImagingOps.metaSearch(_, _)),
    "img_meta_values" -> (ImagingOps.metaValues(_, _)),
    "img_uniqueness" -> (ImagingOps.uniqueness(_, _)),
    "img_lineage" -> (ImagingOps.lineage(_, _)),
    "img_sha_dedup" -> (ImagingOps.shaDedup(_, _)),
    "img_frame_gaps" -> (ImagingOps.frameGaps(_, _)),
    "img_parse_sms_name" -> (ImagingOps.parseSmsName(_, _)),
    "img_parse_sms_channel" -> (ImagingOps.parseSmsChannel(_, _)),
    "img_meta_validate" -> (ImagingOps.metaValidate(_, _)),
    "img_storage_report" -> (ImagingOps.storageReport(_, _)),
    "q1_pricing" -> (Olap.q1Pricing(_, _)),
    "q3_topk" -> (Olap.q3Topk(_, _)),
    "q5_region_join" -> (Olap.q5RegionJoin(_, _)),
    "q6_forecast" -> (Olap.q6Forecast(_, _)),
    "q_percentiles" -> (Olap.qPercentiles(_, _)),
    "q10_returns" -> (Olap.q10Returns(_, _)),
    "q4_priority" -> (Olap.q4Priority(_, _)),
    "q7_volume" -> (Olap.q7Volume(_, _)),
    "q18_large" -> (Olap.q18Large(_, _)),
    "q8_share" -> (Olap.q8Share(_, _)),
    "q9_profit" -> (Olap.q9Profit(_, _)),
    "q12_latency" -> (Olap.q12Latency(_, _)),
    "q13_cust_dist" -> (Olap.q13CustDist(_, _)),
    "q14_promo" -> (Olap.q14Promo(_, _)),
    "q15_top_supplier" -> (Olap.q15TopSupplier(_, _)),
    "q17_small_qty" -> (Olap.q17SmallQty(_, _)),
    "q19_disjunction" -> (Olap.q19Disjunction(_, _)),
    "q21_waiting" -> (Olap.q21Waiting(_, _)),
    "q22_idle" -> (Olap.q22Idle(_, _)),
    "q2_min_cost" -> (Olap.q2MinCost(_, _)),
    "q_cube" -> (Olap.qCube(_, _)),
    "events_pareto" -> (EventOps.eventsPareto(_, _)),
    "emb_ivf_balance" -> (VectorOps.ivfBalance(_, _)),
    "q11_important_value" -> (Olap.q11ImportantValue(_, _)),
    "q16_supplier_cnt" -> (Olap.q16SupplierCnt(_, _)),
    "q20_dominant_supplier" -> (Olap.q20DominantSupplier(_, _)),
    "q_sketch_quantile" -> (Olap.qSketchQuantile(_, _)),
    "img_channel_overlap" -> (ImagingOps.channelOverlap(_, _)),
    "img_lineage_depth" -> (ImagingOps.lineageDepth(_, _)),
    "img_storage_rollup" -> (ImagingOps.storageRollup(_, _)),
    "img_dataset_growth" -> (ImagingOps.datasetGrowth(_, _)),
    "events_seasonality" -> (EventOps.eventsSeasonality(_, _)),
    "win_running" -> (Olap.winRunning(_, _)),
    "win_moving_range" -> (Olap.winMovingRange(_, _)),
    "q_corr" -> (Olap.qCorr(_, _)),
    "events_window" -> (EventOps.eventsWindow(_, _)),
    "events_sessions" -> (EventOps.eventsSessions(_, _)),
    "doc_exact_dedup" -> (DedupOps.exactDedup(_, _)),
    "doc_minhash_lsh" -> (DedupOps.minhashLsh(_, _)),
    "doc_simhash" -> (DedupOps.simhash(_, _)),
    "doc_ngram_jaccard" -> (DedupOps.ngramJaccard(_, _)),
    "doc_ngram_block_census" -> (DedupOps.ngramJaccardCensus(_, _)),
    "doc_ngram_banded" -> (DedupOps.ngramJaccardBanded(_, _)),
    "doc_ngram_probe" -> (DedupOps.ngramBandedProbe(_, _)),
    "doc_containment" -> (DedupOps.containmentPairs(_, _)),
    "doc_containment_residue" -> (DedupOps.containmentResidue(_, _)),
    "doc_containment_keep_best" -> (DedupOps.containmentKeepBest(_, _)),
    "doc_containment_health" -> (DedupOps.containmentHealth(_, _)),
    "doc_text_stats" -> (TextOps.textStats(_, _)),
    "doc_lang_id" -> (TextOps.langId(_, _)),
    "doc_fingerprint" -> (TextOps.fingerprint(_, _)),
    "emb_knn_brute" -> (VectorOps.knnBrute(_, _)),
    "emb_knn_ivf" -> (VectorOps.knnIvf(_, _)),
    "emb_norm_stats" -> (VectorOps.normStats(_, _)),
    "doc_vec_integrity" -> (VectorOps.docVecIntegrity(_, _)),
    "img_validate_id" -> (ImagingOps.validateId(_, _)),
    "img_stack_positions" -> (ImagingOps.stackPositions(_, _)),
    "img_parse_ml_name" -> (ImagingOps.parseMlName(_, _)),
    "events_props_json" -> (EventOps.propsJson(_, _)),
    "events_asof" -> (EventOps.eventsAsof(_, _)),
    "doc_token_regex" -> (TextOps.tokenRegex(_, _)),
    "doc_fertility" -> (TextOps.fertility(_, _)),
    "doc_quality_vs_dup" -> (TextOps.qualityVsDup(_, _)),
    "emb_near_dup" -> (VectorOps.embNearDup(_, _)),
    "emb_near_dup_multiprobe" -> (VectorOps.embNearDupMultiProbe(_, _)),
    "emb_near_dup_probe_curve" -> (VectorOps.embNearDupProbeCurve(_, _)),
    "emb_pq_codes" -> (VectorOps.pqCodes(_, _)),
    "emb_knn_pq" -> (VectorOps.knnPq(_, _)),
    "events_funnel" -> (EventOps.eventsFunnel(_, _)),
    "events_window_funnel" -> (EventOps.eventsWindowFunnel(_, _)),
    "events_resample" -> (EventOps.eventsResample(_, _)),
    "events_dau_wau" -> (EventOps.eventsDauWau(_, _)),
    "events_transitions" -> (EventOps.eventsTransitions(_, _)),
    "events_markov_stationary" ->
      (EventOps.eventsMarkovStationary(_, _)),
    "doc_zipf" -> (TextOps.zipfTokens(_, _)),
    "events_retention" -> (EventOps.eventsRetention(_, _)),
    "events_dropoff" -> (EventOps.eventsDropoff(_, _)),
    "img_channel_pivot" -> (ImagingOps.channelPivot(_, _)),
    "doc_stratified_sample" -> (TextOps.stratifiedSample(_, _)),
    "doc_len_histogram" -> (TextOps.lenHistogram(_, _)),
    "doc_top_per_source" -> (TextOps.topPerSource(_, _)),
    "doc_quality_gate" -> (TextOps.qualityGate(_, _)),
    "doc_tfidf" -> (TextOps.tfidf(_, _)),
    "emb_kmeans_train" -> (VectorOps.kmeansTrain(_, _)),
    "emb_kmeans_inertia" -> (VectorOps.kmeansInertia(_, _)),
    "emb_knn_trained" -> (VectorOps.knnTrained(_, _)),
    "emb_codebook_recall" -> (VectorOps.codebookRecall(_, _)),
    "doc_bpe_train" -> (TextOps.bpeTrain(_, _)),
    "doc_fertility_trained" -> (TextOps.fertilityTrained(_, _)),
    "doc_bpe_vocab" -> (TextOps.bpeVocab(_, _)),
    "emb_knn_truncated" -> (VectorOps.knnTruncated(_, _)),
    "emb_truncate_curve" -> (VectorOps.truncateCurve(_, _)),
    "emb_truncated_recall" -> (VectorOps.truncatedRecall(_, _)),
    "doc_nb_lang" -> (TextOps.nbLang(_, _)),
    "doc_nb_margin" -> (TextOps.nbMargin(_, _)),
    "doc_nb_features" -> (TextOps.nbFeatures(_, _)),
    "doc_bm25_topk" -> (TextOps.bm25TopK(_, _)),
    "doc_bm25_maxscore" -> (TextOps.bm25MaxScore(_, _)),
    "doc_bm25_maxscore_stored" ->
      (graft.sources.TermIndexStore.searchMaxScoreFor(_, _)),
    "doc_bm25_pruned" -> (TextOps.bm25Pruned(_, _)),
    "doc_bm25_recall" -> (TextOps.bm25Recall(_, _)),
    "doc_bm25_recall_curve" -> (TextOps.bm25RecallCurve(_, _)),
    "doc_hybrid_topk" -> (TextOps.hybridTopK(_, _)),
    "doc_hybrid_ivf" -> (TextOps.hybridTopKIvf(_, _)),
    "doc_hybrid_stored" -> (TextOps.hybridTopKStored(_, _)),
    "doc_hybrid_exact_stored" -> (TextOps.hybridTopKExactStored(_, _)),
    "doc_hybrid_refined_stored" ->
      (TextOps.hybridTopKRefinedStored(_, _)),
    "doc_hybrid_recall" -> (TextOps.hybridRecall(_, _)),
    "doc_bpe_pairs" -> (TextOps.bpePairs(_, _)),
    "doc_bpe_merge_step" -> (TextOps.bpeMergeStep(_, _)),
    "doc_dup_clusters" -> (DedupOps.dupClusters(_, _)),
    "doc_dedup_pipeline" -> (DedupOps.dedupPipeline(_, _)),
    "doc_minhash_recall" -> (DedupOps.minhashRecall(_, _)),
    "doc_source_overlap" -> (DedupOps.sourceOverlap(_, _)),
    "doc_lsh_health" -> (DedupOps.lshHealth(_, _)),
    "doc_source_unique" -> (DedupOps.sourceUnique(_, _)),
    "doc_decontaminate" -> (DedupOps.decontaminate(_, _)),
    "doc_repetition" -> (TextOps.repetition(_, _)),
    "doc_unigram_logprob" -> (TextOps.unigramLogprob(_, _)),
    "doc_hash_sample" -> (TextOps.hashSample(_, _)),
    "doc_chunk_dedup" -> (DedupOps.chunkDedup(_, _)),
    "doc_span_dedup" -> (DedupOps.spanDedup(_, _)),
    "doc_winnow" -> (TextOps.winnow(_, _)),
    "doc_bloom_dedup" -> (DedupOps.bloomDedup(_, _)),
    "doc_token_entropy" -> (TextOps.tokenEntropy(_, _)),
    "events_rfm" -> (EventOps.eventsRfm(_, _)),
    "emb_knn_sq8" -> (VectorOps.knnSq8(_, _)),
    "events_paths" -> (EventOps.eventsPaths(_, _)),
    "doc_survival_funnel" -> (DedupOps.survivalFunnel(_, _)),
    "doc_funnel_tokens" -> (DedupOps.funnelTokens(_, _)),
    "doc_domain_census" -> (DedupOps.domainCensus(_, _)),
    "doc_zipf_slope" -> (TextOps.zipfSlope(_, _)),
    "events_conversion_lag" -> (EventOps.eventsConversionLag(_, _)),
    "doc_dedup_inflation" -> (DedupOps.dedupInflation(_, _)),
    "doc_minhash_band_tune" -> (DedupOps.minhashBandTune(_, _)),
    "doc_perplexity_outliers" -> (TextOps.perplexityOutliers(_, _)),
    "emb_norm_outliers" -> (VectorOps.normOutliers(_, _)),
    "emb_ood_outliers" -> (VectorOps.oodOutliers(_, _)),
    "emb_recall_ladder" -> (VectorOps.recallLadder(_, _)),
    "emb_recall_ladder_opq" -> (VectorOps.recallLadderOpq(_, _)),
    "doc_hash_collision_audit" -> (DedupOps.hashCollisionAudit(_, _)),
    "emb_cell_purity" -> (VectorOps.cellPurity(_, _)),
    "events_new_vs_returning" -> (EventOps.eventsNewVsReturning(_, _)),
    "events_user_lifecycle" -> (EventOps.eventsUserLifecycle(_, _)),
    "events_power_law" -> (EventOps.eventsPowerLaw(_, _)),
    "emb_centroid_shift" -> (VectorOps.centroidShift(_, _)),
    "doc_ngram_coverage" -> (DedupOps.ngramCoverage(_, _)),
    "emb_label_margin" -> (VectorOps.labelMargin(_, _)),
    "doc_bigram_logprob" -> (TextOps.bigramLogprob(_, _)),
    "doc_dsir_weights" -> (TextOps.dsirWeights(_, _)),
    "doc_source_kl" -> (TextOps.sourceKl(_, _)),
    "events_type_entropy" -> (EventOps.eventsTypeEntropy(_, _)),
    "events_forecast_eval" -> (EventOps.eventsForecastEval(_, _)),
    "img_dataset_overlap" -> (ImagingOps.datasetOverlap(_, _)),
    "emb_hard_negatives" -> (VectorOps.hardNegatives(_, _)),
    "emb_hard_negatives_ivf" -> (VectorOps.hardNegativesIvf(_, _)),
    "emb_hn_ivf_recall" -> (VectorOps.hardNegativesRecall(_, _)),
    "emb_knn_classify" -> (VectorOps.knnClassify(_, _)),
    "emb_knn_classify_ivf" -> (VectorOps.knnClassifyIvf(_, _)),
    "emb_classify_ivf_recall" -> (VectorOps.knnClassifyRecall(_, _)),
    "doc_paraphrase_mining" -> (VectorOps.paraphraseCandidates(_, _)),
    "doc_paraphrase_mining_ivf" -> (VectorOps.paraphraseCandidatesIvf(_, _)),
    "doc_domain_clusters" -> (VectorOps.domainClusters(_, _)),
    "doc_dedup_keep_best" -> (DedupOps.dedupKeepBest(_, _)),
    "doc_paraphrase_ivf_recall" -> (VectorOps.paraphraseRecall(_, _)),
    "emb_pq_distortion" -> (VectorOps.pqDistortion(_, _)),
    "emb_dim_stats" -> (VectorOps.dimStats(_, _)),
    "emb_dim_corr" -> (VectorOps.dimCorr(_, _)),
    "emb_opq_rotation" -> (VectorOps.opqRotations(_, _)),
    "doc_pruning_manifest" -> (VectorOps.pruningManifest(_, _)),
    "doc_pruning_census" -> (VectorOps.pruningCensus(_, _)),
    "doc_pruning_quality" -> (VectorOps.pruningQuality(_, _)),
    "emb_opq_distortion" -> (VectorOps.opqDistortion(_, _)),
    "emb_opq_sweep" -> (VectorOps.opqSweep(_, _)),
    "emb_knn_opq" -> (VectorOps.knnOpq(_, _)),
    "emb_knn_opq_indexed" ->
      (graft.sources.VectorIndex.searchForRotated(_, _)),
    "doc_mix_weights" -> (TextOps.mixWeights(_, _)),
    "emb_nprobe_curve" -> (VectorOps.nprobeCurve(_, _)),
    "emb_ivf_nlist_sweep" -> (VectorOps.ivfNlistSweep(_, _)),
    "doc_winnow_overlap" -> (TextOps.winnowOverlap(_, _)),
    "emb_semdedup" -> (VectorOps.semDedup(_, _)),
    "emb_knn_graph" -> (VectorOps.knnGraph(_, _)),
    "emb_semdedup_probe" -> (VectorOps.semDedupProbe(_, _)),
    "emb_semdedup_recall" -> (VectorOps.semDedupRecall(_, _)),
    "emb_semdedup_clusters" -> (VectorOps.semDedupClusters(_, _)),
    "emb_prototype_prune" -> (VectorOps.prototypePrune(_, _)),
    "emb_knn_graph_probe" -> (VectorOps.knnGraphProbe(_, _)),
    "emb_knn_graph_topk" -> (VectorOps.knnGraphTopK(_, _)),
    "emb_knn_graph_recall" -> (VectorOps.knnGraphRecall(_, _)),
    "emb_knn_graph_probe_curve" -> (VectorOps.knnGraphProbeCurve(_, _)),
    "events_sliding" -> (EventOps.eventsSliding(_, _)),
    "doc_shard_stats" -> (TextOps.shardStats(_, _)),
    "doc_pack_stats" -> (TextOps.packStats(_, _)),
    "emb_kmeans_step" -> (VectorOps.kmeansStep(_, _)),
    "emb_knn_ivfpq" -> (VectorOps.knnIvfPq(_, _)),
    "emb_ann_recall" -> (VectorOps.annRecall(_, _)),
    "emb_knn_refine" -> (VectorOps.knnRefine(_, _)),
    "emb_knn_refine_indexed" ->
      (graft.sources.VectorIndex.searchRefineFor(_, _)),
    "emb_refine_recall" -> (VectorOps.refineRecall(_, _)),
    "emb_refine_depth_curve" -> (VectorOps.refineDepthCurve(_, _)),
    "emb_gram_power" -> (VectorOps.gramPower(_, _)),
    "events_anomaly" -> (EventOps.eventsAnomaly(_, _)),
    "events_inter_arrival" -> (EventOps.eventsInterArrival(_, _)),
    "events_range_join" -> (EventOps.eventsRangeJoin(_, _)),
    "events_journey_digest" -> (EventOps.eventsJourneyDigest(_, _)),
    "events_session_topk" -> (EventOps.eventsSessionTopk(_, _)),
    "events_cohort_ltv" -> (EventOps.eventsCohortLtv(_, _)),
    "events_attribution" -> (EventOps.eventsAttribution(_, _)),
    "doc_ccnet_buckets" -> (TextOps.ccnetBuckets(_, _)),
    // the declared 100 TB CCNet path itself under the oracle: KLL cut
    // in its exact regime (k = 2^17 > verify-scale doc count, so the
    // sketch quantile is the sorted-rank element) — no exact
    // percentile anywhere in this plan
    "doc_ccnet_sketched" ->
      ((s, dir) => TextOps.ccnetBucketsSketched(s, dir, k = 1 << 17)),
    "doc_pii_scrub" -> (TextOps.piiScrub(_, _)),
    "img_payload_stats" ->
      (graft.multimodal.BinaryFrames.payloadStats(_, _)),
    "img_intensity_drift" ->
      (graft.multimodal.BinaryFrames.intensityDrift(_, _)),
    "img_focus_rank" ->
      (graft.multimodal.BinaryFrames.focusRank(_, _)),
    "img_channel_crosstalk" ->
      (graft.multimodal.BinaryFrames.channelCrosstalk(_, _)),
    "img_payload_stats_rgb" ->
      (graft.multimodal.BinaryFrames.payloadStatsRgb(_, _)),
    "img_pixel_histogram" ->
      (graft.multimodal.BinaryFrames.pixelHistogram(_, _)),
    "img_saturation" ->
      (graft.multimodal.BinaryFrames.saturationQc(_, _)),
    "img_z_profile" ->
      (graft.multimodal.BinaryFrames.zProfile(_, _)),
    "aud_waveform_stats" ->
      (graft.multimodal.BinaryAudio.waveformStats(_, _)),
    "aud_activity_windows" ->
      (graft.multimodal.BinaryAudio.activityWindows(_, _)),
    "vid_scene_cuts" ->
      (graft.multimodal.BinaryFrames.sceneCuts(_, _)),
    "vid_keyframes" ->
      (graft.multimodal.BinaryFrames.keyframes(_, _)),
    // persisted-store twins: identical results (and oracles) to their
    // inline operators, but the corpus side reads a bucketed table —
    // the timing evidence behind the zero-exchange plan claims. Builds
    // are amortized once per JVM (Bench warms them before timing).
    "doc_exact_dedup_bucketed" ->
      (graft.sources.DocumentStore.dupGroupsFor(_, _)),
    "doc_bm25_topk_stored" ->
      (graft.sources.TermIndexStore.searchFor(_, _)),
    "doc_bm25_pruned_stored" ->
      (graft.sources.TermIndexStore.searchPrunedFor(_, _)),
    "emb_knn_ivfpq_indexed" ->
      (graft.sources.VectorIndex.searchFor(_, _)),
    // decode-once FrameStats twins: the 9 imaging-QC queries off ONE
    // persisted decode pass instead of a full-corpus PNG decode each
    "img_payload_stats_stored" ->
      (graft.sources.FrameStats.payloadStatsStored(_, _)),
    "img_intensity_drift_stored" ->
      (graft.sources.FrameStats.intensityDriftStored(_, _)),
    "img_focus_rank_stored" ->
      (graft.sources.FrameStats.focusRankStored(_, _)),
    "img_channel_crosstalk_stored" ->
      (graft.sources.FrameStats.channelCrosstalkStored(_, _)),
    "img_payload_stats_rgb_stored" ->
      (graft.sources.FrameStats.payloadStatsRgbStored(_, _)),
    "img_pixel_histogram_stored" ->
      (graft.sources.FrameStats.pixelHistogramStored(_, _)),
    "img_saturation_stored" ->
      (graft.sources.FrameStats.saturationQcStored(_, _)),
    "img_z_profile_stored" ->
      (graft.sources.FrameStats.zProfileStored(_, _)),
    "vid_scene_cuts_stored" ->
      (graft.sources.FrameStats.sceneCutsStored(_, _)),
    "vid_keyframes_stored" ->
      (graft.sources.FrameStats.keyframesStored(_, _)),
    // the composite per-dataset QC report: five exposure metrics off
    // ONE stored read (the decode-once table's clearest payoff)
    "img_dataset_qc_summary" ->
      (graft.sources.FrameStats.datasetQcSummary(_, _)),
    // decode-once AudioStats twins: the two audio QCs off ONE
    // persisted WAV-decode pass (FrameStats' mold on the audio side)
    "aud_waveform_stats_stored" ->
      (graft.sources.AudioStats.waveformStatsStored(_, _)),
    "aud_activity_windows_stored" ->
      (graft.sources.AudioStats.activityWindowsStored(_, _)),
    // the streamed stats store's monitoring read: per-(dataset, arrival
    // batch) mean intensity vs the cumulative prior mean, decode-free
    "img_stats_drift" ->
      (graft.streaming.ImgStream.statsDriftFor(_, _)),
  )

  /** For each key in queries, equivalent SQL runnable by DuckDB on the
    * same parquet tables. Omitted keys get a rows-only check.
    */
  def oracleSql: Map[String, String] = Oracles.all
}
