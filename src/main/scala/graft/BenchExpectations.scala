package graft

/** Checked-in per-query bench expectations (seconds at sf0.1, local[32],
  * min-of-2 after warmup, caches released per query) — [[Bench]] compares
  * each measured query against its expectation and REPORTS (never fails
  * on: the artifact must survive a slow box) a >[[RegressionFactor]]x
  * regression, so round-over-round performance claims are carried by the
  * harness instead of reconstructed from old logs. Queries added after
  * this snapshot simply have no entry and are not regression-checked
  * until the snapshot is refreshed.
  *
  * Refresh by pasting the `queries` object of a trusted bench run — one
  * run with NOTHING else on the machine: a concurrent sbt/test JVM
  * measurably inflates timings (round 4 saw 2-4x phantom "regressions"
  * from exactly that).
  *
  * Current snapshot: round-9 clean solo run under the off-clock-release
  * protocol (release between timers, warmup pass, min-of-2), all 117
  * queries (pl8 from a targeted solo run under the same contract) —
  * measured under the SAME contract the harness applies, so regression
  * factors are apples-to-apples.
  */
object BenchExpectations {
  val RegressionFactor = 2.0

  /** A regression must also exceed the baseline by this absolute slack:
    * the factor alone flags 0.2s->0.5s box jitter on cheap queries, while
    * a pure absolute floor (round 4 used 0.75s) exempts the majority of
    * the suite from any coverage. Relative-AND-absolute keeps sub-second
    * queries checked (0.2s->0.8s still flags: 4x and +0.6s) without
    * flagging weather. */
  val AbsSlackSec = 0.5

  /** No measurement below this ever flags, whatever its factor: sub-second
    * queries sit at the scheduler-noise floor — a 0.3s query landing at
    * 0.7s on a busy box is weather, not a plan regression (round 8's p18
    * flag was exactly this). Queries whose EXPECTATION is sub-second stay
    * covered — a real regression pushes the measurement past the floor
    * (0.3s → 1.0s flags: 3.3x, +0.7s, and above the floor). */
  val MinFlagSec = 0.75

  val secondsAtSf01: Map[String, Double] = Map(
    "a10_reconcile" -> 0.4866,
    "a11_percentiles" -> 0.9517,
    "a12_rollup" -> 0.5283,
    "a13_group_stats" -> 0.478,
    "a14_profile" -> 0.9664,
    "a15_cube" -> 0.5984,
    "a16_incremental_agg" -> 0.6008,
    "a17_quality_checks" -> 0.5242,
    "a18_group_mode" -> 0.3976,
    "a1_group_sum" -> 0.3993,
    "a3_cycle_breakdown" -> 0.302,
    "a4_conditional_pivot" -> 0.6854,
    "a7_distinct_values" -> 0.264,
    "a8_global_stats" -> 0.3549,
    "d1_amount_bins" -> 0.2998,
    "d2_company_type" -> 0.3325,
    "d3_party_pivot" -> 0.6407,
    "d4_composite_key" -> 0.183,
    "j1_lookup_join" -> 0.5374,
    "j2_anti_join" -> 0.4281,
    "j2_dedup_keepfirst" -> 1.6218,
    "j3_asof_join" -> 0.9541,
    "j4_range_join" -> 0.9994,
    "j5_upsert_merge" -> 0.4776,
    "j6_scd2" -> 0.6298,
    "j7_salted_join" -> 0.9436,
    "j8_bloom_join" -> 0.7125,
    "join_q10_returns" -> 0.7928,
    "join_q18_big_orders" -> 0.7896,
    "join_q3_revenue" -> 1.0654,
    "join_q5_nation_revenue" -> 1.2887,
    "p11_iso8601" -> 0.5587,
    "p14_pushdown_filter" -> 0.4396,
    "p18_json_extract" -> 0.5714,
    "p2_normalize_dropnull" -> 0.3287,
    "p3_clean_normalize" -> 0.22,
    "p5_name_coercion" -> 0.6579,
    "p8_null_fill" -> 0.4045,
    "p9_metadata" -> 0.2606,
    "pl1_csv_pipeline" -> 2.2954,
    "pl2_sql_pipeline" -> 0.9219,
    "pl3_realtime_pipeline" -> 2.0957,
    "pl4_issues_pipeline" -> 0.7707,
    "pl5_curation_pipeline" -> 3.5194,
    "pl6_events_pipeline" -> 1.6002,
    "pl7_corpus_report" -> 1.3601,
    "pl8_nightly_ingest" -> 6.1477,
    "pl9_export_shards" -> 2.0909,
    "pl10_classifier_pipeline" -> 5.5826,
    "s10_tree_paths" -> 0.9913,
    "s11_dryrun" -> 0.2328,
    "s12_orc_scan" -> 0.922,
    "s13_json_scan" -> 0.4053,
    "s14_partitioned_scan" -> 0.8582,
    "s16_bucketed_join" -> 4.6720,
    "s17_zorder_scan" -> 1.6622,
    "s18_schema_evolution" -> 0.9302,
    "s19_compaction" -> 1.3791,
    "x52_leakage_safe_splits" -> 2.0098,
    "x53_quality_scores" -> 2.9732,
    "x54_jl_projection" -> 1.8546,
    "x55_jl_knn" -> 1.7232,
    "x56_weighted_sample" -> 0.5383,
    "s1_csv_scan" -> 0.8577,
    "s7_sink_roundtrip" -> 0.3762,
    "s8_batched_sink" -> 0.4303,
    "s9_tree_roundtrip" -> 0.2012,
    "t1_topk_rows" -> 0.1414,
    "t2_topk_groups" -> 0.2403,
    "u1_set_ops" -> 0.5849,
    "u2_unpivot" -> 0.4469,
    "w10_event_paths" -> 0.4935,
    "w11_time_to_convert" -> 0.6806,
    "w12_attribution" -> 0.499,
    "w1_tumbling_window" -> 0.404,
    "w2_sliding_window" -> 0.3594,
    "w3_session_window" -> 0.8065,
    "w4_window_rank" -> 0.4949,
    "w5_lag_cumsum" -> 0.6422,
    "w6_funnel" -> 0.687,
    "w7_retention" -> 0.6767,
    "w8_anomaly" -> 0.6189,
    "w8_rank_native" -> 0.3037,
    "w9_gapfill" -> 0.5961,
    "x0_exact_dedup" -> 0.2902,
    "x10_media_features" -> 0.4508,
    "x11_ivf_topk" -> 1.4065,
    "x12_chunk_neardups" -> 0.5688,
    "x13_token_chunks" -> 0.5723,
    "x14_fuzzy_names" -> 0.326,
    "x15_tfidf_top_term" -> 1.2379,
    "x16_ngram_jaccard" -> 1.2319,
    "x17_pii_scrub" -> 0.5124,
    "x18_simhash_neardups" -> 1.6712,
    "x19_stratified_sample" -> 0.3613,
    "x1_fingerprint" -> 0.2889,
    "x20_domain_cap" -> 0.272,
    "x21_decontaminate" -> 1.0699,
    "x22_int8_quant" -> 0.5781,
    "x23_train_shuffle" -> 0.246,
    "x24_sequence_pack" -> 0.4284,
    "x25_frame_sample" -> 0.3433,
    "x26_media_resize" -> 0.2864,
    "x27_quant_topk" -> 0.3704,
    "x28_dedup_clusters" -> 2.3251,
    "x29_repetition_metrics" -> 1.3705,
    "x2_quality_metrics" -> 0.8154,
    "x30_knn_join" -> 0.7603,
    "x31_vocab_stats" -> 0.5127,
    "x32_bigram_logprob" -> 1.5832,
    "x33_embed_clusters" -> 3.3396,
    "x34_span_dedup" -> 1.7488,
    "x35_semdedup" -> 2.9767,
    "x36_hybrid_rrf" -> 0.938,
    "x37_domain_mix" -> 0.7665,
    "x38_native_topk" -> 0.3093,
    "x39_incremental_neardups" -> 2.164,
    "x3_lang_id" -> 0.6379,
    "x40_perplexity_bins" -> 1.8171,
    "x41_indexed_screen" -> 2.6587,
    "x42_domain_mix_up" -> 1.0054,
    "x43_knn_native" -> 0.6855,
    "x44_temperature_mix" -> 1.2021,
    "x45_fuzzy_decontam" -> 2.0452,
    "x46_heavy_tokens" -> 0.8228,
    "x47_unicode_dedup" -> 0.9229,
    "x48_incremental_clusters" -> 7.6551,
    "x49_quality_features" -> 2.8046,
    "x50_train_split" -> 0.7215,
    "x51_corpus_drift" -> 0.7233,
    "x4_minhash_neardups" -> 1.1884,
    "x5_simhash" -> 1.4243,
    "x6_brute_topk" -> 0.2199,
    "x7_ann_topk" -> 0.2753,
    "x8_embed_neardups" -> 0.5995,
    "x9_token_stats" -> 0.5869)
}
