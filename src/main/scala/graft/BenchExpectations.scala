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
  * Current snapshot: round-9 CLOSING full-suite solo run under the
  * off-clock-release protocol (release between timers, warmup pass,
  * min-of-2) — all 148 queries from ONE coherent run (159.5s total,
  * zero regressions), measured under the SAME contract the harness
  * applies, so regression factors are apples-to-apples. x67/x68, added after, carry targeted
  * solo-run values.
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
    "a10_reconcile" -> 0.3651,
    "a11_percentiles" -> 0.8826,
    "a12_rollup" -> 0.6238,
    "a13_group_stats" -> 0.416,
    "a14_profile" -> 0.9432,
    "a15_cube" -> 0.5224,
    "a16_incremental_agg" -> 0.5836,
    "a17_quality_checks" -> 0.5238,
    "a18_group_mode" -> 0.4323,
    "a1_group_sum" -> 0.5082,
    "a3_cycle_breakdown" -> 0.2831,
    "a4_conditional_pivot" -> 0.6537,
    "a7_distinct_values" -> 0.2651,
    "a8_global_stats" -> 0.423,
    "d1_amount_bins" -> 0.2731,
    "d2_company_type" -> 0.296,
    "d3_party_pivot" -> 0.791,
    "d4_composite_key" -> 0.1909,
    "j1_lookup_join" -> 0.473,
    "j2_anti_join" -> 0.542,
    "j2_dedup_keepfirst" -> 1.64,
    "j3_asof_join" -> 0.8412,
    "j4_range_join" -> 0.9024,
    "j5_upsert_merge" -> 0.4632,
    "j6_scd2" -> 0.61,
    "j7_salted_join" -> 0.9922,
    "j8_bloom_join" -> 0.6856,
    "j9_snapshot_diff" -> 0.603,
    "join_q10_returns" -> 0.6891,
    "join_q18_big_orders" -> 0.6826,
    "join_q3_revenue" -> 0.8879,
    "join_q5_nation_revenue" -> 1.0632,
    "p11_iso8601" -> 0.4782,
    "p14_pushdown_filter" -> 0.335,
    "p18_json_extract" -> 0.5491,
    "p2_normalize_dropnull" -> 0.2387,
    "p3_clean_normalize" -> 0.1779,
    "p5_name_coercion" -> 0.5279,
    "p8_null_fill" -> 0.289,
    "p9_metadata" -> 0.176,
    "pl10_classifier_pipeline" -> 5.8833,
    "pl11_dsir_pipeline" -> 5.1063,
    "pl1_csv_pipeline" -> 2.0127,
    "pl2_sql_pipeline" -> 0.8191,
    "pl3_realtime_pipeline" -> 1.5346,
    "pl4_issues_pipeline" -> 0.6223,
    "pl5_curation_pipeline" -> 3.2611,
    "pl6_events_pipeline" -> 1.7655,
    "pl7_corpus_report" -> 2.4738,
    "pl8_nightly_ingest" -> 8.564,
    "pl9_export_shards" -> 1.4581,
    "s10_tree_paths" -> 1.1913,
    "s11_dryrun" -> 0.2421,
    "s12_orc_scan" -> 1.0773,
    "s13_json_scan" -> 0.5909,
    "s14_partitioned_scan" -> 1.1782,
    "s16_bucketed_join" -> 3.123,
    "s17_zorder_scan" -> 1.9261,
    "s18_schema_evolution" -> 0.9612,
    "s19_compaction" -> 1.3248,
    "s1_csv_scan" -> 1.0207,
    "s7_sink_roundtrip" -> 0.5562,
    "s8_batched_sink" -> 0.566,
    "s9_tree_roundtrip" -> 0.2796,
    "t1_topk_rows" -> 0.1639,
    "t2_topk_groups" -> 0.2918,
    "u1_set_ops" -> 0.6277,
    "u2_unpivot" -> 0.4966,
    "w10_event_paths" -> 0.6272,
    "w11_time_to_convert" -> 0.8011,
    "w12_attribution" -> 0.6293,
    "w1_tumbling_window" -> 0.4039,
    "w2_sliding_window" -> 0.3868,
    "w3_session_window" -> 0.9187,
    "w4_window_rank" -> 0.4867,
    "w5_lag_cumsum" -> 0.7606,
    "w6_funnel" -> 0.7867,
    "w7_retention" -> 0.816,
    "w8_anomaly" -> 0.5681,
    "w8_rank_native" -> 0.3235,
    "w9_gapfill" -> 0.7127,
    "x0_exact_dedup" -> 0.3728,
    "x10_media_features" -> 0.5734,
    "x11_ivf_topk" -> 1.6245,
    "x12_chunk_neardups" -> 0.9571,
    "x13_token_chunks" -> 0.7353,
    "x14_fuzzy_names" -> 0.4379,
    "x15_tfidf_top_term" -> 1.6122,
    "x16_ngram_jaccard" -> 1.3966,
    "x17_pii_scrub" -> 0.6521,
    "x18_simhash_neardups" -> 1.7826,
    "x19_stratified_sample" -> 0.4453,
    "x1_fingerprint" -> 0.2691,
    "x20_domain_cap" -> 0.3274,
    "x21_decontaminate" -> 1.2275,
    "x22_int8_quant" -> 0.588,
    "x23_train_shuffle" -> 0.2459,
    "x24_sequence_pack" -> 0.4563,
    "x25_frame_sample" -> 0.3585,
    "x26_media_resize" -> 0.3225,
    "x27_quant_topk" -> 0.3744,
    "x28_dedup_clusters" -> 2.2683,
    "x29_repetition_metrics" -> 1.4111,
    "x2_quality_metrics" -> 0.9177,
    "x30_knn_join" -> 0.5863,
    "x31_vocab_stats" -> 0.3637,
    "x32_bigram_logprob" -> 1.3887,
    "x33_embed_clusters" -> 2.9892,
    "x34_span_dedup" -> 1.5555,
    "x35_semdedup" -> 1.8939,
    "x36_hybrid_rrf" -> 0.9499,
    "x37_domain_mix" -> 0.7402,
    "x38_native_topk" -> 0.309,
    "x39_incremental_neardups" -> 1.6578,
    "x3_lang_id" -> 0.6006,
    "x40_perplexity_bins" -> 1.6221,
    "x41_indexed_screen" -> 2.308,
    "x42_domain_mix_up" -> 1.0053,
    "x43_knn_native" -> 0.6026,
    "x44_temperature_mix" -> 1.0041,
    "x45_fuzzy_decontam" -> 1.6168,
    "x46_heavy_tokens" -> 0.6712,
    "x47_unicode_dedup" -> 0.5787,
    "x48_incremental_clusters" -> 7.1827,
    "x49_quality_features" -> 2.8298,
    "x4_minhash_neardups" -> 1.0916,
    "x50_train_split" -> 0.3613,
    "x51_corpus_drift" -> 0.5704,
    "x52_leakage_safe_splits" -> 1.7675,
    "x53_quality_scores" -> 2.8339,
    "x54_jl_projection" -> 1.5265,
    "x55_jl_knn" -> 0.8006,
    "x56_weighted_sample" -> 0.2511,
    "x57_dsir_select" -> 2.7534,
    "x58_filter_cascade" -> 2.2189,
    "x59_dsir_screen" -> 1.5405,
    "x5_simhash" -> 1.0543,
    "x60_diverse_sample" -> 0.9196,
    "x61_gram_coverage" -> 0.8681,
    "x62_embedding_drift" -> 1.129,
    "x63_semantic_decontam" -> 0.4221,
    "x64_ann_recall" -> 1.5937,
    "x65_fit_classifier" -> 3.4191,
    "x67_dedup_thresholds" -> 2.9977,
    "x68_leakage_audit" -> 2.2969,
    "x66_pack_efficiency" -> 0.8545,
    "x6_brute_topk" -> 0.2205,
    "x7_ann_topk" -> 0.2798,
    "x8_embed_neardups" -> 0.536,
    "x9_token_stats" -> 0.5361)
}
