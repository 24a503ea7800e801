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
  * Current snapshot: round-9 FINAL full-suite solo run under the
  * off-clock-release protocol (release between timers, warmup pass,
  * min-of-2) — all 147 queries from ONE coherent run (148.8s total,
  * zero regressions vs the prior 141-query snapshot), measured under
  * the SAME contract the harness applies, so regression factors are
  * apples-to-apples. x66 (added after) and pl9 (its gate
  * barrier landed after) carry targeted solo-run values.
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
    "a10_reconcile" -> 0.4034,
    "a11_percentiles" -> 0.7872,
    "a12_rollup" -> 0.4696,
    "a13_group_stats" -> 0.5284,
    "a14_profile" -> 0.7722,
    "a15_cube" -> 0.4364,
    "a16_incremental_agg" -> 0.4307,
    "a17_quality_checks" -> 0.4487,
    "a18_group_mode" -> 0.2903,
    "a1_group_sum" -> 0.3618,
    "a3_cycle_breakdown" -> 0.2423,
    "a4_conditional_pivot" -> 0.5244,
    "a7_distinct_values" -> 0.2053,
    "a8_global_stats" -> 0.3113,
    "d1_amount_bins" -> 0.2707,
    "d2_company_type" -> 0.254,
    "d3_party_pivot" -> 0.7879,
    "d4_composite_key" -> 0.1978,
    "j1_lookup_join" -> 0.495,
    "j2_anti_join" -> 0.3851,
    "j2_dedup_keepfirst" -> 1.5018,
    "j3_asof_join" -> 0.6886,
    "j4_range_join" -> 0.7708,
    "j5_upsert_merge" -> 0.3561,
    "j6_scd2" -> 0.5089,
    "j7_salted_join" -> 0.8242,
    "j8_bloom_join" -> 0.6406,
    "j9_snapshot_diff" -> 0.5813,
    "join_q10_returns" -> 0.6815,
    "join_q18_big_orders" -> 0.6783,
    "join_q3_revenue" -> 0.9096,
    "join_q5_nation_revenue" -> 1.1437,
    "p11_iso8601" -> 0.4684,
    "p14_pushdown_filter" -> 0.3774,
    "p18_json_extract" -> 0.5288,
    "p2_normalize_dropnull" -> 0.3154,
    "p3_clean_normalize" -> 0.2022,
    "p5_name_coercion" -> 0.5672,
    "p8_null_fill" -> 0.3263,
    "p9_metadata" -> 0.169,
    "pl10_classifier_pipeline" -> 6.0049,
    "pl11_dsir_pipeline" -> 5.3162,
    "pl1_csv_pipeline" -> 2.0671,
    "pl2_sql_pipeline" -> 0.8446,
    "pl3_realtime_pipeline" -> 1.6003,
    "pl4_issues_pipeline" -> 0.7941,
    "pl5_curation_pipeline" -> 3.0544,
    "pl6_events_pipeline" -> 1.6296,
    "pl7_corpus_report" -> 1.5997,
    "pl8_nightly_ingest" -> 4.8053,
    "pl9_export_shards" -> 1.6856,
    "s10_tree_paths" -> 0.9716,
    "s11_dryrun" -> 0.214,
    "s12_orc_scan" -> 0.9338,
    "s13_json_scan" -> 0.3665,
    "s14_partitioned_scan" -> 0.787,
    "s16_bucketed_join" -> 2.6579,
    "s17_zorder_scan" -> 1.4776,
    "s18_schema_evolution" -> 0.6124,
    "s19_compaction" -> 1.0232,
    "s1_csv_scan" -> 0.8476,
    "s7_sink_roundtrip" -> 0.4195,
    "s8_batched_sink" -> 0.5368,
    "s9_tree_roundtrip" -> 0.2659,
    "t1_topk_rows" -> 0.1383,
    "t2_topk_groups" -> 0.2654,
    "u1_set_ops" -> 0.5864,
    "u2_unpivot" -> 0.4664,
    "w10_event_paths" -> 0.5267,
    "w11_time_to_convert" -> 0.8245,
    "w12_attribution" -> 0.5343,
    "w1_tumbling_window" -> 0.3955,
    "w2_sliding_window" -> 0.3597,
    "w3_session_window" -> 0.8354,
    "w4_window_rank" -> 0.4112,
    "w5_lag_cumsum" -> 0.6957,
    "w6_funnel" -> 0.6695,
    "w7_retention" -> 0.6601,
    "w8_anomaly" -> 0.3506,
    "w8_rank_native" -> 0.2794,
    "w9_gapfill" -> 0.5303,
    "x0_exact_dedup" -> 0.2987,
    "x10_media_features" -> 0.4087,
    "x11_ivf_topk" -> 1.3014,
    "x12_chunk_neardups" -> 0.5375,
    "x13_token_chunks" -> 0.6224,
    "x14_fuzzy_names" -> 0.3797,
    "x15_tfidf_top_term" -> 1.3407,
    "x16_ngram_jaccard" -> 1.2559,
    "x17_pii_scrub" -> 0.6962,
    "x18_simhash_neardups" -> 1.8258,
    "x19_stratified_sample" -> 0.3393,
    "x1_fingerprint" -> 0.288,
    "x20_domain_cap" -> 0.3043,
    "x21_decontaminate" -> 1.1888,
    "x22_int8_quant" -> 0.5281,
    "x23_train_shuffle" -> 0.2717,
    "x24_sequence_pack" -> 0.4785,
    "x25_frame_sample" -> 0.3185,
    "x26_media_resize" -> 0.2448,
    "x27_quant_topk" -> 0.2817,
    "x28_dedup_clusters" -> 1.7331,
    "x29_repetition_metrics" -> 1.0537,
    "x2_quality_metrics" -> 0.6769,
    "x30_knn_join" -> 0.5774,
    "x31_vocab_stats" -> 0.335,
    "x32_bigram_logprob" -> 1.1434,
    "x33_embed_clusters" -> 2.5893,
    "x34_span_dedup" -> 1.1907,
    "x35_semdedup" -> 1.9847,
    "x36_hybrid_rrf" -> 0.8042,
    "x37_domain_mix" -> 0.6663,
    "x38_native_topk" -> 0.2914,
    "x39_incremental_neardups" -> 1.3715,
    "x3_lang_id" -> 0.5375,
    "x40_perplexity_bins" -> 1.4819,
    "x41_indexed_screen" -> 2.1758,
    "x42_domain_mix_up" -> 0.7522,
    "x43_knn_native" -> 0.6018,
    "x44_temperature_mix" -> 0.9859,
    "x45_fuzzy_decontam" -> 1.649,
    "x46_heavy_tokens" -> 0.7665,
    "x47_unicode_dedup" -> 0.6607,
    "x48_incremental_clusters" -> 8.7534,
    "x49_quality_features" -> 3.1234,
    "x4_minhash_neardups" -> 1.437,
    "x50_train_split" -> 0.4775,
    "x51_corpus_drift" -> 0.6494,
    "x52_leakage_safe_splits" -> 2.6268,
    "x53_quality_scores" -> 3.3028,
    "x54_jl_projection" -> 1.7743,
    "x55_jl_knn" -> 0.9223,
    "x56_weighted_sample" -> 0.3298,
    "x57_dsir_select" -> 2.9843,
    "x58_filter_cascade" -> 2.0319,
    "x59_dsir_screen" -> 1.796,
    "x5_simhash" -> 1.1963,
    "x60_diverse_sample" -> 1.0862,
    "x61_gram_coverage" -> 0.9504,
    "x62_embedding_drift" -> 1.3503,
    "x63_semantic_decontam" -> 0.4208,
    "x64_ann_recall" -> 1.5278,
    "x66_pack_efficiency" -> 1.5761,
    "x65_fit_classifier" -> 3.5949,
    "x6_brute_topk" -> 0.1902,
    "x7_ann_topk" -> 0.302,
    "x8_embed_neardups" -> 0.5491,
    "x9_token_stats" -> 0.5435)
}
