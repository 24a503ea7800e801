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
  * Current snapshot: round-9 closing full-suite solo run under the
  * off-clock-release protocol (release between timers, warmup pass,
  * min-of-2) — all 150 queries from ONE coherent run (169.4s total,
  * zero regressions), measured under the SAME contract the harness
  * applies, so regression factors are apples-to-apples.
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
    "a10_reconcile" -> 0.4742,
    "a11_percentiles" -> 0.9879,
    "a12_rollup" -> 0.544,
    "a13_group_stats" -> 0.4403,
    "a14_profile" -> 1.0333,
    "a15_cube" -> 0.6432,
    "a16_incremental_agg" -> 0.6248,
    "a17_quality_checks" -> 0.5892,
    "a18_group_mode" -> 0.3902,
    "a1_group_sum" -> 0.4277,
    "a3_cycle_breakdown" -> 0.3264,
    "a4_conditional_pivot" -> 0.6318,
    "a7_distinct_values" -> 0.2512,
    "a8_global_stats" -> 0.3826,
    "d1_amount_bins" -> 0.2995,
    "d2_company_type" -> 0.2886,
    "d3_party_pivot" -> 0.7064,
    "d4_composite_key" -> 0.1788,
    "j1_lookup_join" -> 0.4926,
    "j2_anti_join" -> 0.4444,
    "j2_dedup_keepfirst" -> 1.7543,
    "j3_asof_join" -> 0.853,
    "j4_range_join" -> 0.9226,
    "j5_upsert_merge" -> 0.449,
    "j6_scd2" -> 0.6981,
    "j7_salted_join" -> 0.9192,
    "j8_bloom_join" -> 0.8428,
    "j9_snapshot_diff" -> 0.5969,
    "join_q10_returns" -> 0.7781,
    "join_q18_big_orders" -> 0.753,
    "join_q3_revenue" -> 0.9811,
    "join_q5_nation_revenue" -> 1.2189,
    "p11_iso8601" -> 0.5603,
    "p14_pushdown_filter" -> 0.4631,
    "p18_json_extract" -> 0.5256,
    "p2_normalize_dropnull" -> 0.3063,
    "p3_clean_normalize" -> 0.2132,
    "p5_name_coercion" -> 0.7381,
    // provisional (added r11 with no prior driver run; same shape as p5 —
    // one orders scan + format/parse + tiny agg). Refreshed at next snapshot.
    "p6_datetime_coercion" -> 0.7,
    "p8_null_fill" -> 0.4075,
    "p9_metadata" -> 0.2034,
    "pl10_classifier_pipeline" -> 6.5512,
    "pl11_dsir_pipeline" -> 5.5336,
    "pl1_csv_pipeline" -> 2.2647,
    "pl2_sql_pipeline" -> 0.8937,
    "pl3_realtime_pipeline" -> 1.8366,
    "pl4_issues_pipeline" -> 0.7371,
    "pl5_curation_pipeline" -> 3.4143,
    "pl6_events_pipeline" -> 1.9086,
    "pl7_corpus_report" -> 1.7917,
    "pl8_nightly_ingest" -> 5.6198,
    "pl9_export_shards" -> 1.4884,
    "s10_tree_paths" -> 1.1165,
    "s11_dryrun" -> 0.2851,
    "s12_orc_scan" -> 1.183,
    "s13_json_scan" -> 0.514,
    "s14_partitioned_scan" -> 0.9476,
    "s16_bucketed_join" -> 3.1101,
    "s17_zorder_scan" -> 1.6652,
    "s18_schema_evolution" -> 0.6624,
    "s19_compaction" -> 1.2679,
    "s1_csv_scan" -> 0.9664,
    "s7_sink_roundtrip" -> 0.5044,
    "s8_batched_sink" -> 0.5932,
    "s9_tree_roundtrip" -> 0.2998,
    "t1_topk_rows" -> 0.1879,
    "t2_topk_groups" -> 0.347,
    "u1_set_ops" -> 0.6873,
    "u2_unpivot" -> 0.5379,
    "w10_event_paths" -> 0.6903,
    "w11_time_to_convert" -> 0.9122,
    "w12_attribution" -> 0.6957,
    "w1_tumbling_window" -> 0.4475,
    "w2_sliding_window" -> 0.425,
    "w3_session_window" -> 0.9074,
    "w4_window_rank" -> 0.5551,
    "w5_lag_cumsum" -> 0.7197,
    "w6_funnel" -> 0.8991,
    "w7_retention" -> 0.8437,
    "w8_anomaly" -> 0.6042,
    "w8_rank_native" -> 0.3746,
    "w9_gapfill" -> 0.6334,
    "x0_exact_dedup" -> 0.3546,
    "x10_media_features" -> 0.6808,
    "x11_ivf_topk" -> 1.7654,
    "x12_chunk_neardups" -> 0.7363,
    "x13_token_chunks" -> 0.8022,
    "x14_fuzzy_names" -> 0.4499,
    "x15_tfidf_top_term" -> 1.7806,
    "x16_ngram_jaccard" -> 1.7204,
    "x17_pii_scrub" -> 0.7032,
    "x18_simhash_neardups" -> 1.8859,
    "x19_stratified_sample" -> 0.4044,
    "x1_fingerprint" -> 0.3109,
    "x20_domain_cap" -> 0.3428,
    "x21_decontaminate" -> 1.4394,
    "x22_int8_quant" -> 0.6954,
    "x23_train_shuffle" -> 0.2893,
    "x24_sequence_pack" -> 0.493,
    "x25_frame_sample" -> 0.36,
    "x26_media_resize" -> 0.2942,
    "x27_quant_topk" -> 0.3515,
    "x28_dedup_clusters" -> 2.3052,
    "x29_repetition_metrics" -> 1.4327,
    "x2_quality_metrics" -> 0.8301,
    "x30_knn_join" -> 0.7131,
    "x31_vocab_stats" -> 0.5932,
    "x32_bigram_logprob" -> 1.7875,
    "x33_embed_clusters" -> 3.2667,
    "x34_span_dedup" -> 1.3923,
    "x35_semdedup" -> 2.2702,
    "x36_hybrid_rrf" -> 0.8289,
    "x37_domain_mix" -> 0.7861,
    "x38_native_topk" -> 0.3269,
    "x39_incremental_neardups" -> 1.4336,
    "x3_lang_id" -> 0.6358,
    "x40_perplexity_bins" -> 1.6523,
    "x41_indexed_screen" -> 2.4606,
    "x42_domain_mix_up" -> 0.9075,
    "x43_knn_native" -> 0.6691,
    "x44_temperature_mix" -> 1.0342,
    "x45_fuzzy_decontam" -> 1.5052,
    "x46_heavy_tokens" -> 0.7074,
    "x47_unicode_dedup" -> 0.6791,
    "x48_incremental_clusters" -> 7.4957,
    "x49_quality_features" -> 2.7669,
    "x4_minhash_neardups" -> 1.2054,
    "x50_train_split" -> 0.3988,
    "x51_corpus_drift" -> 0.4951,
    "x52_leakage_safe_splits" -> 1.9717,
    "x53_quality_scores" -> 2.7123,
    "x54_jl_projection" -> 1.6237,
    "x55_jl_knn" -> 0.7126,
    "x56_weighted_sample" -> 0.235,
    "x57_dsir_select" -> 2.5947,
    "x58_filter_cascade" -> 1.9449,
    "x59_dsir_screen" -> 1.8992,
    "x5_simhash" -> 1.3118,
    "x60_diverse_sample" -> 1.1424,
    "x61_gram_coverage" -> 1.0371,
    "x62_embedding_drift" -> 1.2937,
    "x63_semantic_decontam" -> 0.4838,
    "x64_ann_recall" -> 1.6847,
    "x65_fit_classifier" -> 4.1096,
    "x66_pack_efficiency" -> 1.0225,
    "x67_dedup_thresholds" -> 2.9295,
    "x68_leakage_audit" -> 2.4672,
    "x6_brute_topk" -> 0.2346,
    "x7_ann_topk" -> 0.3285,
    "x8_embed_neardups" -> 0.6354,
    "x9_token_stats" -> 0.6652)
}
