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
  * Current snapshot: round-12 closing full-suite solo run through the
  * SHARDED harness (6 cost-balanced shards, each a fresh child JVM;
  * warmup + min-of-2; cache release and sink sweep off-clock) — all 159
  * queries from ONE coherent run (183.8s total, zero regressions, zero
  * errors; quiet box per the contract line's own env field: one other
  * JVM throughout; an earlier same-session 158-query run landed at
  * 155.8s — the spread is sub-2× run-to-run variance, both coherent),
  * measured under the SAME contract the harness applies, so regression
  * factors are apples-to-apples. Since round 12 the committed
  * `bench_full.json` itself carries per-query gc_ms and the env
  * bookends — adjudicate flags from the artifact first.
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
    "a10_reconcile" -> 0.4511,
    "a11_percentiles" -> 1.0682,
    "a12_rollup" -> 0.5613,
    "a13_group_stats" -> 0.4216,
    "a14_profile" -> 1.1287,
    "a15_cube" -> 0.6628,
    "a16_incremental_agg" -> 0.632,
    "a17_quality_checks" -> 0.5718,
    "a18_group_mode" -> 0.432,
    "a1_group_sum" -> 0.4247,
    "a3_cycle_breakdown" -> 0.3396,
    "a4_conditional_pivot" -> 0.5668,
    "a7_distinct_values" -> 0.2048,
    "a8_global_stats" -> 0.2674,
    "d1_amount_bins" -> 0.2521,
    "d2_company_type" -> 0.215,
    "d3_party_pivot" -> 0.667,
    "d4_composite_key" -> 0.2261,
    "j1_lookup_join" -> 0.4331,
    "j2_anti_join" -> 0.3414,
    "j2_dedup_keepfirst" -> 1.7389,
    "j3_asof_join" -> 0.9285,
    "j4_range_join" -> 0.9843,
    "j5_upsert_merge" -> 0.3364,
    "j6_scd2" -> 0.7481,
    "j7_salted_join" -> 0.6999,
    "j8_bloom_join" -> 0.6595,
    "j9_snapshot_diff" -> 0.6363,
    "join_q10_returns" -> 0.667,
    "join_q18_big_orders" -> 0.9303,
    "join_q3_revenue" -> 1.1113,
    "join_q5_nation_revenue" -> 1.0137,
    "p11_iso8601" -> 0.4768,
    "p14_pushdown_filter" -> 0.3449,
    "p18_json_extract" -> 0.5895,
    "p2_normalize_dropnull" -> 0.3192,
    "p3_clean_normalize" -> 0.2252,
    "p5_name_coercion" -> 0.6079,
    "p6_datetime_coercion" -> 0.4527,
    "p8_null_fill" -> 0.201,
    "p9_metadata" -> 0.2128,
    "pl10_classifier_pipeline" -> 4.8739,
    "pl11_dsir_pipeline" -> 4.8402,
    "pl1_csv_pipeline" -> 2.2127,
    "pl2_sql_pipeline" -> 1.0651,
    "pl3_realtime_pipeline" -> 1.7322,
    "pl4_issues_pipeline" -> 0.5707,
    "pl5_curation_pipeline" -> 3.7332,
    "pl6_events_pipeline" -> 1.4833,
    "pl7_corpus_report" -> 1.2076,
    "pl8_nightly_ingest" -> 6.0552,
    "pl9_export_shards" -> 1.7234,
    "s10_tree_paths" -> 0.8926,
    "s11_dryrun" -> 0.271,
    "s12_orc_scan" -> 0.9144,
    "s13_json_scan" -> 0.4692,
    "s14_partitioned_scan" -> 0.8124,
    "s16_bucketed_join" -> 3.158,
    "s17_zorder_scan" -> 1.6924,
    "s18_schema_evolution" -> 0.9202,
    "s19_compaction" -> 1.3071,
    "s1_csv_scan" -> 0.8178,
    "s2_jdbc_roundtrip" -> 0.4642,
    "s3_jdbc_partitioned" -> 0.704,
    "s7_sink_roundtrip" -> 0.4212,
    "s8_batched_sink" -> 0.6163,
    "s9_tree_roundtrip" -> 0.2953,
    "t1_topk_rows" -> 0.1272,
    "t2_topk_groups" -> 0.2485,
    "u1_set_ops" -> 0.6763,
    "u2_unpivot" -> 0.4817,
    "w10_event_paths" -> 0.7414,
    "w11_time_to_convert" -> 0.6591,
    "w12_attribution" -> 0.6802,
    "w13_stream_join" -> 0.3259,
    "w1_tumbling_window" -> 0.3417,
    "w2_sliding_window" -> 0.3619,
    "w3_session_window" -> 0.752,
    "w4_window_rank" -> 0.5343,
    "w5_lag_cumsum" -> 0.8154,
    "w6_funnel" -> 1.1084,
    "w7_retention" -> 0.5805,
    "w8_anomaly" -> 0.5975,
    "w8_rank_native" -> 0.3886,
    "w9_gapfill" -> 0.8373,
    "x0_exact_dedup" -> 0.3621,
    "x10_media_features" -> 0.6564,
    "x11_ivf_topk" -> 1.6517,
    "x12_chunk_neardups" -> 0.5074,
    "x13_token_chunks" -> 0.8098,
    "x14_fuzzy_names" -> 0.315,
    "x15_tfidf_top_term" -> 1.1611,
    "x16_ngram_jaccard" -> 1.1514,
    "x17_pii_scrub" -> 0.4682,
    "x18_simhash_neardups" -> 2.338,
    "x19_stratified_sample" -> 0.4811,
    "x1_fingerprint" -> 0.3269,
    "x20_domain_cap" -> 0.3802,
    "x21_decontaminate" -> 1.3766,
    "x22_int8_quant" -> 0.5082,
    "x23_train_shuffle" -> 0.3119,
    "x24_sequence_pack" -> 0.5954,
    "x25_frame_sample" -> 0.2638,
    "x26_media_resize" -> 0.2034,
    "x27_quant_topk" -> 0.2881,
    "x28_dedup_clusters" -> 2.4078,
    "x29_repetition_metrics" -> 1.1188,
    "x2_quality_metrics" -> 1.1534,
    "x30_knn_join" -> 0.5417,
    "x31_vocab_stats" -> 0.5197,
    "x32_bigram_logprob" -> 1.5823,
    "x33_embed_clusters" -> 3.8969,
    "x34_span_dedup" -> 1.4265,
    "x35_semdedup" -> 2.0112,
    "x36_hybrid_rrf" -> 1.1842,
    "x37_domain_mix" -> 0.5799,
    "x38_native_topk" -> 0.464,
    "x39_incremental_neardups" -> 2.0604,
    "x3_lang_id" -> 0.7626,
    "x40_perplexity_bins" -> 1.7876,
    "x41_indexed_screen" -> 2.7895,
    "x42_domain_mix_up" -> 1.3992,
    "x43_knn_native" -> 0.5379,
    "x44_temperature_mix" -> 0.976,
    "x45_fuzzy_decontam" -> 1.7335,
    "x46_heavy_tokens" -> 0.6609,
    "x47_unicode_dedup" -> 0.5405,
    "x48_incremental_clusters" -> 5.5926,
    "x49_quality_features" -> 2.7308,
    "x4_minhash_neardups" -> 1.0225,
    "x50_train_split" -> 0.3271,
    "x51_corpus_drift" -> 0.4207,
    "x52_leakage_safe_splits" -> 1.8634,
    "x53_quality_scores" -> 2.9065,
    "x54_jl_projection" -> 1.4158,
    "x55_jl_knn" -> 0.8166,
    "x56_weighted_sample" -> 0.2671,
    "x57_dsir_select" -> 3.4046,
    "x58_filter_cascade" -> 2.3364,
    "x59_dsir_screen" -> 1.5321,
    "x5_simhash" -> 1.2844,
    "x60_diverse_sample" -> 1.0031,
    "x61_gram_coverage" -> 1.0266,
    "x62_embedding_drift" -> 1.2283,
    "x63_semantic_decontam" -> 0.5514,
    "x64_ann_recall" -> 1.5284,
    "x65_fit_classifier" -> 2.8503,
    "x66_pack_efficiency" -> 0.7718,
    "x67_dedup_thresholds" -> 2.2272,
    "x68_leakage_audit" -> 2.6913,
    "x69_quality_canonical" -> 2.2832,
    "x6_brute_topk" -> 0.2106,
    "x70_pq_topk" -> 4.185,
    "x71_pq_recall" -> 4.5405,
    "x72_ivfpq_topk" -> 5.6498,
    "x73_pq_indexed" -> 3.9708,
    // provisional (x73 + append overhead) until the next snapshot run
    "x74_pq_append" -> 4.6,
    // provisional (x72 + index write overhead) until the next snapshot run
    "x75_ivfpq_indexed" -> 6.3,
    // provisional (x75 + the 10-query routed join) until the next snapshot
    "x76_pq_routed_knn" -> 6.5,
    "x7_ann_topk" -> 0.3272,
    "x8_embed_neardups" -> 0.5772,
    "x9_token_stats" -> 0.6873,
  )
}
