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
  * warmup + min-of-2; cache release and sink sweep off-clock) — all 162
  * queries from ONE coherent run (198.2s total, zero regressions, zero
  * errors; quiet box per the contract line's own env field: one other
  * JVM throughout; same-session 159- and 161-query runs landed at
  * 183.8s and 183.1s — the spread is sub-2× run-to-run variance, all
  * coherent), measured under the SAME contract the harness applies, so
  * regression factors are apples-to-apples. Since round 12 the committed
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
    "a10_reconcile" -> 0.3859,
    "a11_percentiles" -> 0.9067,
    "a12_rollup" -> 0.629,
    "a13_group_stats" -> 0.5351,
    "a14_profile" -> 0.9263,
    "a15_cube" -> 0.7016,
    "a16_incremental_agg" -> 0.5323,
    "a17_quality_checks" -> 0.446,
    "a18_group_mode" -> 0.3951,
    "a1_group_sum" -> 0.5517,
    "a3_cycle_breakdown" -> 0.26,
    "a4_conditional_pivot" -> 0.5494,
    "a7_distinct_values" -> 0.2321,
    "a8_global_stats" -> 0.295,
    "d1_amount_bins" -> 0.321,
    "d2_company_type" -> 0.2499,
    "d3_party_pivot" -> 0.752,
    "d4_composite_key" -> 0.1481,
    "j1_lookup_join" -> 0.4716,
    "j2_anti_join" -> 0.4125,
    "j2_dedup_keepfirst" -> 1.6485,
    "j3_asof_join" -> 0.745,
    "j4_range_join" -> 0.8577,
    "j5_upsert_merge" -> 0.3878,
    "j6_scd2" -> 0.5534,
    "j7_salted_join" -> 0.8695,
    "j8_bloom_join" -> 0.6411,
    "j9_snapshot_diff" -> 0.5233,
    "join_q10_returns" -> 0.7493,
    "join_q18_big_orders" -> 0.6272,
    "join_q3_revenue" -> 0.9654,
    "join_q5_nation_revenue" -> 1.0869,
    "p11_iso8601" -> 0.5162,
    "p14_pushdown_filter" -> 0.373,
    "p18_json_extract" -> 0.563,
    "p2_normalize_dropnull" -> 0.2523,
    "p3_clean_normalize" -> 0.1799,
    "p5_name_coercion" -> 0.6989,
    "p6_datetime_coercion" -> 0.4105,
    "p8_null_fill" -> 0.2421,
    "p9_metadata" -> 0.1521,
    "pl10_classifier_pipeline" -> 6.0866,
    "pl11_dsir_pipeline" -> 5.3434,
    "pl1_csv_pipeline" -> 1.9447,
    "pl2_sql_pipeline" -> 0.8188,
    "pl3_realtime_pipeline" -> 1.4789,
    "pl4_issues_pipeline" -> 0.7068,
    "pl5_curation_pipeline" -> 3.4259,
    "pl6_events_pipeline" -> 1.6755,
    "pl7_corpus_report" -> 1.622,
    "pl8_nightly_ingest" -> 4.5729,
    "pl9_export_shards" -> 1.0937,
    "s10_tree_paths" -> 0.8861,
    "s11_dryrun" -> 0.2041,
    "s12_orc_scan" -> 1.0552,
    "s13_json_scan" -> 0.4924,
    "s14_partitioned_scan" -> 1.0585,
    "s16_bucketed_join" -> 2.9258,
    "s17_zorder_scan" -> 1.4701,
    "s18_schema_evolution" -> 0.6853,
    "s19_compaction" -> 1.6851,
    "s1_csv_scan" -> 1.1736,
    "s2_jdbc_roundtrip" -> 0.4367,
    "s3_jdbc_partitioned" -> 0.475,
    "s7_sink_roundtrip" -> 0.3839,
    "s8_batched_sink" -> 0.5312,
    "s9_tree_roundtrip" -> 0.2392,
    "t1_topk_rows" -> 0.1594,
    "t2_topk_groups" -> 0.2529,
    "u1_set_ops" -> 0.5622,
    "u2_unpivot" -> 0.4116,
    "w10_event_paths" -> 0.5597,
    "w11_time_to_convert" -> 0.6408,
    "w12_attribution" -> 0.5441,
    "w13_stream_join" -> 0.4079,
    "w1_tumbling_window" -> 0.3935,
    "w2_sliding_window" -> 0.4341,
    "w3_session_window" -> 0.8205,
    "w4_window_rank" -> 0.4213,
    "w5_lag_cumsum" -> 0.8568,
    "w6_funnel" -> 0.8158,
    "w7_retention" -> 0.7095,
    "w8_anomaly" -> 0.6069,
    "w8_rank_native" -> 0.3617,
    "w9_gapfill" -> 0.616,
    "x0_exact_dedup" -> 0.3544,
    "x10_media_features" -> 0.4729,
    "x11_ivf_topk" -> 1.3889,
    "x12_chunk_neardups" -> 0.5641,
    "x13_token_chunks" -> 0.7881,
    "x14_fuzzy_names" -> 0.3104,
    "x15_tfidf_top_term" -> 1.176,
    "x16_ngram_jaccard" -> 1.7726,
    "x17_pii_scrub" -> 0.6073,
    "x18_simhash_neardups" -> 1.9555,
    "x19_stratified_sample" -> 0.3307,
    "x1_fingerprint" -> 0.3544,
    "x20_domain_cap" -> 0.2874,
    "x21_decontaminate" -> 1.3307,
    "x22_int8_quant" -> 0.5665,
    "x23_train_shuffle" -> 0.2601,
    "x24_sequence_pack" -> 0.4404,
    "x25_frame_sample" -> 0.2954,
    "x26_media_resize" -> 0.2991,
    "x27_quant_topk" -> 0.3751,
    "x28_dedup_clusters" -> 2.1466,
    "x29_repetition_metrics" -> 1.3304,
    "x2_quality_metrics" -> 0.7012,
    "x30_knn_join" -> 0.6134,
    "x31_vocab_stats" -> 0.4711,
    "x32_bigram_logprob" -> 1.4527,
    "x33_embed_clusters" -> 2.7157,
    "x34_span_dedup" -> 1.3251,
    "x35_semdedup" -> 1.8241,
    "x36_hybrid_rrf" -> 0.9237,
    "x37_domain_mix" -> 0.6807,
    "x38_native_topk" -> 0.3318,
    "x39_incremental_neardups" -> 1.775,
    "x3_lang_id" -> 0.5978,
    "x40_perplexity_bins" -> 1.5599,
    "x41_indexed_screen" -> 2.5379,
    "x42_domain_mix_up" -> 0.8889,
    "x43_knn_native" -> 0.6051,
    "x44_temperature_mix" -> 0.9384,
    "x45_fuzzy_decontam" -> 1.8953,
    "x46_heavy_tokens" -> 0.6611,
    "x47_unicode_dedup" -> 0.6443,
    "x48_incremental_clusters" -> 3.1153,
    "x49_quality_features" -> 3.6233,
    "x4_minhash_neardups" -> 1.1673,
    "x50_train_split" -> 0.3468,
    "x51_corpus_drift" -> 0.4481,
    "x52_leakage_safe_splits" -> 2.2483,
    "x53_quality_scores" -> 3.0212,
    "x54_jl_projection" -> 1.6156,
    "x55_jl_knn" -> 0.9501,
    "x56_weighted_sample" -> 0.329,
    "x57_dsir_select" -> 3.051,
    "x58_filter_cascade" -> 2.1157,
    "x59_dsir_screen" -> 1.9112,
    "x5_simhash" -> 1.3446,
    "x60_diverse_sample" -> 1.0601,
    "x61_gram_coverage" -> 1.0565,
    "x62_embedding_drift" -> 1.2363,
    "x63_semantic_decontam" -> 0.4298,
    "x64_ann_recall" -> 1.607,
    "x65_fit_classifier" -> 2.9442,
    "x66_pack_efficiency" -> 0.9582,
    "x67_dedup_thresholds" -> 2.4747,
    "x68_leakage_audit" -> 2.3573,
    "x69_quality_canonical" -> 2.2708,
    "x6_brute_topk" -> 0.1858,
    "x70_pq_topk" -> 3.9726,
    "x71_pq_recall" -> 5.4455,
    "x72_ivfpq_topk" -> 4.5205,
    "x73_pq_indexed" -> 5.0813,
    "x74_pq_append" -> 6.8388,
    "x75_ivfpq_indexed" -> 6.1003,
    "x76_pq_routed_knn" -> 7.6069,
    "x7_ann_topk" -> 0.2901,
    "x8_embed_neardups" -> 0.5651,
    "x9_token_stats" -> 0.6122,
  )
}
