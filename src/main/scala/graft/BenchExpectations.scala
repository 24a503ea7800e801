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
  * Current snapshot: round-14 SECOND-PASS closing full-suite solo run at
  * HEAD — all 195 queries from ONE coherent run (219.7s total; the +33s
  * over the first-pass 186.4s/187 carries the 8 second-pass gates,
  * dominated by the two ~5s BPE training/serving gates — ZERO in-suite
  * flags, zero errors; quiet box per the contract line's env field,
  * loadavg 0.69 at start, one other JVM throughout; 8 cost-balanced
  * shards at the ~25/shard design point). No query flagged in-suite, so
  * no solo adjudication was needed; the standing rule from round 13
  * remains — a query flagged in-suite and adjudicated solo snapshots
  * min(in-suite, solo), never the churn-inflated reading
  * (tools/refresh_expectations.py implements it). The committed
  * `bench_full.json` carries per-query gc_ms and the env bookends —
  * adjudicate flags from the artifact first.
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
    "a10_reconcile" -> 0.2745,
    "a11_percentiles" -> 0.6787,
    "a12_rollup" -> 0.5012,
    "a13_group_stats" -> 0.3992,
    "a14_profile" -> 0.7088,
    "a15_cube" -> 0.4649,
    "a16_incremental_agg" -> 0.3906,
    "a17_quality_checks" -> 0.4069,
    "a18_group_mode" -> 0.2726,
    "a19_decimal_money" -> 1.0828,
    "a1_group_sum" -> 0.412,
    "a20_kmv_distinct" -> 0.6497,
    "a21_kmv_incremental" -> 0.9335,
    "a22_kmv_overlap" -> 0.863,
    "a23_daily_distinct" -> 0.6098,
    "a24_value_histogram" -> 0.5978,
    "a3_cycle_breakdown" -> 0.3044,
    "a4_conditional_pivot" -> 0.5619,
    "a7_distinct_values" -> 0.2201,
    "a8_global_stats" -> 0.2535,
    "d1_amount_bins" -> 0.2292,
    "d2_company_type" -> 0.2137,
    "d3_party_pivot" -> 0.5713,
    "d4_composite_key" -> 0.1184,
    "j1_lookup_join" -> 0.3668,
    "j2_anti_join" -> 0.2883,
    "j2_dedup_keepfirst" -> 1.4657,
    "j3_asof_join" -> 0.6712,
    "j4_range_join" -> 0.6825,
    "j5_upsert_merge" -> 0.3511,
    "j6_scd2" -> 0.4925,
    "j7_salted_join" -> 0.8834,
    "j8_bloom_join" -> 0.5832,
    "j9_snapshot_diff" -> 0.3985,
    "join_q10_returns" -> 0.6021,
    "join_q18_big_orders" -> 0.5801,
    "join_q3_revenue" -> 0.8358,
    "join_q5_nation_revenue" -> 0.8006,
    "p11_iso8601" -> 0.3209,
    "p14_pushdown_filter" -> 0.2876,
    "p18_json_extract" -> 0.414,
    "p2_normalize_dropnull" -> 0.231,
    "p3_clean_normalize" -> 0.1288,
    "p5_name_coercion" -> 0.6543,
    "p6_datetime_coercion" -> 0.3411,
    "p8_null_fill" -> 0.2229,
    "p9_metadata" -> 0.1193,
    "pl10_classifier_pipeline" -> 4.873,
    "pl11_dsir_pipeline" -> 4.1703,
    "pl12_index_refresh" -> 2.8145,
    "pl13_sketch_report" -> 1.0834,
    "pl14_bloom_rotate" -> 2.183, // added post-snapshot, solo-measured
    "pl1_csv_pipeline" -> 1.649,
    "pl2_sql_pipeline" -> 0.7222,
    "pl3_realtime_pipeline" -> 1.3951,
    "pl4_issues_pipeline" -> 0.5305,
    "pl5_curation_pipeline" -> 2.6932,
    "pl6_events_pipeline" -> 1.2126,
    "pl7_corpus_report" -> 1.1498,
    "pl8_nightly_ingest" -> 4.7277,
    "pl9_export_shards" -> 1.31,
    "s10_tree_paths" -> 0.7332,
    "s11_dryrun" -> 0.179,
    "s12_orc_scan" -> 0.8798,
    "s13_json_scan" -> 0.3466,
    "s14_partitioned_scan" -> 0.8437,
    "s16_bucketed_join" -> 2.1335,
    "s17_zorder_scan" -> 1.2256,
    "s18_schema_evolution" -> 0.6627,
    "s19_compaction" -> 1.2427,
    "s1_csv_scan" -> 0.7786,
    "s2_jdbc_roundtrip" -> 0.3755,
    "s3_jdbc_partitioned" -> 0.436,
    "s7_sink_roundtrip" -> 0.3395,
    "s8_batched_sink" -> 0.4714,
    "s9_tree_roundtrip" -> 0.2108,
    "t1_topk_rows" -> 0.1363,
    "t2_topk_groups" -> 0.2103,
    "u1_set_ops" -> 0.5211,
    "u2_unpivot" -> 0.394,
    "w10_event_paths" -> 0.3787,
    "w11_time_to_convert" -> 0.577,
    "w12_attribution" -> 0.4613,
    "w13_stream_join" -> 0.3329,
    "w1_tumbling_window" -> 0.3328,
    "w2_sliding_window" -> 0.3261,
    "w3_session_window" -> 0.649,
    "w4_window_rank" -> 0.415,
    "w5_lag_cumsum" -> 0.6461,
    "w6_funnel" -> 0.7142,
    "w7_retention" -> 0.5222,
    "w8_anomaly" -> 0.4593,
    "w8_rank_native" -> 0.3334,
    "w9_gapfill" -> 0.509,
    "x0_exact_dedup" -> 0.2868,
    "x100_bpe_merges" -> 4.9534,
    "x101_bpe_apply" -> 5.3837,
    "x102_self_repetition" -> 1.5012, // added post-snapshot, solo-measured
    "x103_hard_negatives" -> 0.5073, // added post-snapshot, solo-measured
    "x104_span_corruption" -> 1.6689, // added post-snapshot, solo-measured
    "x105_bpe_apply_local" -> 4.5755, // added post-snapshot, solo-measured
    "x106_bpe_sampled" -> 2.7742, // added post-snapshot, solo-measured
    "x107_hard_negatives_indexed" -> 2.6525, // added post-snapshot, solo-measured
    "x108_hard_negative_recall" -> 2.3779, // added post-snapshot, solo-measured
    "x10_media_features" -> 0.401,
    "x11_ivf_topk" -> 1.2171,
    "x12_chunk_neardups" -> 0.5172,
    "x13_token_chunks" -> 0.5947,
    "x14_fuzzy_names" -> 0.2895,
    "x15_tfidf_top_term" -> 1.1429,
    "x16_ngram_jaccard" -> 1.2215,
    "x17_pii_scrub" -> 0.4625,
    "x18_simhash_neardups" -> 1.6105,
    "x19_stratified_sample" -> 0.3247,
    "x1_fingerprint" -> 0.2502,
    "x20_domain_cap" -> 0.2138,
    "x21_decontaminate" -> 0.9818,
    "x22_int8_quant" -> 0.5133,
    "x23_train_shuffle" -> 0.272,
    "x24_sequence_pack" -> 0.4238,
    "x25_frame_sample" -> 0.237,
    "x26_media_resize" -> 0.2219,
    "x27_quant_topk" -> 0.2823,
    "x28_dedup_clusters" -> 1.6343,
    "x29_repetition_metrics" -> 1.0672,
    "x2_quality_metrics" -> 0.5581,
    "x30_knn_join" -> 0.4698,
    "x31_vocab_stats" -> 0.3169,
    "x32_bigram_logprob" -> 1.0116,
    "x33_embed_clusters" -> 2.4282,
    "x34_span_dedup" -> 1.0122,
    "x35_semdedup" -> 1.5481,
    "x36_hybrid_rrf" -> 0.7859,
    "x37_domain_mix" -> 0.6079,
    "x38_native_topk" -> 0.2628,
    "x39_incremental_neardups" -> 1.4668,
    "x3_lang_id" -> 0.5409,
    "x40_perplexity_bins" -> 1.3125,
    "x41_indexed_screen" -> 1.9637,
    "x42_domain_mix_up" -> 0.7604,
    "x43_knn_native" -> 0.5306,
    "x44_temperature_mix" -> 0.7691,
    "x45_fuzzy_decontam" -> 1.5671,
    "x46_heavy_tokens" -> 0.5195,
    "x47_unicode_dedup" -> 0.4657,
    "x48_incremental_clusters" -> 2.6347,
    "x49_quality_features" -> 2.4009,
    "x4_minhash_neardups" -> 1.0168,
    "x50_train_split" -> 0.2813,
    "x51_corpus_drift" -> 0.3942,
    "x52_leakage_safe_splits" -> 1.6134,
    "x53_quality_scores" -> 2.3102,
    "x54_jl_projection" -> 1.3831,
    "x55_jl_knn" -> 0.7415,
    "x56_weighted_sample" -> 0.2423,
    "x57_dsir_select" -> 2.0504,
    "x58_filter_cascade" -> 1.5305,
    "x59_dsir_screen" -> 1.3707,
    "x5_simhash" -> 1.0369,
    "x60_diverse_sample" -> 0.8586,
    "x61_gram_coverage" -> 0.8868,
    "x62_embedding_drift" -> 1.1365,
    "x63_semantic_decontam" -> 0.3902,
    "x64_ann_recall" -> 1.361,
    "x65_fit_classifier" -> 2.6168,
    "x66_pack_efficiency" -> 0.7648,
    "x67_dedup_thresholds" -> 2.0348,
    "x68_leakage_audit" -> 1.7484,
    "x69_quality_canonical" -> 2.0529,
    "x6_brute_topk" -> 0.1618,
    "x70_pq_topk" -> 1.2238,
    "x71_pq_recall" -> 2.273,
    "x72_ivfpq_topk" -> 2.0113,
    "x73_pq_indexed" -> 1.6318,
    "x74_pq_append" -> 2.0343,
    "x75_ivfpq_indexed" -> 2.981,
    "x76_pq_routed_knn" -> 3.0471,
    "x77_ivfpq_append" -> 3.3754,
    "x78_ivfpq_residual" -> 2.1654,
    "x79_band_delete" -> 2.6542,
    "x7_ann_topk" -> 0.2157,
    "x80_routed_recall" -> 3.823,
    "x81_ivfpq_compact" -> 3.4704,
    "x82_residual_recall" -> 3.0057,
    "x83_pq_delete" -> 2.046,
    "x84_ivfpq_residual_indexed" -> 3.3984,
    "x85_ivfpq_delete" -> 3.0064,
    "x86_clustered_recall" -> 3.3036,
    "x87_residual_routed_knn" -> 3.7025,
    "x88_two_stage_indexed" -> 1.6714,
    "x89_knn_pagerank" -> 2.4183,
    "x8_embed_neardups" -> 0.4073,
    "x90_ivfpq_residual_append" -> 3.2973,
    "x91_source_authority" -> 3.6775,
    "x92_ivfpq_bigk" -> 1.7463,
    // 0.8304 in closing run 1 was shard-warming (PQ siblings pre-JITed the
    // encode path in that shard's JVM); the snapshot refresh re-balanced
    // the shards and x93 now runs colder. Two idle-box solo runs measured
    // 1.51/1.95 — the standalone cost is the honest guardrail baseline.
    "x93_pq_bigks" -> 1.5144, // solo-adjudicated (see above)
    "x94_ivfpq_bigk_bigks" -> 2.7054,
    "x95_pr_curve" -> 2.4957,
    "x96_video_demux" -> 0.3477,
    "x97_substring_dedup" -> 1.6533,
    "x98_bloom_prune" -> 0.6456,
    "x99_bloom_admission" -> 1.0486,
    "x9_token_stats" -> 0.4245,
  )
}
