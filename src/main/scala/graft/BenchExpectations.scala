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
    "a10_reconcile" -> 0.3379,
    "a11_percentiles" -> 1.1859,
    "a12_rollup" -> 0.4248,
    "a13_group_stats" -> 0.5749,
    "a14_profile" -> 0.8893,
    "a15_cube" -> 0.4672,
    "a16_incremental_agg" -> 0.4496,
    "a17_quality_checks" -> 0.5023,
    "a18_group_mode" -> 0.4119,
    "a19_decimal_money" -> 0.792,
    "a1_group_sum" -> 0.4935,
    "a20_kmv_distinct" -> 0.6945,
    "a21_kmv_incremental" -> 1.3279,
    "a22_kmv_overlap" -> 0.8247,
    "a23_daily_distinct" -> 0.782,
    "a24_value_histogram" -> 0.8462,
    "a3_cycle_breakdown" -> 0.2901,
    "a4_conditional_pivot" -> 0.522,
    "a7_distinct_values" -> 0.3542,
    "a8_global_stats" -> 0.2779,
    "d1_amount_bins" -> 0.2326,
    "d2_company_type" -> 0.3881,
    "d3_party_pivot" -> 0.5313,
    "d4_composite_key" -> 0.1556,
    "j1_lookup_join" -> 0.3876,
    "j2_anti_join" -> 0.3998,
    "j2_dedup_keepfirst" -> 1.2799,
    "j3_asof_join" -> 0.7474,
    "j4_range_join" -> 0.7417,
    "j5_upsert_merge" -> 0.4424,
    "j6_scd2" -> 0.5617,
    "j7_salted_join" -> 0.7527,
    "j8_bloom_join" -> 0.6794,
    "j9_snapshot_diff" -> 0.6269,
    "join_q10_returns" -> 0.6542,
    "join_q18_big_orders" -> 0.6023,
    "join_q3_revenue" -> 0.7834,
    "join_q5_nation_revenue" -> 1.0194,
    "p11_iso8601" -> 0.46,
    "p14_pushdown_filter" -> 0.3006,
    "p18_json_extract" -> 0.4349,
    "p2_normalize_dropnull" -> 0.2332,
    "p3_clean_normalize" -> 0.2077,
    "p5_name_coercion" -> 0.6456,
    "p6_datetime_coercion" -> 0.3973,
    "p8_null_fill" -> 0.2811,
    "p9_metadata" -> 0.2118,
    "pl10_classifier_pipeline" -> 4.3638,
    "pl11_dsir_pipeline" -> 4.2184,
    "pl12_index_refresh" -> 2.8611,
    "pl13_sketch_report" -> 1.0988,
    "pl14_bloom_rotate" -> 1.3602,
    "pl1_csv_pipeline" -> 1.7624,
    "pl2_sql_pipeline" -> 0.6529,
    "pl3_realtime_pipeline" -> 1.2595,
    "pl4_issues_pipeline" -> 0.8154,
    "pl5_curation_pipeline" -> 2.3827,
    "pl6_events_pipeline" -> 1.3758,
    "pl7_corpus_report" -> 1.5734,
    "pl8_nightly_ingest" -> 5.9601,
    "pl9_export_shards" -> 1.0794,
    "s10_tree_paths" -> 0.9359,
    "s11_dryrun" -> 0.1827,
    "s12_orc_scan" -> 0.8501,
    "s13_json_scan" -> 0.3764,
    "s14_partitioned_scan" -> 0.7877,
    "s16_bucketed_join" -> 2.8877,
    "s17_zorder_scan" -> 1.1401,
    "s18_schema_evolution" -> 0.8521,
    "s19_compaction" -> 1.5839,
    "s1_csv_scan" -> 0.8479,
    "s2_jdbc_roundtrip" -> 0.391,
    "s3_jdbc_partitioned" -> 0.4999,
    "s7_sink_roundtrip" -> 0.3066,
    "s8_batched_sink" -> 0.4391,
    "s9_tree_roundtrip" -> 0.2388,
    "t1_topk_rows" -> 0.1353,
    "t2_topk_groups" -> 0.221,
    "u1_set_ops" -> 0.4669,
    "u2_unpivot" -> 0.3833,
    "w10_event_paths" -> 0.4616,
    "w11_time_to_convert" -> 0.6481,
    "w12_attribution" -> 0.7502,
    "w13_stream_join" -> 0.3356,
    "w1_tumbling_window" -> 0.328,
    "w2_sliding_window" -> 0.2916,
    "w3_session_window" -> 0.7757,
    "w4_window_rank" -> 0.5575,
    "w5_lag_cumsum" -> 0.7025,
    "w6_funnel" -> 1.2318,
    "w7_retention" -> 0.8679,
    "w8_anomaly" -> 0.6496,
    "w8_rank_native" -> 0.3609,
    "w9_gapfill" -> 0.5441,
    "x0_exact_dedup" -> 0.2877,
    "x100_bpe_merges" -> 4.9334,
    "x101_bpe_apply" -> 5.7217,
    "x102_self_repetition" -> 2.6521,
    "x103_hard_negatives" -> 0.9147,
    "x104_span_corruption" -> 2.112,
    "x105_bpe_apply_local" -> 3.5397,
    "x106_bpe_sampled" -> 3.2423,
    "x107_hard_negatives_indexed" -> 3.0724,
    "x108_hard_negative_recall" -> 2.2027,
    "x109_hard_negatives_routed" -> 5.5195,
    "x10_media_features" -> 0.3405,
    "x11_ivf_topk" -> 1.0563,
    "x12_chunk_neardups" -> 0.602,
    "x13_token_chunks" -> 0.7666,
    "x14_fuzzy_names" -> 0.2961,
    "x15_tfidf_top_term" -> 1.0956,
    "x16_ngram_jaccard" -> 0.9687,
    "x17_pii_scrub" -> 0.5009,
    "x18_simhash_neardups" -> 1.409,
    "x19_stratified_sample" -> 0.2925,
    "x1_fingerprint" -> 0.2589,
    "x20_domain_cap" -> 0.2802,
    "x21_decontaminate" -> 1.109,
    "x22_int8_quant" -> 0.4911,
    "x23_train_shuffle" -> 0.3058,
    "x24_sequence_pack" -> 0.3622,
    "x25_frame_sample" -> 0.3088,
    "x26_media_resize" -> 0.2088,
    "x27_quant_topk" -> 0.2661,
    "x28_dedup_clusters" -> 1.8261,
    "x29_repetition_metrics" -> 0.9941,
    "x2_quality_metrics" -> 0.519,
    "x30_knn_join" -> 0.5501,
    "x31_vocab_stats" -> 0.4078,
    "x32_bigram_logprob" -> 1.4461,
    "x33_embed_clusters" -> 2.3331,
    "x34_span_dedup" -> 1.1144,
    "x35_semdedup" -> 1.4699,
    "x36_hybrid_rrf" -> 0.7738,
    "x37_domain_mix" -> 0.5903,
    "x38_native_topk" -> 0.3259,
    "x39_incremental_neardups" -> 1.4106,
    "x3_lang_id" -> 0.5409,
    "x40_perplexity_bins" -> 1.629,
    "x41_indexed_screen" -> 2.2253,
    "x42_domain_mix_up" -> 0.6949,
    "x43_knn_native" -> 0.4415,
    "x44_temperature_mix" -> 1.5516,
    "x45_fuzzy_decontam" -> 2.171,
    "x46_heavy_tokens" -> 0.5567,
    "x47_unicode_dedup" -> 0.7595,
    "x48_incremental_clusters" -> 2.6467,
    "x49_quality_features" -> 2.5105,
    "x4_minhash_neardups" -> 1.4793,
    "x50_train_split" -> 0.4616,
    "x51_corpus_drift" -> 0.4675,
    "x52_leakage_safe_splits" -> 2.0871,
    "x53_quality_scores" -> 2.5296,
    "x54_jl_projection" -> 1.364,
    "x55_jl_knn" -> 0.7722,
    "x56_weighted_sample" -> 0.2877,
    "x57_dsir_select" -> 2.4003,
    "x58_filter_cascade" -> 1.8161,
    "x59_dsir_screen" -> 1.8978,
    "x5_simhash" -> 1.2111,
    "x60_diverse_sample" -> 0.7856,
    "x61_gram_coverage" -> 0.7433,
    "x62_embedding_drift" -> 0.9716,
    "x63_semantic_decontam" -> 0.3649,
    "x64_ann_recall" -> 1.3427,
    "x65_fit_classifier" -> 2.9266,
    "x66_pack_efficiency" -> 1.0252,
    "x67_dedup_thresholds" -> 1.928,
    "x68_leakage_audit" -> 1.9331,
    "x69_quality_canonical" -> 2.3345,
    "x6_brute_topk" -> 0.1552,
    "x70_pq_topk" -> 1.7398,
    "x71_pq_recall" -> 2.7926,
    "x72_ivfpq_topk" -> 1.7635,
    "x73_pq_indexed" -> 1.8361,
    "x74_pq_append" -> 2.3861,
    "x75_ivfpq_indexed" -> 2.832,
    "x76_pq_routed_knn" -> 3.1851,
    "x77_ivfpq_append" -> 4.541,
    "x78_ivfpq_residual" -> 2.3307,
    "x79_band_delete" -> 4.0529,
    "x7_ann_topk" -> 0.255,
    "x80_routed_recall" -> 5.3159,
    "x81_ivfpq_compact" -> 4.0851,
    "x82_residual_recall" -> 4.5351,
    "x83_pq_delete" -> 1.9191,
    "x84_ivfpq_residual_indexed" -> 3.5666,
    "x85_ivfpq_delete" -> 3.4138,
    "x86_clustered_recall" -> 5.9136,
    "x87_residual_routed_knn" -> 3.7323,
    "x88_two_stage_indexed" -> 2.5994,
    "x89_knn_pagerank" -> 2.5463,
    "x8_embed_neardups" -> 0.4567,
    "x90_ivfpq_residual_append" -> 4.253,
    "x91_source_authority" -> 3.8404,
    "x92_ivfpq_bigk" -> 2.3637,
    "x93_pq_bigks" -> 1.399,
    "x94_ivfpq_bigk_bigks" -> 1.9993,
    "x95_pr_curve" -> 3.1871,
    "x96_video_demux" -> 0.4368,
    "x97_substring_dedup" -> 2.0352,
    "x98_bloom_prune" -> 0.8394,
    "x99_bloom_admission" -> 1.1467,
    "x9_token_stats" -> 0.4492,
    // round-16 gates: provisional solo-run values (idle box, loadavg
    // 0.66, args-mode run of exactly these four) — re-snapshotted from
    // the closing full-suite run like everything else
    "pl15_training_pairs" -> 8.6029,
    "x110_sharded_bloom_rotate" -> 2.1355,
    "x111_bpe_batched" -> 3.2515,
    "x112_adaptive_nprobe" -> 9.1007
  )
}
