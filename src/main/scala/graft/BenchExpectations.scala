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
    "a10_reconcile" -> 0.4012,
    "a11_percentiles" -> 0.7422,
    "a12_rollup" -> 0.5341,
    "a13_group_stats" -> 0.423,
    "a14_profile" -> 1.0836,
    "a15_cube" -> 0.8495,
    "a16_incremental_agg" -> 0.5031,
    "a17_quality_checks" -> 0.6367,
    "a18_group_mode" -> 0.3882,
    "a19_decimal_money" -> 1.737,
    "a1_group_sum" -> 0.4772,
    "a20_kmv_distinct" -> 0.6811,
    "a21_kmv_incremental" -> 1.1621,
    "a22_kmv_overlap" -> 1.1498,
    "a23_daily_distinct" -> 0.9285,
    "a24_value_histogram" -> 0.8448,
    "a3_cycle_breakdown" -> 0.2792,
    "a4_conditional_pivot" -> 0.766,
    "a7_distinct_values" -> 0.2966,
    "a8_global_stats" -> 0.294,
    "d1_amount_bins" -> 0.2631,
    "d2_company_type" -> 0.2288,
    "d3_party_pivot" -> 0.6151,
    "d4_composite_key" -> 0.1626,
    "j1_lookup_join" -> 0.5734,
    "j2_anti_join" -> 0.5173,
    "j2_dedup_keepfirst" -> 1.3963,
    "j3_asof_join" -> 0.9254,
    "j4_range_join" -> 0.8452,
    "j5_upsert_merge" -> 0.3772,
    "j6_scd2" -> 0.4787,
    "j7_salted_join" -> 0.7307,
    "j8_bloom_join" -> 0.7013,
    "j9_snapshot_diff" -> 0.5158,
    "join_q10_returns" -> 0.6848,
    "join_q18_big_orders" -> 0.8521,
    "join_q3_revenue" -> 0.9385,
    "join_q5_nation_revenue" -> 1.2803,
    "p11_iso8601" -> 0.5787,
    "p14_pushdown_filter" -> 0.3405,
    "p18_json_extract" -> 0.4908,
    "p2_normalize_dropnull" -> 0.2483,
    "p3_clean_normalize" -> 0.2078,
    "p5_name_coercion" -> 0.6663,
    "p6_datetime_coercion" -> 0.3818,
    "p8_null_fill" -> 0.2185,
    "p9_metadata" -> 0.2002,
    "pl10_classifier_pipeline" -> 5.3144,
    "pl11_dsir_pipeline" -> 4.5503,
    "pl12_index_refresh" -> 3.7929,
    "pl13_sketch_report" -> 1.2002,
    "pl14_bloom_rotate" -> 1.5042,
    "pl1_csv_pipeline" -> 1.847,
    "pl2_sql_pipeline" -> 0.9012,
    "pl3_realtime_pipeline" -> 1.4386,
    "pl4_issues_pipeline" -> 0.549,
    "pl5_curation_pipeline" -> 3.0179,
    "pl6_events_pipeline" -> 1.7583,
    "pl7_corpus_report" -> 2.1089,
    "pl8_nightly_ingest" -> 5.5697,
    "pl9_export_shards" -> 1.459,
    "s10_tree_paths" -> 0.9509,
    "s11_dryrun" -> 0.1898,
    "s12_orc_scan" -> 0.9279,
    "s13_json_scan" -> 0.4749,
    "s14_partitioned_scan" -> 0.8227,
    "s16_bucketed_join" -> 2.3622,
    "s17_zorder_scan" -> 1.4207,
    "s18_schema_evolution" -> 0.6512,
    "s19_compaction" -> 1.5274,
    "s1_csv_scan" -> 0.876,
    "s2_jdbc_roundtrip" -> 0.3904,
    "s3_jdbc_partitioned" -> 0.4904,
    "s7_sink_roundtrip" -> 0.5651,
    "s8_batched_sink" -> 0.4412,
    "s9_tree_roundtrip" -> 0.2304,
    "t1_topk_rows" -> 0.1789,
    "t2_topk_groups" -> 0.2802,
    "u1_set_ops" -> 0.6339,
    "u2_unpivot" -> 0.4142,
    "w10_event_paths" -> 0.5937,
    "w11_time_to_convert" -> 0.6291,
    "w12_attribution" -> 0.5911,
    "w13_stream_join" -> 0.3639,
    "w1_tumbling_window" -> 0.4289,
    "w2_sliding_window" -> 0.3121,
    "w3_session_window" -> 0.9187,
    "w4_window_rank" -> 0.449,
    "w5_lag_cumsum" -> 0.7992,
    "w6_funnel" -> 0.9117,
    "w7_retention" -> 0.7438,
    "w8_anomaly" -> 0.4664,
    "w8_rank_native" -> 0.4312,
    "w9_gapfill" -> 0.8894,
    "x0_exact_dedup" -> 0.323,
    "x100_bpe_merges" -> 5.0337,
    "x101_bpe_apply" -> 5.4056,
    "x102_self_repetition" -> 1.9436,
    "x103_hard_negatives" -> 0.5072,
    "x104_span_corruption" -> 2.547,
    "x105_bpe_apply_local" -> 3.6956,
    "x106_bpe_sampled" -> 4.1086,
    "x107_hard_negatives_indexed" -> 2.6906,
    "x109_hard_negatives_routed" -> 4.9375, // added post-snapshot, solo-measured
    "x108_hard_negative_recall" -> 2.6873,
    "x10_media_features" -> 0.5051,
    "x11_ivf_topk" -> 1.3672,
    "x12_chunk_neardups" -> 0.5382,
    "x13_token_chunks" -> 0.5352,
    "x14_fuzzy_names" -> 0.3313,
    "x15_tfidf_top_term" -> 1.3581,
    "x16_ngram_jaccard" -> 1.34,
    "x17_pii_scrub" -> 0.5021,
    "x18_simhash_neardups" -> 1.6856,
    "x19_stratified_sample" -> 0.3505,
    "x1_fingerprint" -> 0.2926,
    "x20_domain_cap" -> 0.307,
    "x21_decontaminate" -> 1.2743,
    "x22_int8_quant" -> 0.4323,
    "x23_train_shuffle" -> 0.3365,
    "x24_sequence_pack" -> 0.4611,
    "x25_frame_sample" -> 0.2974,
    "x26_media_resize" -> 0.2346,
    "x27_quant_topk" -> 0.2564,
    "x28_dedup_clusters" -> 2.096,
    "x29_repetition_metrics" -> 1.1239,
    "x2_quality_metrics" -> 0.7109,
    "x30_knn_join" -> 0.5295,
    "x31_vocab_stats" -> 0.3883,
    "x32_bigram_logprob" -> 1.4779,
    "x33_embed_clusters" -> 2.92,
    "x34_span_dedup" -> 1.2312,
    "x35_semdedup" -> 2.1981,
    "x36_hybrid_rrf" -> 0.9279,
    "x37_domain_mix" -> 0.8333,
    "x38_native_topk" -> 0.2668,
    "x39_incremental_neardups" -> 1.4586,
    "x3_lang_id" -> 0.5709,
    "x40_perplexity_bins" -> 1.9367,
    "x41_indexed_screen" -> 2.1557,
    "x42_domain_mix_up" -> 0.8328,
    "x43_knn_native" -> 0.6902,
    "x44_temperature_mix" -> 1.1314,
    "x45_fuzzy_decontam" -> 1.6824,
    "x46_heavy_tokens" -> 0.5979,
    "x47_unicode_dedup" -> 0.7248,
    "x48_incremental_clusters" -> 2.9838,
    "x49_quality_features" -> 3.0588,
    "x4_minhash_neardups" -> 1.274,
    "x50_train_split" -> 0.3115,
    "x51_corpus_drift" -> 0.4842,
    "x52_leakage_safe_splits" -> 1.9403,
    "x53_quality_scores" -> 2.8489,
    "x54_jl_projection" -> 1.5296,
    "x55_jl_knn" -> 0.7827,
    "x56_weighted_sample" -> 0.3263,
    "x57_dsir_select" -> 2.5116,
    "x58_filter_cascade" -> 1.8055,
    "x59_dsir_screen" -> 1.5341,
    "x5_simhash" -> 1.1747,
    "x60_diverse_sample" -> 0.9,
    "x61_gram_coverage" -> 0.9126,
    "x62_embedding_drift" -> 1.0951,
    "x63_semantic_decontam" -> 0.5331,
    "x64_ann_recall" -> 2.0563,
    "x65_fit_classifier" -> 2.8577,
    "x66_pack_efficiency" -> 1.0568,
    "x67_dedup_thresholds" -> 2.6952,
    "x68_leakage_audit" -> 2.16,
    "x69_quality_canonical" -> 2.6032,
    "x6_brute_topk" -> 0.1944,
    "x70_pq_topk" -> 1.2711,
    "x71_pq_recall" -> 2.5405,
    "x72_ivfpq_topk" -> 2.4676,
    "x73_pq_indexed" -> 2.2416,
    "x74_pq_append" -> 2.1959,
    "x75_ivfpq_indexed" -> 2.8423,
    "x76_pq_routed_knn" -> 4.0123,
    "x77_ivfpq_append" -> 4.247,
    "x78_ivfpq_residual" -> 2.5666,
    "x79_band_delete" -> 3.3702,
    "x7_ann_topk" -> 0.2952,
    "x80_routed_recall" -> 4.1721,
    "x81_ivfpq_compact" -> 5.2625,
    "x82_residual_recall" -> 3.641,
    "x83_pq_delete" -> 2.6144,
    "x84_ivfpq_residual_indexed" -> 4.4255,
    "x85_ivfpq_delete" -> 3.9153,
    "x86_clustered_recall" -> 5.0313,
    "x87_residual_routed_knn" -> 4.164,
    "x88_two_stage_indexed" -> 2.7483,
    "x89_knn_pagerank" -> 3.5825,
    "x8_embed_neardups" -> 0.4812,
    "x90_ivfpq_residual_append" -> 4.0088,
    "x91_source_authority" -> 5.3843,
    "x92_ivfpq_bigk" -> 1.8751,
    "x93_pq_bigks" -> 1.8122,
    "x94_ivfpq_bigk_bigks" -> 2.8757,
    "x95_pr_curve" -> 2.2326,
    "x96_video_demux" -> 0.5144,
    "x97_substring_dedup" -> 2.2387,
    "x98_bloom_prune" -> 0.7506,
    "x99_bloom_admission" -> 1.0853,
    "x9_token_stats" -> 0.5602
  )
}
