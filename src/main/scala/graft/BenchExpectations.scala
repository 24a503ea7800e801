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
  * Current snapshot: round-12 FINAL closing full-suite solo run through
  * the SHARDED harness (6 cost-balanced shards, each a fresh child JVM;
  * warmup + min-of-2; cache release and sink sweep off-clock) — all 162
  * queries from ONE coherent run at HEAD (128.9s total, zero
  * regressions, zero errors; quiet box per the contract line's own env
  * field: one other JVM throughout; earlier same-session runs landed at
  * 183-198s before the review-fix pass split the routed join's
  * broadcasts — sub-2× run-to-run spread, all coherent), measured under
  * the SAME contract the harness applies, so regression factors are
  * apples-to-apples. Since round 12 the committed `bench_full.json`
  * itself carries per-query gc_ms and the env bookends — adjudicate
  * flags from the artifact first.
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
    "a10_reconcile" -> 0.2608,
    "a11_percentiles" -> 0.5582,
    "a12_rollup" -> 0.332,
    "a13_group_stats" -> 0.3003,
    "a14_profile" -> 0.5999,
    "a15_cube" -> 0.3874,
    "a16_incremental_agg" -> 0.3398,
    "a17_quality_checks" -> 0.3056,
    "a18_group_mode" -> 0.2554,
    "a19_decimal_money" -> 1.3081,
    "a1_group_sum" -> 0.3296,
    "a20_kmv_distinct" -> 0.8789,
    "a21_kmv_incremental" -> 1.1749,
    "a22_kmv_overlap" -> 0.8556,
    "a23_daily_distinct" -> 0.571,
    "a3_cycle_breakdown" -> 0.1907,
    "a4_conditional_pivot" -> 0.3804,
    "a7_distinct_values" -> 0.1587,
    "a8_global_stats" -> 0.2025,
    "d1_amount_bins" -> 0.1733,
    "d2_company_type" -> 0.1523,
    "d3_party_pivot" -> 0.4289,
    "d4_composite_key" -> 0.1053,
    "j1_lookup_join" -> 0.3097,
    "j2_anti_join" -> 0.2796,
    "j2_dedup_keepfirst" -> 1.0517,
    "j3_asof_join" -> 0.5233,
    "j4_range_join" -> 0.4823,
    "j5_upsert_merge" -> 0.2576,
    "j6_scd2" -> 0.4522,
    "j7_salted_join" -> 0.5412,
    "j8_bloom_join" -> 0.3871,
    "j9_snapshot_diff" -> 0.3321,
    "join_q10_returns" -> 0.4903,
    "join_q18_big_orders" -> 0.4626,
    "join_q3_revenue" -> 0.6939,
    "join_q5_nation_revenue" -> 0.6627,
    "p11_iso8601" -> 0.303,
    "p14_pushdown_filter" -> 0.2002,
    "p18_json_extract" -> 0.3777,
    "p2_normalize_dropnull" -> 0.1517,
    "p3_clean_normalize" -> 0.1403,
    "p5_name_coercion" -> 0.4838,
    "p6_datetime_coercion" -> 0.234,
    "p8_null_fill" -> 0.1947,
    "p9_metadata" -> 0.0963,
    "pl10_classifier_pipeline" -> 3.7333,
    "pl11_dsir_pipeline" -> 3.7301,
    "pl1_csv_pipeline" -> 1.3389,
    "pl2_sql_pipeline" -> 0.6523,
    "pl3_realtime_pipeline" -> 1.1401,
    "pl4_issues_pipeline" -> 0.5135,
    "pl5_curation_pipeline" -> 2.1461,
    "pl6_events_pipeline" -> 1.0071,
    "pl7_corpus_report" -> 1.1656,
    "pl8_nightly_ingest" -> 3.2885,
    "pl9_export_shards" -> 0.8057,
    "s10_tree_paths" -> 0.5928,
    "s11_dryrun" -> 0.1508,
    "s12_orc_scan" -> 0.7157,
    "s13_json_scan" -> 0.3042,
    "s14_partitioned_scan" -> 0.5676,
    "s16_bucketed_join" -> 1.7446,
    "s17_zorder_scan" -> 0.9955,
    "s18_schema_evolution" -> 0.4187,
    "s19_compaction" -> 0.9146,
    "s1_csv_scan" -> 0.6486,
    "s2_jdbc_roundtrip" -> 0.3231,
    "s3_jdbc_partitioned" -> 0.3907,
    "s7_sink_roundtrip" -> 0.282,
    "s8_batched_sink" -> 0.3251,
    "s9_tree_roundtrip" -> 0.1538,
    "t1_topk_rows" -> 0.0883,
    "t2_topk_groups" -> 0.1724,
    "u1_set_ops" -> 0.3716,
    "u2_unpivot" -> 0.2742,
    "w10_event_paths" -> 0.3393,
    "w11_time_to_convert" -> 0.539,
    "w12_attribution" -> 0.3602,
    "w13_stream_join" -> 0.2457,
    "w1_tumbling_window" -> 0.2378,
    "w2_sliding_window" -> 0.2689,
    "w3_session_window" -> 0.5601,
    "w4_window_rank" -> 0.2911,
    "w5_lag_cumsum" -> 0.4715,
    "w6_funnel" -> 0.503,
    "w7_retention" -> 0.4402,
    "w8_anomaly" -> 0.3135,
    "w8_rank_native" -> 0.2664,
    "w9_gapfill" -> 0.4134,
    "x0_exact_dedup" -> 0.1856,
    "x10_media_features" -> 0.2705,
    "x11_ivf_topk" -> 0.9183,
    "x12_chunk_neardups" -> 0.3861,
    "x13_token_chunks" -> 0.4146,
    "x14_fuzzy_names" -> 0.2355,
    "x15_tfidf_top_term" -> 0.8162,
    "x16_ngram_jaccard" -> 1.0402,
    "x17_pii_scrub" -> 0.3233,
    "x18_simhash_neardups" -> 1.1947,
    "x19_stratified_sample" -> 0.1861,
    "x1_fingerprint" -> 0.1836,
    "x20_domain_cap" -> 0.1829,
    "x21_decontaminate" -> 0.7847,
    "x22_int8_quant" -> 0.4015,
    "x23_train_shuffle" -> 0.2262,
    "x24_sequence_pack" -> 0.2415,
    "x25_frame_sample" -> 0.1813,
    "x26_media_resize" -> 0.1606,
    "x27_quant_topk" -> 0.2055,
    "x28_dedup_clusters" -> 1.4227,
    "x29_repetition_metrics" -> 0.7716,
    "x2_quality_metrics" -> 0.4694,
    "x30_knn_join" -> 0.3276,
    "x31_vocab_stats" -> 0.2606,
    "x32_bigram_logprob" -> 0.7889,
    "x33_embed_clusters" -> 2.1108,
    "x34_span_dedup" -> 0.7703,
    "x35_semdedup" -> 1.4256,
    "x36_hybrid_rrf" -> 0.6816,
    "x37_domain_mix" -> 0.516,
    "x38_native_topk" -> 0.1729,
    "x39_incremental_neardups" -> 1.0327,
    "x3_lang_id" -> 0.3582,
    "x40_perplexity_bins" -> 1.0972,
    "x41_indexed_screen" -> 2.147,
    "x42_domain_mix_up" -> 0.6468,
    "x43_knn_native" -> 0.3787,
    "x44_temperature_mix" -> 0.6973,
    "x45_fuzzy_decontam" -> 1.3024,
    "x46_heavy_tokens" -> 0.436,
    "x47_unicode_dedup" -> 0.396,
    "x48_incremental_clusters" -> 2.0265,
    "x49_quality_features" -> 2.0723,
    "x4_minhash_neardups" -> 0.8381,
    "x50_train_split" -> 0.2055,
    "x51_corpus_drift" -> 0.3461,
    "x52_leakage_safe_splits" -> 1.54,
    "x53_quality_scores" -> 1.9748,
    "x54_jl_projection" -> 1.0569,
    "x55_jl_knn" -> 0.5733,
    "x56_weighted_sample" -> 0.1705,
    "x57_dsir_select" -> 2.037,
    "x58_filter_cascade" -> 1.31,
    "x59_dsir_screen" -> 1.1329,
    "x5_simhash" -> 0.7936,
    "x60_diverse_sample" -> 0.9215,
    "x61_gram_coverage" -> 0.5831,
    "x62_embedding_drift" -> 0.7916,
    "x63_semantic_decontam" -> 0.7364,
    "x64_ann_recall" -> 1.4541,
    "x65_fit_classifier" -> 2.0825,
    "x66_pack_efficiency" -> 0.5806,
    "x67_dedup_thresholds" -> 1.7311,
    "x68_leakage_audit" -> 1.7041,
    "x69_quality_canonical" -> 1.5976,
    "x6_brute_topk" -> 0.1243,
    "x70_pq_topk" -> 2.3611,
    "x71_pq_recall" -> 3.3445,
    "x72_ivfpq_topk" -> 2.9216,
    "x73_pq_indexed" -> 2.9391,
    "x74_pq_append" -> 4.405,
    "x75_ivfpq_indexed" -> 3.5962,
    "x76_pq_routed_knn" -> 4.4357,
    "x77_ivfpq_append" -> 8.1348,
    "x78_ivfpq_residual" -> 4.1489,
    "x79_band_delete" -> 3.4064,
    "x7_ann_topk" -> 0.1949,
    "x80_routed_recall" -> 6.7733,
    "x81_ivfpq_compact" -> 8.3821,
    "x82_residual_recall" -> 8.456,
    "x83_pq_delete" -> 4.2218,
    "x84_ivfpq_residual_indexed" -> 6.8377,
    "x85_ivfpq_delete" -> 5.5455,
    "x86_clustered_recall" -> 10.7327,
    "x87_residual_routed_knn" -> 6.796,
    "x88_two_stage_indexed" -> 4.7916,
    "x89_knn_pagerank" -> 3.8466,
    "x90_ivfpq_residual_append" -> 5.5453,
    "x91_source_authority" -> 4.1412,
    "pl12_index_refresh" -> 3.9792,
    "x8_embed_neardups" -> 0.4072,
    "x9_token_stats" -> 0.3596,
  )
}
