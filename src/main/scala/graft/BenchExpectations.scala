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
  * Current snapshot: round-13 FINAL closing full-suite solo run at HEAD
  * — all 185 queries from ONE coherent run (309.8s total, zero errors;
  * idle box per the contract line's own env field, loadavg 0.17 at
  * start, one other JVM throughout) — EXCEPT that any query the in-suite
  * run itself flagged carries its solo-adjudicated timing instead (pl5
  * 3.11s, pl6 1.55s). Round-13 verdict "What's wrong #1": carrying the
  * inflated in-suite reading for a query the same round adjudicated as
  * churn sets that query's flag threshold at RegressionFactor x the
  * INFLATED value (~5.6x its true solo cost for pl5) — regression
  * detection for exactly the churn-prone queries would be disabled. Rule
  * for every future refresh: a query flagged in-suite and adjudicated
  * solo snapshots min(in-suite, solo). The committed `bench_full.json`
  * carries per-query gc_ms and the env bookends — adjudicate flags from
  * the artifact first.
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
    "a10_reconcile" -> 0.3845,
    "a11_percentiles" -> 1.1797,
    "a12_rollup" -> 0.4769,
    "a13_group_stats" -> 0.5693,
    "a14_profile" -> 0.7953,
    "a15_cube" -> 0.6364,
    "a16_incremental_agg" -> 0.4945,
    "a17_quality_checks" -> 0.6776,
    "a18_group_mode" -> 0.4663,
    "a19_decimal_money" -> 1.0901,
    "a1_group_sum" -> 0.4556,
    "a20_kmv_distinct" -> 0.9527,
    "a21_kmv_incremental" -> 0.9659,
    "a22_kmv_overlap" -> 1.1872,
    "a23_daily_distinct" -> 0.6613,
    "a24_value_histogram" -> 0.5868,
    "a3_cycle_breakdown" -> 0.2868,
    "a4_conditional_pivot" -> 0.746,
    "a7_distinct_values" -> 0.3265,
    "a8_global_stats" -> 0.3673,
    "d1_amount_bins" -> 0.2296,
    "d2_company_type" -> 0.2291,
    "d3_party_pivot" -> 0.5673,
    "d4_composite_key" -> 0.1296,
    "j1_lookup_join" -> 0.3257,
    "j2_anti_join" -> 0.3895,
    "j2_dedup_keepfirst" -> 1.5782,
    "j3_asof_join" -> 0.7575,
    "j4_range_join" -> 0.8747,
    "j5_upsert_merge" -> 0.3276,
    "j6_scd2" -> 0.5118,
    "j7_salted_join" -> 0.9271,
    "j8_bloom_join" -> 0.5701,
    "j9_snapshot_diff" -> 0.4866,
    "join_q10_returns" -> 0.6007,
    "join_q18_big_orders" -> 0.8243,
    "join_q3_revenue" -> 0.8606,
    "join_q5_nation_revenue" -> 1.1662,
    "p11_iso8601" -> 0.5018,
    "p14_pushdown_filter" -> 0.3676,
    "p18_json_extract" -> 0.7066,
    "p2_normalize_dropnull" -> 0.2477,
    "p3_clean_normalize" -> 0.247,
    "p5_name_coercion" -> 0.84,
    "p6_datetime_coercion" -> 0.3417,
    "p8_null_fill" -> 0.1969,
    "p9_metadata" -> 0.141,
    "pl10_classifier_pipeline" -> 5.4366,
    "pl11_dsir_pipeline" -> 4.881,
    "pl12_index_refresh" -> 3.8157,
    "pl13_sketch_report" -> 1.7047,
    "pl1_csv_pipeline" -> 1.7956,
    "pl2_sql_pipeline" -> 1.0954,
    "pl3_realtime_pipeline" -> 1.3382,
    "pl4_issues_pipeline" -> 0.8522,
    "pl5_curation_pipeline" -> 3.11, // solo-adjudicated (in-suite 8.7623 was churn)
    "pl6_events_pipeline" -> 1.55, // solo-adjudicated (in-suite 4.1353 was churn)
    "pl7_corpus_report" -> 1.2759,
    "pl8_nightly_ingest" -> 5.8934,
    "pl9_export_shards" -> 1.1347,
    "s10_tree_paths" -> 0.9805,
    "s11_dryrun" -> 0.2581,
    "s12_orc_scan" -> 0.8826,
    "s13_json_scan" -> 0.383,
    "s14_partitioned_scan" -> 0.7685,
    "s16_bucketed_join" -> 3.1169,
    "s17_zorder_scan" -> 1.5943,
    "s18_schema_evolution" -> 0.7619,
    "s19_compaction" -> 1.516,
    "s1_csv_scan" -> 1.0644,
    "s2_jdbc_roundtrip" -> 0.5941,
    "s3_jdbc_partitioned" -> 0.5428,
    "s7_sink_roundtrip" -> 0.4458,
    "s8_batched_sink" -> 0.6567,
    "s9_tree_roundtrip" -> 0.2371,
    "t1_topk_rows" -> 0.1345,
    "t2_topk_groups" -> 0.2098,
    "u1_set_ops" -> 0.5291,
    "u2_unpivot" -> 0.3694,
    "w10_event_paths" -> 0.4879,
    "w11_time_to_convert" -> 0.8151,
    "w12_attribution" -> 0.6886,
    "w13_stream_join" -> 0.3287,
    "w1_tumbling_window" -> 0.4182,
    "w2_sliding_window" -> 0.419,
    "w3_session_window" -> 0.7313,
    "w4_window_rank" -> 0.3745,
    "w5_lag_cumsum" -> 0.7995,
    "w6_funnel" -> 0.6721,
    "w7_retention" -> 0.5624,
    "w8_anomaly" -> 0.3699,
    "w8_rank_native" -> 0.4414,
    "w9_gapfill" -> 0.554,
    "x0_exact_dedup" -> 0.3017,
    "x10_media_features" -> 0.3602,
    "x11_ivf_topk" -> 1.1402,
    "x12_chunk_neardups" -> 0.6232,
    "x13_token_chunks" -> 0.8981,
    "x14_fuzzy_names" -> 0.2797,
    "x15_tfidf_top_term" -> 1.2874,
    "x16_ngram_jaccard" -> 1.4049,
    "x17_pii_scrub" -> 0.5269,
    "x18_simhash_neardups" -> 1.6494,
    "x19_stratified_sample" -> 0.3484,
    "x1_fingerprint" -> 0.2521,
    "x20_domain_cap" -> 0.3,
    "x21_decontaminate" -> 1.1929,
    "x22_int8_quant" -> 0.5202,
    "x23_train_shuffle" -> 0.379,
    "x24_sequence_pack" -> 0.3997,
    "x25_frame_sample" -> 0.2948,
    "x26_media_resize" -> 0.2305,
    "x27_quant_topk" -> 0.2822,
    "x28_dedup_clusters" -> 2.1505,
    "x29_repetition_metrics" -> 1.3907,
    "x2_quality_metrics" -> 0.5695,
    "x30_knn_join" -> 0.5384,
    "x31_vocab_stats" -> 0.4654,
    "x32_bigram_logprob" -> 1.0687,
    "x33_embed_clusters" -> 2.4477,
    "x34_span_dedup" -> 1.0452,
    "x35_semdedup" -> 1.8876,
    "x36_hybrid_rrf" -> 0.7871,
    "x37_domain_mix" -> 0.7791,
    "x38_native_topk" -> 0.279,
    "x39_incremental_neardups" -> 2.1317,
    "x3_lang_id" -> 0.5477,
    "x40_perplexity_bins" -> 1.7704,
    "x41_indexed_screen" -> 2.0543,
    "x42_domain_mix_up" -> 0.9249,
    "x43_knn_native" -> 0.6124,
    "x44_temperature_mix" -> 1.0797,
    "x45_fuzzy_decontam" -> 1.5517,
    "x46_heavy_tokens" -> 0.5576,
    "x47_unicode_dedup" -> 0.8025,
    "x48_incremental_clusters" -> 2.5901,
    "x49_quality_features" -> 2.8577,
    "x4_minhash_neardups" -> 0.9551,
    "x50_train_split" -> 0.4483,
    "x51_corpus_drift" -> 0.3919,
    "x52_leakage_safe_splits" -> 1.9927,
    "x53_quality_scores" -> 3.3681,
    "x54_jl_projection" -> 1.4492,
    "x55_jl_knn" -> 0.7423,
    "x56_weighted_sample" -> 0.2755,
    "x57_dsir_select" -> 2.4064,
    "x58_filter_cascade" -> 1.8373,
    "x59_dsir_screen" -> 1.9944,
    "x5_simhash" -> 1.3484,
    "x60_diverse_sample" -> 0.8381,
    "x61_gram_coverage" -> 1.113,
    "x62_embedding_drift" -> 1.1031,
    "x63_semantic_decontam" -> 0.4863,
    "x64_ann_recall" -> 1.4318,
    "x65_fit_classifier" -> 3.0334,
    "x66_pack_efficiency" -> 0.7413,
    "x67_dedup_thresholds" -> 2.0915,
    "x68_leakage_audit" -> 2.0206,
    "x69_quality_canonical" -> 2.9486,
    "x6_brute_topk" -> 0.2517,
    "x70_pq_topk" -> 3.3626,
    "x71_pq_recall" -> 4.6561,
    "x72_ivfpq_topk" -> 4.0077,
    "x73_pq_indexed" -> 4.6396,
    "x74_pq_append" -> 5.8736,
    "x75_ivfpq_indexed" -> 7.8377,
    "x76_pq_routed_knn" -> 7.7077,
    "x77_ivfpq_append" -> 9.9646,
    "x78_ivfpq_residual" -> 5.4702,
    "x79_band_delete" -> 3.3575,
    "x7_ann_topk" -> 0.2673,
    "x80_routed_recall" -> 7.896,
    "x81_ivfpq_compact" -> 7.9467,
    "x82_residual_recall" -> 9.2992,
    "x83_pq_delete" -> 5.0246,
    "x84_ivfpq_residual_indexed" -> 8.504,
    "x85_ivfpq_delete" -> 7.0949,
    "x86_clustered_recall" -> 9.459,
    "x87_residual_routed_knn" -> 6.9312,
    "x88_two_stage_indexed" -> 4.5503,
    "x89_knn_pagerank" -> 2.6698,
    "x8_embed_neardups" -> 0.5113,
    "x90_ivfpq_residual_append" -> 6.4861,
    "x91_source_authority" -> 5.8488,
    // round-14 additions, solo-measured at entry (refreshed at close)
    "x92_ivfpq_bigk" -> 1.7962,
    "x93_pq_bigks" -> 1.3437,
    "x9_token_stats" -> 0.5091,
  )
}
