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
  * Current snapshot: round-9 END-OF-ROUND full-suite solo run under the
  * off-clock-release protocol (release between timers, warmup pass,
  * min-of-2) — all 136 queries from ONE coherent run (142.5s total,
  * zero regressions vs the prior incrementally-maintained snapshot),
  * measured under the SAME contract the harness applies, so regression
  * factors are apples-to-apples. Queries added after that run
  * (x57–x60, pl11) carry targeted solo-run values under the same
  * contract.
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
    "a10_reconcile" -> 0.3838,
    "a11_percentiles" -> 0.8938,
    "a12_rollup" -> 0.6081,
    "a13_group_stats" -> 0.4359,
    "a14_profile" -> 1.0662,
    "a15_cube" -> 0.5846,
    "a16_incremental_agg" -> 0.5801,
    "a17_quality_checks" -> 0.6125,
    "a18_group_mode" -> 0.3876,
    "a1_group_sum" -> 0.5381,
    "a3_cycle_breakdown" -> 0.3699,
    "a4_conditional_pivot" -> 0.6417,
    "a7_distinct_values" -> 0.2598,
    "a8_global_stats" -> 0.3422,
    "d1_amount_bins" -> 0.2896,
    "d2_company_type" -> 0.288,
    "d3_party_pivot" -> 0.6912,
    "d4_composite_key" -> 0.1639,
    "j1_lookup_join" -> 0.4802,
    "j2_anti_join" -> 0.4642,
    "j2_dedup_keepfirst" -> 1.6596,
    "j3_asof_join" -> 0.8092,
    "j4_range_join" -> 0.8024,
    "j5_upsert_merge" -> 0.4091,
    "j6_scd2" -> 0.5891,
    "j7_salted_join" -> 0.8867,
    "j8_bloom_join" -> 0.6682,
    "join_q10_returns" -> 0.7667,
    "join_q18_big_orders" -> 0.7873,
    "join_q3_revenue" -> 0.9212,
    "join_q5_nation_revenue" -> 1.0402,
    "p11_iso8601" -> 0.4384,
    "p14_pushdown_filter" -> 0.358,
    "p18_json_extract" -> 0.4757,
    "p2_normalize_dropnull" -> 0.2607,
    "p3_clean_normalize" -> 0.2056,
    "p5_name_coercion" -> 0.5049,
    "p8_null_fill" -> 0.3245,
    "p9_metadata" -> 0.1788,
    "pl10_classifier_pipeline" -> 6.4854,
    "pl1_csv_pipeline" -> 2.4661,
    "pl2_sql_pipeline" -> 1.0864,
    "pl3_realtime_pipeline" -> 1.9475,
    "pl4_issues_pipeline" -> 0.7688,
    "pl5_curation_pipeline" -> 3.6661,
    "pl6_events_pipeline" -> 2.0365,
    "pl7_corpus_report" -> 1.8516,
    "pl8_nightly_ingest" -> 6.0422,
    "pl9_export_shards" -> 2.1244,
    "s10_tree_paths" -> 1.3414,
    "s11_dryrun" -> 0.2462,
    "s12_orc_scan" -> 1.1269,
    "s13_json_scan" -> 0.4739,
    "s14_partitioned_scan" -> 1.0629,
    "s16_bucketed_join" -> 3.1616,
    "s17_zorder_scan" -> 1.6753,
    "s18_schema_evolution" -> 0.8163,
    "s19_compaction" -> 1.2203,
    "s1_csv_scan" -> 1.0089,
    "s7_sink_roundtrip" -> 0.5431,
    "s8_batched_sink" -> 0.5268,
    "s9_tree_roundtrip" -> 0.2643,
    "t1_topk_rows" -> 0.1541,
    "t2_topk_groups" -> 0.2676,
    "u1_set_ops" -> 0.6667,
    "u2_unpivot" -> 0.4787,
    "w10_event_paths" -> 0.6236,
    "w11_time_to_convert" -> 0.8873,
    "w12_attribution" -> 0.6664,
    "w1_tumbling_window" -> 0.4722,
    "w2_sliding_window" -> 0.4491,
    "w3_session_window" -> 0.8801,
    "w4_window_rank" -> 0.4878,
    "w5_lag_cumsum" -> 0.7765,
    "w6_funnel" -> 0.8549,
    "w7_retention" -> 0.7887,
    "w8_anomaly" -> 0.5837,
    "w8_rank_native" -> 0.3573,
    "w9_gapfill" -> 0.6899,
    "x0_exact_dedup" -> 0.3656,
    "x10_media_features" -> 0.5206,
    "x11_ivf_topk" -> 1.5348,
    "x12_chunk_neardups" -> 0.6425,
    "x13_token_chunks" -> 0.6745,
    "x14_fuzzy_names" -> 0.4018,
    "x15_tfidf_top_term" -> 1.3931,
    "x16_ngram_jaccard" -> 1.3859,
    "x17_pii_scrub" -> 0.7131,
    "x18_simhash_neardups" -> 1.7689,
    "x19_stratified_sample" -> 0.3726,
    "x1_fingerprint" -> 0.3384,
    "x20_domain_cap" -> 0.3511,
    "x21_decontaminate" -> 1.246,
    "x22_int8_quant" -> 0.5785,
    "x23_train_shuffle" -> 0.2781,
    "x24_sequence_pack" -> 0.4803,
    "x25_frame_sample" -> 0.317,
    "x26_media_resize" -> 0.2607,
    "x27_quant_topk" -> 0.3323,
    "x28_dedup_clusters" -> 1.9884,
    "x29_repetition_metrics" -> 1.2136,
    "x2_quality_metrics" -> 0.7177,
    "x30_knn_join" -> 0.6177,
    "x31_vocab_stats" -> 0.4054,
    "x32_bigram_logprob" -> 1.2663,
    "x33_embed_clusters" -> 3.1568,
    "x34_span_dedup" -> 1.2548,
    "x35_semdedup" -> 2.35,
    "x36_hybrid_rrf" -> 1.0254,
    "x37_domain_mix" -> 0.7764,
    "x38_native_topk" -> 0.3802,
    "x39_incremental_neardups" -> 1.8404,
    "x3_lang_id" -> 0.719,
    "x40_perplexity_bins" -> 2.294,
    "x41_indexed_screen" -> 2.6723,
    "x42_domain_mix_up" -> 1.0167,
    "x43_knn_native" -> 0.8014,
    "x44_temperature_mix" -> 1.0293,
    "x45_fuzzy_decontam" -> 1.8944,
    "x46_heavy_tokens" -> 0.8272,
    "x47_unicode_dedup" -> 0.6207,
    "x48_incremental_clusters" -> 8.2322,
    "x49_quality_features" -> 3.1479,
    "x4_minhash_neardups" -> 1.3919,
    "x50_train_split" -> 0.479,
    "x51_corpus_drift" -> 0.7063,
    "x52_leakage_safe_splits" -> 2.7004,
    "x53_quality_scores" -> 2.9718,
    "x54_jl_projection" -> 1.6112,
    "x55_jl_knn" -> 0.9287,
    "x56_weighted_sample" -> 0.2782,
    "x57_dsir_select" -> 2.852,
    "x58_filter_cascade" -> 1.7488,
    "x59_dsir_screen" -> 2.4672,
    "x60_diverse_sample" -> 2.897,
    "pl11_dsir_pipeline" -> 6.3682,
    "x5_simhash" -> 1.2357,
    "x6_brute_topk" -> 0.2751,
    "x7_ann_topk" -> 0.3149,
    "x8_embed_neardups" -> 0.5895,
    "x9_token_stats" -> 0.6213)
}
