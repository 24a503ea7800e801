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
  * Current snapshot: round-8 clean solo run under the off-clock-release
  * protocol (release between timers, warmup pass, min-of-2), all 112
  * queries (x34-x40 and pl7 from targeted solo runs under the same
  * contract) — measured under the SAME contract the harness applies, so
  * regression factors are apples-to-apples.
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
    "a10_reconcile" -> 0.4294,
    "a11_percentiles" -> 0.8524,
    "a12_rollup" -> 0.5265,
    "a13_group_stats" -> 0.3933,
    "a14_profile" -> 0.8934,
    "a15_cube" -> 0.5007,
    "a16_incremental_agg" -> 0.4994,
    "a17_quality_checks" -> 0.4884,
    "a18_group_mode" -> 0.3445,
    "a1_group_sum" -> 0.4365,
    "a3_cycle_breakdown" -> 0.2858,
    "a4_conditional_pivot" -> 0.4648,
    "a7_distinct_values" -> 0.2112,
    "a8_global_stats" -> 0.2847,
    "d1_amount_bins" -> 0.2308,
    "d2_company_type" -> 0.2443,
    "d3_party_pivot" -> 0.5567,
    "d4_composite_key" -> 0.1441,
    "j1_lookup_join" -> 0.3589,
    "j2_anti_join" -> 0.3873,
    "j2_dedup_keepfirst" -> 1.3818,
    "j3_asof_join" -> 0.7630,
    "j4_range_join" -> 0.7577,
    "j5_upsert_merge" -> 0.3660,
    "j6_scd2" -> 0.4846,
    "j7_salted_join" -> 0.7811,
    "j8_bloom_join" -> 0.5689,
    "join_q10_returns" -> 0.7019,
    "join_q18_big_orders" -> 0.6269,
    "join_q3_revenue" -> 0.8182,
    "join_q5_nation_revenue" -> 0.9223,
    "p11_iso8601" -> 0.4100,
    "p14_pushdown_filter" -> 0.3110,
    "p18_json_extract" -> 0.4656,
    "p2_normalize_dropnull" -> 0.2369,
    "p3_clean_normalize" -> 0.1639,
    "p5_name_coercion" -> 0.3972,
    "p8_null_fill" -> 0.3052,
    "p9_metadata" -> 0.1348,
    "pl1_csv_pipeline" -> 1.8608,
    "pl2_sql_pipeline" -> 1.0000,
    "pl3_realtime_pipeline" -> 1.4659,
    "pl4_issues_pipeline" -> 0.5768,
    "pl5_curation_pipeline" -> 3.7133,
    "pl7_corpus_report" -> 1.3302,
    "pl6_events_pipeline" -> 1.5817,
    "s10_tree_paths" -> 0.9549,
    "s11_dryrun" -> 0.1667,
    "s12_orc_scan" -> 1.0150,
    "s13_json_scan" -> 0.4246,
    "s14_partitioned_scan" -> 0.8613,
    "s1_csv_scan" -> 0.7410,
    "s7_sink_roundtrip" -> 0.4097,
    "s8_batched_sink" -> 0.5593,
    "s9_tree_roundtrip" -> 0.2008,
    "t1_topk_rows" -> 0.1306,
    "t2_topk_groups" -> 0.2852,
    "u1_set_ops" -> 0.5661,
    "u2_unpivot" -> 0.4474,
    "w10_event_paths" -> 0.4705,
    "w11_time_to_convert" -> 0.7713,
    "w12_attribution" -> 0.5047,
    "w1_tumbling_window" -> 0.2869,
    "w2_sliding_window" -> 0.3752,
    "w3_session_window" -> 0.5975,
    "w4_window_rank" -> 0.4083,
    "w5_lag_cumsum" -> 0.6462,
    "w6_funnel" -> 0.8541,
    "w7_retention" -> 0.6608,
    "w8_anomaly" -> 0.4783,
    "w9_gapfill" -> 0.5923,
    "x0_exact_dedup" -> 0.3129,
    "x10_media_features" -> 0.4143,
    "x11_ivf_topk" -> 1.1566,
    "x12_chunk_neardups" -> 0.5171,
    "x13_token_chunks" -> 0.5166,
    "x14_fuzzy_names" -> 0.3716,
    "x15_tfidf_top_term" -> 1.1251,
    "x16_ngram_jaccard" -> 1.2653,
    "x17_pii_scrub" -> 0.5034,
    "x18_simhash_neardups" -> 1.7533,
    "x19_stratified_sample" -> 0.3059,
    "x1_fingerprint" -> 0.2281,
    "x20_domain_cap" -> 0.3253,
    "x21_decontaminate" -> 1.0745,
    "x22_int8_quant" -> 0.4517,
    "x23_train_shuffle" -> 0.2307,
    "x24_sequence_pack" -> 0.4000,
    "x25_frame_sample" -> 0.2907,
    "x26_media_resize" -> 0.2385,
    "x27_quant_topk" -> 0.3080,
    "x28_dedup_clusters" -> 2.0635,
    "x29_repetition_metrics" -> 1.5450,
    "x2_quality_metrics" -> 0.9855,
    "x30_knn_join" -> 0.8117,
    "x31_vocab_stats" -> 0.4245,
    "x32_bigram_logprob" -> 1.2365,
    "x33_embed_clusters" -> 2.8664,
    // round-8 additions, measured by a targeted solo `Bench x34... x35...
    // x36...` run under the same off-clock-release contract
    "x34_span_dedup" -> 0.9797,
    "x35_semdedup" -> 1.5989,
    "x36_hybrid_rrf" -> 0.9438,
    "x37_domain_mix" -> 1.1797,
    "x38_native_topk" -> 0.4053,
    "x39_incremental_neardups" -> 1.5667,
    "x40_perplexity_bins" -> 1.7264,
    "x3_lang_id" -> 0.5260,
    "x4_minhash_neardups" -> 1.0623,
    "x5_simhash" -> 0.9654,
    "x6_brute_topk" -> 0.1885,
    "x7_ann_topk" -> 0.2577,
    "x8_embed_neardups" -> 0.4639,
    "x9_token_stats" -> 0.5556)
}
