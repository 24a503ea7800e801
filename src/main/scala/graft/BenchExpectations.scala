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
  * protocol (release between timers, warmup pass, min-of-2), all 104
  * queries — the first snapshot measured under the SAME contract the
  * harness applies, so regression factors are apples-to-apples.
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

  val secondsAtSf01: Map[String, Double] = Map(
    "a10_reconcile" -> 0.3752,
    "a11_percentiles" -> 0.8966,
    "a12_rollup" -> 0.5112,
    "a13_group_stats" -> 0.3250,
    "a14_profile" -> 0.9841,
    "a15_cube" -> 0.4101,
    "a16_incremental_agg" -> 0.4694,
    "a17_quality_checks" -> 0.5019,
    "a18_group_mode" -> 0.3284,
    "a1_group_sum" -> 0.3855,
    "a3_cycle_breakdown" -> 0.2911,
    "a4_conditional_pivot" -> 0.5874,
    "a7_distinct_values" -> 0.2211,
    "a8_global_stats" -> 0.2797,
    "d1_amount_bins" -> 0.2587,
    "d2_company_type" -> 0.2395,
    "d3_party_pivot" -> 0.5628,
    "d4_composite_key" -> 0.1551,
    "j1_lookup_join" -> 0.4484,
    "j2_anti_join" -> 0.3855,
    "j2_dedup_keepfirst" -> 1.3979,
    "j3_asof_join" -> 0.7489,
    "j4_range_join" -> 0.7171,
    "j5_upsert_merge" -> 0.3879,
    "j6_scd2" -> 0.4500,
    "j7_salted_join" -> 0.7647,
    "j8_bloom_join" -> 0.7247,
    "join_q10_returns" -> 0.6838,
    "join_q18_big_orders" -> 0.5569,
    "join_q3_revenue" -> 0.8119,
    "join_q5_nation_revenue" -> 0.9038,
    "p11_iso8601" -> 0.4448,
    "p14_pushdown_filter" -> 0.3211,
    "p18_json_extract" -> 0.6081,
    "p2_normalize_dropnull" -> 0.2670,
    "p3_clean_normalize" -> 0.2019,
    "p5_name_coercion" -> 0.4737,
    "p8_null_fill" -> 0.2764,
    "p9_metadata" -> 0.1401,
    "pl1_csv_pipeline" -> 1.7651,
    "pl2_sql_pipeline" -> 0.8824,
    "pl3_realtime_pipeline" -> 1.5904,
    "pl4_issues_pipeline" -> 0.5194,
    "pl5_curation_pipeline" -> 3.5101,
    "pl6_events_pipeline" -> 1.6624,
    "s10_tree_paths" -> 0.9372,
    "s11_dryrun" -> 0.2142,
    "s12_orc_scan" -> 0.9213,
    "s13_json_scan" -> 0.3746,
    "s14_partitioned_scan" -> 0.8246,
    "s1_csv_scan" -> 0.8331,
    "s7_sink_roundtrip" -> 0.4084,
    "s8_batched_sink" -> 0.5948,
    "s9_tree_roundtrip" -> 0.2327,
    "t1_topk_rows" -> 0.1323,
    "t2_topk_groups" -> 0.3125,
    "u1_set_ops" -> 0.6165,
    "u2_unpivot" -> 0.3975,
    "w10_event_paths" -> 0.4822,
    "w11_time_to_convert" -> 0.8419,
    "w12_attribution" -> 0.5035,
    "w1_tumbling_window" -> 0.3671,
    "w2_sliding_window" -> 0.3267,
    "w3_session_window" -> 0.6493,
    "w4_window_rank" -> 0.4086,
    "w5_lag_cumsum" -> 0.6020,
    "w6_funnel" -> 0.9530,
    "w7_retention" -> 0.6303,
    "w8_anomaly" -> 0.6031,
    "w9_gapfill" -> 0.5733,
    "x0_exact_dedup" -> 0.2985,
    "x10_media_features" -> 0.3928,
    "x11_ivf_topk" -> 1.2885,
    "x12_chunk_neardups" -> 0.5508,
    "x13_token_chunks" -> 0.5351,
    "x14_fuzzy_names" -> 0.3234,
    "x15_tfidf_top_term" -> 1.2043,
    "x16_ngram_jaccard" -> 1.3641,
    "x17_pii_scrub" -> 0.4652,
    "x18_simhash_neardups" -> 1.8106,
    "x19_stratified_sample" -> 0.3333,
    "x1_fingerprint" -> 0.2524,
    "x20_domain_cap" -> 0.2836,
    "x21_decontaminate" -> 1.0641,
    "x22_int8_quant" -> 0.4924,
    "x23_train_shuffle" -> 0.2363,
    "x24_sequence_pack" -> 0.4408,
    "x25_frame_sample" -> 0.2815,
    "x26_media_resize" -> 0.2332,
    "x27_quant_topk" -> 0.2567,
    "x28_dedup_clusters" -> 2.0223,
    "x29_repetition_metrics" -> 1.2307,
    "x2_quality_metrics" -> 0.7728,
    "x30_knn_join" -> 0.6825,
    "x31_vocab_stats" -> 0.4411,
    "x32_bigram_logprob" -> 1.2150,
    "x33_embed_clusters" -> 5.1009,
    "x3_lang_id" -> 0.5790,
    "x4_minhash_neardups" -> 1.2350,
    "x5_simhash" -> 1.0501,
    "x6_brute_topk" -> 0.2044,
    "x7_ann_topk" -> 0.2738,
    "x8_embed_neardups" -> 0.5045,
    "x9_token_stats" -> 0.5478)
}
