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
    "a10_reconcile" -> 0.4412,
    "a11_percentiles" -> 1.0962,
    "a12_rollup" -> 0.5811,
    "a13_group_stats" -> 0.4908,
    "a14_profile" -> 1.1583,
    "a15_cube" -> 0.6630,
    "a16_incremental_agg" -> 0.6093,
    "a17_quality_checks" -> 0.5849,
    "a18_group_mode" -> 0.4075,
    "a1_group_sum" -> 0.4732,
    "a3_cycle_breakdown" -> 0.4159,
    "a4_conditional_pivot" -> 0.6800,
    "a7_distinct_values" -> 0.2851,
    "a8_global_stats" -> 0.3742,
    "d1_amount_bins" -> 0.3620,
    "d2_company_type" -> 0.2999,
    "d3_party_pivot" -> 0.7021,
    "d4_composite_key" -> 0.1859,
    "j1_lookup_join" -> 0.5030,
    "j2_anti_join" -> 0.3932,
    "j2_dedup_keepfirst" -> 1.6516,
    "j3_asof_join" -> 0.8844,
    "j4_range_join" -> 0.8649,
    "j5_upsert_merge" -> 0.4378,
    "j6_scd2" -> 0.6475,
    "j7_salted_join" -> 0.7933,
    "join_q18_big_orders" -> 0.6289,
    "join_q3_revenue" -> 1.1737,
    "join_q5_nation_revenue" -> 1.2504,
    "p11_iso8601" -> 0.6049,
    "p14_pushdown_filter" -> 0.3366,
    "p18_json_extract" -> 0.6116,
    "p2_normalize_dropnull" -> 0.2686,
    "p3_clean_normalize" -> 0.1890,
    "p5_name_coercion" -> 0.6910,
    "p8_null_fill" -> 0.3698,
    "pl1_csv_pipeline" -> 2.1308,
    "pl2_sql_pipeline" -> 1.0088,
    "pl3_realtime_pipeline" -> 1.9999,
    "pl4_issues_pipeline" -> 0.7341,
    "pl5_curation_pipeline" -> 3.5578,
    "pl6_events_pipeline" -> 2.1868,
    "s10_tree_paths" -> 1.1682,
    "s11_dryrun" -> 0.2980,
    "s12_orc_scan" -> 1.0981,
    "s13_json_scan" -> 0.4783,
    "s14_partitioned_scan" -> 0.8828,
    "s1_csv_scan" -> 1.0282,
    "s7_sink_roundtrip" -> 0.4536,
    "s8_batched_sink" -> 0.7445,
    "s9_tree_roundtrip" -> 0.2529,
    "t1_topk_rows" -> 0.1365,
    "t2_topk_groups" -> 0.2437,
    "u1_set_ops" -> 0.6574,
    "u2_unpivot" -> 0.4257,
    "w10_event_paths" -> 0.4429,
    "w11_time_to_convert" -> 0.7395,
    "w1_tumbling_window" -> 0.4571,
    "w2_sliding_window" -> 0.3676,
    "w3_session_window" -> 0.9148,
    "w4_window_rank" -> 0.4992,
    "w5_lag_cumsum" -> 0.8431,
    "w6_funnel" -> 1.0631,
    "w7_retention" -> 0.8730,
    "w8_anomaly" -> 0.5745,
    "w9_gapfill" -> 0.7638,
    "x0_exact_dedup" -> 0.3118,
    "x10_media_features" -> 0.6151,
    "x11_ivf_topk" -> 1.6282,
    "x12_chunk_neardups" -> 0.6925,
    "x13_token_chunks" -> 0.8254,
    "x14_fuzzy_names" -> 0.4218,
    "x15_tfidf_top_term" -> 1.6832,
    "x16_ngram_jaccard" -> 1.6689,
    "x17_pii_scrub" -> 0.6702,
    "x18_simhash_neardups" -> 2.5138,
    "x19_stratified_sample" -> 0.3791,
    "x1_fingerprint" -> 0.3203,
    "x20_domain_cap" -> 0.3042,
    "x21_decontaminate" -> 1.5585,
    "x22_int8_quant" -> 0.5474,
    "x23_train_shuffle" -> 0.2292,
    "x24_sequence_pack" -> 0.4042,
    "x25_frame_sample" -> 0.2993,
    "x26_media_resize" -> 0.2367,
    "x27_quant_topk" -> 0.2963,
    "x28_dedup_clusters" -> 2.0880,
    "x29_repetition_metrics" -> 1.0812,
    "x2_quality_metrics" -> 0.6397,
    "x30_knn_join" -> 0.6046,
    "x31_vocab_stats" -> 0.3370,
    "x32_bigram_logprob" -> 1.1781,
    "x33_embed_clusters" -> 3.3593,
    "x3_lang_id" -> 0.5087,
    "x4_minhash_neardups" -> 1.0559,
    "x5_simhash" -> 1.1181,
    "x6_brute_topk" -> 0.2072,
    "x7_ann_topk" -> 0.3160,
    "x8_embed_neardups" -> 0.6025,
    "x9_token_stats" -> 0.6154)
}
