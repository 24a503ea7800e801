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
    "a10_reconcile" -> 0.3534,
    "a11_percentiles" -> 0.8913,
    "a12_rollup" -> 0.4975,
    "a13_group_stats" -> 0.4230,
    "a14_profile" -> 0.9024,
    "a1_group_sum" -> 0.4210,
    "a3_cycle_breakdown" -> 0.2951,
    "a4_conditional_pivot" -> 0.5704,
    "a7_distinct_values" -> 0.2104,
    "a8_global_stats" -> 0.2833,
    "d1_amount_bins" -> 0.2676,
    "d2_company_type" -> 0.2720,
    "d3_party_pivot" -> 0.6378,
    "d4_composite_key" -> 0.1690,
    "j1_lookup_join" -> 0.4648,
    "j2_anti_join" -> 0.3689,
    "j2_dedup_keepfirst" -> 1.4610,
    "j3_asof_join" -> 0.7216,
    "j4_range_join" -> 0.8298,
    "j5_upsert_merge" -> 0.3768,
    "j6_scd2" -> 0.5187,
    "join_q3_revenue" -> 0.9044,
    "join_q5_nation_revenue" -> 1.0055,
    "p11_iso8601" -> 0.4877,
    "p14_pushdown_filter" -> 0.3257,
    "p18_json_extract" -> 0.5608,
    "p2_normalize_dropnull" -> 0.2262,
    "p3_clean_normalize" -> 0.1827,
    "p5_name_coercion" -> 0.4994,
    "p8_null_fill" -> 0.3007,
    "pl1_csv_pipeline" -> 1.8239,
    "pl2_sql_pipeline" -> 0.9901,
    "pl3_realtime_pipeline" -> 1.7187,
    "pl4_issues_pipeline" -> 0.6921,
    "pl5_curation_pipeline" -> 3.0728,
    "s10_tree_paths" -> 0.9314,
    "s11_dryrun" -> 0.2657,
    "s12_orc_scan" -> 0.8942,
    "s13_json_scan" -> 0.4050,
    "s1_csv_scan" -> 0.8525,
    "s7_sink_roundtrip" -> 0.3505,
    "s8_batched_sink" -> 0.4600,
    "s9_tree_roundtrip" -> 0.2005,
    "t1_topk_rows" -> 0.1311,
    "t2_topk_groups" -> 0.2293,
    "u1_set_ops" -> 0.5020,
    "u2_unpivot" -> 0.3945,
    "w1_tumbling_window" -> 0.3541,
    "w2_sliding_window" -> 0.3189,
    "w3_session_window" -> 0.7466,
    "w4_window_rank" -> 0.4293,
    "w5_lag_cumsum" -> 0.6045,
    "w6_funnel" -> 0.7186,
    "w7_retention" -> 0.7158,
    "w8_anomaly" -> 0.3848,
    "x0_exact_dedup" -> 0.2735,
    "x10_media_features" -> 0.3742,
    "x11_ivf_topk" -> 1.2431,
    "x12_chunk_neardups" -> 0.5311,
    "x13_token_chunks" -> 0.5688,
    "x14_fuzzy_names" -> 0.3809,
    "x15_tfidf_top_term" -> 1.1855,
    "x16_ngram_jaccard" -> 1.0846,
    "x17_pii_scrub" -> 0.5368,
    "x18_simhash_neardups" -> 1.4777,
    "x19_stratified_sample" -> 0.3193,
    "x1_fingerprint" -> 0.2538,
    "x20_domain_cap" -> 0.2737,
    "x21_decontaminate" -> 1.0964,
    "x22_int8_quant" -> 0.5244,
    "x23_train_shuffle" -> 0.2181,
    "x24_sequence_pack" -> 0.3568,
    "x25_frame_sample" -> 0.2782,
    "x26_media_resize" -> 0.2441,
    "x27_quant_topk" -> 0.2905,
    "x28_dedup_clusters" -> 2.4670,
    "x29_repetition_metrics" -> 1.3438,
    "x2_quality_metrics" -> 0.9597,
    "x30_knn_join" -> 0.5868,
    "x31_vocab_stats" -> 0.3880,
    "x3_lang_id" -> 0.6019,
    "x4_minhash_neardups" -> 1.1059,
    "x5_simhash" -> 1.3298,
    "x6_brute_topk" -> 0.2185,
    "x7_ann_topk" -> 0.3322,
    "x8_embed_neardups" -> 0.5792,
    "x9_token_stats" -> 0.6567)
}
