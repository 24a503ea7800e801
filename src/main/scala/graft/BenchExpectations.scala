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
    "a10_reconcile" -> 0.3990,
    "a11_percentiles" -> 0.8731,
    "a12_rollup" -> 0.5019,
    "a1_group_sum" -> 0.4031,
    "a3_cycle_breakdown" -> 0.2396,
    "a4_conditional_pivot" -> 0.5755,
    "a7_distinct_values" -> 0.2324,
    "a8_global_stats" -> 0.2974,
    "d1_amount_bins" -> 0.2505,
    "d2_company_type" -> 0.2963,
    "d3_party_pivot" -> 0.7846,
    "d4_composite_key" -> 0.1621,
    "j1_lookup_join" -> 0.4401,
    "j2_anti_join" -> 0.4840,
    "j2_dedup_keepfirst" -> 1.5209,
    "j3_asof_join" -> 0.6959,
    "j4_range_join" -> 0.8142,
    "join_q3_revenue" -> 1.0257,
    "join_q5_nation_revenue" -> 1.0037,
    "p11_iso8601" -> 0.5172,
    "p14_pushdown_filter" -> 0.2884,
    "p18_json_extract" -> 0.5423,
    "p2_normalize_dropnull" -> 0.2570,
    "p3_clean_normalize" -> 0.2118,
    "p5_name_coercion" -> 0.6078,
    "p8_null_fill" -> 0.3318,
    "pl1_csv_pipeline" -> 2.0435,
    "pl2_sql_pipeline" -> 0.9373,
    "pl3_realtime_pipeline" -> 1.6820,
    "pl4_issues_pipeline" -> 0.6104,
    "pl5_curation_pipeline" -> 3.2039,
    "s10_tree_paths" -> 0.8934,
    "s11_dryrun" -> 0.2527,
    "s1_csv_scan" -> 0.8948,
    "s7_sink_roundtrip" -> 0.3965,
    "s8_batched_sink" -> 0.4895,
    "s9_tree_roundtrip" -> 0.2144,
    "t1_topk_rows" -> 0.1304,
    "t2_topk_groups" -> 0.3140,
    "u1_set_ops" -> 0.5515,
    "w1_tumbling_window" -> 0.3392,
    "w2_sliding_window" -> 0.3381,
    "w3_session_window" -> 0.8207,
    "w4_window_rank" -> 0.4310,
    "w5_lag_cumsum" -> 0.6169,
    "x0_exact_dedup" -> 0.3015,
    "x10_media_features" -> 0.4666,
    "x11_ivf_topk" -> 1.4474,
    "x12_chunk_neardups" -> 0.5603,
    "x13_token_chunks" -> 0.6703,
    "x14_fuzzy_names" -> 0.3615,
    "x15_tfidf_top_term" -> 1.2099,
    "x16_ngram_jaccard" -> 1.1933,
    "x17_pii_scrub" -> 0.5214,
    "x18_simhash_neardups" -> 1.6852,
    "x19_stratified_sample" -> 0.3431,
    "x1_fingerprint" -> 0.2804,
    "x20_domain_cap" -> 0.3161,
    "x21_decontaminate" -> 1.4728,
    "x22_int8_quant" -> 0.5806,
    "x23_train_shuffle" -> 0.2698,
    "x24_sequence_pack" -> 0.4842,
    "x25_frame_sample" -> 0.3276,
    "x26_media_resize" -> 0.2411,
    "x27_quant_topk" -> 0.3198,
    "x2_quality_metrics" -> 0.6718,
    "x3_lang_id" -> 0.6641,
    "x4_minhash_neardups" -> 1.1996,
    "x5_simhash" -> 1.4551,
    "x6_brute_topk" -> 0.1922,
    "x7_ann_topk" -> 0.2772,
    "x8_embed_neardups" -> 0.5625,
    "x9_token_stats" -> 0.5822)
}
