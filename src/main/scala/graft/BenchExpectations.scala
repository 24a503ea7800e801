package graft

/** Checked-in per-query bench expectations (seconds at sf0.1, local[32],
  * min-of-2 after warmup) — the round-3 measured numbers. [[Bench]] compares
  * each measured query against its expectation and reports (and fails on)
  * a >[[RegressionFactor]]× regression, so round-over-round performance
  * claims are enforced by the harness instead of reconstructed from old
  * logs. Queries added after this snapshot simply have no entry and are
  * not regression-checked until the snapshot is refreshed.
  *
  * Refresh by pasting the `queries` object of a trusted bench run.
  */
object BenchExpectations {
  val RegressionFactor = 2.0

  /** Sub-second queries jitter with filesystem/GC noise; a measured time
    * must exceed BOTH the factor and this absolute floor to count as a
    * regression (0.2 s → 0.45 s is noise, not a finding). */
  val NoiseFloorSec = 0.5

  val secondsAtSf01: Map[String, Double] = Map(
    "a10_reconcile" -> 0.3539,
    "a11_percentiles" -> 0.7752,
    "a12_rollup" -> 0.4442,
    "a1_group_sum" -> 0.4358,
    "a3_cycle_breakdown" -> 0.2833,
    "a4_conditional_pivot" -> 0.5831,
    "a7_distinct_values" -> 0.2408,
    "a8_global_stats" -> 0.3118,
    "d1_amount_bins" -> 0.2863,
    "d2_company_type" -> 0.2382,
    "d3_party_pivot" -> 0.2565,
    "d4_composite_key" -> 0.1538,
    "j1_lookup_join" -> 0.4076,
    "j2_anti_join" -> 0.3864,
    "j2_dedup_keepfirst" -> 1.4254,
    "j3_asof_join" -> 0.6689,
    "j4_range_join" -> 0.7487,
    "join_q3_revenue" -> 0.8496,
    "join_q5_nation_revenue" -> 0.9405,
    "p11_iso8601" -> 0.3937,
    "p14_pushdown_filter" -> 0.2858,
    "p18_json_extract" -> 0.4216,
    "p2_normalize_dropnull" -> 0.2437,
    "p3_clean_normalize" -> 0.1722,
    "p5_name_coercion" -> 0.4574,
    "p8_null_fill" -> 0.2629,
    "pl1_csv_pipeline" -> 1.2812,
    "pl2_sql_pipeline" -> 0.6921,
    "pl3_realtime_pipeline" -> 1.0840,
    "pl4_issues_pipeline" -> 0.6694,
    "s10_tree_paths" -> 0.5712,
    "s11_dryrun" -> 0.1978,
    "s1_csv_scan" -> 0.8215,
    "s7_sink_roundtrip" -> 0.3787,
    "s8_batched_sink" -> 0.4401,
    "s9_tree_roundtrip" -> 0.1706,
    "t1_topk_rows" -> 0.1217,
    "t2_topk_groups" -> 0.2259,
    "w1_tumbling_window" -> 0.3367,
    "w2_sliding_window" -> 0.3172,
    "w3_session_window" -> 0.6837,
    "w4_window_rank" -> 0.3644,
    "x0_exact_dedup" -> 0.2578,
    "x10_media_features" -> 0.3687,
    "x11_ivf_topk" -> 1.1508,
    "x12_chunk_neardups" -> 0.5268,
    "x13_token_chunks" -> 1.0646,
    "x14_fuzzy_names" -> 0.3135,
    "x15_tfidf_top_term" -> 1.0431,
    "x16_ngram_jaccard" -> 2.5398,
    "x17_pii_scrub" -> 0.4789,
    "x1_fingerprint" -> 0.2423,
    "x2_quality_metrics" -> 0.6023,
    "x3_lang_id" -> 0.4913,
    "x4_minhash_neardups" -> 1.1926,
    "x5_simhash" -> 0.8065,
    "x6_brute_topk" -> 0.1743,
    "x7_ann_topk" -> 0.2568,
    "x8_embed_neardups" -> 0.4898,
    "x9_token_stats" -> 0.4860)
}
