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

  val secondsAtSf01: Map[String, Double] = Map(
    "a10_reconcile" -> 0.3645,
    "a11_percentiles" -> 0.7573,
    "a12_rollup" -> 0.4202,
    "a1_group_sum" -> 0.4444,
    "a3_cycle_breakdown" -> 0.2266,
    "a4_conditional_pivot" -> 0.5328,
    "a7_distinct_values" -> 0.2034,
    "a8_global_stats" -> 0.2746,
    "d1_amount_bins" -> 0.2395,
    "d2_company_type" -> 0.2453,
    "d3_party_pivot" -> 0.5773,
    "d4_composite_key" -> 0.1363,
    "j1_lookup_join" -> 0.3680,
    "j2_anti_join" -> 0.3511,
    "j2_dedup_keepfirst" -> 1.9104,
    "j3_asof_join" -> 1.0056,
    "j4_range_join" -> 1.1469,
    "join_q3_revenue" -> 1.2453,
    "join_q5_nation_revenue" -> 1.2927,
    "p11_iso8601" -> 0.6471,
    "p14_pushdown_filter" -> 0.5571,
    "p18_json_extract" -> 0.9716,
    "p3_clean_normalize" -> 0.1724,
    "p5_name_coercion" -> 0.4891,
    "p8_null_fill" -> 0.2444,
    "pl1_csv_pipeline" -> 1.6554,
    "pl2_sql_pipeline" -> 1.0600,
    "pl3_realtime_pipeline" -> 2.9881,
    "pl4_issues_pipeline" -> 0.5120,
    "s10_tree_paths" -> 0.7951,
    "s11_dryrun" -> 0.1886,
    "s1_csv_scan" -> 0.7669,
    "s7_sink_roundtrip" -> 0.4429,
    "s8_batched_sink" -> 0.4049,
    "s9_tree_roundtrip" -> 0.1744,
    "t1_topk_rows" -> 0.1134,
    "t2_topk_groups" -> 0.2388,
    "w1_tumbling_window" -> 0.3545,
    "w2_sliding_window" -> 0.2901,
    "w3_session_window" -> 0.6639,
    "w4_window_rank" -> 0.3619,
    "x0_exact_dedup" -> 0.2607,
    "x11_ivf_topk" -> 1.3565,
    "x12_chunk_neardups" -> 0.5355,
    "x13_token_chunks" -> 1.0482,
    "x14_fuzzy_names" -> 0.3001,
    "x15_tfidf_top_term" -> 1.0464,
    "x1_fingerprint" -> 0.2422,
    "x2_quality_metrics" -> 0.5868,
    "x3_lang_id" -> 0.4984,
    "x4_minhash_neardups" -> 1.1784,
    "x5_simhash" -> 0.7611,
    "x6_brute_topk" -> 0.1825,
    "x7_ann_topk" -> 0.2713,
    "x8_embed_neardups" -> 0.4929,
    "x9_token_stats" -> 0.4767)
}
