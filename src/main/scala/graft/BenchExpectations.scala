package graft

/** Checked-in per-query bench expectations (seconds at sf0.1, local[32],
  * min-of-2 after warmup) — the round-4 measured numbers (post HOF-
  * materialization fix, 69 queries). [[Bench]] compares each measured query
  * against its expectation and reports (and fails on) a
  * >[[RegressionFactor]]x regression, so round-over-round performance
  * claims are enforced by the harness instead of reconstructed from old
  * logs. Queries added after this snapshot simply have no entry and are
  * not regression-checked until the snapshot is refreshed.
  *
  * Refresh by pasting the `queries` object of a trusted bench run — one
  * run with NOTHING else on the machine: a concurrent sbt/test JVM
  * measurably inflates timings (round 4 saw 2-4x phantom "regressions"
  * from exactly that).
  */
object BenchExpectations {
  val RegressionFactor = 2.0

  /** Sub-second queries jitter with filesystem/GC noise; a measured time
    * must exceed BOTH the factor and this absolute floor to count as a
    * regression (0.2 s -> 0.45 s is noise, not a finding). */
  val NoiseFloorSec = 0.5

  val secondsAtSf01: Map[String, Double] = Map(
    "a10_reconcile" -> 0.3534,
    "a11_percentiles" -> 0.7570,
    "a12_rollup" -> 0.4390,
    "a1_group_sum" -> 0.3578,
    "a3_cycle_breakdown" -> 0.2361,
    "a4_conditional_pivot" -> 0.6015,
    "a7_distinct_values" -> 0.2483,
    "a8_global_stats" -> 0.3166,
    "d1_amount_bins" -> 0.2741,
    "d2_company_type" -> 0.2707,
    "d3_party_pivot" -> 0.2107,
    "d4_composite_key" -> 0.1254,
    "j1_lookup_join" -> 0.3760,
    "j2_anti_join" -> 0.3489,
    "j2_dedup_keepfirst" -> 1.5201,
    "j3_asof_join" -> 0.7022,
    "j4_range_join" -> 0.7102,
    "join_q3_revenue" -> 0.9065,
    "join_q5_nation_revenue" -> 0.8851,
    "p11_iso8601" -> 0.4125,
    "p14_pushdown_filter" -> 0.2989,
    "p18_json_extract" -> 0.4577,
    "p2_normalize_dropnull" -> 0.2580,
    "p3_clean_normalize" -> 0.1839,
    "p5_name_coercion" -> 0.5329,
    "p8_null_fill" -> 0.2976,
    "pl1_csv_pipeline" -> 1.3366,
    "pl2_sql_pipeline" -> 0.6221,
    "pl3_realtime_pipeline" -> 0.9699,
    "pl4_issues_pipeline" -> 0.5919,
    "s10_tree_paths" -> 0.6175,
    "s11_dryrun" -> 0.2110,
    "s1_csv_scan" -> 0.9967,
    "s7_sink_roundtrip" -> 0.3788,
    "s8_batched_sink" -> 0.4426,
    "s9_tree_roundtrip" -> 0.1799,
    "t1_topk_rows" -> 0.1265,
    "t2_topk_groups" -> 0.2374,
    "u1_set_ops" -> 0.5027,
    "w1_tumbling_window" -> 0.3563,
    "w2_sliding_window" -> 0.3141,
    "w3_session_window" -> 0.7997,
    "w4_window_rank" -> 0.3696,
    "w5_lag_cumsum" -> 0.6315,
    "x0_exact_dedup" -> 0.3198,
    "x10_media_features" -> 0.4500,
    "x11_ivf_topk" -> 1.3181,
    "x12_chunk_neardups" -> 0.5608,
    "x13_token_chunks" -> 0.5825,
    "x14_fuzzy_names" -> 0.3107,
    "x15_tfidf_top_term" -> 1.1732,
    "x16_ngram_jaccard" -> 0.8030,
    "x17_pii_scrub" -> 0.4972,
    "x18_simhash_neardups" -> 1.9422,
    "x19_stratified_sample" -> 0.2895,
    "x1_fingerprint" -> 0.2462,
    "x20_domain_cap" -> 0.2592,
    "x21_decontaminate" -> 1.0405,
    "x22_int8_quant" -> 0.5627,
    "x23_train_shuffle" -> 0.2248,
    "x24_sequence_pack" -> 0.3686,
    "x2_quality_metrics" -> 0.6145,
    "x3_lang_id" -> 0.5104,
    "x4_minhash_neardups" -> 1.1985,
    "x5_simhash" -> 1.1502,
    "x6_brute_topk" -> 0.1915,
    "x7_ann_topk" -> 0.2714,
    "x8_embed_neardups" -> 0.5172,
    "x9_token_stats" -> 0.5286)
}
