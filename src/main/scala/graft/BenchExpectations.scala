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
  * Current snapshot: round-9 end-of-round full-suite solo run under the
  * off-clock-release protocol (release between timers, warmup pass,
  * min-of-2) — all 141 queries from ONE coherent run (171.0s total,
  * zero regressions vs the prior snapshot, which mixed the morning
  * full run with targeted values for x57–x60/pl11), measured under
  * the SAME contract the harness applies, so regression factors are
  * apples-to-apples. x61–x65/j9, added after that run, carry
  * targeted solo-run values under the same contract.
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
    "a10_reconcile" -> 0.4769,
    "a11_percentiles" -> 0.9804,
    "a12_rollup" -> 0.5428,
    "a13_group_stats" -> 0.4701,
    "a14_profile" -> 1.0734,
    "a15_cube" -> 0.5315,
    "a16_incremental_agg" -> 0.6645,
    "a17_quality_checks" -> 0.7528,
    "a18_group_mode" -> 0.4302,
    "a1_group_sum" -> 0.4492,
    "a3_cycle_breakdown" -> 0.3093,
    "a4_conditional_pivot" -> 0.7274,
    "a7_distinct_values" -> 0.2568,
    "a8_global_stats" -> 0.3543,
    "d1_amount_bins" -> 0.2988,
    "d2_company_type" -> 0.3313,
    "d3_party_pivot" -> 0.7536,
    "d4_composite_key" -> 0.2438,
    "j1_lookup_join" -> 0.5789,
    "j2_anti_join" -> 0.545,
    "j2_dedup_keepfirst" -> 1.936,
    "j3_asof_join" -> 0.956,
    "j4_range_join" -> 0.9289,
    "j5_upsert_merge" -> 0.4569,
    "j6_scd2" -> 0.6374,
    "j7_salted_join" -> 0.9069,
    "j8_bloom_join" -> 0.8306,
    "j9_snapshot_diff" -> 0.6169,
    "join_q10_returns" -> 0.7799,
    "join_q18_big_orders" -> 0.7845,
    "join_q3_revenue" -> 1.07,
    "join_q5_nation_revenue" -> 1.3712,
    "p11_iso8601" -> 0.712,
    "p14_pushdown_filter" -> 0.4561,
    "p18_json_extract" -> 0.6767,
    "p2_normalize_dropnull" -> 0.3214,
    "p3_clean_normalize" -> 0.2012,
    "p5_name_coercion" -> 0.659,
    "p8_null_fill" -> 0.3404,
    "p9_metadata" -> 0.1648,
    "pl10_classifier_pipeline" -> 5.6259,
    "pl11_dsir_pipeline" -> 5.9017,
    "pl1_csv_pipeline" -> 2.3804,
    "pl2_sql_pipeline" -> 1.0463,
    "pl3_realtime_pipeline" -> 2.1655,
    "pl4_issues_pipeline" -> 0.7339,
    "pl5_curation_pipeline" -> 3.8746,
    "pl6_events_pipeline" -> 2.0154,
    "pl7_corpus_report" -> 1.8644,
    "pl8_nightly_ingest" -> 6.0991,
    "pl9_export_shards" -> 2.0206,
    "s10_tree_paths" -> 1.1434,
    "s11_dryrun" -> 0.2474,
    "s12_orc_scan" -> 1.0594,
    "s13_json_scan" -> 0.5924,
    "s14_partitioned_scan" -> 1.0332,
    "s16_bucketed_join" -> 3.013,
    "s17_zorder_scan" -> 1.5826,
    "s18_schema_evolution" -> 0.732,
    "s19_compaction" -> 1.2538,
    "s1_csv_scan" -> 0.9056,
    "s7_sink_roundtrip" -> 0.5545,
    "s8_batched_sink" -> 0.5737,
    "s9_tree_roundtrip" -> 0.2887,
    "t1_topk_rows" -> 0.1506,
    "t2_topk_groups" -> 0.2601,
    "u1_set_ops" -> 0.6168,
    "u2_unpivot" -> 0.441,
    "w10_event_paths" -> 0.518,
    "w11_time_to_convert" -> 0.963,
    "w12_attribution" -> 0.6454,
    "w1_tumbling_window" -> 0.4529,
    "w2_sliding_window" -> 0.4259,
    "w3_session_window" -> 0.941,
    "w4_window_rank" -> 0.4644,
    "w5_lag_cumsum" -> 0.8112,
    "w6_funnel" -> 1.0459,
    "w7_retention" -> 0.844,
    "w8_anomaly" -> 0.7869,
    "w8_rank_native" -> 0.4128,
    "w9_gapfill" -> 0.7301,
    "x0_exact_dedup" -> 0.3667,
    "x10_media_features" -> 0.481,
    "x11_ivf_topk" -> 1.5419,
    "x12_chunk_neardups" -> 0.8136,
    "x13_token_chunks" -> 0.6879,
    "x14_fuzzy_names" -> 0.4746,
    "x15_tfidf_top_term" -> 1.5891,
    "x16_ngram_jaccard" -> 1.5671,
    "x17_pii_scrub" -> 0.7425,
    "x18_simhash_neardups" -> 2.1748,
    "x19_stratified_sample" -> 0.5576,
    "x1_fingerprint" -> 0.4163,
    "x20_domain_cap" -> 0.4502,
    "x21_decontaminate" -> 1.459,
    "x22_int8_quant" -> 0.726,
    "x23_train_shuffle" -> 0.2852,
    "x24_sequence_pack" -> 0.502,
    "x25_frame_sample" -> 0.3749,
    "x26_media_resize" -> 0.2847,
    "x27_quant_topk" -> 0.3684,
    "x28_dedup_clusters" -> 3.0636,
    "x29_repetition_metrics" -> 1.3601,
    "x2_quality_metrics" -> 1.0338,
    "x30_knn_join" -> 0.7808,
    "x31_vocab_stats" -> 0.4476,
    "x32_bigram_logprob" -> 1.7194,
    "x33_embed_clusters" -> 3.4533,
    "x34_span_dedup" -> 1.5164,
    "x35_semdedup" -> 2.6825,
    "x36_hybrid_rrf" -> 1.394,
    "x37_domain_mix" -> 1.1554,
    "x38_native_topk" -> 0.5056,
    "x39_incremental_neardups" -> 2.0491,
    "x3_lang_id" -> 0.7496,
    "x40_perplexity_bins" -> 2.2757,
    "x41_indexed_screen" -> 3.8963,
    "x42_domain_mix_up" -> 1.4104,
    "x43_knn_native" -> 0.8879,
    "x44_temperature_mix" -> 1.5017,
    "x45_fuzzy_decontam" -> 2.69,
    "x46_heavy_tokens" -> 0.9184,
    "x47_unicode_dedup" -> 0.7675,
    "x48_incremental_clusters" -> 9.4011,
    "x49_quality_features" -> 3.3387,
    "x4_minhash_neardups" -> 1.3789,
    "x50_train_split" -> 0.5424,
    "x51_corpus_drift" -> 0.7599,
    "x52_leakage_safe_splits" -> 2.4939,
    "x53_quality_scores" -> 3.7517,
    "x54_jl_projection" -> 1.6954,
    "x55_jl_knn" -> 0.9411,
    "x56_weighted_sample" -> 0.4184,
    "x57_dsir_select" -> 3.3386,
    "x58_filter_cascade" -> 2.108,
    "x59_dsir_screen" -> 1.9383,
    "x5_simhash" -> 1.506,
    "x60_diverse_sample" -> 1.2003,
    "x61_gram_coverage" -> 1.168,
    "x62_embedding_drift" -> 1.3921,
    "x63_semantic_decontam" -> 0.8232,
    "x64_ann_recall" -> 2.2497,
    "x65_fit_classifier" -> 3.6521,
    "x6_brute_topk" -> 0.2126,
    "x7_ann_topk" -> 0.3432,
    "x8_embed_neardups" -> 0.7046,
    "x9_token_stats" -> 0.6002)
}
