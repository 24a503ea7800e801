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
  * Current snapshot: round-11 full-suite solo run through the SHARDED
  * harness (6 cost-balanced shards, each a fresh child JVM; warmup +
  * min-of-2; cache release and sink sweep off-clock) — all 151 queries
  * from ONE coherent run (182.7s total, zero regressions, zero errors),
  * measured under the SAME contract the harness applies, so regression
  * factors are apples-to-apples. This is the sharded path's first proving
  * run: every query the round-9 single-JVM suite flagged (s17 21x, pl5
  * 8.7x, ...) landed inside bounds, confirming the GC/writeback
  * amplification diagnosis.
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
    "a10_reconcile" -> 0.4917,
    "a11_percentiles" -> 0.921,
    "a12_rollup" -> 0.4911,
    "a13_group_stats" -> 0.5255,
    "a14_profile" -> 1.045,
    "a15_cube" -> 0.6922,
    "a16_incremental_agg" -> 0.6038,
    "a17_quality_checks" -> 0.8598,
    "a18_group_mode" -> 0.4435,
    "a1_group_sum" -> 0.4415,
    "a3_cycle_breakdown" -> 0.3193,
    "a4_conditional_pivot" -> 0.6582,
    "a7_distinct_values" -> 0.2895,
    "a8_global_stats" -> 0.3316,
    "d1_amount_bins" -> 0.3359,
    "d2_company_type" -> 0.5608,
    "d3_party_pivot" -> 0.999,
    "d4_composite_key" -> 0.1856,
    "j1_lookup_join" -> 0.5339,
    "j2_anti_join" -> 0.5903,
    "j2_dedup_keepfirst" -> 1.8314,
    "j3_asof_join" -> 0.867,
    "j4_range_join" -> 0.9545,
    "j5_upsert_merge" -> 0.4868,
    "j6_scd2" -> 0.6172,
    "j7_salted_join" -> 0.962,
    "j8_bloom_join" -> 0.7626,
    "j9_snapshot_diff" -> 0.6293,
    "join_q10_returns" -> 0.7538,
    "join_q18_big_orders" -> 0.7423,
    "join_q3_revenue" -> 0.992,
    "join_q5_nation_revenue" -> 1.2471,
    "p11_iso8601" -> 0.4758,
    "p14_pushdown_filter" -> 0.5496,
    "p18_json_extract" -> 0.6134,
    "p2_normalize_dropnull" -> 0.329,
    "p3_clean_normalize" -> 0.2911,
    "p5_name_coercion" -> 0.8456,
    "p6_datetime_coercion" -> 0.4214,
    "p8_null_fill" -> 0.2386,
    "p9_metadata" -> 0.1568,
    "pl10_classifier_pipeline" -> 7.9601,
    "pl11_dsir_pipeline" -> 5.3589,
    "pl1_csv_pipeline" -> 3.5936,
    "pl2_sql_pipeline" -> 1.1181,
    "pl3_realtime_pipeline" -> 1.7146,
    "pl4_issues_pipeline" -> 1.006,
    "pl5_curation_pipeline" -> 3.4104,
    "pl6_events_pipeline" -> 1.9616,
    "pl7_corpus_report" -> 3.067,
    "pl8_nightly_ingest" -> 5.7741,
    "pl9_export_shards" -> 1.424,
    "s10_tree_paths" -> 1.2108,
    "s11_dryrun" -> 0.2205,
    "s12_orc_scan" -> 1.021,
    "s13_json_scan" -> 0.6902,
    "s14_partitioned_scan" -> 0.9793,
    "s16_bucketed_join" -> 3.0934,
    "s17_zorder_scan" -> 1.4253,
    "s18_schema_evolution" -> 1.1683,
    "s19_compaction" -> 2.1392,
    "s1_csv_scan" -> 1.2106,
    // provisional (added r11 after the snapshot run; JDBC staging write
    // dominates — single embedded-Derby connection). Refreshed at next
    // snapshot.
    "s2_jdbc_roundtrip" -> 4.0,
    "s3_jdbc_partitioned" -> 4.0,
    "s7_sink_roundtrip" -> 0.4749,
    "s8_batched_sink" -> 0.6209,
    "s9_tree_roundtrip" -> 0.3401,
    "t1_topk_rows" -> 0.1215,
    "t2_topk_groups" -> 0.2958,
    "u1_set_ops" -> 0.6517,
    "u2_unpivot" -> 0.4151,
    "w10_event_paths" -> 0.5658,
    "w11_time_to_convert" -> 0.8886,
    "w12_attribution" -> 0.6747,
    "w1_tumbling_window" -> 0.62,
    "w2_sliding_window" -> 0.4818,
    "w3_session_window" -> 1.2433,
    "w4_window_rank" -> 0.4635,
    "w5_lag_cumsum" -> 0.8595,
    "w6_funnel" -> 0.8686,
    "w7_retention" -> 0.7879,
    "w8_anomaly" -> 0.5683,
    "w8_rank_native" -> 0.5504,
    "w9_gapfill" -> 0.9836,
    "x0_exact_dedup" -> 0.3352,
    "x10_media_features" -> 0.4716,
    "x11_ivf_topk" -> 1.5106,
    "x12_chunk_neardups" -> 0.6749,
    "x13_token_chunks" -> 0.7049,
    "x14_fuzzy_names" -> 0.3718,
    "x15_tfidf_top_term" -> 1.2984,
    "x16_ngram_jaccard" -> 1.6279,
    "x17_pii_scrub" -> 0.503,
    "x18_simhash_neardups" -> 1.8848,
    "x19_stratified_sample" -> 0.3552,
    "x1_fingerprint" -> 0.3981,
    "x20_domain_cap" -> 0.3717,
    "x21_decontaminate" -> 1.5953,
    "x22_int8_quant" -> 0.8446,
    "x23_train_shuffle" -> 0.3342,
    "x24_sequence_pack" -> 0.5246,
    "x25_frame_sample" -> 0.256,
    "x26_media_resize" -> 0.3093,
    "x27_quant_topk" -> 0.4902,
    "x28_dedup_clusters" -> 2.1007,
    "x29_repetition_metrics" -> 1.2896,
    "x2_quality_metrics" -> 0.6642,
    "x30_knn_join" -> 0.5601,
    "x31_vocab_stats" -> 0.3831,
    "x32_bigram_logprob" -> 1.2851,
    "x33_embed_clusters" -> 3.2291,
    "x34_span_dedup" -> 1.2275,
    "x35_semdedup" -> 1.8201,
    "x36_hybrid_rrf" -> 1.6054,
    "x37_domain_mix" -> 0.9002,
    "x38_native_topk" -> 0.315,
    "x39_incremental_neardups" -> 1.7562,
    "x3_lang_id" -> 0.6513,
    "x40_perplexity_bins" -> 1.7214,
    "x41_indexed_screen" -> 3.3199,
    "x42_domain_mix_up" -> 0.9816,
    "x43_knn_native" -> 0.6946,
    "x44_temperature_mix" -> 1.2563,
    "x45_fuzzy_decontam" -> 2.0702,
    "x46_heavy_tokens" -> 0.7829,
    "x47_unicode_dedup" -> 0.6327,
    "x48_incremental_clusters" -> 8.3743,
    "x49_quality_features" -> 2.8235,
    "x4_minhash_neardups" -> 1.3162,
    "x50_train_split" -> 0.4492,
    "x51_corpus_drift" -> 0.6381,
    "x52_leakage_safe_splits" -> 2.2643,
    "x53_quality_scores" -> 4.7091,
    "x54_jl_projection" -> 1.5728,
    "x55_jl_knn" -> 0.8274,
    "x56_weighted_sample" -> 0.275,
    "x57_dsir_select" -> 2.6542,
    "x58_filter_cascade" -> 2.0046,
    "x59_dsir_screen" -> 1.7438,
    "x5_simhash" -> 1.1556,
    "x60_diverse_sample" -> 1.0035,
    "x61_gram_coverage" -> 1.6184,
    "x62_embedding_drift" -> 1.3468,
    "x63_semantic_decontam" -> 0.4358,
    "x64_ann_recall" -> 3.0313,
    "x65_fit_classifier" -> 3.3134,
    "x66_pack_efficiency" -> 1.0466,
    "x67_dedup_thresholds" -> 2.8281,
    "x68_leakage_audit" -> 3.3423,
    "x6_brute_topk" -> 0.2244,
    "x7_ann_topk" -> 0.3097,
    "x8_embed_neardups" -> 0.5393,
    "x9_token_stats" -> 0.6428,
  )
}
