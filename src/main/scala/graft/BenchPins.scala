package graft

/** Per-query committed pins for the self-adjudicating bench leg
  * (r17 verdict next-round #1). Values are DRIFT-NORMALIZED seconds:
  * the r19 closing map (BENCH_LOCAL.json committed beside this file,
  * REPEAT=2 warm, sf0.1, 122.5 s / 175 queries / 0 err) divided by
  * that map's own host_factor (1.322), i.e. seconds on the canary
  * reference host. Bench compares each run's `t / host_factor`
  * (artifact-build millis subtracted — r18 advice) against these and
  * re-runs any line that breaches the suspect rule, so a one-shot
  * driver map explains its own outliers instead of costing a
  * worktree A/B adjudication cycle.
  *
  * r19 regeneration notes (deliberate re-pins, not noise
  * absorption): q3_topk 0.969 → 0.528 (shuffle-hash joins + 32 MB
  * scan partitions); the graph family re-pinned on the
  * score-inside-the-candidate-join shape and WalkBeam = 64;
  * d_lsh_jaccard/d_minhash_est and the cluster family re-pinned on
  * the verify-inside-the-banding-join shape; d_incr_clusters
  * 2.046 → 2.259 — the r18 propagate persist regression was removed
  * (4.08 → 3.46 s raw warm) and the remaining delta vs the old pin
  * is the convergence-probe + pointer-jump round structure itself,
  * re-pinned deliberately after the A/B (bigEdges=false on the
  * batch-merge path) rather than absorbed.
  *
  * r20 regeneration (optimization round 1): the 42 queries whose
  * plans changed on purpose (Par.fan scan fan-out, full-key kernel
  * repartitions, EqCount, the lake listing threshold — see
  * OPTIMIZATION_r20.md) re-pinned from the committed same-window A/B
  * after-leg (bench_r20_after_ab.json, REPEAT=2, hf 1.074 — the
  * round's one leg whose canary read within 7% of the reference
  * host; the r20 sandbox suffered hypervisor-steal bursts that made
  * cross-leg normalization swing ±2×, so the A/B pair, not any
  * single normalized map, is the before/after evidence).
  * s_ann_graph_walk 0.756 → 2.364 is the beam 64→128 / rounds 4→8
  * recall re-pin (BASELINE walk-dial grid) finally reflected in its
  * pin; the improved lines are pinned DOWN so the next regression is
  * caught against the new plans, not the old ones.
  *
  * Re-pin DELIBERATELY (regenerate from a fresh committed closing
  * map) when a query's plan changes on purpose; never to absorb host
  * noise. Queries added after the pin map (no entry) are exempt from
  * the suspect rule until the next regeneration.
  *
  * r21 regeneration (optimization round 2): the 40 queries whose
  * execution paths changed on purpose (single-task union-find flood
  * + local walk, compacted artifact scans, the PqRecon/Sq8Recon/
  * MicroVec/SqDistL2/EditVariants kernels, the dropped ANN fans,
  * ppjoin widths, overlapped star dim builds, AQE-sizeable id stage,
  * lpa min-struct agg — see OPTIMIZATION_r21.md) re-pinned from the
  * committed same-window A/B after-leg (bench_r21_after_ab.json,
  * REPEAT=2, hf 1.182, steal_s 10.95 — legs are now steal-stamped),
  * normalized by that leg's host factor. Improved lines pinned DOWN,
  * per the standing discipline.
  */
object BenchPins {
  val pins: Map[String, Double] = Map(
    "d_chunk_dup" -> 0.832,
    "d_cluster_sizes" -> 0.101,
    "d_contaminate" -> 0.886,
    "d_contaminate_bloom" -> 1.696,
    "d_curate_corpus" -> 1.238,
    "d_dedup_card" -> 0.316,
    "d_dedup_corpus" -> 0.179,
    "d_dup_clusters" -> 0.062,
    "d_dup_inflation" -> 0.233,
    "d_dup_span_ratio" -> 0.131,
    "d_edit_dup" -> 1.445,
    "d_edit_dup2" -> 2.772,
    "d_embed_clusters" -> 0.394,
    "d_embed_dup" -> 0.118,
    "d_exact" -> 0.127,
    "d_incr_chunk" -> 0.844,
    "d_incr_clusters" -> 1.552,
    "d_incr_dedup" -> 0.182,
    "d_incr_edit" -> 0.123,
    "d_lsh_jaccard" -> 2.552,
    "d_lsh_recall" -> 1.67,
    "d_lsh_recall_curve" -> 1.526,
    "d_minhash" -> 0.073,
    "d_minhash_est" -> 1.77,
    "d_minhash_lsh" -> 0.752,
    "d_ngram_jaccard" -> 0.409,
    "d_norm_exact" -> 0.204,
    "d_ppjoin" -> 2.111,
    "d_rung_overlap" -> 0.632,
    "d_semdedup" -> 0.603,
    "d_simhash" -> 0.201,
    "d_simhash_pairs" -> 1.219,
    "d_source_overlap" -> 1.374,
    "d_source_overlap_sketch" -> 0.473,
    "d_span_dup" -> 0.648,
    "d_split_safe" -> 0.194,
    "d_strip_spans" -> 0.113,
    "l_asof_read" -> 0.209,
    "l_change_feed" -> 0.764,
    "l_changes_full" -> 1.052,
    "l_compact_read" -> 0.176,
    "l_incr_agg" -> 1.476,
    "l_merge_cond" -> 0.192,
    "l_merge_history" -> 0.196,
    "l_merge_upsert" -> 0.228,
    "l_meta_stats" -> 0.128,
    "l_mor_delete" -> 0.843,
    "l_restore_read" -> 0.225,
    "l_version_diff" -> 0.808,
    "m_byte_neardup" -> 0.566,
    "m_meta" -> 0.092,
    "q1_pricing" -> 0.15,
    "q3_topk" -> 0.528,
    "q5_multijoin" -> 0.287,
    "q_anomaly" -> 0.113,
    "q_asof" -> 0.074,
    "q_ban_flags" -> 0.151,
    "q_band_join" -> 0.223,
    "q_communities" -> 0.493,
    "q_cube" -> 0.347,
    "q_edge_jaccard" -> 0.448,
    "q_equidepth" -> 0.589,
    "q_fof_reco" -> 0.882,
    "q_funnel" -> 0.138,
    "q_heatmap" -> 0.232,
    "q_heatmap_daily" -> 0.395,
    "q_histogram" -> 0.166,
    "q_interval_attr" -> 0.143,
    "q_kcore" -> 0.283,
    "q_latency_hist" -> 0.259,
    "q_mutual_reports" -> 0.279,
    "q_paths" -> 0.304,
    "q_pit_join" -> 0.331,
    "q_pivot" -> 0.297,
    "q_ppr" -> 0.752,
    "q_promo_share" -> 0.254,
    "q_report_components" -> 0.335,
    "q_report_triangles" -> 0.993,
    "q_report_triangles_approx" -> 0.821,
    "q_retention" -> 0.228,
    "q_rfm" -> 0.206,
    "q_rollup" -> 0.387,
    "q_salted_agg" -> 0.12,
    "q_skew_keys" -> 0.12,
    "q_stats_hist" -> 0.25,
    "q_stickiness" -> 0.211,
    "q_suspicion_rank" -> 0.176,
    "q_table_stats" -> 0.465,
    "q_top_suppliers" -> 0.547,
    "q_user_topk" -> 0.154,
    "q_user_topk_dense" -> 0.225,
    "q_user_topk_rank" -> 0.164,
    "q_world_stats" -> 0.139,
    "r_batch_stats" -> 0.144,
    "r_cache_join" -> 0.221,
    "r_clamp_gear" -> 0.095,
    "r_dead_letter" -> 0.39,
    "r_dim_build" -> 0.386,
    "r_dim_gear9" -> 0.267,
    "r_dim_scd2" -> 0.228,
    "r_dim_sighting" -> 0.645,
    "r_fact_antijoin" -> 0.602,
    "r_fact_assemble" -> 1.373,
    "r_fact_full" -> 0.136,
    "r_parse_props" -> 0.101,
    "r_parse_route" -> 0.716,
    "r_player_upsert" -> 0.744,
    "r_resolve_v1" -> 1.475,
    "r_sanitize_name" -> 0.088,
    "r_scd2_merge" -> 0.498,
    "r_sessionize" -> 0.277,
    "r_ts_normalize" -> 0.125,
    "r_upsert_latest" -> 0.13,
    "r_upsert_report" -> 0.669,
    "r_validate_split" -> 0.294,
    "s_ann_filtered" -> 0.239,
    "s_ann_graph_walk" -> 0.245,
    "s_ann_ivf" -> 0.212,
    "s_ann_ivf_km" -> 0.247,
    "s_ann_ivf_km_probe" -> 0.276,
    "s_ann_ivf_probe" -> 0.244,
    "s_ann_ivfpq" -> 0.259,
    "s_ann_ivfpq_probe" -> 0.254,
    "s_ann_lsh" -> 0.085,
    "s_ann_multiprobe" -> 0.093,
    "s_ann_pq" -> 0.19,
    "s_ann_recall" -> 2.321,
    "s_ann_rerank" -> 0.267,
    "s_ann_sq8" -> 0.195,
    "s_centroids" -> 0.144,
    "s_cosine_topk" -> 0.16,
    "s_diverse_sample" -> 0.214,
    "s_embed_drift" -> 0.169,
    "s_hybrid_topk" -> 0.935,
    "s_kmeans" -> 0.868,
    "s_knn_agreement" -> 0.181,
    "s_knn_graph" -> 0.058,
    "s_knn_join" -> 0.15,
    "s_knn_recall" -> 0.273,
    "s_knn_topk_agg" -> 0.221,
    "s_mmr" -> 0.861,
    "s_range_search" -> 0.275,
    "t_bigrams" -> 0.335,
    "t_bpe" -> 0.787,
    "t_bpe_encode" -> 0.081,
    "t_cdc_chunk" -> 0.99,
    "t_char_gini" -> 0.166,
    "t_chunk" -> 0.238,
    "t_dataset_card" -> 0.129,
    "t_drift" -> 0.234,
    "t_epoch_order" -> 0.33,
    "t_filter" -> 0.081,
    "t_fingerprint" -> 0.073,
    "t_langid" -> 0.102,
    "t_len_quantiles" -> 0.099,
    "t_lm_score" -> 1.312,
    "t_mix_plan" -> 0.381,
    "t_mix_plan_dedup" -> 0.377,
    "t_mix_sample" -> 0.357,
    "t_oov" -> 0.153,
    "t_pack" -> 0.144,
    "t_pii_scrub" -> 0.1,
    "t_quality" -> 0.085,
    "t_repetition" -> 0.216,
    "t_sample_strat" -> 0.093,
    "t_sample_weighted" -> 0.365,
    "t_source_mix" -> 0.125,
    "t_split_assign" -> 0.084,
    "t_strip_html" -> 0.073,
    "t_tfidf" -> 0.812,
    "t_tokens" -> 0.088,
    "t_vocab" -> 0.181,
    "w_ntile" -> 0.151,
    "w_running" -> 0.079,
    "w_trailing" -> 0.095)
}
