"""Declared queries: importing this package registers every
query/oracle pair with etl_jobs_spark.registry.

Registration order == the order the driver's correctness sweep walks
the registry (50 per round). Rounds 1+2 verified 100 distinct queries
with zero failures; the ``_NEEDS_CORRECTNESS_ROW`` list below promotes
the remaining never-driver-checked queries (plus any newly added ones)
to the front so the round-3 sweep covers them. After a query earns a
green CORRECTNESS row, drop it from the list and let it drift back."""

from etl_jobs_spark import registry
from etl_jobs_spark.queries import (  # noqa: F401
    corpus_governance,
    data_quality,
    graph_analytics,
    warehouse_ext,
    product_analytics,
    similarity,
    temporal,
    text_analysis,
    sources_sinks,
    streaming,
    tpch_plus,
    training_pipeline,
    observability_ext,
    functions_suite,
    relational,
    analytics_ext,
    dedup,
    extensibility,
    multimodal,
    reference_parity,
    spatial,
    feature_engineering,
)

# Round-8 sweep window (50 queries, registration order), per VERDICT
# r7 item 1 ("clear the driver-row backlog before anything else"):
# (a) round-8 additions, inserted at the front as they land — each
# one displaces a slot from the tail's r1-era deferral block, so the
# 20 never-checked r7 queries and the full r2-era rotation always
# keep their slots; (b) the 20 round-7 queries that have NEVER been
# through the driver's oracle (the hard-signal gap the r7 verdict
# called out); (c) the entire r2-era rotation displaced from the
# round-7 window (scan_/sink_ family, the exact-baseline embed
# anchors per VERDICT item 7, the text block); (d) r1-era rows
# deferred from round 7, lowest-information last so new additions
# displace them first.
_NEEDS_CORRECTNESS_ROW = [
    # (a) round-8 additions
    "dedup_substring_drop_audit",
    "multimodal_decode_jpeg",
    "q8_national_market_share",
    "q9_product_type_profit",
    "q11_important_stock",
    "q16_supplier_part_count",
    "q19_discounted_revenue",
    "q20_potential_promotion",
    "stat_kendall_tau",
    "stat_bootstrap_ci_mean",
    # (b) never driver-checked round-7 queries
    "pipeline_entity_resolution",
    "stream_pii_redact",
    "multimodal_image_dhash_dedup",
    "multimodal_audio_fingerprint_dedup",
    "multimodal_image_patches",
    "dq_drift_ks",
    "agg_cohort_ltv",
    "agg_funnel_time_bound",
    "ts_bollinger_breakouts",
    "ts_holt_level_trend",
    "embed_pca_power_iter",
    "stat_mann_whitney_u",
    "pipeline_pit_training_set",
    "graph_bfs_hops",
    "fn_try_suite",
    "sample_negative_pairs",
    "feat_quantile_binning",
    "feat_minmax_scale",
    "feat_target_encode",
    "feat_cross_hash",
    # (c) r2-era rotation (newest driver evidence = r2)
    "scan_csv_single",
    "scan_csv_pandas",
    "scan_glob_union",
    "scan_binary_files",
    "scan_csv_corrupt_quarantine",
    "scan_incremental_watermark",
    "scan_orc_roundtrip",
    "scan_schema_evolution",
    "sink_jdbc_append",
    "sink_json_report",
    "sink_partition_overwrite",
    "sink_s3",
    "source_s3",
    "embed_cosine_topk",
    "embed_lsh_topk",
    "text_fingerprint",
    "text_lang_id",
    "text_quality_score",
    "text_tfidf",
    "text_token_stats",
    # (d) r1-era rows deferred from round 7: ALL NINE are displaced
    # by the nine round-8 additions above (the window caps at 50 and
    # backlog-first means the 20 never-checked r7 rows + the full
    # r2-era rotation keep their slots). Each displaced row HOLDS a
    # green r1 driver row and is a low-information re-check by its
    # round-7 deferral rationale: agg_approx_sketches (rows-only by
    # design), filter_valid_rows (complement of the fresh
    # filter_rejected_rows), agg_success_rate (alias of
    # agg_completion_rate's implementation), agg_record_count /
    # agg_events_by_type (bare counts), setop_intersect /
    # setop_except (family fresh from four directions),
    # fillna_const (sibling of the fresh fillna_mean),
    # window_running_sum (cumulative-window path fresh via M4/STL).
    # They rotate into round 9's window front.
]

#: Round-9 window FRONT (not promoted into the round-8 window — the
#: 50 slots above implement VERDICT r7's backlog-first allocation and
#: are full). Everything here was added late in round 8 AFTER the
#: window froze; each is hash-green at sf0.001/0.01/0.1 in
#: builder-side driver-grade sweeps (docs/SWEEP_COST*.json + the
#: end-of-round full sweep) and carries an independent pure-Python
#: cross-check in tests/. Round 9 must promote THESE first, then the
#: nine r1-era deferrals listed above, then the r3-era rotation.
_ROUND9_WINDOW_FRONT = [
    # late round-8 wave 2 (commits d3d0045..d35bc6d)
    "stat_spearman_rho",
    "stat_runs_test",
    "graph_k_core",
    "graph_degree_assortativity",
    "ts_sax_symbols",
    "ts_theil_sen_trend",
    "text_collocation_lift",
    "feat_vocab_collapse_encode",
    "spatial_morton_tiles",
    # late round-8 wave 3 (continuation session)
    "embed_sq8_topk",
    "embed_binary_hamming_topk",
    "stat_welch_t",
    "stat_anova_f",
    "stat_cramers_v",
    "ts_acf_lags",
    "sample_systematic_every_k",
    "graph_link_prediction_cn",
    "text_readability",
    "window_sliding_distinct_users",
    "ann_quantized_recall_eval",
    "agg_time_decay_topk",
    "ts_seasonal_naive_error",
    "pack_efficiency_audit",
    "seq_len_histogram",
    "stat_permutation_test",
    "stat_cohens_d",
    "dedup_cross_source_matrix",
    "embed_mmr_diversified_topk",
    "graph_local_clustering_topk",
    "stat_proportion_ci_wilson",
    "feat_robust_scale",
    "agg_session_bounce_rate",
    "pipeline_rag_retrieval_end_to_end",
    "agg_markov_transitions",
    "dedup_gram_novelty_by_source",
    "embed_cell_label_purity",
    "stat_pettitt_changepoint",
    "agg_rfm_segments",
    "stat_levene_bf",
    "dedup_threshold_sensitivity",
    "agg_new_vs_returning",
    "embed_dim_variance_topk",
    "text_hapax_ratio",
    "stat_mann_kendall_trend",
    "agg_lorenz_deciles",
    "ts_anomaly_seasonal_mad",
    "embed_exact_dup_audit",
    "governance_retention_ttl_audit",
    "attr_u_shaped_touch",
    "dq_pk_uniqueness_suite",
    "agg_stickiness_dau_mau",
    "ts_seasonality_strength",
    "text_simpson_diversity",
    "agg_user_overlap_stability",
    "ts_burstiness_fano",
    "stat_chi_square_residuals",
]

registry.promote(_NEEDS_CORRECTNESS_ROW)
