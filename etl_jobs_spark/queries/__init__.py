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
)

# Round-6 sweep window (50 queries, registration order). Front of the
# list = highest priority: (a) the 20 round-6 additions (all
# hash-oracled), then (b) the remaining never-rechecked r1-era rows
# (27 — the last of VERDICT r4 item 7's rotation; round 5 already
# re-greened 23 of the oldest) and the three oldest r2-era rows to
# fill the window.
_NEEDS_CORRECTNESS_ROW = [
    # (a) round-6 additions
    "agg_gini_revenue",
    "basket_brand_affinity",
    "path_top_sequences",
    "ts_interval_coverage",
    "ts_autocorr_lag1",
    "ts_ols_daily_trend",
    "ts_rolling_median_hourly",
    "graph_triangle_count",
    "dq_l_diversity",
    "governance_erasure_cascade",
    "curriculum_phase_plan",
    "sample_weighted_bernoulli",
    "mv_incremental_refresh",
    "maintenance_vacuum_report",
    "ann_recall_eval",
    "multimodal_audio_downsample",
    "scan_text_logparse",
    "q4_priority_exists",
    "q12_priority_by_flag",
    "q18_large_orders",
    "stream_interval_join_full",
    "attr_linear_touch",
    "agg_pareto_share",
    "fn_map_suite",
    "scan_json_nested_explode",
    "text_bpe_tokenize",
    "text_hashing_trick_features",
    "scan_txn_log_snapshot",
    "agg_time_to_convert",
    "stat_chi_square_independence",
    "stat_ab_test_zscore",
    "dq_drift_psi",
    "dedup_lsh_recall_eval",
    "multimodal_image_histogram",
    "ts_seasonal_profile",
    "fn_regex_suite",
    "scd2_merge_apply",
    "join_lateral_topn",
    "fn_url_suite",
    "corpus_quality_threshold_sweep",
    "ts_cusum_changepoint",
    "dq_benford_first_digit",
    "window_share_of_total",
    "text_langid_confusion_eval",
    "fn_interval_suite",
    "pipeline_dq_quarantine_replay",
    "embed_centroid_drift",
    "agg_bitmap_rollup_weekly",
    "window_pct_change_mom",
    "agg_repeat_purchase_rate",
    # The 50-slot window is entirely round-6 additions; the r1/r2-era
    # recheck rotation (VERDICT r4 item 7's tail: q1_pricing_summary,
    # the agg_/filter_/fillna_/proj_ reference-parity rows, the setop
    # trio, topk_orders, window_rank/running, and the r2-era batch)
    # rolls to round 7. fn_bitwise_suite (pure-integer, individually
    # driver-checked at sf0.01 this round) also rolls, as do
    # join_null_safe and setop_multiset_all (same pure-integer class,
    # same individual checks) — 53 additions don't fit a 50-row
    # window.
]

registry.promote(_NEEDS_CORRECTNESS_ROW)
