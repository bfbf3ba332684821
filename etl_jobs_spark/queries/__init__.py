"""Declared queries: importing this package registers every
query/oracle pair with etl_jobs_spark.registry.

Registration order == the order the driver's correctness sweep walks
the registry (50 per round). The ``_ROUND*_WINDOW`` list below picks
this round's 50: queries needing a FIRST driver row (new or changed
this round) lead, then the rows whose last driver check is oldest
rotate through the remaining slots. After a query earns a green
CORRECTNESS row it drifts back and the rotation continues."""

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

# Round-15 sweep window (50 queries, registration order), per the
# r14 verdict item 2 + docs/PERF_r14.md handoff:
#   (a) rows NEW or CHANGED in round 15, fronted per the round-10
#       discipline:
#       - sink_txn_parquet: NEW — the write-side transactional
#         commit log (VERDICT r14 item 7; the one registry addition
#         this round, breaking the 380 freeze by exactly the row
#         item 7 prescribed);
#       - embed_mmr_diversified_topk: the MMR bound check moved
#         after the collect (ADVICE r14 — two count() actions
#         dropped);
#       - sink_s3 / sink_json_report / maintenance_compact_report /
#         sink_custom_ledger: their shared write-lock primitive
#         gained token ownership + rename-based stale breaking +
#         dead-pid recovery (ADVICE r14 medium);
#       - stream_interval_join_full / stream_dedup_exact /
#         stream_stateful_pandas / scan_json_lines /
#         multimodal_decode_features: their fixture staging moved to
#         the atomic temp-dir+rename protocol (ADVICE r14,
#         streaming.py:908). The remaining streaming rows share the
#         same one-line stage_atomic wrap and carry fresh 21/21
#         cross-version restart evidence on this tree
#         (docs/SWEEP_COST_axis_checkpoint.json, engine_tree-stamped).
#       - q1_pricing_summary / agg_salted_events / agg_cube_events:
#         the davg tie fix (nulled-axis finding, see
#         docs/FLOAT_ORDER_AUDIT.md round-15 section) rewrote their
#         average aggregates AND oracles in lockstep — changed rows
#         front.
#   (b) the r6-latest cohort — the oldest driver evidence after the
#       r14 window landed — in CORRECTNESS_r06 order, minus
#       agg_gini_revenue (fronted r14) and stream_interval_join_full
#       (fronted in (a)), trimmed by its last three rows
#       (agg_bitmap_rollup_weekly, window_pct_change_mom,
#       agg_repeat_purchase_rate, embed_centroid_drift — they lead
#       the r16 rotation) to hold the four davg-fix rows: 35 rows. After this window lands
#       green, driver evidence older than round 7 is those three
#       r6 rows only.
_ROUND15_WINDOW = [
    "q1_pricing_summary",
    "agg_events_by_type",
    "agg_salted_events",
    "agg_cube_events",
    "sink_txn_parquet",
    "embed_mmr_diversified_topk",
    "sink_s3",
    "sink_json_report",
    "maintenance_compact_report",
    "sink_custom_ledger",
    "stream_interval_join_full",
    "stream_dedup_exact",
    "stream_stateful_pandas",
    "scan_json_lines",
    "multimodal_decode_features",
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
    "q4_priority_exists",
    "q12_priority_by_flag",
    "q18_large_orders",
    "attr_linear_touch",
    "agg_pareto_share",
    "fn_map_suite",
    "scan_json_nested_explode",
    "text_bpe_tokenize",
    "text_hashing_trick_features",
    "scan_txn_log_snapshot",
    "agg_time_to_convert",
    "stat_ab_test_zscore",
    "dq_drift_psi",
    "ts_seasonal_profile",
    "fn_regex_suite",
    "fn_url_suite",
    "corpus_quality_threshold_sweep",
    "ts_cusum_changepoint",
    "dq_benford_first_digit",
    "window_share_of_total",
    "text_langid_confusion_eval",
    "fn_interval_suite",
    "pipeline_dq_quarantine_replay",
]

registry.promote(_ROUND15_WINDOW)
