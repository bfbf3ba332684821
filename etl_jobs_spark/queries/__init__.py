"""Declared queries: importing this package registers every
query/oracle pair with etl_jobs_spark.registry.

Registration order == the order the driver's correctness sweep walks
the registry (50 per round). The ``_ROUND11_WINDOW`` list below picks
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

# Round-11 sweep window (50 queries, registration order). With the
# registry fully driver-evidenced since round 10 (379/379), the window
# is now: changed-this-round rows first, then the round-10 handoff's
# recorded front, then pure oldest-driver-row-first rotation
# (docs/PERF_r10.md "Handoff to round 11"). Row-age census at the
# start of this round: r2-era 8, r3-era 39, r4-era 38 (computed from
# CORRECTNESS_r01-r10.json, latest round per query).
_ROUND11_WINDOW = [
    # (a) changed THIS round — the review-driven AVG-denominator fix
    #     (operators/money.py davg/davg_sql now divide by the
    #     non-null count; four inline oracles rewritten in lockstep),
    #     the rms_udaf all-null-group NULL fix, and the
    #     agg_profile_stats variance clamp + exact_decimal opt-out.
    #     Values are identical on the null-free fixtures (old rows
    #     stay valid) but the oracle/operator text changed, so per
    #     the round-10 discipline they take fresh rows first.
    "q1_pricing_summary",
    "agg_events_by_type",
    "agg_cube_events",
    "agg_salted_events",
    "agg_profile_stats",
    "udaf_grouped_pandas",
    # (b) the recorded round-11 front (PERF_r10.md handoff):
    #     snapshot_diff_audit (displaced from the r10 window by the
    #     sketch-accuracy row), the round-10 null/unicode-axis fixes
    #     whose oracle text changed late (value-identical on clean
    #     fixtures), and the four re-checks round 10 deferred with
    #     rationale.
    "snapshot_diff_audit",
    "dq_drift_ks",
    "stat_mann_whitney_u",
    "stat_levene_bf",
    "feat_robust_scale",
    "ts_downsample_m4",
    "window_ntile_quartiles",
    "fn_window_suite",
    "scan_text_logparse",
    "agg_user_gap_stats",
    "udf_arrow_scalar",
    "join_bloom_prefilter",
    "join_dpp_pruned",
    "sink_custom_ledger_stream",
    "agg_session_bounce_rate",
    # (c) rotation, oldest rows first: the full r2-era cohort (the 8
    #     oldest driver rows in the registry, last checked 9 rounds
    #     ago)...
    "agg_funnel_steps",
    "agg_retention_cohorts",
    "cdc_apply_changelog",
    "join_asof_events",
    "scd2_history",
    "text_top_terms",
    "text_unigram_commonness",
    "zorder_layout_stats",
    # (d) ...then 21 of the 34 remaining r3-era rows, the families
    #     the handoff named first (queue source/sink, the stream_*
    #     r3 cohort, text_pii_scrub, the fn_* suites, the join
    #     family, the UDTF row, multimodal_audio_chunks), topped up
    #     with the first three unnamed r3 rows. The 13 r3-era rows
    #     that don't fit (dedup_*/embed_* r3 cohort + doc_shard_assign
    #     etc.) lead the round-12 rotation.
    "source_queue",
    "sink_queue",
    "stream_interval_join",
    "stream_interval_join_outer",
    "stream_merge_upsert",
    "stream_stateful_pandas",
    "stream_static_join",
    "text_pii_scrub",
    "fn_array_suite",
    "fn_datetime_suite",
    "fn_percentile_suite",
    "fn_string_suite",
    "join_asof_forward",
    "join_dim_snapshot_asof",
    "join_full_outer",
    "join_semi_anti",
    "udtf_passage_chunks",
    "multimodal_audio_chunks",
    "agg_histogram_value",
    "agg_mode_value_bucket",
    "approx_distinct_kmv",
]

registry.promote(_ROUND11_WINDOW)
