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

# Round-9 sweep window (50 queries, registration order), per VERDICT
# r8 item 1: "Freeze the registry and promote all 56 never-driver-
# checked late-round-8 queries (the _ROUND9_WINDOW_FRONT order)
# through the round-9 correctness window — no new operators until it
# clears." The registry is FROZEN this round: zero new queries; the
# whole window budget goes to the hard-signal backlog.
#
# Window arithmetic: backlog = 56 never-checked (below) + 9 r1-era
# deferrals = 65 > 50, so the first 50 of _ROUND9_WINDOW_FRONT fill
# this round's window and the remaining 6 + the 9 r1-era deferrals
# form _ROUND10_WINDOW_FRONT (the recorded deferral rationale VERDICT
# r8 item 7 asks for — their r1 rows are green, they are the lowest-
# information re-checks, and backlog-first wins the slots again).
_NEEDS_CORRECTNESS_ROW = [
    # late round-8 wave 2 (never driver-checked; each hash-green at
    # sf0.001/0.01/0.1 in builder-side driver-grade sweeps with a
    # pure-Python cross-check in tests/ — soft evidence until the
    # driver row lands)
    "stat_spearman_rho",
    "stat_runs_test",
    "graph_k_core",
    "graph_degree_assortativity",
    "ts_sax_symbols",
    "ts_theil_sen_trend",
    "text_collocation_lift",
    "feat_vocab_collapse_encode",
    "spatial_morton_tiles",
    # late round-8 wave 3 (continuation session; same evidence tier)
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
    # ---- 50-slot window boundary: everything below spills to the
    # ---- round-10 front (see _ROUND10_WINDOW_FRONT).
]

#: Round-10 window FRONT (slots 51+ this round — the driver's window
#: caps at 50, so these carry over): (a) the last 6 never-checked
#: late-round-8 queries displaced by the 50-slot cap above, then
#: (b) the 9 r1-era deferrals. The r1-era rows each HOLD a green r1
#: driver row and are low-information re-checks (rationale recorded
#: in round 7/8: agg_approx_sketches is rows-only by design;
#: filter_valid_rows complements the fresh filter_rejected_rows;
#: agg_success_rate aliases agg_completion_rate's implementation;
#: agg_record_count / agg_events_by_type are bare counts;
#: setop_intersect / setop_except have the family fresh from four
#: directions; fillna_const is the sibling of the fresh fillna_mean;
#: window_running_sum's cumulative-window path is fresh via M4/STL).
#: Backlog-first allocation (never-checked > stale-green) wins them
#: out of this round's window for the third time — that is the
#: explicit deferral record VERDICT r8 item 7 asks for. All 15 rows
#: here (and the 50-slot window above) were re-verified hash-green
#: builder-side at sf0.01 on the round-9 tree in one driver-shaped
#: sweep (65/65, 57s), and the round-9 full sweeps held 377/377 at
#: both sf0.01 and sf0.1.
_ROUND10_WINDOW_FRONT = [
    # (a) never-driver-checked spill from the 56-query backlog
    "agg_stickiness_dau_mau",
    "ts_seasonality_strength",
    "text_simpson_diversity",
    "agg_user_overlap_stability",
    "ts_burstiness_fano",
    "stat_chi_square_residuals",
    # (b) r1-era deferrals (green r1 rows; rotation re-checks)
    "filter_valid_rows",
    "fillna_const",
    "agg_record_count",
    "agg_success_rate",
    "agg_events_by_type",
    "setop_intersect",
    "setop_except",
    "window_running_sum",
    "agg_approx_sketches",
]

registry.promote(_NEEDS_CORRECTNESS_ROW + _ROUND10_WINDOW_FRONT)
