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

# Round-14 sweep window (50 queries, registration order), per the
# r13 verdict item 1 + docs/PERF_r13.md handoff: this round is
# evidence-depth focused (measurement basis, durability/concurrency
# axes) and changes almost no operator text, so the window is nearly
# pure rotation:
#   (a) rows changed in round 14: embed_mmr_diversified_topk (the
#       driver-side MMR greedy stage gained the loud shortlist
#       bound VERDICT r13 item 6 asked for);
#   (b) the full 12-row r4-latest remainder the r13 window could not
#       hold (incl. agg_hll_mergeable, the rows-only sketch row with
#       the weakest driver signal), correctness-file order;
#   (c) the complete 32-row r5-latest cohort, correctness-file order
#       -- after this window lands green, no driver evidence is
#       older than r6;
#   (d) the first 1 of the 41-row r6-latest cohort, correctness-file
#       order (the rest lead the r15 rotation).
_ROUND14_WINDOW = [
    # (a) changed in round 14: the MMR loud-bound row plus the four
    #     batch write rows whose sink primitives gained the
    #     exclusive table write lock (sources/write_lock.py) /
    #     NULL-partition + percent-encoding fix — changed rows
    #     front, per the round-10 discipline. All swept green at
    #     three SFs post-change; driver currency is what they lack.
    "embed_mmr_diversified_topk",
    "sink_s3",
    "sink_json_report",
    "maintenance_compact_report",
    "sink_custom_ledger",
    # (b) r4-latest remainder (12)
    "agg_hll_mergeable",
    "dedup_cluster_size_hist",
    "fn_variant_json",
    "mix_temperature_weights",
    "scan_xml_roundtrip",
    "text_quality_classifier",
    "text_boilerplate_removal",
    "dedup_repeated_ngram_spans",
    "agg_kmv_intersect_types",
    "mix_epoch_plan",
    "dq_expectations_suite",
    "join_interval_overlap",
    # (c) r5-latest cohort (32)
    "corpus_token_budget",
    "ts_anomaly_mad",
    "governance_column_masking",
    "embed_matryoshka_topk",
    "q2_min_cost_supplier",
    "agg_count_min_sketch",
    "dedup_incremental_bloom",
    "fn_lambda_suite",
    "ts_ewma_hourly",
    "scan_csv_gzip",
    "setop_union_schema_drift",
    "text_token_entropy",
    "text_zipf_slope",
    "agg_kmv_difference_types",
    "agg_activity_streaks",
    "scan_json_lines",
    "dedup_exact_text",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_cluster_components",
    "udf_scalar_pandas",
    "multimodal_decode_features",
    "multimodal_frame_sample",
    "proj_upper",
    "proj_cast_int",
    "proj_add_ts",
    "proj_batch_id",
    "filter_required_fields",
    "filter_nonempty_name",
    "filter_age_range",
    "filter_email_format",
    # (d) r6-latest head (1; the remaining 40 lead the r15
    #     rotation)
    "agg_gini_revenue",
]

registry.promote(_ROUND14_WINDOW)
