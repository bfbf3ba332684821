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

# Round-5 sweep window (50 queries, registration order). Front of the
# list = highest priority: (a) the one red row ever
# (corpus_token_budget, r4 hash-mismatch — ordering key now quantized
# to integer-exact BIGINT centichars), (b) round-5 additions /
# oracle-upgraded queries, (c) VERDICT r4 item 7: rotate the stale
# r1-era rows — the code beneath them has evolved for three rounds, so
# the oldest-green queries get fresh driver evidence.
_NEEDS_CORRECTNESS_ROW = [
    # (a) the r4 red row — integer-exact rank key, re-green it
    "corpus_token_budget",
    # (b) round-5 additions & oracle upgrades
    # IVF tier upgraded from rows-only to hash-checked oracles
    # (deterministic centroid fit exported as SQL literals)
    "embed_ivf_topk",
    "embed_ivf_append_topk",
    "embed_pq_topk",
    "embed_ivfpq_topk",
    # round-5 new operators
    "join_bloom_prefilter",
    "ts_anomaly_mad",
    "governance_column_masking",
    "maintenance_compact_report",
    "embed_matryoshka_topk",
    "sink_custom_ledger_stream",
    "multimodal_decode_gif",
    "q2_min_cost_supplier",
    "join_dpp_pruned",
    "agg_count_min_sketch",
    "dedup_incremental_bloom",
    "fn_lambda_suite",
    "udf_arrow_scalar",
    "ts_ewma_hourly",
    "scan_csv_gzip",
    "setop_union_schema_drift",
    "join_asof_tolerance",
    "text_token_entropy",
    "text_zipf_slope",
    "pipeline_daily_incremental",
    "agg_kmv_difference_types",
    "agg_activity_streaks",
    # (c) r1-era rechecks, oldest driver rows first (CORRECTNESS_r01
    # order) — ≥20 per VERDICT r4 item 7
    "agg_pivot_events",
    "scan_partition_pruned",
    "stream_dedup_exact",
    "scan_json_lines",
    "dedup_exact_text",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_embed_cosine",
    "dedup_cluster_components",
    "obs_run_metrics",
    "udf_scalar_pandas",
    "udf_grouped_map",
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
]

registry.promote(_NEEDS_CORRECTNESS_ROW)
