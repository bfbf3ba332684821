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

# Queries with no green row in CORRECTNESS_r01/r02 — promoted to the
# front of the registry so the next 50-query sweep reaches all of them.
# The window holds exactly 50; the round-3 additions that didn't fit
# (embed_ivfpq_topk — rows-only anyway — scan_with_lineage,
# dedup_cluster_size_hist, mix_temperature_weights,
# corpus_token_budget, join_star_shuffle_hash,
# source_custom_pushdown, stream_source_custom, fn_variant_json,
# agg_hll_mergeable, agg_bitmap_distinct, scan_xml_roundtrip,
# fn_collation_suite, graph_reachability_sql,
# pipeline_llm_corpus_end_to_end) are the round-4 promotion backlog.
_NEEDS_CORRECTNESS_ROW = [
    # round-3 additions (tpch_plus)
    "q6_forecast_revenue",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q10_returned_items",
    "embed_centroid_labels",
    "approx_distinct_kmv",
    "agg_mode_value_bucket",
    "join_asof_forward",
    "stream_merge_upsert",
    "dedup_ngram_containment",
    "dedup_semantic_keep_best",
    "dedup_incremental_new_docs",
    "text_fertility_by_lang",
    "join_range_autobucket",
    "stream_topk_types",
    "join_dim_snapshot_asof",
    "snapshot_diff_audit",
    # never driver-checked through round 2
    "source_queue",
    "sink_queue",
    "stream_stateful_pandas",
    "stream_static_join",
    "stream_interval_join",
    "stream_interval_join_outer",
    "text_pii_scrub",
    "doc_shard_assign",
    "sample_stratified",
    "pack_sequences",
    "quality_filter_top_half",
    "dedup_keep_canonical",
    "embed_norm_stats",
    "agg_user_gap_stats",
    "obs_prometheus_text",
    "fn_string_suite",
    "fn_datetime_suite",
    "join_full_outer",
    "fn_window_suite",
    "fn_array_suite",
    "fn_percentile_suite",
    "join_bucketed_colocated",
    "join_salted_skew",
    "agg_grouping_sets",
    "agg_salted_events",
    "agg_histogram_value",
    "join_semi_anti",
    "window_ntile_quartiles",
    "window_range_frame",
    "dedup_lsh_verified",
    "udaf_grouped_pandas",
    "udtf_passage_chunks",
    "multimodal_audio_chunks",
]

registry.promote(_NEEDS_CORRECTNESS_ROW)
