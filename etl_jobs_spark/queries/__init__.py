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

# Queries with no green driver row in CORRECTNESS_r01–r03 — promoted
# to the front of the registry so the round-4 sweep reaches all of
# them (15 left; the 50-query window easily holds them plus any
# round-4 additions, which should be appended to this list as they
# are registered).
_NEEDS_CORRECTNESS_ROW = [
    # the 15-query round-4 backlog (VERDICT r3 "What's missing" #1),
    # in queries/__init__ registration order
    "agg_bitmap_distinct",
    "agg_hll_mergeable",
    "corpus_token_budget",
    "dedup_cluster_size_hist",
    "embed_ivfpq_topk",
    "fn_collation_suite",
    "fn_variant_json",
    "graph_reachability_sql",
    "join_star_shuffle_hash",
    "mix_temperature_weights",
    "pipeline_llm_corpus_end_to_end",
    "scan_with_lineage",
    "scan_xml_roundtrip",
    "source_custom_pushdown",
    "stream_source_custom",
    # round-4 additions: real stdlib-codec multimodal decode
    "multimodal_decode_png_bmp",
    "multimodal_resize_nearest",
    "multimodal_decode_wav",
    # round-4 additions: Spark 4 arrow-optimized UDTFs (batch LATERAL
    # fan-out + the streaming write path)
    "udtf_arrow_shingles",
    "stream_udtf_fanout",
    # round-4 additions: linear quality classifier + boilerplate removal
    "text_quality_classifier",
    "text_boilerplate_removal",
    # round-4 addition: exact-substring (Lee et al.) repeated spans
    "dedup_repeated_ngram_spans",
    # round-4 addition: theta-style KMV intersection sketch
    "agg_kmv_intersect_types",
    # round-4 addition: nearest as-of join
    "join_asof_nearest",
    # round-4 addition: per-source epoch allocation recipe
    "mix_epoch_plan",
    # round-4 addition: multimodal curation flagship (real codecs)
    "pipeline_media_curation",
    # round-4 addition: streaming media ingest with real decode
    "stream_media_decode",
    # round-4 addition: custom Python DataSource write path
    "sink_custom_ledger",
    # round-4 addition: one-pass declarative expectation suite
    "dq_expectations_suite",
    # round-4 addition: bucketed interval-overlap join
    "join_interval_overlap",
    # round-4 addition: TPC-H Q14 promotion-effect shape
    "q14_promo_effect",
    # round-4 addition: footer-stats consistency audit
    "scan_footer_stats_audit",
    # round-4 addition: TPC-H Q19 disjunctive-bracket shape
    "q19_bracket_revenue",
    # round-4 addition: managed-catalog dynamic partition overwrite
    "catalog_partition_overwrite",
    # round-4 addition: incremental IVF index maintenance (rows-only)
    "embed_ivf_append_topk",
    # round-4 addition: streaming JDBC sink (2025-era relational loop)
    "stream_sink_jdbc",
]

# Round-4 addition: Spark 4 transformWithStateInPandas is registered
# only where a protobuf runtime exists (protobuf_compat shim), so its
# promotion is conditional the same way — promote() treats unknown
# names as a hard error on purpose.
if "stream_tws_processor" in registry._REGISTRY:
    _NEEDS_CORRECTNESS_ROW.append("stream_tws_processor")

registry.promote(_NEEDS_CORRECTNESS_ROW)
