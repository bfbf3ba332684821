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

# Round-7 sweep window (50 queries, registration order), per VERDICT
# r6 item 1: (a) round-7 additions (each new query is inserted at
# the front as it lands), then (b) the THREE queries that have never
# received a driver row, then (c) the 27 r1-era rows whose newest
# driver evidence is still CORRECTNESS_r01, then (d) the oldest
# r2-era rows to fill to 50 (scan_/sink_ family, the embed pair,
# the text block — the rest of the r2 batch rotates in round 8).
_NEEDS_CORRECTNESS_ROW = [
    # (a) round-7 additions
    "dedup_substring_spans",
    "text_bpe_learn",
    "embed_kmeans_lloyd",
    "text_pii_redact",
    "multimodal_audio_rms_energy",
    "join_spatial_grid",
    "geo_grid_density",
    "dedup_substring_coverage",
    "decontam_substring_hits",
    "text_bpe_apply_learned",
    "agg_weighted_median",
    "sample_reservoir_per_key",
    "ts_downsample_m4",
    "spatial_point_in_polygon",
    "ts_missing_buckets",
    "ts_stl_decompose_hourly",
    "q7_nation_volume",
    "q13_order_count_distribution",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q21_suppliers_kept_waiting",
    "q22_global_sales_opportunity",
    "fn_variant_suite",
    "agg_listagg_ordered",
    "recursive_cte_hierarchy",
    "agg_hll_custom_deterministic",
    "dq_order_lineitem_reconcile",
    "governance_access_report",
    "fn_collation_suite",
    # (b) never driver-checked
    "fn_bitwise_suite",
    "join_null_safe",
    "setop_multiset_all",
    # (c) r1-era rows (newest driver row = r1)
    "q1_pricing_summary",
    "join_star_revenue",
    "agg_null_counts",
    "agg_dup_count",
    "agg_quantiles_iqr",
    "filter_outliers_iqr",
    "agg_profile_stats",
    # agg_record_count (a bare count(*)) defers to round 8 with the
    # other displaced rows.
    "agg_completion_rate",
    # agg_success_rate defers to round 8: it is the same
    # implementation as agg_completion_rate under a second alias
    # (see reference_parity.py), so one fresh row covers the code
    # path.
    "pred_alert_thresholds",
    "dedup_full_row",
    # fillna_const defers to round 8 (sibling fillna_mean stays —
    # same imputation path, the mean variant is the harder half).
    "fillna_mean",
    "proj_quality_score",
    "filter_rejected_rows",
    "setop_union_all",
    # setop_intersect defers to round 8 (setop_union_all,
    # setop_except AND the multiset pair all hold fresh rows — the
    # set-operation path is covered from four directions).
    # setop_except defers to round 8 alongside setop_intersect
    # (setop_union_all + the multiset pair keep the family fresh).
    "topk_orders",
    "window_rank_events",
    # window_running_sum defers to round 8 (cumulative-window code
    # is exercised by the fresh M4/STL/coverage/share rows).
    "json_extract_props",
    "pipeline_2022_end_to_end",
    # agg_events_by_type (bare groupBy-count, the same path dozens
    # of green queries exercise) defers to round 8.
    # agg_approx_sketches (rows-only by design — its refresh carries
    # no hash information) and filter_valid_rows (the complement
    # half of filter_rejected_rows, same code path) defer to round 8
    # to make room for the 22 round-7 additions.
    # (d) r2-era fill — fully displaced this round; the whole r2
    # rotation (scan_/sink_/embed_/text_ families) runs in round 8.
    # scan_csv_corrupt_quarantine / scan_incremental_watermark / scan_orc_roundtrip /
    # scan_schema_evolution / sink_jdbc_append / sink_json_report /
    # sink_partition_overwrite / sink_s3 / source_s3 rotate to
    # round 8 with the text block below.
    # embed_cosine_topk / embed_lsh_topk / text_fingerprint /
    # text_lang_id / text_quality_score /
    # text_tfidf / text_token_stats rotate to round 8 — each round-7
    # addition displaces one r2-era fill slot (window cap is 50).
]

registry.promote(_NEEDS_CORRECTNESS_ROW)
