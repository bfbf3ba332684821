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

# Round-12 sweep window (50 queries, registration order). This round
# DRAINS the displaced r2/r3 driver-row backlog — the round-11
# verdict's top item, reserved slots so it cannot be displaced a
# third time. Composition:
#   (a) 6 rows changed THIS round (round-10 discipline: operator or
#       oracle text changed → must front): scan_empty_feed_census is
#       the round's ONE registry addition (379 → 380; the round-11
#       verdict item 5 documented the gap first — a permanent
#       driver-green witness for the zero-row class), udf_grouped_map
#       (oracle neutralizes the value key inside the missing bucket —
#       round-12 ADVICE), scan_glob_union (empty-feed detection moved
#       from a driver-local glob.glob probe to catching Spark's own
#       PATH_NOT_FOUND — ADVICE medium), and the scan_csv family
#       (scan_csv_single / scan_csv_pandas / source_s3: the CSV
#       timestamp default became optional-fraction
#       "yyyy-MM-dd HH:mm:ss[.SSSSSS]", overridable via **options).
#   (b) the FULL 39-query backlog, oldest-first in the recorded
#       handoff order: the r2 cohort (8), then the r3 queue/stream/
#       fn/join/udtf families and the rest of the r3 rows.
#   (c) 5 of the r5-era rows: four of the round-11 guard-only
#       changes the driver has never seen post-guard (embed_ivf_topk,
#       embed_pq_topk, embed_ivfpq_topk, dedup_embed_cosine) and
#       join_bloom_prefilter (displaced in r11).
# After this window lands green, no driver row predates r4 except
# embed_ivf_append_topk (r5, same guard family as three checked
# here) — it leads the round-13 rotation with ann_recall_eval (r6),
# text_bpe_apply_learned (r7) and the r4 cohort (31 rows).
_ROUND12_WINDOW = [
    # (a) changed this round
    "scan_empty_feed_census",
    "udf_grouped_map",
    "scan_glob_union",
    "scan_csv_single",
    "scan_csv_pandas",
    "source_s3",
    # (b) the r2 cohort — oldest evidence in the repo (last row r2)
    "agg_funnel_steps",
    "agg_retention_cohorts",
    "cdc_apply_changelog",
    "join_asof_events",
    "scd2_history",
    "text_top_terms",
    "text_unigram_commonness",
    "zorder_layout_stats",
    # (b) the r3 families, recorded handoff order
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
    "fn_string_suite",
    "join_asof_forward",
    "join_dim_snapshot_asof",
    "join_full_outer",
    "join_semi_anti",
    "udtf_passage_chunks",
    "multimodal_audio_chunks",
    "agg_mode_value_bucket",
    "approx_distinct_kmv",
    "dedup_incremental_new_docs",
    "dedup_keep_canonical",
    # (b) remaining r3 rows (alphabetical within the cohort)
    "dedup_lsh_verified",
    "dedup_ngram_containment",
    "dedup_semantic_keep_best",
    "doc_shard_assign",
    "embed_centroid_labels",
    "embed_norm_stats",
    "pack_sequences",
    "quality_filter_top_half",
    "sample_stratified",
    "text_fertility_by_lang",
    # (c) r5-era guard-changed rows + the twice-displaced re-check.
    #     scan_incremental_watermark takes embed_ivfpq_topk's slot:
    #     the round-12 TZ axis found (and fixed) a real divergence in
    #     it — a changed row outranks the fourth of four same-family
    #     guard re-checks (embed_ivf_topk + embed_pq_topk jointly
    #     cover IVFPQ's two constituent guard paths; it rotates r13).
    #     agg_pivot_events takes join_bloom_prefilter's slot (the
    #     window's one unchanged non-backlog row): the round-12
    #     duplicate-key axis found a REAL sparse-data wrong-answer in
    #     it (post-pivot NULL cells vs the oracle's zero-fill) — the
    #     fixed bug outranks a stale-green re-check; bloom rotates
    #     r13 at the head with the other axis-8-changed rows (the
    #     asof/tws/dedup/multimodal/fit-tier cohort), which stay
    #     behind the reserved backlog per the round-11 verdict and
    #     are all swept green builder-side at three SFs.
    "scan_incremental_watermark",
    "embed_ivf_topk",
    "embed_pq_topk",
    "dedup_embed_cosine",
    "agg_pivot_events",
]

registry.promote(_ROUND12_WINDOW)
