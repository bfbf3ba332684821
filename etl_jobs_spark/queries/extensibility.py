"""Observability + UDF-surface query declarations (SURVEY §2.9/§2.10).

Even the Python-extension paths are oracle-checked: the examples are
deterministic, so the Arrow-batched UDF results must hash-match pure
SQL — proving the hooks are semantically transparent, not escape
hatches from correctness.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_jobs_spark.operators import udfs as U
from etl_jobs_spark.operators.observability import run_metrics
from etl_jobs_spark.registry import register
from etl_jobs_spark.sources.readers import read_table

_VALID = "value BETWEEN 0 AND 150 AND coalesce(trim(event_type) <> '', FALSE)"


@register(
    "obs_run_metrics",
    oracle=f"""
    -- coalesce/greatest: an EMPTY run is 0 processed / 0 failed /
    -- rate 0, matching the engine's counter semantics (round-11
    -- empty-input axis; bare sum() would emit NULLs)
    SELECT CAST(count(*) AS BIGINT) AS total_rows,
           CAST(coalesce(sum(CASE WHEN {_VALID} THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS valid_rows,
           CAST(count(*) - coalesce(sum(CASE WHEN {_VALID} THEN 1 ELSE 0 END),
                                    0) AS BIGINT) AS failed_rows,
           CAST((coalesce(sum(CASE WHEN {_VALID} THEN 1 ELSE 0 END), 0)
                 * 10000) // greatest(count(*), 1) AS BIGINT)
             AS success_rate_bp
    FROM events
    """,
)
def obs_run_metrics(spark, sf_dir):
    """ETLMetrics via df.observe: counters ride along with the
    action, no second scan (ref: src/etl_2020.py:20-34)."""
    ev = read_table(spark, sf_dir, "events")
    valid = F.col("value").between(0, 150) & (F.trim("event_type") != "")
    return run_metrics(spark, ev, valid)


@register(
    "udf_scalar_pandas",
    oracle="SELECT doc_id, lower(trim(text)) AS norm_text FROM documents",
)
def udf_scalar_pandas(spark, sf_dir):
    """Vectorized scalar pandas UDF (row-level extension hook) —
    hash-matches the pure-SQL equivalent."""
    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", U.normalize_text_udf()("text").alias("norm_text")
    )


@register(
    "udf_grouped_map",
    oracle="""
    -- missing bucket first in the key: NULL and NaN both rank LAST
    -- (the grouped-map contract; SQL alone would rank NaN as the
    -- largest value — round-11 extremes axis). Inside the missing
    -- bucket the value key is NEUTRALIZED to NULL: otherwise DuckDB
    -- still orders NaN above NULL within the bucket, while the
    -- pandas kernel orders all missing rows purely by event_id —
    -- ranks would diverge in a group holding both a SQL NULL and a
    -- NaN payload (round-12 ADVICE).
    SELECT event_id, event_type, value,
           CAST(row_number() OVER (
                    PARTITION BY event_type
                    ORDER BY CASE WHEN value IS NULL OR isnan(value)
                                  THEN 1 ELSE 0 END ASC,
                             CASE WHEN value IS NULL OR isnan(value)
                                  THEN NULL ELSE value END DESC,
                             event_id ASC)
                AS BIGINT) AS rnk
    FROM events
    """,
)
def udf_grouped_map(spark, sf_dir):
    """applyInPandas grouped map (group-level extension hook, the
    process_chunk shape) — hash-matches a window-function oracle."""
    return U.rank_within_group(read_table(spark, sf_dir, "events"))


@register(
    "udaf_grouped_pandas",
    # sums floor(v^2 * SCALE + 0.5) — exactly-representable integers,
    # so the sum is order-independent and bit-identical to the pandas
    # UDAF's numpy pairwise sum (see operators/udfs.py RMS_SCALE).
    # vv/n are the NON-NaN values: the pandas UDAF's dropna treats a
    # NaN payload as missing (Arrow float64 cannot distinguish it
    # from SQL NULL), so the oracle restates the same contract —
    # value-neutral on NaN-free fixtures (round-11 extremes axis)
    oracle=f"""
    WITH vv AS (
      SELECT event_type,
             CASE WHEN NOT isnan(value) THEN value END AS value
      FROM events)
    SELECT event_type, CAST(count(value) AS BIGINT) AS n,
           round(sqrt(sum(floor(value * value * {U.RMS_SCALE} + 0.5))
                      / ({U.RMS_SCALE} * count(value))), 6) AS rms_value
    FROM vv GROUP BY event_type
    """,
)
def udaf_grouped_pandas(spark, sf_dir):
    """Grouped-agg pandas UDF (the UDAF hook: Series → scalar per
    group, Arrow-batched) computing per-type RMS — hash-matches the
    sqrt(avg(v*v)) restatement. Completes the §2.9 trio with
    udf_scalar_pandas (row) and udf_grouped_map (group map)."""
    ev = read_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        U.count_udaf()(F.col("value")).alias("n"),
        F.round(U.rms_udaf()(F.col("value")), 6).alias("rms_value"),
    )


@register(
    "udtf_passage_chunks",
    oracle="""
    SELECT doc_id,
           CAST(u['i'] AS BIGINT) AS chunk_idx,
           u['v'] AS passage
    FROM (
        SELECT doc_id,
               unnest(list_transform(
                   range(1, CAST(ceil(len(toks) / 16.0) AS BIGINT) + 1),
                   i -> {'i': i,
                         'v': array_to_string(
                                  list_slice(toks, (i - 1) * 16 + 1, i * 16),
                                  ' ')}
               )) AS u
        FROM (
            SELECT doc_id,
                   string_split(regexp_replace(lower(trim(text)),
                                               '\\s+', ' ', 'g'), ' ') AS toks
            FROM documents
        )
    )
    """,
)
def udtf_passage_chunks(spark, sf_dir):
    """Python UDTF via LATERAL join: one document row → N fixed-width
    passage rows (retrieval-index segmentation; the flatMap-style
    table-function hook). The oracle restates the chunking with an
    indexed list_transform + unnest, so even the UDTF path is
    hash-checked."""
    from etl_jobs_spark.operators.hashing import norm_text

    docs = read_table(spark, sf_dir, "documents")
    spark.udtf.register("passage_chunk", U.passage_chunk_udtf())
    from etl_jobs_spark.queries._shared import scoped_view

    v = scoped_view(  # dataset-scoped view name: axis 9
        docs.select(
            "doc_id", F.expr(norm_text("text", "spark")).alias("n")
        ),
        "_udtf_docs",
        sf_dir,
    )
    return spark.sql(
        f"SELECT doc_id, s.chunk_idx, s.passage "
        f"FROM {v}, LATERAL passage_chunk(n) s"
    )


@register(
    "udtf_arrow_shingles",
    oracle=f"""
    SELECT doc_id, CAST(u.i AS BIGINT) AS gram_idx,
           array_to_string(list_slice(toks, u.i, u.i + {U.SHINGLE_WORDS - 1}),
                           ' ') AS gram
    FROM (
        SELECT doc_id,
               string_split(regexp_replace(lower(trim(text)),
                                           '\\s+', ' ', 'g'), ' ') AS toks
        FROM documents
    ), unnest(range(1, greatest(len(toks) - {U.SHINGLE_WORDS - 2}, 1))) u(i)
    """,
)
def udtf_arrow_shingles(spark, sf_dir):
    """Spark 4 ARROW-OPTIMIZED Python UDTF (``useArrow=True``): one
    document → one row per overlapping word shingle, via LATERAL join.
    Same table-function hook as udtf_passage_chunks but Arrow-batched
    end-to-end — the fan-out shape MinHash/decontamination shingle
    extraction uses. Hash-matches an unnest(range)+list_slice oracle."""
    from etl_jobs_spark.operators.hashing import norm_text as _nt

    docs = read_table(spark, sf_dir, "documents")
    spark.udtf.register("word_shingle", U.word_shingle_udtf())
    from etl_jobs_spark.queries._shared import scoped_view

    v = scoped_view(  # dataset-scoped view name: axis 9
        docs.select("doc_id", F.expr(_nt("text", "spark")).alias("n")),
        "_udtf_shingle_docs",
        sf_dir,
    )
    return spark.sql(
        f"SELECT doc_id, s.gram_idx, s.gram "
        f"FROM {v}, LATERAL word_shingle(n) s"
    )


@register(
    "udf_arrow_scalar",
    oracle="""
    SELECT doc_id,
           CAST(len(list_filter(
                    regexp_split_to_array(text, '[ \t\n\r\f\v]+'),
                    t -> t <> '')) AS BIGINT) AS n_ws_tokens
    FROM documents
    """,
)
def udf_arrow_scalar(spark, sf_dir):
    """Spark 4 Arrow-optimized scalar Python UDF (``useArrow=True``)
    — completes the row-level UDF ladder alongside the pandas UDF
    (udf_scalar_pandas) and the Arrow UDTF (udtf_arrow_shingles):
    plain per-value Python, Arrow-columnar transport. Tokens split
    on an EXPLICIT ASCII whitespace class pinned identically in the
    Python UDF and the oracle's regexp_split_to_array — Python's
    ``str.split()`` and SQL ``\\s`` disagree on unicode whitespace
    (NBSP), caught by the round-10 unicode differential."""
    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", U.token_count_arrow_udf()("text").alias("n_ws_tokens")
    )
