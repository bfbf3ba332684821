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
    SELECT CAST(count(*) AS BIGINT) AS total_rows,
           CAST(sum(CASE WHEN {_VALID} THEN 1 ELSE 0 END) AS BIGINT)
             AS valid_rows,
           CAST(count(*) - sum(CASE WHEN {_VALID} THEN 1 ELSE 0 END) AS BIGINT)
             AS failed_rows,
           CAST((sum(CASE WHEN {_VALID} THEN 1 ELSE 0 END) * 10000)
                // count(*) AS BIGINT) AS success_rate_bp
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
    SELECT event_id, event_type, value,
           CAST(row_number() OVER (PARTITION BY event_type
                                   ORDER BY value DESC, event_id ASC)
                AS BIGINT) AS rnk
    FROM events
    """,
)
def udf_grouped_map(spark, sf_dir):
    """applyInPandas grouped map (group-level extension hook, the
    process_chunk shape) — hash-matches a window-function oracle."""
    return U.rank_within_group(read_table(spark, sf_dir, "events"))
