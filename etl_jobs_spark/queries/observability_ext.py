"""Observability extensions registered ahead of the verified tail
(see queries/__init__.py on registration order)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_jobs_spark.registry import register
from etl_jobs_spark.sources.readers import read_table

_VALID = "value BETWEEN 0 AND 150 AND coalesce(trim(event_type) <> '', FALSE)"


@register(
    "obs_prometheus_text",
    oracle=f"""
    WITH m AS (
      SELECT CAST(count(*) AS BIGINT) AS total_rows,
             -- coalesce: 0 valid rows on an empty run; bare sum()'s
             -- NULL would also diverge on concat (DuckDB concat
             -- skips NULLs, Spark's nulls the line) (round-11
             -- empty-input axis)
             CAST(coalesce(sum(CASE WHEN {_VALID} THEN 1 ELSE 0 END), 0)
                  AS BIGINT) AS valid_rows
      FROM events)
    SELECT metric, value,
           concat('etl_', metric, ' ', CAST(value AS VARCHAR)) AS line
    FROM (
      SELECT 'rows_total' AS metric, total_rows AS value FROM m
      UNION ALL
      SELECT 'rows_valid', valid_rows FROM m
      UNION ALL
      SELECT 'rows_failed', total_rows - valid_rows FROM m)
    """,
)
def obs_prometheus_text(spark, sf_dir):
    """Prometheus exposition format for the run counters (ref:
    src/etl_2025.py:27-29,268 starts an HTTP exposition server): one
    `etl_<metric> <value>` line per counter, derived from the same
    single-pass aggregates as obs_run_metrics. The HTTP side is
    deployment config on Spark (metrics servlet / JMX exporter);
    the exposition CONTENT is what the pipeline owns, and it's
    oracle-checked here. Long-form unpivot via stack — one scan."""
    ev = read_table(spark, sf_dir, "events")
    valid = (
        (F.col("value").between(0, 150)) & (F.trim("event_type") != "")
    ).cast("int")
    wide = ev.agg(
        F.count(F.lit(1)).alias("total_rows"),
        # count(when): 0 on an empty run (round-11 empty-input axis)
        F.count(F.when(valid == 1, F.lit(1))).cast("long").alias("valid_rows"),
    )
    long = wide.selectExpr(
        "stack(3, 'rows_total', total_rows, 'rows_valid', valid_rows, "
        "'rows_failed', total_rows - valid_rows) AS (metric, value)"
    )
    return long.select(
        "metric",
        "value",
        F.concat(F.lit("etl_"), F.col("metric"), F.lit(" "),
                 F.col("value").cast("string")).alias("line"),
    )
