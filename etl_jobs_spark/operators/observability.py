"""Run metrics / observability (SURVEY §2.10, §7 step 8).

The reference instruments itself three ways: an ``ETLMetrics``
duration/success-rate tracker (ref: src/etl_2020.py:20-34), Prometheus
counters + histogram behind an HTTP server (ref:
src/etl_2025.py:27-29,268), and per-run quality metric JSON artifacts
(ref: src/etl_2022.py:161-165).

Spark-first mapping: ``DataFrame.observe`` attaches named aggregate
metrics to the *existing* job — the counters ride along with the
action instead of costing a second pass over the data (the 100 TB
point: metrics must not re-scan). A ``StreamingQueryListener`` /
``QueryExecutionListener`` exports the same values to any metrics
backend; Spark's Prometheus servlet (``metrics.properties``) replaces
``start_http_server`` — configuration, not code.

Success-rate is reported in basis points via integer floor division:
deterministic across engines (no float rounding-mode hazards), so the
metric itself is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def observed_counts(
    df: DataFrame, valid: Column, name: str = "etl_metrics"
) -> tuple[DataFrame, Observation]:
    """Attach total/valid counters to ``df`` via ``observe``. The
    metrics materialize with the caller's OWN action — no extra scan
    (vs the reference's separate counter increments per row,
    src/etl_2020.py:70-76)."""
    obs = Observation(name)
    out = df.observe(
        obs,
        F.count(F.lit(1)).alias("total_rows"),
        F.sum(valid.cast("long")).alias("valid_rows"),
    )
    return out, obs


def run_metrics(spark, df: DataFrame, valid: Column) -> DataFrame:
    """ETLMetrics parity (ref: src/etl_2020.py:20-34): run the
    pipeline once with observed counters, return the metrics row
    (processed/failed/success-rate-basis-points). Duration is a
    wall-clock concern left to the caller/listener — it is
    nondeterministic and therefore not part of the checkable row."""
    observed, obs = observed_counts(df, valid)
    # One SQL action; metrics ride along. Must be a *SQL* action —
    # rdd-path actions (foreach) bypass the QueryExecution listener
    # that fulfills the Observation, hanging obs.get forever.
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    # observed aggregates over ZERO rows come back as None (SQL
    # NULL sums); an empty run is 0 processed, not a crash
    total = int(m["total_rows"] or 0)
    valid_n = int(m["valid_rows"] or 0)
    return spark.createDataFrame(
        [(total, valid_n, total - valid_n, (valid_n * 10000) // max(total, 1))],
        "total_rows BIGINT, valid_rows BIGINT, failed_rows BIGINT, "
        "success_rate_bp BIGINT",
    )
