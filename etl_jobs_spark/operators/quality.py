"""Data-quality aggregation, profiling, outlier detection, alerting.

Reference semantics (SURVEY §2.4; ref: src/etl_2022.py):
- per-column null counts       :52-54
- duplicate-row count          :56-58  (pandas `duplicated().sum()` =
                               all-but-first = total − distinct)
- IQR fences + outliers        :60-72  (Q1/Q3, 1.5·IQR)
- per-column profile           :81-109 (dtype, nunique, missing,
                               mean/median/std/min/max)
- completion rate              :39     (valid/total × 100)
- success rate                 ref: src/etl_2020.py:26-34
- alert thresholds             :113-121 (<90% valid, >100 nulls/col,
                               >50 dups, >10 outliers/col)

Everything is a partial+final hash aggregate over one scan — the
shapes that stay O(1)-output no matter the input size, so the whole
quality suite is a single cheap job even at 100 TB. Quantiles use
Spark's exact interpolating `percentile` to match ANSI
`quantile_cont`/pandas semantics (SURVEY §7 hard parts); swap to
`percentile_approx` at extreme scale when ±ε is acceptable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_jobs_spark.operators.validation import Rule, passes_all


def agg_null_counts(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """One row: per-column null counts, aliased `<col>_nulls`
    (ref: src/etl_2022.py:52-54)."""
    cols = cols or df.columns
    return df.select(
        *[
            F.count(F.when(F.col(c).isNull(), F.lit(1))).alias(f"{c}_nulls")
            for c in cols
        ]
    )


def agg_dup_count(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """One row, `dup_count` = rows − distinct rows — pandas
    `duplicated().sum()` keep-first semantics exactly (ref:
    src/etl_2022.py:56-58; SURVEY §7 hard parts).

    Single aggregate with a two-level distinct — Catalyst plans this
    as partial distinct + final count, no driver round-trips.
    """
    sub = subset or df.columns
    total = df.select(F.count(F.lit(1)).alias("__total"))
    distinct = (
        df.select(*sub).distinct().select(F.count(F.lit(1)).alias("__distinct"))
    )
    return total.crossJoin(distinct).select(
        (F.col("__total") - F.col("__distinct")).alias("dup_count")
    )


def agg_quantiles_iqr(df: DataFrame, col: str) -> DataFrame:
    """One row: q1, q3, iqr (exact interpolating percentile; ref:
    src/etl_2022.py:65-67)."""
    q1 = F.percentile(F.col(col), F.lit(0.25))
    q3 = F.percentile(F.col(col), F.lit(0.75))
    return df.select(
        F.round(q1, 6).alias("q1"),
        F.round(q3, 6).alias("q3"),
        F.round(q3 - q1, 6).alias("iqr"),
    )


def iqr_fences(df: DataFrame, col: str, k: float = 1.5) -> DataFrame:
    """One row: lo/hi outlier fences, rounded so the fence value is
    engine-reproducible (a raw float fence can straddle a data value
    differently across summation orders).

    Fences are computed over FINITE values only: NaN/±inf are by
    definition outliers, never fence inputs — and engines disagree
    on whether NaN participates in quantile rank (Spark's percentile
    counts it, DuckDB's quantile_cont drops it; round-11 extremes
    axis), so including them makes the fence itself
    engine-dependent."""
    fin = F.when(
        ~F.isnan(F.col(col)) & (F.abs(F.col(col)) != F.lit(float("inf"))),
        F.col(col),
    )
    q1 = F.percentile(fin, F.lit(0.25))
    q3 = F.percentile(fin, F.lit(0.75))
    iqr = q3 - q1
    return df.select(
        F.round(q1 - k * iqr, 6).alias("lo"),
        F.round(q3 + k * iqr, 6).alias("hi"),
    )


def filter_outliers_iqr(df: DataFrame, col: str, k: float = 1.5) -> DataFrame:
    """Rows outside the IQR fences (ref: src/etl_2022.py:60-72).

    agg → broadcast re-join → filter: the fence row is one record,
    so this is a map-side join; the base table is scanned twice
    (once for quantiles, once for the filter) — at scale, cache()
    the input or compute fences on a sample.
    """
    fences = iqr_fences(df, col, k)
    return (
        df.crossJoin(F.broadcast(fences))
        .filter((F.col(col) < F.col("lo")) | (F.col(col) > F.col("hi")))
        .drop("lo", "hi")
    )


def count_outliers_iqr(df: DataFrame, col: str, k: float = 1.5) -> DataFrame:
    """One row, `outlier_count` (feeds the alert predicate)."""
    return filter_outliers_iqr(df, col, k).select(
        F.count(F.lit(1)).alias("outlier_count")
    )


def agg_profile_stats(
    df: DataFrame,
    cols: list[str],
    exact_decimal: str | None = "decimal(18,2)",
) -> DataFrame:
    """Long-form per-column profile: one output row per column with
    dtype, n_distinct, n_missing, mean, stddev, min, max, median
    (ref: DataProfiler.profile_data src/etl_2022.py:81-109).

    ONE aggregation pass computes every stat for every column (flat
    aggregate list), then the wide row unpivots via stack() — no
    per-column jobs, no driver loop. Exact countDistinct for parity
    with pandas `nunique`; switch to approx_count_distinct at scale.

    Round-10 hardening: mean and stddev are computed from EXACT
    decimal moments (Σx as DECIMAL(18,2), Σx² as its scale-4
    product) with one closed-form double evaluation at the end —
    summation-order-free, so the profile is identical on any row
    order/partitioning and the oracle can mirror the identical
    expression tree instead of trusting two engines' different
    incremental-variance recurrences to agree in the rounded
    digits. Requires the 2dp input contract
    (tests/test_order_invariance.py pins it for the fixtures);
    pass ``exact_decimal=None`` for columns that carry >2dp values
    — that path profiles the raw double (order-sensitive in the
    last ulp, like pandas) instead of silently rounding the input.

    The variance numerator ``s2 - s1*s1/n`` is clamped at 0: it is
    mathematically non-negative but the one double evaluation can
    land fractionally negative for a near-constant column, where
    sqrt would produce NaN instead of ~0 (the oracle mirrors the
    same greatest(0, ·)).
    """
    dtypes = dict(df.dtypes)
    aggs: list[Column] = []
    for c in cols:
        d = (
            F.col(c).cast(exact_decimal)
            if exact_decimal is not None
            else F.col(c).cast("double")
        )
        n = F.count(F.col(c))
        s1 = F.sum(d).cast("double")
        s2 = F.sum(d * d).cast("double")
        aggs += [
            F.countDistinct(F.col(c)).alias(f"{c}__nd"),
            F.count(F.when(F.col(c).isNull(), F.lit(1))).alias(f"{c}__nm"),
            F.round(s1 / n, 6).alias(f"{c}__mean"),
            F.round(
                F.sqrt(
                    F.greatest(F.lit(0.0), s2 - s1 * s1 / n)
                    / (n - F.lit(1))
                ),
                6,
            ).alias(f"{c}__std"),
            F.round(F.min(F.col(c)).cast("double"), 6).alias(f"{c}__min"),
            F.round(F.max(F.col(c)).cast("double"), 6).alias(f"{c}__max"),
            F.round(F.percentile(F.col(c), F.lit(0.5)), 6).alias(f"{c}__med"),
        ]
    wide = df.select(*aggs)
    stack_args = ", ".join(
        f"'{c}', '{dtypes[c]}', {c}__nd, {c}__nm, {c}__mean, {c}__std, "
        f"{c}__min, {c}__max, {c}__med"
        for c in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS "
        "(col_name, dtype, n_distinct, n_missing, mean, stddev, min, max, median)"
    )


def agg_record_count(df: DataFrame) -> DataFrame:
    """One row, `n_records` (ref: src/etl_2022.py:50)."""
    return df.select(F.count(F.lit(1)).alias("n_records"))


def run_quality_metrics(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """One metrics row: total/valid counts + completion & success
    rates (ref: DataQualityMetrics src/etl_2022.py:25-44;
    ETLMetrics.log_metrics src/etl_2020.py:26-34). One pass —
    validity is a conditional count, not a second scan."""
    ok = passes_all(rules).cast("int")
    return df.select(
        F.count(F.lit(1)).alias("total_records"),
        F.sum(ok).alias("valid_records"),
    ).select(
        "total_records",
        "valid_records",
        F.round(F.col("valid_records") * 100.0 / F.col("total_records"), 6).alias(
            "completion_rate"
        ),
        F.round(F.col("valid_records") * 100.0 / F.col("total_records"), 6).alias(
            "success_rate"
        ),
    )


def pred_alert_thresholds(
    metrics: DataFrame,
    max_null_count: int = 100,
    max_dup_count: int = 50,
    max_outlier_count: int = 10,
    min_success_rate: float = 90.0,
) -> DataFrame:
    """HAVING-style predicate over the metrics row → alert flags
    (ref: AlertManager.should_alert src/etl_2022.py:113-121; the
    email send itself stays stubbed like the reference's
    'Would send alert' at :144).

    Expects a one-row DF with any of: success_rate, null_count,
    dup_count, outlier_count (missing metrics don't alert).
    """
    cols = set(metrics.columns)
    checks: list[Column] = []
    if "success_rate" in cols:
        checks.append(
            (F.col("success_rate") < F.lit(min_success_rate)).alias("alert_success")
        )
    if "null_count" in cols:
        checks.append(
            (F.col("null_count") > F.lit(max_null_count)).alias("alert_nulls")
        )
    if "dup_count" in cols:
        checks.append((F.col("dup_count") > F.lit(max_dup_count)).alias("alert_dups"))
    if "outlier_count" in cols:
        checks.append(
            (F.col("outlier_count") > F.lit(max_outlier_count)).alias(
                "alert_outliers"
            )
        )
    out = metrics.select(*metrics.columns, *checks)
    flag_names = [c for c in out.columns if c.startswith("alert_")]
    any_col = F.lit(False)
    for name in flag_names:
        any_col = any_col | F.col(name)
    return out.withColumn("should_alert", any_col)
