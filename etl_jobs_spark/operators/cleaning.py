"""Cleaning transforms: dedup, imputation, casing/casting, audit
columns, row quality score.

Reference semantics reproduced exactly (SURVEY §2.3):
- full-row dedup            ref: src/etl_2022.py:178, src/etl_2025.py:201
- constant imputation       ref: src/etl_2022.py:181,183 (name→'UNKNOWN',
                            email→'unknown@example.com')
- mean imputation           ref: src/etl_2022.py:182 (float mean, THEN int
                            cast at :187 — truncation order preserved)
- uppercase projection      ref: src/etl_2016.py:16 … src/etl_2025.py:209
- processing timestamp      ref: src/etl_2018.py:60 (isoformat string)
- batch id                  ref: src/etl_2022.py:217 (yyyyMMdd_HHmmss)
- row quality score         ref: src/etl_2022.py:216
                            (1 − nulls_in_row / n_cols)

All are single-pass Column algebra except mean-imputation, which is
a scalar aggregate re-joined to every row: implemented as
agg → crossJoin(broadcast(1 row)) — a map-side broadcast, NOT
`Window.partitionBy()` (which would drag the whole table into one
partition) and NOT a driver-side collect of the mean (which would
break lazy composition).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dedup_full_row(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """Duplicate elimination (ref: `df.drop_duplicates()`
    src/etl_2022.py:178). Hash-shuffles on all (or subset) columns;
    at scale prefer deduping on a key/fingerprint column rather than
    wide payloads so the shuffle carries hashes, not documents."""
    return df.dropDuplicates(subset) if subset else df.dropDuplicates()


def fillna_const(df: DataFrame, values: dict[str, object]) -> DataFrame:
    """Constant imputation (ref: src/etl_2022.py:181,183)."""
    return df.fillna(values)


def fillna_mean(
    df: DataFrame,
    col: str,
    round_digits: int | None = 6,
    exact_decimal: str | None = "decimal(18,2)",
) -> DataFrame:
    """Mean imputation (ref: `df[c].fillna(df[c].mean())`
    src/etl_2022.py:182).

    One extra stage: a scalar mean (partial+final, one row)
    broadcast back over the table. With ``exact_decimal`` (default:
    the repo's 2dp money/value contract) the mean is an EXACT
    decimal sum divided once in double — summation-order-free, so
    the imputed value is identical on any partitioning/row order
    (round-10 hardening; the old ``avg(double)`` could flip the
    rounded mean a ulp across orderings). Pass ``None`` for columns
    that don't hold finite-decimal values. The mean is then rounded
    before use so the imputed value is reproducible across
    engines."""
    if exact_decimal is not None:
        mean_col = (
            F.sum(F.col(col).cast(exact_decimal)).cast("double")
            / F.count(F.col(col))
        ).alias("__mean")
    else:
        mean_col = F.avg(F.col(col)).alias("__mean")
    agg = df.select(mean_col)
    if round_digits is not None:
        agg = agg.select(F.round(F.col("__mean"), round_digits).alias("__mean"))
    joined = df.crossJoin(F.broadcast(agg))
    return joined.withColumn(col, F.coalesce(F.col(col), F.col("__mean"))).drop(
        "__mean"
    )


def proj_upper(df: DataFrame, col: str, out: str | None = None) -> DataFrame:
    """Uppercase projection (ref: src/etl_2016.py:16)."""
    return df.withColumn(out or col, F.upper(F.col(col)))


def proj_cast_int(df: DataFrame, col: str, out: str | None = None) -> DataFrame:
    """Numeric → int cast (ref: `int(row['age'])` src/etl_2016.py:33,
    `astype(int)` src/etl_2022.py:187). Spark's double→int cast
    truncates toward zero, matching Python/pandas; external SQL
    oracles must trunc() explicitly since ANSI CAST rounds."""
    return df.withColumn(out or col, F.col(col).cast("int"))


def proj_add_ts(df: DataFrame, ts_literal: str | None = None) -> DataFrame:
    """Processing-timestamp audit column (ref: src/etl_2018.py:60).
    `ts_literal` pins a deterministic value for oracle-checked runs;
    production path uses current_timestamp()."""
    ts = (
        F.lit(ts_literal).cast("timestamp")
        if ts_literal
        else F.current_timestamp()
    )
    return df.withColumn("processed_at", ts)


def proj_batch_id(df: DataFrame, batch_time: str | None = None) -> DataFrame:
    """Batch-id audit column, yyyyMMdd_HHmmss (ref:
    src/etl_2022.py:217)."""
    base = (
        F.lit(batch_time).cast("timestamp")
        if batch_time
        else F.current_timestamp()
    )
    return df.withColumn("batch_id", F.date_format(base, "yyyyMMdd_HHmmss"))


def quality_score(df: DataFrame, cols: list[str]) -> Column:
    """Row quality score: 1 − (nulls in row / n_cols) over a PINNED
    column list (ref: src/etl_2022.py:216 — there the list is
    `df.columns`; pinning makes the score stable under schema
    evolution). Horizontal fold, no shuffle."""
    null_count = sum(
        (F.col(c).isNull().cast("int") for c in cols), F.lit(0)
    )
    return F.round(
        F.lit(1.0) - null_count / F.lit(len(cols)), 6
    )


def proj_quality_score(df: DataFrame, cols: list[str]) -> DataFrame:
    return df.withColumn("quality_score", quality_score(df, cols))
