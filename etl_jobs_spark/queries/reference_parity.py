"""Reference-parity queries, one per SURVEY §2 Qkey.

The fixture tables have no nulls/dirty rows, so the validation and
imputation Qkeys run over a deterministic "dirtied" projection of
``events`` (nulls injected by event_id modulus — same CTE on the
oracle side), exactly the dirty-row cases FIXTURES.md §A calls for.
Timestamp-producing projections take pinned literals so results are
oracle-stable (SURVEY §7 hard parts: nondeterminism).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_jobs_spark.operators import cleaning as C
from etl_jobs_spark.operators import quality as Q
from etl_jobs_spark.operators import validation as V
from etl_jobs_spark.queries._shared import (  # noqa: F401  (re-export)
    DIRTY_SQL,
    TS_LIT,
    _dirty_rules,
    dirty_events,
)
from etl_jobs_spark.registry import register
from etl_jobs_spark.sources.readers import read_table


# ---------------------------------------------------------------- projections

@register(
    "proj_upper",
    oracle="SELECT c_custkey, upper(c_name) AS name_upper FROM customer",
)
def proj_upper(spark, sf_dir):
    df = read_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return C.proj_upper(df, "c_name", "name_upper").drop("c_name")


@register(
    "proj_cast_int",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(trunc(l_quantity) AS INTEGER) AS qty_int
    FROM lineitem
    """,
)
def proj_cast_int(spark, sf_dir):
    """Spark double→int truncates; the oracle truncs explicitly since
    ANSI CAST rounds (SURVEY §7 hard parts)."""
    df = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    return C.proj_cast_int(df, "l_quantity", "qty_int").drop("l_quantity")


@register(
    "proj_add_ts",
    oracle=f"""
    SELECT c_custkey, CAST(TIMESTAMP '{TS_LIT}' AS TIMESTAMP_NS) AS processed_at FROM customer
    """,
)
def proj_add_ts(spark, sf_dir):
    return C.proj_add_ts(
        read_table(spark, sf_dir, "customer").select("c_custkey"), TS_LIT
    )


@register(
    "proj_batch_id",
    oracle="SELECT c_custkey, '20260101_000000' AS batch_id FROM customer",
)
def proj_batch_id(spark, sf_dir):
    return C.proj_batch_id(
        read_table(spark, sf_dir, "customer").select("c_custkey"), TS_LIT
    )


# -------------------------------------------------------------------- filters

@register(
    "filter_required_fields",
    oracle=f"""
    WITH dirty AS ({DIRTY_SQL})
    SELECT event_id, value_n, event_type_n FROM dirty
    WHERE value_n IS NOT NULL AND event_type_n IS NOT NULL
    """,
)
def filter_required_fields(spark, sf_dir):
    d = dirty_events(spark, sf_dir).select("event_id", "value_n", "event_type_n")
    rules = V.required_fields("value_n", "event_type_n")
    return d.filter(V.passes_all(rules))


@register(
    "filter_nonempty_name",
    oracle="SELECT c_custkey, c_name FROM customer WHERE trim(c_name) <> ''",
)
def filter_nonempty_name(spark, sf_dir):
    d = read_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return d.filter(V.nonempty_string("c_name").predicate)


@register(
    "filter_age_range",
    oracle="""
    SELECT event_id, value FROM events
    WHERE CAST(value AS DOUBLE) IS NOT NULL AND value BETWEEN 0 AND 150
    """,
)
def filter_age_range(spark, sf_dir):
    d = read_table(spark, sf_dir, "events").select("event_id", "value")
    return d.filter(V.numeric_range("value", 0, 150).predicate)


@register(
    "filter_email_format",
    oracle="SELECT event_id, props FROM events WHERE contains(props, '\"k\"')",
)
def filter_email_format(spark, sf_dir):
    """Substring-containment predicate (the '@ in email' shape, ref:
    src/etl_2020.py:47-49) realized as a token check on props."""
    d = read_table(spark, sf_dir, "events").select("event_id", "props")
    return d.filter(V.contains_token("props", '"k"').predicate)


@register(
    "filter_rejected_rows",
    oracle=f"""
    WITH dirty AS ({DIRTY_SQL}),
    flags AS (
      SELECT *,
        coalesce(value_n IS NOT NULL, FALSE) AS p1,
        coalesce(trim(event_type_n) <> '', FALSE) AS p2,
        coalesce(CAST(value_n AS DOUBLE) IS NOT NULL
                 AND CAST(value_n AS DOUBLE) BETWEEN 0 AND 150, FALSE) AS p3
      FROM dirty)
    SELECT event_id, user_id, event_type, value, props, value_n, event_type_n,
           concat_ws(',',
             CASE WHEN NOT p1 THEN 'required_value_n' END,
             CASE WHEN NOT p2 THEN 'nonempty_event_type_n' END,
             CASE WHEN NOT p3 THEN 'range_value_n' END) AS reject_reasons
    FROM flags WHERE NOT (p1 AND p2 AND p3)
    """,
)
def filter_rejected_rows(spark, sf_dir):
    """Quarantine side-output with failure reasons (ref:
    src/etl_2018.py:34-36,55-56)."""
    _, rejected = V.validate_split(dirty_events(spark, sf_dir), _dirty_rules())
    return rejected


@register(
    "filter_valid_rows",
    oracle=f"""
    WITH dirty AS ({DIRTY_SQL})
    SELECT event_id, user_id, event_type, value, props, value_n, event_type_n
    FROM dirty
    WHERE value_n IS NOT NULL AND coalesce(trim(event_type_n) <> '', FALSE)
      AND value_n BETWEEN 0 AND 150
    """,
)
def filter_valid_rows(spark, sf_dir):
    valid, _ = V.validate_split(dirty_events(spark, sf_dir), _dirty_rules())
    return valid


# ------------------------------------------------------------------- cleaning

@register(
    "dedup_full_row",
    oracle="SELECT DISTINCT lang, source FROM documents",
)
def dedup_full_row(spark, sf_dir):
    return C.dedup_full_row(
        read_table(spark, sf_dir, "documents").select("lang", "source")
    )


@register(
    "fillna_const",
    oracle=f"""
    WITH dirty AS ({DIRTY_SQL})
    SELECT event_id, coalesce(event_type_n, 'UNKNOWN') AS event_type_n FROM dirty
    """,
)
def fillna_const(spark, sf_dir):
    d = dirty_events(spark, sf_dir).select("event_id", "event_type_n")
    return C.fillna_const(d, {"event_type_n": "UNKNOWN"})


@register(
    "fillna_mean",
    oracle=f"""
    WITH dirty AS ({DIRTY_SQL})
    SELECT event_id,
           coalesce(value_n, (SELECT round(CAST(sum(CAST(value_n AS DECIMAL(18,2))) AS DOUBLE) / count(value_n), 6) FROM dirty)) AS value_n
    FROM dirty
    """,
)
def fillna_mean(spark, sf_dir):
    d = dirty_events(spark, sf_dir).select("event_id", "value_n")
    return C.fillna_mean(d, "value_n")


@register(
    "proj_quality_score",
    oracle=f"""
    WITH dirty AS ({DIRTY_SQL})
    SELECT event_id,
           round(1.0 - (CAST(user_id IS NULL AS INTEGER)
                        + CAST(value_n IS NULL AS INTEGER)
                        + CAST(event_type_n IS NULL AS INTEGER)) / 3.0, 6)
             AS quality_score
    FROM dirty
    """,
)
def proj_quality_score(spark, sf_dir):
    d = dirty_events(spark, sf_dir)
    return C.proj_quality_score(
        d, ["user_id", "value_n", "event_type_n"]
    ).select("event_id", "quality_score")


# -------------------------------------------------------------------- quality

@register(
    "agg_null_counts",
    oracle=f"""
    WITH dirty AS ({DIRTY_SQL})
    SELECT count(*) FILTER (WHERE user_id IS NULL)      AS user_id_nulls,
           count(*) FILTER (WHERE value_n IS NULL)      AS value_n_nulls,
           count(*) FILTER (WHERE event_type_n IS NULL) AS event_type_n_nulls
    FROM dirty
    """,
)
def agg_null_counts(spark, sf_dir):
    return Q.agg_null_counts(
        dirty_events(spark, sf_dir), ["user_id", "value_n", "event_type_n"]
    )


@register(
    "agg_dup_count",
    oracle="""
    SELECT count(*) - (SELECT count(*)
                       FROM (SELECT DISTINCT lang, source FROM documents) t)
           AS dup_count
    FROM documents
    """,
)
def agg_dup_count(spark, sf_dir):
    return Q.agg_dup_count(
        read_table(spark, sf_dir, "documents").select("lang", "source")
    )


@register(
    "agg_quantiles_iqr",
    oracle="""
    SELECT round(quantile_cont(l_extendedprice, 0.25), 6) AS q1,
           round(quantile_cont(l_extendedprice, 0.75), 6) AS q3,
           round(quantile_cont(l_extendedprice, 0.75)
                 - quantile_cont(l_extendedprice, 0.25), 6) AS iqr
    FROM lineitem
    """,
)
def agg_quantiles_iqr(spark, sf_dir):
    return Q.agg_quantiles_iqr(read_table(spark, sf_dir, "lineitem"), "l_extendedprice")


@register(
    "filter_outliers_iqr",
    oracle="""
    -- fences over FINITE values only, matching iqr_fences (NaN/inf
    -- are outliers, not fence inputs; round-11 extremes axis)
    WITH fv AS (
      SELECT CASE WHEN isfinite(value) THEN value END AS value FROM events),
    f AS (
      SELECT round(quantile_cont(value, 0.25)
                   - 1.5 * (quantile_cont(value, 0.75) - quantile_cont(value, 0.25)), 6) AS lo,
             round(quantile_cont(value, 0.75)
                   + 1.5 * (quantile_cont(value, 0.75) - quantile_cont(value, 0.25)), 6) AS hi
      FROM fv)
    SELECT event_id, value FROM events, f WHERE value < lo OR value > hi
    """,
)
def filter_outliers_iqr(spark, sf_dir):
    d = read_table(spark, sf_dir, "events").select("event_id", "value")
    return Q.filter_outliers_iqr(d, "value")


@register(
    "agg_profile_stats",
    oracle="""
    SELECT 'l_quantity' AS col_name, 'double' AS dtype,
           count(DISTINCT l_quantity) AS n_distinct,
           count(*) FILTER (WHERE l_quantity IS NULL) AS n_missing,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(l_quantity), 6) AS mean,
           round(sqrt(greatest(0, CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) - CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) * CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(l_quantity)) / (count(l_quantity) - 1)), 6) AS stddev,
           round(min(l_quantity), 6) AS min, round(max(l_quantity), 6) AS max,
           round(quantile_cont(l_quantity, 0.5), 6) AS median
    FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', 'double', count(DISTINCT l_extendedprice),
           count(*) FILTER (WHERE l_extendedprice IS NULL),
           round(round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(l_extendedprice), 6), 4),
           round(round(sqrt(greatest(0, CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) - CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) * CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(l_extendedprice)) / (count(l_extendedprice) - 1)), 6), 4),
           round(min(l_extendedprice), 6), round(max(l_extendedprice), 6),
           round(quantile_cont(l_extendedprice, 0.5), 6)
    FROM lineitem
    UNION ALL
    SELECT 'l_discount', 'double', count(DISTINCT l_discount),
           count(*) FILTER (WHERE l_discount IS NULL),
           round(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(l_discount), 6),
           round(sqrt(greatest(0, CAST(sum(CAST(l_discount AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) - CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) * CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(l_discount)) / (count(l_discount) - 1)), 6),
           round(min(l_discount), 6), round(max(l_discount), 6),
           round(quantile_cont(l_discount, 0.5), 6)
    FROM lineitem
    """,
)
def agg_profile_stats(spark, sf_dir):
    """Profile of the fact table's numeric columns. Large-magnitude
    price stats round at 4 (cross-engine float-summation noise);
    small-magnitude at 6."""
    li = read_table(spark, sf_dir, "lineitem")
    prof = Q.agg_profile_stats(
        li, ["l_quantity", "l_extendedprice", "l_discount"]
    )
    # re-round the price row's mean/stddev to 4 to match the oracle
    price = F.col("col_name") == "l_extendedprice"
    return prof.select(
        "col_name",
        "dtype",
        "n_distinct",
        "n_missing",
        F.when(price, F.round(F.col("mean"), 4)).otherwise(F.col("mean")).alias("mean"),
        F.when(price, F.round(F.col("stddev"), 4))
        .otherwise(F.col("stddev"))
        .alias("stddev"),
        "min",
        "max",
        "median",
    )


@register(
    "agg_record_count",
    oracle="SELECT count(*) AS n_records FROM lineitem",
)
def agg_record_count(spark, sf_dir):
    return Q.agg_record_count(read_table(spark, sf_dir, "lineitem"))


@register(
    "agg_completion_rate",
    oracle=f"""
    WITH dirty AS ({DIRTY_SQL})
    SELECT count(*) AS total_records,
           CAST(sum(CAST(value_n IS NOT NULL
                    AND coalesce(trim(event_type_n) <> '', FALSE)
                    AND coalesce(value_n BETWEEN 0 AND 150, FALSE)
               AS INTEGER)) AS BIGINT) AS valid_records,
           round(sum(CAST(value_n IS NOT NULL
                    AND coalesce(trim(event_type_n) <> '', FALSE)
                    AND coalesce(value_n BETWEEN 0 AND 150, FALSE) AS INTEGER))
                 * 100.0 / count(*), 6) AS completion_rate,
           round(sum(CAST(value_n IS NOT NULL
                    AND coalesce(trim(event_type_n) <> '', FALSE)
                    AND coalesce(value_n BETWEEN 0 AND 150, FALSE) AS INTEGER))
                 * 100.0 / count(*), 6) AS success_rate
    FROM dirty
    """,
)
def agg_completion_rate(spark, sf_dir):
    """Also covers Qkey agg_success_rate — same ratio, two aliases
    (ref: src/etl_2022.py:39 and src/etl_2020.py:33)."""
    return Q.run_quality_metrics(dirty_events(spark, sf_dir), _dirty_rules())


@register(
    "agg_success_rate",
    oracle=f"""
    WITH dirty AS ({DIRTY_SQL})
    SELECT CAST(sum(CAST(value_n IS NOT NULL
                    AND coalesce(trim(event_type_n) <> '', FALSE)
                    AND coalesce(value_n BETWEEN 0 AND 150, FALSE)
               AS BIGINT)) AS BIGINT)                        AS processed,
           CAST(sum(CAST(NOT (value_n IS NOT NULL
                    AND coalesce(trim(event_type_n) <> '', FALSE)
                    AND coalesce(value_n BETWEEN 0 AND 150, FALSE))
               AS BIGINT)) AS BIGINT)                        AS failed,
           round(sum(CAST(value_n IS NOT NULL
                    AND coalesce(trim(event_type_n) <> '', FALSE)
                    AND coalesce(value_n BETWEEN 0 AND 150, FALSE) AS INTEGER))
                 * 100.0 / count(*), 6)                      AS success_rate
    FROM dirty
    """,
)
def agg_success_rate(spark, sf_dir):
    """ETLMetrics success rate: processed/(processed+failed)×100
    (ref: src/etl_2020.py:26-34, the `:33` ratio) as an explicit
    Qkey — pass/fail counters from one observed-style aggregation."""
    d = dirty_events(spark, sf_dir)
    ok = V.passes_all(_dirty_rules()).cast("long")
    return d.select(
        F.sum(ok).alias("processed"),
        F.sum(1 - ok).alias("failed"),
        F.round(
            F.sum(ok.cast("int")) * 100.0 / F.count(F.lit(1)), 6
        ).alias("success_rate"),
    )


@register(
    "pred_alert_thresholds",
    oracle=f"""
    WITH dirty AS ({DIRTY_SQL}),
    m AS (
      SELECT round(sum(CAST(value_n IS NOT NULL
                       AND coalesce(trim(event_type_n) <> '', FALSE)
                       AND coalesce(value_n BETWEEN 0 AND 150, FALSE) AS INTEGER))
                   * 100.0 / count(*), 6) AS success_rate,
             count(*) FILTER (WHERE value_n IS NULL) AS null_count
      FROM dirty)
    SELECT success_rate, null_count,
           success_rate < 90.0 AS alert_success,
           null_count > 100 AS alert_nulls,
           (success_rate < 90.0) OR (null_count > 100) AS should_alert
    FROM m
    """,
)
def pred_alert_thresholds(spark, sf_dir):
    """Threshold predicate over run metrics (ref:
    src/etl_2022.py:113-121; email send stays stubbed like :144)."""
    d = dirty_events(spark, sf_dir)
    metrics = d.select(
        F.round(
            F.sum(V.passes_all(_dirty_rules()).cast("int")) * 100.0
            / F.count(F.lit(1)),
            6,
        ).alias("success_rate"),
        F.count(F.when(F.col("value_n").isNull(), F.lit(1))).alias("null_count"),
    )
    return Q.pred_alert_thresholds(metrics)


@register(
    "pipeline_2022_end_to_end",
    oracle=f"""
    WITH dirty AS ({DIRTY_SQL}),
    dedup AS (SELECT DISTINCT * FROM dirty),
    scored AS (
      SELECT *,
             round(1.0 - (CAST(value_n IS NULL AS INT)
                          + CAST(event_type_n IS NULL AS INT))
                   / CAST(2 AS DOUBLE), 6) AS quality_score
      FROM dedup),
    m AS (SELECT round(CAST(sum(CAST(value_n AS DECIMAL(18,2))) AS DOUBLE)
                   / count(value_n), 6) AS mean_v FROM dedup)
    SELECT event_id, user_id,
           upper(coalesce(event_type_n, 'UNKNOWN')) AS event_type_clean,
           CAST(trunc(coalesce(value_n, m.mean_v)) AS INT) AS value_int,
           quality_score,
           '20260101_000000' AS batch_id
    FROM scored CROSS JOIN m
    """,
)
def pipeline_2022_end_to_end(spark, sf_dir):
    """The 2022-era pipeline COMPOSED end-to-end from the operator
    kit (ref: src/etl_2022.py:233-272 __main__ flow): dirty scan →
    full-row dedup → row quality score (scored BEFORE imputation so
    it measures the raw data, ref computes it post-clean at :216) →
    constant + mean imputation → casing + int cast → batch-id audit
    column. One lazy DataFrame chain — Catalyst fuses every step
    into the scan projection except the scalar-mean broadcast; the
    chain shape is what replaces the reference's five sequential
    script stages."""
    d = C.dedup_full_row(dirty_events(spark, sf_dir))
    d = d.withColumn(
        "quality_score", C.quality_score(d, ["value_n", "event_type_n"])
    )
    d = C.fillna_const(d, {"event_type_n": "UNKNOWN"})
    d = C.fillna_mean(d, "value_n")
    d = C.proj_upper(d, "event_type_n", "event_type_clean")
    d = C.proj_cast_int(d, "value_n", "value_int")
    d = C.proj_batch_id(d, TS_LIT)
    return d.select(
        "event_id",
        "user_id",
        "event_type_clean",
        "value_int",
        "quality_score",
        "batch_id",
    )
