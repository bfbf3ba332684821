"""Warehouse-maintenance + matching + time-series queries (round 2
breadth: MERGE upsert, unpivot, fuzzy entity pairs, resample/
interpolate). See the operator modules (``operators/warehouse.py``,
``operators/matching.py``, ``operators/timeseries.py``) for the
scale rationale of each plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_jobs_spark.operators import matching as MT
from etl_jobs_spark.operators import timeseries as TS
from etl_jobs_spark.operators import warehouse as WH
from etl_jobs_spark.registry import register
from etl_jobs_spark.sources.readers import read_table


@register(
    "fuzzy_pairs_names",
    oracle="""
    SELECT key_a, key_b, dist FROM (
      SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
             CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
      FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey)
    WHERE dist <= 1
    """,
)
def fuzzy_pairs_names(spark, sf_dir):
    """Edit-distance-1 name pairs via SymSpell deletion-neighborhood
    blocking (map-only variant explode → equi-join → exact
    levenshtein verify; never all-pairs). The oracle IS the all-pairs
    scan — fine for an oracle, the thing the operator exists to
    avoid."""
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name"
    )
    return MT.fuzzy_pairs(cust, "c_custkey", "c_name")


_B = TS.BUCKET_S


@register(
    "ts_resample_interpolate",
    oracle=f"""
    WITH obs AS (
      SELECT user_id,
             CAST(floor(epoch(ts) / {_B}) AS BIGINT) AS bucket,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
               / count(*) AS obs_val
      FROM events GROUP BY 1, 2),
    bounds AS (
      SELECT user_id, min(bucket) AS b0, max(bucket) AS b1
      FROM obs GROUP BY 1),
    spine AS (
      SELECT user_id, unnest(generate_series(b0, b1)) AS bucket
      FROM bounds),
    grid AS (
      SELECT s.user_id, s.bucket, o.obs_val
      FROM spine s LEFT JOIN obs o USING (user_id, bucket)),
    filled AS (
      SELECT user_id, bucket, obs_val,
        last_value(obs_val IGNORE NULLS) OVER
          (PARTITION BY user_id ORDER BY bucket
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        last_value(CASE WHEN obs_val IS NOT NULL THEN bucket END
                   IGNORE NULLS) OVER
          (PARTITION BY user_id ORDER BY bucket
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pb,
        first_value(obs_val IGNORE NULLS) OVER
          (PARTITION BY user_id ORDER BY bucket
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        first_value(CASE WHEN obs_val IS NOT NULL THEN bucket END
                    IGNORE NULLS) OVER
          (PARTITION BY user_id ORDER BY bucket
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nb
      FROM grid)
    SELECT user_id, bucket,
           floor((CASE WHEN obs_val IS NOT NULL THEN obs_val
                       WHEN pv IS NULL THEN nv
                       WHEN nv IS NULL THEN pv
                       ELSE pv + (nv - pv) * (bucket - pb) / (nb - pb)
                  END) * 10000.0 + 0.5) / 10000.0 AS val,
           obs_val IS NOT NULL AS observed
    FROM filled
    """,
)
def ts_resample_interpolate(spark, sf_dir):
    """Per-user 4-hour resample grid with linear interpolation across
    unobserved buckets (gap-fill) — the regular-grid feature-prep
    step for ML over event timelines."""
    return TS.resample_interpolate(read_table(spark, sf_dir, "events"))


@register(
    "merge_upsert_customers",
    oracle="""
    WITH changes AS (
      SELECT c_custkey, c_name, c_nationkey,
             c_acctbal + 100 AS c_acctbal, c_mktsegment, 'U' AS op
      FROM customer WHERE c_custkey % 10 = 0 AND c_custkey % 97 <> 3
      UNION ALL
      SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment, 'D'
      FROM customer WHERE c_custkey % 97 = 3
      UNION ALL
      SELECT c_custkey + 1000000, concat('NEW#', c_name), c_nationkey,
             0.0, c_mktsegment, 'U'
      FROM customer WHERE c_custkey < 50),
    merged AS (
      SELECT c_custkey,
             CASE WHEN c.op IS NOT NULL THEN c.c_name
                  ELSE b.c_name END AS c_name,
             CASE WHEN c.op IS NOT NULL THEN c.c_nationkey
                  ELSE b.c_nationkey END AS c_nationkey,
             CASE WHEN c.op IS NOT NULL THEN c.c_acctbal
                  ELSE b.c_acctbal END AS c_acctbal,
             CASE WHEN c.op IS NOT NULL THEN c.c_mktsegment
                  ELSE b.c_mktsegment END AS c_mktsegment,
             c.op
      FROM customer b FULL OUTER JOIN changes c USING (c_custkey))
    SELECT c_custkey, c_name, c_nationkey,
           round(c_acctbal, 2) AS c_acctbal, c_mktsegment
    FROM merged WHERE op IS NULL OR op <> 'D'
    """,
)
def merge_upsert_customers(spark, sf_dir):
    """MERGE INTO as a transform: apply a deterministic change batch
    (updates for custkey%10=0, deletes for custkey%97=3 — delete
    wins on overlap — inserts for custkey<50 rekeyed +1M) to the
    customer table via one full-outer sort-merge join."""
    cust = read_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    upd = cust.filter((k % 10 == 0) & (k % 97 != 3)).select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        (F.col("c_acctbal") + 100).alias("c_acctbal"),
        "c_mktsegment",
        F.lit(WH.OP_UPSERT).alias("op"),
    )
    dele = cust.filter(k % 97 == 3).select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        "c_acctbal",
        "c_mktsegment",
        F.lit(WH.OP_DELETE).alias("op"),
    )
    ins = cust.filter(k < 50).select(
        (k + 1_000_000).alias("c_custkey"),
        F.concat(F.lit("NEW#"), F.col("c_name")).alias("c_name"),
        "c_nationkey",
        F.lit(0.0).alias("c_acctbal"),
        "c_mktsegment",
        F.lit(WH.OP_UPSERT).alias("op"),
    )
    changes = upd.unionByName(dele).unionByName(ins)
    merged = WH.merge_upsert(cust, changes, ["c_custkey"])
    return merged.withColumn("c_acctbal", F.round("c_acctbal", 2))


@register(
    "agg_unpivot_metrics",
    oracle="""
    SELECT metric,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(val AS DECIMAL(18,2))) AS DOUBLE) AS total,
           round(min(val), 2) AS vmin,
           round(max(val), 2) AS vmax
    FROM (
      SELECT 'quantity' AS metric, l_quantity AS val FROM lineitem
      UNION ALL
      SELECT 'extendedprice', l_extendedprice FROM lineitem
      UNION ALL
      SELECT 'discount', l_discount FROM lineitem
      UNION ALL
      SELECT 'tax', l_tax FROM lineitem)
    GROUP BY metric
    """,
)
def agg_unpivot_metrics(spark, sf_dir):
    """Wide → long unpivot (stack generator, map-only) + per-metric
    profile. Sums run over DECIMAL(18,2) so they are EXACT — no
    float-summation-order hazard — then surface as DOUBLE."""
    li = read_table(spark, sf_dir, "lineitem")
    long = WH.unpivot_metrics(
        li,
        {
            "quantity": "l_quantity",
            "extendedprice": "l_extendedprice",
            "discount": "l_discount",
            "tax": "l_tax",
        },
    )
    return long.groupBy("metric").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("val").cast("decimal(18,2)"))
        .cast("double")
        .alias("total"),
        F.round(F.min("val"), 2).alias("vmin"),
        F.round(F.max("val"), 2).alias("vmax"),
    )
