"""Semantics tests for the warehouse-ext operators beyond the
oracle comparison: completeness/exclusion properties of the
deletion-neighborhood fuzzy join, MERGE edge cases, interpolation
exactness, and the plan shapes that make them scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_jobs_spark.operators import matching as MT
from etl_jobs_spark.operators import timeseries as TS
from etl_jobs_spark.operators import warehouse as WH


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_fuzzy_pairs_finds_all_distance_one_variants(spark):
    # substitution, deletion, insertion, and a distance-2 decoy
    rows = [
        (1, "banana"),
        (2, "banane"),   # substitution        -> dist 1
        (3, "banan"),    # deletion            -> dist 1
        (4, "bananas"),  # insertion           -> dist 1
        (5, "bananensplit"),  # far away        -> excluded
        (6, "banxne"),   # dist 2 from banana  -> excluded
    ]
    df = spark.createDataFrame(rows, "k INT, s STRING")
    got = {
        (r.key_a, r.key_b)
        for r in MT.fuzzy_pairs(df, "k", "s").collect()
    }
    assert (1, 2) in got and (1, 3) in got and (1, 4) in got
    assert all(5 not in p and 6 not in p or p == (2, 6) for p in got)
    # banane vs banxne IS distance 1 (one substitution)
    assert (2, 6) in got


def test_fuzzy_pairs_has_no_cartesian_product(spark):
    df = spark.createDataFrame([(1, "abc"), (2, "abd")], "k INT, s STRING")
    plan = _plan(MT.fuzzy_pairs(df, "k", "s"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_merge_upsert_update_delete_insert_passthrough(spark):
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id INT, name STRING, bal DOUBLE",
    )
    changes = spark.createDataFrame(
        [
            (2, "b2", 25.0, "U"),   # update
            (3, None, None, "D"),   # delete
            (9, "new", 1.0, "U"),   # insert
        ],
        "id INT, name STRING, bal DOUBLE, op STRING",
    )
    out = {
        r.id: (r.name, r.bal)
        for r in WH.merge_upsert(base, changes, ["id"]).collect()
    }
    assert out == {1: ("a", 10.0), 2: ("b2", 25.0), 9: ("new", 1.0)}


def test_resample_interpolates_exact_midpoint(spark):
    # two observations two buckets apart -> the gap bucket is the
    # exact arithmetic midpoint, and endpoints are flagged observed
    b = TS.BUCKET_S
    ev = spark.createDataFrame(
        [(1, float(0 * b + 10), 10.0), (2, float(2 * b + 10), 30.0)],
        "event_id INT, sec DOUBLE, value DOUBLE",
    ).select(
        F.lit(7).alias("user_id"),
        F.col("sec").cast("timestamp").alias("ts"),
        "value",
    )
    rows = {
        r.bucket: (r.val, r.observed)
        for r in TS.resample_interpolate(ev).collect()
    }
    assert rows[0] == (10.0, True)
    assert rows[1] == (20.0, False)  # linear midpoint
    assert rows[2] == (30.0, True)


def test_unpivot_is_shuffle_free(spark):
    df = spark.createDataFrame([(1.0, 2.0)], "a DOUBLE, b DOUBLE")
    plan = _plan(WH.unpivot_metrics(df, {"a": "a", "b": "b"}))
    assert "Exchange" not in plan
