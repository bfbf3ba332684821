"""Accuracy contract for the sketch aggregates (no SQL oracle —
different HLL implementations aren't comparable; accuracy vs exact
values is the meaningful check)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_jobs_spark.queries.analytics_ext import agg_approx_sketches
from etl_jobs_spark.sources.readers import read_table
from tests.conftest import SF_DIR


def test_sketches_within_tolerance(spark):
    ev = read_table(spark, SF_DIR, "events")
    exact = ev.select(
        F.countDistinct("user_id").alias("users"),
        F.countDistinct("event_id").alias("events"),
        F.expr("percentile(value, 0.5)").alias("median"),
        F.expr("percentile(value, 0.99)").alias("p99"),
    ).first()
    approx = agg_approx_sketches(spark, SF_DIR).first()
    assert abs(approx["approx_users"] - exact["users"]) <= max(3, 0.05 * exact["users"])
    assert abs(approx["approx_events"] - exact["events"]) <= 0.05 * exact["events"]
    assert abs(approx["approx_median_value"] - exact["median"]) <= 0.05 * max(exact["median"], 1)
    assert abs(approx["approx_p99_value"] - exact["p99"]) <= 0.05 * max(exact["p99"], 1)


def test_hll_mergeable_accuracy_and_union(spark):
    """Per-type estimates within HLL tolerance of exact, and the ALL
    row — built by UNIONING per-type sketches — matches both the
    exact global distinct and a direct global sketch (the rollup
    property that makes sketch columns storable)."""
    from pyspark.sql import functions as F

    from etl_jobs_spark.queries.analytics_ext import agg_hll_mergeable
    from etl_jobs_spark.sources.readers import read_table
    from tests.conftest import SF_DIR

    got = {
        r["event_type"]: r["est_users"]
        for r in agg_hll_mergeable(spark, SF_DIR).collect()
    }
    ev = read_table(spark, SF_DIR, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    exact["ALL"] = ev.select("user_id").distinct().count()
    for k, e in exact.items():
        assert abs(got[k] - e) / e < 0.05, (k, got[k], e)
    direct = ev.select(
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col("user_id").cast("bigint"))
        ).cast("bigint")
    ).collect()[0][0]
    assert got["ALL"] == direct  # union-of-sketches == direct sketch
