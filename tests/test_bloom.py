"""Bloom runtime-filter operator: no false negatives, sane false-
positive rate, and the probe stays a codegen scan-side predicate
(no UDF, no extra shuffle before the join)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_jobs_spark.operators.bloom import bloom_build, bloom_probe_expr
from etl_jobs_spark.queries.relational import join_bloom_prefilter
from etl_jobs_spark.sources.readers import read_table
from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bloom_no_false_negatives(spark):
    keys = (
        read_table(spark, SF_DIR, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    words = bloom_build(keys, "c_custkey")
    n_keys = keys.count()
    # every inserted key must pass its own filter
    assert keys.where(bloom_probe_expr(words, "c_custkey")).count() == n_keys


def test_bloom_false_positive_rate_bounded(spark):
    keys = (
        read_table(spark, SF_DIR, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    words = bloom_build(keys, "c_custkey")
    # probe a disjoint key range (shifted far above any custkey)
    probes = spark.range(1_000_000, 1_010_000).select(
        F.col("id").alias("c_custkey")
    )
    fp = probes.where(bloom_probe_expr(words, "c_custkey")).count()
    # m=2^16, k=3, n≈tens of keys at sf0.001 → fpr ≪ 1%; allow 1%
    assert fp < 100, fp


def test_bloom_probe_is_scan_side_codegen(spark):
    plan = _plan(join_bloom_prefilter(spark, SF_DIR))
    # the probe's bit tests run as a Filter over the fact scan —
    # element_at against the folded literal, before the semi join
    assert "element_at" in plan, plan[:2000]
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan[:2000]
    # no Python evaluation anywhere in the probe path
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
