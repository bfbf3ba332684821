"""Plan-shape locks for the round-3 TPC-H-style queries and the KMV
sketch (value correctness is covered by test_queries_oracle's
parametrized sweep; these pin the 100 TB-critical physical plans)."""

from __future__ import annotations

import re

from etl_jobs_spark.queries.tpch_plus import (
    approx_distinct_kmv,
    q3_shipping_priority,
    q5_local_supplier_volume,
    q6_forecast_revenue,
    q10_returned_items,
)
from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q6_predicates_reach_scan(spark):
    plan = _plan(q6_forecast_revenue(spark, SF_DIR))
    # plan toString truncates long filter lists mid-line (no closing
    # bracket) — capture to end of line instead
    pushed = " ".join(re.findall(r"PushedFilters: \[([^\n]*)", plan))
    assert "l_shipdate" in pushed and "l_quantity" in pushed, pushed
    # single-row agg: no join, no sort
    assert "Join" not in plan and "Sort" not in plan, plan[:1500]


def test_q3_broadcasts_and_take_ordered(spark):
    plan = _plan(q3_shipping_priority(spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 2, plan[:2000]
    assert "SortMergeJoin" not in plan
    assert "TakeOrderedAndProject" in plan


def test_q5_no_fact_shuffle_before_agg(spark):
    plan = _plan(q5_local_supplier_volume(spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 4, plan[:2000]
    assert "SortMergeJoin" not in plan


def test_q10_take_ordered(spark):
    plan = _plan(q10_returned_items(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan
    assert plan.count("BroadcastHashJoin") >= 3, plan[:2000]


def test_kmv_uses_take_ordered_not_global_sort(spark):
    plan = _plan(approx_distinct_kmv(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan, plan[:1500]


def test_kmv_estimate_within_tolerance(spark):
    row = approx_distinct_kmv(spark, SF_DIR).collect()[0]
    exact = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    if row["k"] < 256:
        # fewer distinct keys than sketch slots: estimator degenerates,
        # but k itself equals the exact count
        assert row["k"] == exact
    else:
        assert abs(row["est_distinct"] - exact) / exact < 0.2, (
            row["est_distinct"],
            exact,
        )
