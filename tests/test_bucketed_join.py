"""Bucketed co-located join contract: with both sides written
bucketBy(8, custkey).sortBy(custkey), the sort-merge join must read
bucket files directly — no Exchange (shuffle) and no Sort on either
join input. The only Exchange in the whole plan is the final
segment aggregation's."""

from __future__ import annotations

import re

from etl_jobs_spark.queries.relational import join_bucketed_colocated
from tests.conftest import SF_DIR


def test_bucketed_join_plan_has_single_exchange(spark):
    df = join_bucketed_colocated(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan, plan[:1500]
    exchanges = re.findall(r"Exchange \w+", plan)
    # exactly one shuffle: the post-join groupBy(c_mktsegment) agg
    assert len(exchanges) == 1, f"expected 1 Exchange, got {exchanges}\n{plan[:2000]}"
    assert "hashpartitioning(c_mktsegment" in plan, plan[:2000]
