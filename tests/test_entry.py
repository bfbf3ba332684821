"""Driver-contract smoke tests mirroring t1."""

from __future__ import annotations

import importlib.util
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _load_entry_module():
    spec = importlib.util.spec_from_file_location(
        "spark_entry", REPO / "__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_contract(spark):
    mod = _load_entry_module()
    df = mod.entry(spark)
    assert df.count() > 0
    q, o = mod.queries(), mod.oracle_sql()
    assert q, "queries() must not be empty"
    assert set(o) <= set(q), "every oracle key must have a query"


def test_promotion_list_within_sweep_window():
    """Every query promoted for a correctness row must actually land
    in the first 50 registry positions (the external sweep's budget),
    and the list must only name registered queries."""
    from etl_jobs_spark import registry
    from etl_jobs_spark.queries import _NEEDS_CORRECTNESS_ROW

    names = list(registry.all_queries())
    assert len(_NEEDS_CORRECTNESS_ROW) <= 50
    first = set(names[: len(_NEEDS_CORRECTNESS_ROW)])
    assert set(_NEEDS_CORRECTNESS_ROW) == first
    # the round-10 carry-over front must hold the slots right after
    # the window so next round's promotion is a list swap, not a hunt
    from etl_jobs_spark.queries import _ROUND10_WINDOW_FRONT

    lo = len(_NEEDS_CORRECTNESS_ROW)
    hi = lo + len(_ROUND10_WINDOW_FRONT)
    assert names[lo:hi] == _ROUND10_WINDOW_FRONT
