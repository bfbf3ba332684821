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
    """The promoted round-11 window must exactly fill the external
    sweep's 50-slot budget (registration order IS the sweep order),
    and the list must only name registered queries."""
    from etl_jobs_spark import registry
    from etl_jobs_spark.queries import _ROUND11_WINDOW

    names = list(registry.all_queries())
    assert len(_ROUND11_WINDOW) == 50
    assert names[:50] == _ROUND11_WINDOW
