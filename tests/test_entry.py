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
    """The promoted per-round window must exactly fill the external
    sweep's 50-slot budget (registration order IS the sweep order),
    and the list must only name registered queries. The window
    variable is resolved by its _ROUND*_WINDOW naming convention so
    the test survives the per-round rename."""
    from etl_jobs_spark import queries, registry

    windows = [
        getattr(queries, n)
        for n in dir(queries)
        if n.startswith("_ROUND") and n.endswith("_WINDOW")
    ]
    assert len(windows) == 1, "exactly one promoted window per round"
    window = windows[0]
    names = list(registry.all_queries())
    assert len(window) == 50
    assert names[:50] == window
