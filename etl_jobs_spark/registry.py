"""Query + oracle registry.

Every operator the engine claims is registered here twice: a Spark
callable ``(spark, sf_dir) -> DataFrame`` and (when SQL-expressible)
an ANSI-SQL oracle string DuckDB runs over the same parquet tables.
The driver hash-compares the two (row count + schema +
order-insensitive value hash), so both sides must agree on:

- column NAMES (alias every computed column identically),
- float formatting (aggregates rounded, same digits both sides),
- integer widths (DuckDB ``sum(int)`` is HUGEINT → cast to BIGINT),
- timestamp semantics (session TZ pinned UTC in session.py),
- double→int casts (Spark truncates, DuckDB rounds → oracles use
  ``CAST(trunc(x) AS ...)``),
- tiebreaks on any top-k boundary.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class RegisteredQuery:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB, or None → rows-only check
    doc: str = ""


_REGISTRY: dict[str, RegisteredQuery] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: add a query (and its oracle) to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        _REGISTRY[name] = RegisteredQuery(name, fn, oracle, doc or (fn.__doc__ or ""))
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _load()
    return {name: rq.fn for name, rq in _REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load()
    return {n: rq.oracle for n, rq in _REGISTRY.items() if rq.oracle is not None}


_LOADED = False


def promote(names: list[str]) -> None:
    """Move ``names`` (in the given order) to the front of the registry.

    Registration order is the order external correctness sweeps walk the
    registry, so queries that still need a fresh correctness row are
    promoted ahead of already-verified ones. Unknown names are an error —
    a stale promotion list should fail loudly, not silently shrink.
    """
    missing = [n for n in names if n not in _REGISTRY]
    if missing:
        raise KeyError(f"promote(): unknown query names {missing}")
    promoted = {n: _REGISTRY[n] for n in names}
    rest = {n: rq for n, rq in _REGISTRY.items() if n not in promoted}
    _REGISTRY.clear()
    _REGISTRY.update(promoted)
    _REGISTRY.update(rest)


def _load() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    import etl_jobs_spark.queries  # noqa: F401  (registers on import)

    _LOADED = True
