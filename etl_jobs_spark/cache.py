"""Scoped cache tracking.

Operators that persist an intermediate (the decontamination gram
explode, the graph-analytics normalized-edge table) register the
handle here instead of leaking it into the session's block manager.
Long-lived sessions (bench.py, the driver's correctness sweep, a
notebook) call :func:`release_all` between queries so repeated
invocations don't accumulate cached blocks — the round-2 bench log
showed 'Asked to cache already cached data' warnings from exactly
this leak.

At 100 TB the same discipline matters more, not less: an unreleased
persist pins executor storage memory that the next stage's shuffle
needs, turning a one-query optimization into cluster-wide eviction
churn."""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def track(df: DataFrame) -> DataFrame:
    """Persist ``df`` and remember the handle for later release."""
    df.persist()
    _TRACKED.append(df)
    return df


def release_all() -> None:
    """Unpersist every tracked DataFrame (idempotent, never raises)."""
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist(blocking=False)
        except Exception:
            pass
