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

#: Extra release hooks (e.g. scoped temp-view cleanup in
#: queries/_shared.py) run by release_all after unpersisting.
_RELEASE_HOOKS: list = []


def track(df: DataFrame) -> DataFrame:
    """Persist ``df`` and remember the handle for later release."""
    df.persist()
    _TRACKED.append(df)
    return df


def on_release(hook) -> None:
    """Register a zero-arg callable to run on every release_all()
    (deduped — module-level registration may re-run on reload)."""
    if hook not in _RELEASE_HOOKS:
        _RELEASE_HOOKS.append(hook)


def release_all() -> None:
    """Unpersist every tracked DataFrame and run the registered
    release hooks (idempotent, never raises).

    QUIESCE-POINT operation: call between jobs, never concurrently
    with one — the scoped-view hook drops temp views a query still
    being constructed on another thread may not have analyzed yet
    (an unpersist race was only a perf hazard; a view drop is a
    loud failure). The bench/driver/sweep call sites all release
    after collect, serially."""
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist(blocking=False)
        except Exception:
            pass
    for hook in _RELEASE_HOOKS:
        try:
            hook()
        except Exception:
            pass


def clear_staging_memos() -> None:
    """Forget every staged-fixture memo so the next invocation of a
    staging query re-stages from scratch (fresh uuid dirs).

    Two consumers: the checkpoint axis (each archive must be
    self-contained, scripts/axis_checkpoint.py) and the bench's
    retime pass (VERDICT r14 item 5 — the second timing run must pay
    the SAME staging cost as the first, or min-of-2 would silently
    switch streaming rows to a staged-reuse basis prior rounds never
    measured)."""
    from etl_jobs_spark.queries import _shared, analytics_ext, multimodal
    from etl_jobs_spark.queries import streaming as SQ

    SQ._STAGED.clear()
    analytics_ext._SDEDUP_MEMO.clear()
    analytics_ext._JSONL_MEMO.clear()
    multimodal._MEDIA_STAGED.clear()
    _shared._SESSION_MEMOS.clear()
