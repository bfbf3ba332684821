"""Engine-free property tests of the replay/idempotency contracts
(VERDICT r13 item 5, builder candidate docs/PERF_r13.md:216-220).

Spark's foreachBatch is at-least-once under micro-batch retry: a
batch may be delivered again — possibly after a crash left a PARTIAL
application of its previous attempt — until its commit lands. Every
replay-guarded sink in the registry relies on one of three contracts
to make that safe, and each contract is a plain filesystem/SQL
protocol that can be driven to convergence with hypothesis-generated
redelivery schedules WITHOUT a SparkSession:

1. per-batch OVERWRITE directory (queue sinks,
   queries/streaming.py:237-251,277-284,338-359): batch b writes
   everything it owns under a deterministic dir keyed by b, mode
   overwrite;
2. DELETE-by-batch then insert (the JDBC sink,
   queries/streaming.py:786-822): batch b first deletes
   batch_id = b, then appends its rows tagged b — the guard the
   round-13 sink-crash axis proved was a silent no-op under Derby's
   identifier-case folding;
3. rename-aside state swap (operators/state_swap.py): versioned
   directory replace with crash recovery, driven here through the
   REAL module with a crash injected at every filesystem operation
   index.

These tests would have caught the Derby bug without a cluster: a
no-op delete guard fails the convergence property on the first
schedule containing a redelivery (proved explicitly below).
"""

from __future__ import annotations

import shutil
import sqlite3
from pathlib import Path

from hypothesis import given, settings
from hypothesis import strategies as st

# ---------------------------------------------------------------------------
# Shared schedule strategy: an at-least-once delivery schedule over
# n batches. Each event is (batch_id, completed_rows) where
# completed_rows < len(rows) models a crash mid-application (the
# partial state a replay must overwrite). Spark redelivers until the
# commit lands, so the FINAL event per batch is always complete.
# ---------------------------------------------------------------------------


@settings(max_examples=60, deadline=None)
@given(data=st.data())
def test_overwrite_dir_contract_converges(data, tmp_path_factory):
    """Contract 1: per-batch overwrite dirs. After ANY at-least-once
    schedule (duplicates + partial crashes, final attempt complete),
    the directory tree equals the exactly-once tree. An
    append-mode sink fails this on the first duplicated non-empty
    batch — the pre-r13 queue sinks' bug class."""
    rows, merged = _draw_schedule(data)
    root = tmp_path_factory.mktemp("queue_out")

    def deliver(b: int, upto: int) -> None:
        # mode=overwrite: clear the batch dir, then write the
        # attempt's rows; a partial attempt stops mid-write exactly
        # like a crashed task set.
        d = root / f"b{b:09d}"
        if d.exists():
            shutil.rmtree(d)
        d.mkdir()
        for j in range(upto):
            (d / f"part-{j}").write_text(rows[b][j])

    for b, upto in merged:
        deliver(b, upto)

    got = {
        d.name: sorted(p.read_text() for p in d.iterdir())
        for d in root.iterdir()
    }
    want = {f"b{b:09d}": sorted(rs) for b, rs in rows.items()}
    assert got == want


def _draw_schedule(data, max_batches: int = 5, max_rows: int = 5):
    n = data.draw(st.integers(min_value=1, max_value=max_batches))
    rows = {
        b: [f"r{b}-{j}" for j in range(data.draw(st.integers(0, max_rows)))]
        for b in range(n)
    }
    queues: dict[int, list[tuple[int, int]]] = {}
    for b in range(n):
        attempts = [
            (b, data.draw(st.integers(0, len(rows[b]))))
            for _ in range(data.draw(st.integers(0, 2)))
        ]
        attempts.append((b, len(rows[b])))
        queues[b] = attempts
    merged: list[tuple[int, int]] = []
    live = sorted(b for b in queues if queues[b])
    while live:
        b = data.draw(st.sampled_from(live))
        merged.append(queues[b].pop(0))
        if not queues[b]:
            live.remove(b)
    return rows, merged


# ---------------------------------------------------------------------------
# Contract 2: delete-by-batch then insert, against a REAL SQL engine
# (sqlite, autocommit — each insert is visible immediately, so a
# mid-insert crash leaves committed partial rows, the torn state
# Spark's per-partition JDBC commits can produce).
# ---------------------------------------------------------------------------


def _jdbc_deliver(con, b: int, rows: list[str], upto: int) -> None:
    """The sink's guard verbatim (queries/streaming.py:786-822):
    delete own batch_id, then insert tagged rows; ``upto`` < len
    models the crash before the attempt finished."""
    con.execute('DELETE FROM events_sink WHERE "batch_id" = ?', (b,))
    for j in range(upto):
        con.execute(
            'INSERT INTO events_sink ("batch_id", payload) VALUES (?, ?)',
            (b, rows[j]),
        )


@settings(max_examples=60, deadline=None)
@given(data=st.data())
def test_delete_by_batch_contract_converges(data):
    rows, merged = _draw_schedule(data)
    con = sqlite3.connect(":memory:", isolation_level=None)  # autocommit
    con.execute('CREATE TABLE events_sink ("batch_id" INT, payload TEXT)')
    for b, upto in merged:
        _jdbc_deliver(con, b, rows[b], upto)
    got = sorted(con.execute("SELECT * FROM events_sink").fetchall())
    want = sorted((b, r) for b, rs in rows.items() for r in rs)
    assert got == want


def test_noop_delete_guard_is_caught():
    """The Derby identifier-case bug, reproduced abstractly: a guard
    whose DELETE never matches (existence lookup failed → delete
    skipped) degrades to blind append, and the convergence property
    catches it on the FIRST schedule with a redelivery — i.e. this
    harness would have caught queries/streaming.py's r13 bug without
    a cluster."""
    con = sqlite3.connect(":memory:", isolation_level=None)
    con.execute('CREATE TABLE events_sink ("batch_id" INT, payload TEXT)')

    def broken_deliver(b, rows, upto):
        # the no-op guard: deletes a batch id that can never exist
        con.execute('DELETE FROM events_sink WHERE "batch_id" = ?', (-1,))
        for j in range(upto):
            con.execute(
                'INSERT INTO events_sink ("batch_id", payload) VALUES (?, ?)',
                (b, rows[j]),
            )

    rows = ["a", "b"]
    broken_deliver(0, rows, 2)
    broken_deliver(0, rows, 2)  # the replay Spark is allowed to do
    got = sorted(con.execute("SELECT * FROM events_sink").fetchall())
    want = sorted((0, r) for r in rows)
    assert got != want, "a no-op delete guard must FAIL convergence"


# ---------------------------------------------------------------------------
# Contract 3: the rename-aside state swap, driven through the REAL
# operators/state_swap.py with a crash injected at every filesystem
# operation boundary. Invariants: (a) at any crash point a complete
# state copy exists under `state` or exactly one recoverable
# leftover; (b) recover() + redo converges to the latest version.
# ---------------------------------------------------------------------------


class _InjectedCrash(Exception):
    pass


class _CrashBudget:
    def __init__(self, n_ops: int):
        self.left = n_ops

    def tick(self):
        if self.left == 0:
            raise _InjectedCrash
        self.left -= 1


def _build_out(wk: Path, version: int) -> Path:
    out = wk / f"out_v{version}"
    if out.exists():
        shutil.rmtree(out)
    out.mkdir()
    (out / "data").write_text(f"v{version}")
    return out


@settings(max_examples=40, deadline=None)
@given(data=st.data())
def test_state_swap_converges_under_crashes(data, tmp_path_factory):
    from etl_jobs_spark.operators import state_swap

    wk = tmp_path_factory.mktemp("swap_wk")
    state = wk / "state"
    n_versions = data.draw(st.integers(1, 4))

    real_rename = Path.rename
    real_rmtree = shutil.rmtree
    budget: list[_CrashBudget | None] = [None]

    def rename(self, target):
        if budget[0] is not None:
            budget[0].tick()
        return real_rename(self, target)

    def rmtree(path, *a, **kw):
        if budget[0] is not None:
            budget[0].tick()
        return real_rmtree(path, *a, **kw)

    Path.rename = rename
    state_swap.shutil.rmtree = rmtree
    try:
        for v in range(1, n_versions + 1):
            # 0-2 crashed attempts at each version before the clean one
            for _ in range(data.draw(st.integers(0, 2))):
                crash_at = data.draw(st.integers(0, 5))
                out = _build_out(wk, v)
                budget[0] = _CrashBudget(crash_at)
                try:
                    state_swap.recover(wk, state)
                    state_swap.swap(wk, state, out, v)
                except _InjectedCrash:
                    pass
                finally:
                    budget[0] = None
                # invariant (a): once a state has ever been
                # established (v > 1), a COMPLETE copy of some
                # version survives every crash point — under `state`
                # or as a recoverable leftover. (At v == 1 with no
                # prior state a pre-rename crash legitimately leaves
                # nothing; the replay rebuilds from the batch.)
                copies = [state] if state.exists() else []
                copies += sorted(wk.glob("state_old_v*"))
                if v > 1:
                    assert copies, "crash lost every state copy"
                for c in copies:
                    assert (c / "data").read_text().startswith("v"), c
            out = _build_out(wk, v)
            state_swap.recover(wk, state)
            state_swap.swap(wk, state, out, v)
            assert (state / "data").read_text() == f"v{v}"
        # no leftovers survive a clean pass
        assert not list(wk.glob("state_old_v*"))
    finally:
        Path.rename = real_rename
        state_swap.shutil.rmtree = real_rmtree
