"""Crash-safe rename-aside swap for a directory-valued state table.

The streaming merge-upsert sink accumulates its state as a parquet
directory and replaces it per micro-batch. A naive rmtree+rename has
a window where a crash loses the accumulated table; the rename-aside
protocol here guarantees a complete state copy exists on disk under
ONE of two names at every instant:

    1. clear any leftover ``state_old_v{batch}`` from a crashed
       attempt of THIS batch (os.rename onto a non-empty directory
       raises — the bug a replayed batch would otherwise hit),
    2. ``state``  -> ``state_old_v{batch}``   (old survives),
    3. ``out``    -> ``state``                (new in place),
    4. drop ``state_old_v{batch}``.

Recovery (run before each merge): if ``state`` is missing, a crash
died between steps 2 and 3 — restore the NEWEST leftover by NUMERIC
batch suffix (lexicographic order would pick v10 before v2). Stale
older leftovers are snapshots from swaps that completed later and are
purged either way, so they can never poison a future recovery.

Separated from the streaming query so the crash paths are directly
unit-testable (tests/test_state_swap.py) — no sweep or oracle run
exercises a crash window. Reference analogue: the transactional
commit/rollback of the 2018 loader (src/etl_2018.py:65-92), applied
to directory state.
"""

from __future__ import annotations

import shutil
from pathlib import Path


def _batch_no(p: Path) -> int:
    return int(p.name.rsplit("v", 1)[1])


def recover(wk: Path, state: Path) -> None:
    """Restore state from the newest crash leftover (if state is
    missing) and purge stale leftovers."""
    leftovers = sorted(wk.glob("state_old_v*"), key=_batch_no)
    if not leftovers:
        return
    newest = leftovers.pop()
    if state.exists():
        shutil.rmtree(str(newest))
    else:
        newest.rename(state)
    for stale in leftovers:
        shutil.rmtree(str(stale))


def swap(wk: Path, state: Path, out: Path, batch_id: int) -> None:
    """Atomically-recoverable replace of ``state`` with ``out``."""
    old = wk / f"state_old_v{batch_id}"
    if old.exists():
        shutil.rmtree(str(old))
    if state.exists():
        state.rename(old)
    out.rename(state)
    if old.exists():
        shutil.rmtree(str(old))
