"""Crash-window tests for the rename-aside state swap
(operators/state_swap.py) — every interruption point of the protocol,
simulated directly on directories (no Spark needed)."""

from __future__ import annotations

from pathlib import Path

from etl_jobs_spark.operators import state_swap


def _mk(d: Path, tag: str) -> None:
    d.mkdir(parents=True)
    (d / "part-0.parquet").write_text(tag)


def _tag(d: Path) -> str:
    return (d / "part-0.parquet").read_text()


def test_happy_path_swap(tmp_path):
    state, out = tmp_path / "state", tmp_path / "state_v3"
    _mk(state, "old")
    _mk(out, "new")
    state_swap.swap(tmp_path, state, out, 3)
    assert _tag(state) == "new"
    assert not list(tmp_path.glob("state_old_v*"))


def test_first_swap_no_prior_state(tmp_path):
    out = tmp_path / "state_v0"
    _mk(out, "new")
    state_swap.swap(tmp_path, tmp_path / "state", out, 0)
    assert _tag(tmp_path / "state") == "new"


def test_recover_restores_missing_state(tmp_path):
    # crash between rename(old) and rename(state): only the aside copy
    _mk(tmp_path / "state_old_v5", "accumulated")
    state = tmp_path / "state"
    state_swap.recover(tmp_path, state)
    assert _tag(state) == "accumulated"
    assert not list(tmp_path.glob("state_old_v*"))


def test_recover_prefers_newest_numeric_not_lexicographic(tmp_path):
    # v10 sorts before v2 lexicographically; recovery must pick v10
    _mk(tmp_path / "state_old_v2", "ancient")
    _mk(tmp_path / "state_old_v10", "latest")
    state = tmp_path / "state"
    state_swap.recover(tmp_path, state)
    assert _tag(state) == "latest"
    assert not list(tmp_path.glob("state_old_v*")), "stale purged"


def test_recover_drops_leftovers_when_state_intact(tmp_path):
    # crash after rename(state) but before rmtree(old): state is the
    # newer table; the leftover is stale and must go
    _mk(tmp_path / "state", "current")
    _mk(tmp_path / "state_old_v7", "stale")
    state_swap.recover(tmp_path, tmp_path / "state")
    assert _tag(tmp_path / "state") == "current"
    assert not list(tmp_path.glob("state_old_v*"))


def test_replayed_batch_survives_own_leftover(tmp_path):
    # the bug the round-4 review caught: a replayed batch N finds its
    # own state_old_vN from the crashed attempt; os.rename onto a
    # non-empty dir raises unless swap clears it first
    _mk(tmp_path / "state", "recovered")
    _mk(tmp_path / "state_old_v4", "crashed-attempt")
    out = tmp_path / "state_v4"
    _mk(out, "replayed")
    state_swap.swap(tmp_path, tmp_path / "state", out, 4)
    assert _tag(tmp_path / "state") == "replayed"
    assert not list(tmp_path.glob("state_old_v*"))


def test_full_crash_replay_cycle(tmp_path):
    """recover() then swap() after every possible crash point ends
    with the replayed batch's table installed and no leftovers."""
    for crash_point in ("after_aside", "after_install"):
        wk = tmp_path / crash_point
        state = wk / "state"
        _mk(state, "v1")
        # batch 2 crashes at the given point
        old = wk / "state_old_v2"
        state.rename(old)
        if crash_point == "after_install":
            _mk(state, "v2-installed")
        # restart: recover, then replay batch 2
        state_swap.recover(wk, state)
        assert state.exists()
        out = wk / "state_v2"
        _mk(out, "v2-replayed")
        state_swap.swap(wk, state, out, 2)
        assert _tag(state) == "v2-replayed"
        assert not list(wk.glob("state_old_v*"))
