"""stage_atomic: all-or-nothing staging for exists-guarded fixture
dirs (ADVICE r14, streaming.py:908 — a crash between a feed write
and its marker appends left a dir the pinned-scratch restart treated
as fully staged)."""

from __future__ import annotations

import os

import pytest

from etl_jobs_spark.scratch import stage_atomic


def test_builds_then_renames(tmp_path):
    final = tmp_path / "feed"

    def build(tmp):
        tmp.mkdir()
        (tmp / "a").write_text("1")
        (tmp / "b").write_text("2")

    stage_atomic(final, build)
    assert sorted(os.listdir(final)) == ["a", "b"]
    assert not (tmp_path / ".feed.__staging").exists()


def test_existing_final_reused_untouched(tmp_path):
    """Restart reuse: an already-staged dir must not be re-written
    (re-writing would invalidate a FileStreamSource seen-file log)."""
    final = tmp_path / "feed"
    final.mkdir()
    (final / "a").write_text("orig")

    def build(tmp):  # pragma: no cover - must not run
        raise AssertionError("build ran over an existing staging")

    stage_atomic(final, build)
    assert (final / "a").read_text() == "orig"


def test_crashed_partial_staging_is_discarded(tmp_path):
    """A crash mid-build leaves only the temp dir; the next attempt
    discards it and stages cleanly — the final dir NEVER exists in
    a half-staged state."""
    final = tmp_path / "feed"

    def crashing(tmp):
        tmp.mkdir()
        (tmp / "a").write_text("partial")
        raise RuntimeError("injected crash between staging steps")

    with pytest.raises(RuntimeError, match="injected"):
        stage_atomic(final, crashing)
    assert not final.exists(), "half-staged dir became visible"

    def build(tmp):
        tmp.mkdir()
        (tmp / "a").write_text("full")
        (tmp / "marker").write_text("m")

    stage_atomic(final, build)
    assert sorted(os.listdir(final)) == ["a", "marker"]
    assert (final / "a").read_text() == "full"
