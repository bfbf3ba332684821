"""Unit tests for the table write lock (round-14 write-path
concurrency contract; engine-level sweep in
scripts/axis_concurrent.py)."""

from __future__ import annotations

import os
import threading
import time

import pytest

from etl_jobs_spark.sources.write_lock import (
    ConcurrentWriteError,
    _lock_path,
    acquire_table_lock,
    release_table_lock,
    table_write_lock,
)


def test_exclusive_and_released(tmp_path):
    root = tmp_path / "tbl"
    with table_write_lock(root):
        assert _lock_path(root).exists()
        with pytest.raises(ConcurrentWriteError):
            acquire_table_lock(root, timeout_sec=0.2)
    assert not _lock_path(root).exists()
    # reacquirable after release
    with table_write_lock(root):
        pass


def test_waiter_proceeds_after_holder_releases(tmp_path):
    root = tmp_path / "tbl"
    acquire_table_lock(root)
    got = []

    def waiter():
        with table_write_lock(root, timeout_sec=5.0):
            got.append(time.monotonic())

    t = threading.Thread(target=waiter)
    t.start()
    time.sleep(0.3)
    released_at = time.monotonic()
    release_table_lock(root)
    t.join(timeout=5)
    assert got and got[0] >= released_at


def test_stale_lock_broken(tmp_path):
    root = tmp_path / "tbl"
    acquire_table_lock(root)
    lock = _lock_path(root)
    old = time.time() - 7200
    os.utime(lock, (old, old))
    # a dead writer's 2h-old lock must not wedge the table forever
    with table_write_lock(root, timeout_sec=1.0, stale_sec=3600.0):
        pass
    assert not lock.exists()


def test_lock_is_sibling_not_child(tmp_path):
    # overwrite mode deletes the root's contents — the lock must
    # survive that, so it lives NEXT TO the root
    p = _lock_path(tmp_path / "tbl")
    assert p.parent == tmp_path and p.name == "tbl.__write_lock"


def test_uri_and_object_store_paths(tmp_path):
    assert _lock_path((tmp_path / "t").as_uri()) == _lock_path(tmp_path / "t")
    assert _lock_path("s3a://bucket/table") is None
    # non-posix store: lock degrades to a documented no-op
    with table_write_lock("s3a://bucket/table"):
        pass


def test_locked_sink_parquet_serializes_two_appenders(spark, tmp_path):
    """Two concurrent appends through the locked sink land BOTH
    writers' rows exactly — the r13 torn-append hazard closed."""
    from pyspark.sql import functions as F

    from etl_jobs_spark.sources import writers

    root = str(tmp_path / "tbl")

    def make(tag):
        return spark.range(5000).select(
            F.col("id").alias("event_id"), F.lit(tag).alias("writer")
        )

    errs = []

    def w(tag):
        try:
            writers.sink_parquet(make(tag), root, mode="append")
        except Exception as e:  # pragma: no cover
            errs.append(e)

    ts = [threading.Thread(target=w, args=(t,)) for t in ("A", "B")]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs, errs
    counts = {
        r["writer"]: r["n"]
        for r in spark.read.parquet(root)
        .groupBy("writer")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert counts == {"A": 5000, "B": 5000}
