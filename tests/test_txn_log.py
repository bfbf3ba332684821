"""Write-side transactional commit log (sources/txn_log.py —
VERDICT r14 item 7). The protocol's contracts, each pinned:
atomic visibility, overwrite's remove-fold, time travel, crashed
writers invisible, optimistic two-writer safety with zero lost
updates, loud refusal under pathological contention."""

from __future__ import annotations

import threading

import pytest

from etl_jobs_spark.sources import txn_log as T
from etl_jobs_spark.sources.write_lock import ConcurrentWriteError


def _df(spark, tag: str, n: int = 100):
    return spark.range(n).selectExpr(
        "id AS event_id", f"'{tag}' AS writer"
    )


def test_append_commits_accumulate(spark, tmp_path):
    root = tmp_path / "tbl"
    v1 = T.txn_commit(_df(spark, "a"), root)
    v2 = T.txn_commit(_df(spark, "b"), root)
    assert (v1, v2) == (1, 2)
    back = T.read_txn_table(spark, root)
    counts = dict(
        back.groupBy("writer").count().rdd.map(tuple).collect()
    )
    assert counts == {"a": 100, "b": 100}


def test_overwrite_replaces_atomically(spark, tmp_path):
    root = tmp_path / "tbl"
    T.txn_commit(_df(spark, "old1"), root)
    T.txn_commit(_df(spark, "old2"), root)
    T.txn_commit(_df(spark, "new", 7), root, mode="overwrite")
    back = T.read_txn_table(spark, root).collect()
    assert len(back) == 7 and {r["writer"] for r in back} == {"new"}
    # one commit file carries removes+add together: no window where
    # a reader can see zero files or old+new mixed
    log = T.read_log(root, version=3)
    v3 = [a for a in log if a["version"] == 3]
    assert sum(a["action"] == "remove" for a in v3) == 2
    assert sum(a["action"] == "add" for a in v3) == 1


def test_time_travel_reads_old_snapshot(spark, tmp_path):
    root = tmp_path / "tbl"
    T.txn_commit(_df(spark, "a"), root)
    T.txn_commit(_df(spark, "b", 50), root)
    T.txn_commit(_df(spark, "c", 7), root, mode="overwrite")
    assert T.read_txn_table(spark, root, version=1).count() == 100
    assert T.read_txn_table(spark, root, version=2).count() == 150
    assert T.read_txn_table(spark, root).count() == 7


def test_staged_without_commit_is_invisible(spark, tmp_path):
    root = tmp_path / "tbl"
    T.txn_commit(_df(spark, "a"), root)
    # a crashed writer: data staged, version file never published
    _df(spark, "ghost", 999).write.parquet(str(root / "data_ghost"))
    back = T.read_txn_table(spark, root)
    assert back.count() == 100
    assert {r["writer"] for r in back.collect()} == {"a"}
    assert T.orphans(root) == ["data_ghost"]


def test_empty_overwrite_reads_back_with_schema(spark, tmp_path):
    root = tmp_path / "tbl"
    T.txn_commit(_df(spark, "a"), root)
    T.txn_commit(
        _df(spark, "none", 0).limit(0), root, mode="overwrite"
    )
    back = T.read_txn_table(spark, root)
    assert back.count() == 0
    assert back.columns == ["event_id", "writer"]


def test_read_uncommitted_table_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        T.read_txn_table(spark, tmp_path / "never")


def test_two_writers_no_lost_update(spark, tmp_path):
    """The r14 axis's silent-data-loss scenario, replayed through
    the commit log: two concurrent appenders must BOTH land in full
    — version claims serialize via os.link, data writes never
    contend."""
    root = tmp_path / "tbl"
    errs: list = []

    def writer(tag):
        try:
            T.txn_commit(_df(spark, tag, 5000), root)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    ts = [threading.Thread(target=writer, args=(t,)) for t in "ABCD"]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs, errs
    assert T.current_version(root) == 4
    counts = dict(
        T.read_txn_table(spark, root)
        .groupBy("writer")
        .count()
        .rdd.map(tuple)
        .collect()
    )
    assert counts == {t: 5000 for t in "ABCD"}


def test_version_claim_is_first_writer_wins(spark, tmp_path):
    """Directly pin the claim primitive: a pre-existing version file
    forces the committer to the next version, never an overwrite of
    someone else's manifest."""
    root = tmp_path / "tbl"
    T.txn_commit(_df(spark, "a"), root)
    # forge a competing v2 as another engine would publish it
    (root / T.LOG_DIR / "00000002.json").write_text(
        '{"version": 2, "action": "commit", "mode": "append", '
        '"writer": "foreign", "schema": null}\n'
    )
    v = T.txn_commit(_df(spark, "b"), root)
    assert v == 3
    assert (root / T.LOG_DIR / "00000003.json").exists()


def test_contention_exhaustion_is_loud(spark, tmp_path, monkeypatch):
    root = tmp_path / "tbl"
    T.txn_commit(_df(spark, "a"), root)

    # an adversary that always steals the next version number
    real_current = T.current_version

    def racing_current(r):
        v = real_current(r)
        (root / T.LOG_DIR / f"{v + 1:08d}.json").write_text(
            '{"version": %d, "action": "commit", "mode": "append", '
            '"writer": "thief", "schema": null}\n' % (v + 1)
        )
        return v

    monkeypatch.setattr(T, "current_version", racing_current)
    with pytest.raises(ConcurrentWriteError, match="version races"):
        T.txn_commit(_df(spark, "b"), root, max_retries=3)
