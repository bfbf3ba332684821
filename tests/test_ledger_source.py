"""Custom Python DataSource contract: partition planning + filter
pushdown semantics (unit-level), end-to-end parity via the oracle
sweep (source_custom_pushdown)."""

from __future__ import annotations

import json

from etl_jobs_spark.sources.ledger_source import LedgerReader


def _write_ledger(tmp_path, files):
    for name, recs in files.items():
        (tmp_path / name).write_text(
            "\n".join(json.dumps(r) for r in recs) + "\n"
        )


def test_one_partition_per_file(tmp_path):
    _write_ledger(
        tmp_path,
        {
            "a.json": [{"event_id": 1, "user_id": 1, "event_type": "x", "value": 1.0}],
            "b.json": [{"event_id": 2, "user_id": 2, "event_type": "y", "value": 2.0}],
            "ignored.txt": [],
        },
    )
    r = LedgerReader({"path": str(tmp_path)})
    parts = r.partitions()
    assert len(parts) == 2  # .txt excluded
    rows = [row for p in parts for row in r.read(p)]
    assert sorted(row[0] for row in rows) == [1, 2]


def test_equality_filter_consumed_and_applied(tmp_path):
    from pyspark.sql.datasource import EqualTo

    _write_ledger(
        tmp_path,
        {
            "a.json": [
                {"event_id": 1, "user_id": 1, "event_type": "buy", "value": 1.0},
                {"event_id": 2, "user_id": 2, "event_type": "view", "value": 2.0},
            ]
        },
    )
    r = LedgerReader({"path": str(tmp_path)})
    remaining = list(r.pushFilters([EqualTo(("event_type",), "buy")]))
    assert remaining == []  # consumed — Spark won't re-evaluate
    rows = [row for p in r.partitions() for row in r.read(p)]
    assert [row[0] for row in rows] == [1]


def test_unsupported_filter_returned(tmp_path):
    from pyspark.sql.datasource import EqualTo

    _write_ledger(tmp_path, {"a.json": []})
    r = LedgerReader({"path": str(tmp_path)})
    other = EqualTo(("user_id",), 7)
    remaining = list(r.pushFilters([other]))
    assert remaining == [other]  # handed back to Spark
