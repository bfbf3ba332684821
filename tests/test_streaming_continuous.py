"""2025-era parity: the reference's poll loop runs CONTINUOUSLY
(1 s sleep between polls, max 10 messages per poll — ref:
src/etl_2025.py:233-263). The oracle queries drain with availableNow
for determinism; this test runs the same file-arrival pipeline under
a real ``processingTime="1 second"`` trigger and shows it processes
multiple micro-batches before being stopped — the continuous mode a
production deployment would run.
"""

from __future__ import annotations

import uuid
from pathlib import Path

from pyspark.sql import functions as F

from etl_jobs_spark.sources.readers import read_table
from etl_jobs_spark.streaming import pipelines as S
from tests.conftest import SF_DIR


def test_processing_time_trigger_runs_multiple_batches(spark, tmp_path):
    # stage the raw/ "queue": 4 files, 2 per trigger → ≥2 batches
    raw = tmp_path / "raw"
    ev = read_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    ev.repartition(4).write.option("header", "true").csv(str(raw))

    src = S.file_stream_source(
        spark,
        str(raw),
        "event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE",
        "csv",
        max_files_per_trigger=2,
    )
    cleaned = src.filter(F.col("value").between(0, 150))

    seen = []  # foreachBatch runs driver-side in local mode

    def sink(batch_df, batch_id):
        seen.append((batch_id, batch_df.count()))

    S.foreach_batch_pipeline(
        cleaned,
        str(tmp_path / "ck"),
        sink,
        state_partitions=4,
        trigger={"processingTime": "1 second"},
        await_seconds=60,
        stop_when=lambda: len(seen) >= 2 and sum(n for _, n in seen) >= 1,
    )
    assert len(seen) >= 2, f"expected >=2 micro-batches, got {seen}"
    total = sum(n for _, n in seen)
    expected = ev.filter(F.col("value").between(0, 150)).count()
    assert total == expected
