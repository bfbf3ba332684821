"""Checkpoint-recovery semantics: the exactly-once upgrade over the
reference's no-delete SQS loop (SURVEY §2.8 — redelivery vs
checkpoint).

A file-arrival stream drains with availableNow, more files land, and
a SECOND run resumes from the SAME checkpoint: only the new files
may be processed — no reprocessing, no loss.
"""

from __future__ import annotations

import tempfile
import uuid
from pathlib import Path

from pyspark.sql import functions as F

from etl_jobs_spark.sources.readers import read_table
from etl_jobs_spark.streaming import pipelines as S
from tests.conftest import SF_DIR


def test_checkpoint_resume_processes_each_file_once(spark):
    d = Path(tempfile.gettempdir()) / f"etl_recov_{uuid.uuid4().hex[:8]}"
    ev = read_table(spark, SF_DIR, "events").select("event_id", "user_id")
    first = ev.filter(F.col("event_id") % 2 == 0)
    second = ev.filter(F.col("event_id") % 2 == 1)

    out = str(d / "out")
    ck = str(d / "ck")
    schema = "event_id BIGINT, user_id BIGINT"

    def drain():
        src = S.file_stream_source(spark, str(d / "raw"), schema, "parquet", None)
        q = (
            src.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    first.coalesce(1).write.parquet(str(d / "raw"))
    drain()
    n1 = spark.read.schema(schema).parquet(out).count()
    assert n1 == first.count()

    # new arrivals; resume from the SAME checkpoint
    second.coalesce(1).write.mode("append").parquet(str(d / "raw"))
    drain()
    result = spark.read.schema(schema).parquet(out)
    assert result.count() == ev.count()  # nothing lost, nothing doubled
    assert result.select("event_id").distinct().count() == ev.count()


def test_merge_sink_resume_keeps_latest_per_key(spark):
    """The streaming MERGE sink's recovery contract: drain, new
    changelog files arrive, resume from the SAME checkpoint — the
    merged table must equal latest-per-key over the full feed (old
    batches not reapplied, new ones merged on top)."""
    from etl_jobs_spark.scratch import scratch_dir
    from etl_jobs_spark.streaming import pipelines as SP
    from pyspark.sql import Window

    d = scratch_dir("etl_merge_recov")
    ev = read_table(spark, SF_DIR, "events").select(
        "event_id", "ts", "user_id", "value"
    )
    first = ev.filter(F.col("event_id") % 2 == 0)
    second = ev.filter(F.col("event_id") % 2 == 1)
    schema = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, value DOUBLE"
    state = d / "state"

    def merge(batch_df, batch_id):
        w = Window.partitionBy("user_id").orderBy(
            F.col("ts").desc(), F.col("event_id").desc()
        )
        compact = (
            batch_df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )
        ss = batch_df.sparkSession
        if state.exists():
            merged = (
                ss.read.parquet(str(state))
                .unionByName(compact)
                .withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") == 1)
                .drop("rn")
            )
        else:
            merged = compact
        out = d / f"v{batch_id}"
        merged.write.mode("overwrite").parquet(str(out))
        if state.exists():
            import shutil

            shutil.rmtree(str(state))
        out.rename(state)

    def drain():
        src = SP.file_stream_source(spark, str(d / "raw"), schema, "parquet", None)
        SP.foreach_batch_pipeline(src, str(d / "ck"), merge, state_partitions=4)

    first.coalesce(1).write.parquet(str(d / "raw"))
    drain()
    second.coalesce(1).write.mode("append").parquet(str(d / "raw"))
    drain()

    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    want = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    got = spark.read.parquet(str(state))
    assert got.count() == want.count()
    assert (
        got.select("user_id", "event_id")
        .exceptAll(want.select("user_id", "event_id"))
        .count()
        == 0
    )
