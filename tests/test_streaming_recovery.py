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


def test_mid_drain_kill_restart_is_exactly_once(spark):
    """Fault injection (round 12): stop a STATEFUL streaming query
    MID-DRAIN — between micro-batches, with input files still
    unprocessed — and restart from the same checkpoint. The
    full-row dedup over an at-least-once (doubled) feed must come
    out exactly-once: no loss, no phantom, no double. The dedup is
    deliberately WATERMARK-FREE: this feed's files carry randomly
    interleaved event times, so a checkpoint-recovered watermark
    would (correctly!) drop old rows as late — real streaming
    semantics, but it would test the watermark, not the recovery;
    the registry's watermarked streaming queries stage
    monotone/single-file feeds for exactly that reason.

    Local scope, stated honestly: in local[] mode the driver JVM is
    the test process, so the injection is query.stop() between
    batches (task interruption + checkpoint fence), not a process
    kill; the state-store/commit-log recovery path exercised is the
    same one a real executor loss replays."""
    import time

    d = Path(tempfile.gettempdir()) / f"etl_fault_{uuid.uuid4().hex[:8]}"
    ev = read_table(spark, SF_DIR, "events").select(
        "event_id", "ts", "user_id", "value"
    )
    # 8 arrival files; the doubled feed makes the dedup state real
    ev.repartition(4).write.parquet(str(d / "raw"))
    ev.repartition(4).write.mode("append").parquet(str(d / "raw"))
    schema = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, value DOUBLE"
    out, ck = str(d / "out"), str(d / "ck")

    def start(available_now):
        src = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(d / "raw"))
        )
        dedup = src.dropDuplicates(
            ["event_id", "ts", "user_id", "value"]
        )
        w = (
            dedup.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
        )
        if available_now:
            w = w.trigger(availableNow=True)
        else:
            # paced trigger so the stop lands BETWEEN batches with
            # files still pending — a stop after a finished drain
            # would test nothing
            w = w.trigger(processingTime="2 seconds")
        return w.start()

    q = start(available_now=False)
    deadline = time.time() + 180
    while time.time() < deadline:
        p = q.lastProgress
        if p and p["batchId"] >= 1:
            break
        time.sleep(0.2)
    q.stop()  # the injection
    q.awaitTermination()
    mid = spark.read.schema(schema).parquet(out).count()

    q2 = start(available_now=True)  # resume from the SAME checkpoint
    q2.awaitTermination()
    got = spark.read.schema(schema).parquet(out)
    want = ev.distinct().count()
    n_total, n_distinct = got.count(), got.distinct().count()
    # the kill must have been genuinely mid-drain, and recovery
    # exactly-once
    assert mid < n_total, (mid, n_total)
    assert n_distinct == want, "row LOSS or phantom after restart"
    assert n_total == n_distinct, "DUPLICATES after restart"
