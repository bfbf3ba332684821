"""Streaming pipelines.

The reference's 2025 era is a poll loop: SQS message → S3 download →
pandas transform → MySQL insert → S3 archive, sleeping 1 s when idle,
never deleting messages (at-least-once-ish; ref:
src/etl_2025.py:233-263, idle backoff :238, no-delete :261-263).

Spark mapping (SURVEY §2.8):
- trigger: `processingTime="1 second"` ≈ the poll loop;
  `availableNow` = drain-and-stop (used by tests/queries so runs
  terminate);
- source: file-arrival stream on the raw prefix —
  `maxFilesPerTrigger=10` ≈ `max_messages=10` (ref:
  src/etl_2025.py:107);
- transform: the SAME batch DataFrame functions — batch/stream
  unification is free;
- sink: `foreachBatch` for the dual sink (relational insert +
  archive copy + queue notification);
- semantics: checkpointing gives exactly-once file processing —
  strictly stronger than the reference's redelivery loop
  (documented upgrade, SURVEY §7).

At scale: streaming state (windows, sessions) lives in the state
store keyed by group — watermarks bound it; without a watermark,
complete-mode aggregations are only for bounded key spaces.
"""

from __future__ import annotations

import threading
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def file_stream_source(
    spark: SparkSession,
    path: str,
    schema: str,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = 10,
    header: bool = True,
) -> DataFrame:
    """File-arrival stream (Qkey source_queue): new files under the
    raw prefix are the 'messages' (ref: src/etl_2025.py:107-119);
    `maxFilesPerTrigger` caps the per-batch fetch like
    `max_messages=10`."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    if fmt == "csv":
        reader = reader.option("header", str(header).lower())
    return reader.format(fmt).load(path)


#: Serializes every set->start->restore window below: the conf is
#: SESSION-GLOBAL, so two concurrent stream starts interleaving
#: their set/restore can leave the session parked on the streaming
#: partition count FOREVER — every later batch query then plans
#: with (say) 4 shuffle partitions, a silent 8x parallelism loss on
#: 32 cores and catastrophic on a real cluster (round-12
#: shared-session axis, streaming wave).
_START_LOCK = threading.Lock()


class _state_partitions:
    """Pin ``spark.sql.shuffle.partitions`` for the duration of one
    streaming query start.

    A stateful streaming query materializes ONE state store instance
    per shuffle partition per micro-batch (open + commit + checkpoint
    file each). The partition count is a per-query sizing decision —
    match it to key cardinality × throughput, not the session-wide
    batch default: a 1000-executor job wants thousands, a
    local-oracle drain over 10k rows wants a handful (32 stores × N
    batches of pure fixed cost otherwise). The count is baked into
    the checkpoint on first start, so it must be set BEFORE
    ``.start()`` — hence this guard, not a post-hoc repartition.

    Holds ``_START_LOCK`` across the window: the flip is
    session-global and only the brief plan+start needs the pinned
    value — started streams still RUN concurrently."""

    def __init__(self, spark: SparkSession, n: int | None):
        self.spark, self.n = spark, n

    def __enter__(self):
        # The lock is taken even for n=None starts: an unpinned start
        # planning concurrently with a pinned one would otherwise bake
        # the OTHER query's partition count into its own checkpoint
        # (round-12 ADVICE). Only pinned starts touch the conf.
        _START_LOCK.acquire()
        try:
            if self.n is not None:
                self.prev = self.spark.conf.get("spark.sql.shuffle.partitions")
                self.spark.conf.set("spark.sql.shuffle.partitions", str(self.n))
        except BaseException:
            # conf.get/set raising after acquire must not leak the
            # lock — a leaked _START_LOCK deadlocks every later
            # stream start in the session (round-12 ADVICE).
            _START_LOCK.release()
            raise

    def __exit__(self, *exc):
        try:
            if self.n is not None:
                self.spark.conf.set(
                    "spark.sql.shuffle.partitions", self.prev
                )
        finally:
            _START_LOCK.release()


def run_to_parquet(
    stream_df: DataFrame,
    checkpoint_dir: str,
    out_dir: str,
    state_partitions: int | None = None,
) -> DataFrame:
    """Drain a streaming DataFrame into a PARQUET sink with
    `availableNow` and return a schema-pinned batch scan of the
    output. Unlike the memory sink (driver-resident, re-scanned
    single-threaded), the parquet read-back is a distributed
    columnar scan — the shape consumers of a drained stream have at
    cluster scale. The round-11 64x stress measured the trio's
    memory-sink cell re-scans steepening with table size; this is
    the named production fix. Schema pinned on read: an empty feed
    drains to zero part files (round-11 empty-input axis)."""
    spark = stream_df.sparkSession
    with _state_partitions(spark, state_partitions):
        q = (
            stream_df.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.read.schema(stream_df.schema).parquet(out_dir)


def run_to_memory(
    stream_df: DataFrame,
    checkpoint_dir: str,
    output_mode: str = "append",
    state_partitions: int | None = None,
) -> DataFrame:
    """Drain a streaming DataFrame into an in-memory table with
    `availableNow` (drain-and-stop) and return the result as a batch
    DataFrame. The memory sink is a TEST/DEMO sink — production
    streams use parquet/JDBC/foreachBatch sinks below."""
    name = f"mem_{uuid.uuid4().hex[:10]}"
    spark = stream_df.sparkSession
    with _state_partitions(spark, state_partitions):
        q = (
            stream_df.writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


def windowed_counts(
    events: DataFrame, window: str = "1 hour", watermark: str | None = None
) -> DataFrame:
    """Tumbling event-time window aggregation (beyond-reference
    streaming surface; SURVEY §2.8 last row). With a watermark,
    append mode emits exactly the finalized windows
    (window_end ≤ max(ts) − delay) — late data beyond the delay is
    dropped, bounding state size at scale."""
    src = events.withWatermark("ts", watermark) if watermark else events
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sliding_window_counts(
    events: DataFrame, window: str = "1 hour", slide: str = "30 minutes"
) -> DataFrame:
    """Sliding (hopping) event-time windows — each event lands in
    window/slide overlapping windows."""
    return (
        events.groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )


def session_windows(events: DataFrame, gap: str = "5 minutes") -> DataFrame:
    """Per-user session windows with a fixed inactivity gap —
    Spark's native session_window; a new session starts when the
    inter-event gap is ≥ the threshold."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .select(
            F.col("sw.start").alias("session_start"),
            "user_id",
            "n_events",
            "session_value",
        )
    )


def foreach_batch_pipeline(
    stream_df: DataFrame,
    checkpoint_dir: str,
    batch_sinks: Callable[[DataFrame, int], None],
    state_partitions: int | None = None,
    trigger: dict | None = None,
    await_seconds: float | None = None,
    stop_when: Callable[[], bool] | None = None,
) -> None:
    """The 2025-era dual-sink loop: per micro-batch, run arbitrary
    sinks (relational insert + archive + queue notify) exactly once
    per batch id (ref: src/etl_2025.py:233-263).

    ``trigger`` defaults to ``availableNow`` (drain-and-stop, so
    oracle runs terminate); pass
    ``{"processingTime": "1 second"}`` for the reference's
    continuous poll-loop mode (ref: src/etl_2025.py:236-239), with
    ``await_seconds`` bounding the run and optional ``stop_when``
    (polled between micro-batches) ending it early — e.g. "stop
    once N batches landed" in tests, where production would run
    until redeploy."""
    with _state_partitions(stream_df.sparkSession, state_partitions):
        q = (
            stream_df.writeStream.foreachBatch(batch_sinks)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(**(trigger or {"availableNow": True}))
            .start()
        )
        if await_seconds is None:
            q.awaitTermination()
        else:
            import time

            deadline = time.monotonic() + await_seconds
            try:
                while q.isActive and time.monotonic() < deadline:
                    if stop_when is not None and stop_when():
                        break
                    time.sleep(0.25)
            finally:
                q.stop()
                q.awaitTermination(10)
