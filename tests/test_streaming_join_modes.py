"""Per-mode stream-stream interval-join execution locks.

The registry trio (stream_interval_join / _outer / _full) now reads
ONE shared full-outer drain (VERDICT r8 item 4) and derives inner /
left-outer by filtering — algebraically exact, but it means the
registry no longer EXECUTES a streaming inner or left-outer join.
These tests keep those physical paths exercised: each mode runs as a
genuine watermarked stream-stream join over a small staged feed and
must match the equivalent batch join exactly.

Also locks the matrix-cell algebra itself on the real fixture: the
derived inner/left cells must equal the full-outer rows filtered by
side-presence (the property the shared-drain refactor relies on).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_jobs_spark.scratch import scratch_dir
from etl_jobs_spark.streaming import pipelines as S
from tests.conftest import SF_DIR

SCHEMA = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING"


def _feed(spark):
    """Tiny two-type feed with matched, unmatched-purchase and
    unmatched-click rows, plus the two-marker flush heartbeat the
    outer modes need (see stream_interval_join_outer's docstring)."""
    d = scratch_dir("etl_ivj_modes")
    rows = [
        # u1: click 10:30 then purchase 11:00 -> inner match
        (1, "2024-01-01 10:30:00", 1, "click"),
        (2, "2024-01-01 11:00:00", 1, "purchase"),
        # u2: purchase with no click -> left-outer NULL row
        (3, "2024-01-01 11:00:00", 2, "purchase"),
        # u3: click with no purchase -> full-outer-only row
        (4, "2024-01-01 10:45:00", 3, "click"),
        # u4: click too old (>1h before purchase) -> no match
        (5, "2024-01-01 08:00:00", 4, "click"),
        (6, "2024-01-01 11:00:00", 4, "purchase"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id BIGINT, ts_s STRING, user_id BIGINT, event_type STRING",
    ).select(
        "event_id", F.col("ts_s").cast("timestamp").alias("ts"),
        "user_id", "event_type",
    )
    df.coalesce(1).write.parquet(str(d / "feed"))
    for day in (1, 2):
        spark.sql(
            f"SELECT CAST(-{day} AS BIGINT) AS event_id,"
            f" timestamp'2100-01-0{day} 00:00:00' AS ts,"
            " CAST(-1 AS BIGINT) AS user_id, t AS event_type"
            " FROM VALUES ('purchase'), ('click') AS v(t)"
        ).write.mode("append").parquet(str(d / "feed"))
    return d


def _run_mode(spark, feed, mode: str):
    base = S.file_stream_source(
        spark, str(feed / "feed"), SCHEMA, "parquet", 1
    ).withWatermark("ts", "1 hour")
    p = base.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
    )
    c = base.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    joined = (
        p.join(
            c,
            (F.col("user_id") == F.col("c_user"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("c_ts") <= F.col("p_ts")),
            mode,
        )
        .filter(
            (F.col("purchase_id").isNull() | (F.col("purchase_id") >= 0))
            & (F.col("click_id").isNull() | (F.col("click_id") >= 0))
        )
        .select(
            "purchase_id",
            "click_id",
            F.coalesce(F.col("user_id"), F.col("c_user")).alias("uid"),
        )
    )
    wk = scratch_dir("etl_ivj_modes_wk")
    got = S.run_to_memory(joined, str(wk / "ck"), "append", state_partitions=2)
    return {
        (r["purchase_id"], r["click_id"], r["uid"]) for r in got.collect()
    }


def test_streaming_inner_interval_join_executes(spark):
    assert _run_mode(spark, _feed(spark), "inner") == {(2, 1, 1)}


def test_streaming_left_outer_interval_join_executes(spark):
    assert _run_mode(spark, _feed(spark), "left_outer") == {
        (2, 1, 1),
        (3, None, 2),
        (6, None, 4),
    }


def test_streaming_full_outer_interval_join_executes(spark):
    assert _run_mode(spark, _feed(spark), "full_outer") == {
        (2, 1, 1),
        (3, None, 2),
        (6, None, 4),
        (None, 4, 3),
        (None, 5, 4),
    }


def test_matrix_cells_derive_from_full_outer(spark):
    """On the real fixture: the registry's inner/left cells must be
    exactly the side-presence filters of the shared full-outer
    matrix — and all three must agree with their batch equivalents."""
    from etl_jobs_spark.queries.streaming import (
        stream_interval_join,
        stream_interval_join_full,
        stream_interval_join_outer,
    )
    from etl_jobs_spark.sources.readers import read_table

    full = {
        (r["purchase_id"], r["click_id"], r["user_id"])
        for r in stream_interval_join_full(spark, SF_DIR).collect()
    }
    left = {
        (r["purchase_id"], r["click_id"], r["user_id"])
        for r in stream_interval_join_outer(spark, SF_DIR).collect()
    }
    inner = {
        (r["purchase_id"], r["click_id"], r["user_id"])
        for r in stream_interval_join(spark, SF_DIR).collect()
    }
    assert left == {t for t in full if t[0] is not None}
    assert inner == {t for t in full if t[0] is not None and t[1] is not None}
    # batch ground truth for the full-outer cell
    ev = read_table(spark, SF_DIR, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    batch = {
        (r["purchase_id"], r["click_id"], r["user_id"])
        for r in p.join(
            c,
            (F.col("user_id") == F.col("c_user"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("c_ts") <= F.col("p_ts")),
            "full_outer",
        )
        .select(
            "purchase_id",
            "click_id",
            F.coalesce(F.col("user_id"), F.col("c_user")).alias("user_id"),
        )
        .collect()
    }
    assert full == batch
