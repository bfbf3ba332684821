"""Empty-input robustness: every operator family must degrade to an
empty (or identity) result on empty input, never crash — the
behavior that matters when a partition filter matches nothing or an
incremental run finds no new data."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_jobs_spark.operators import dedup as DD
from etl_jobs_spark.operators import training as TR


def _empty(spark, schema):
    return spark.createDataFrame([], schema)


def test_connected_components_empty_edges(spark):
    edges = _empty(spark, "doc_a BIGINT, doc_b BIGINT")
    assert DD.connected_components(edges).count() == 0


def test_exact_dedup_empty_corpus(spark):
    corpus = _empty(spark, "doc_id BIGINT, lang STRING, n STRING")
    assert DD.exact_dedup(corpus).count() == 0
    assert TR.keep_canonical(corpus).count() == 0


def test_pack_and_gap_empty(spark):
    docs = _empty(spark, "doc_id BIGINT, lang STRING, text STRING")
    assert TR.pack_sequences(docs).count() == 0
    events = _empty(spark, "event_id BIGINT, ts TIMESTAMP, user_id BIGINT")
    assert TR.user_gap_stats(events).count() == 0


def test_scrub_and_shard_empty(spark):
    docs = _empty(spark, "doc_id BIGINT, text STRING")
    assert TR.pii_scrub(docs).count() == 0
    assert TR.shard_assign(docs).count() == 0


def test_gap_stats_single_event_user(spark):
    """A user with one event has no gaps — must vanish from the
    result, not produce a null-gap row."""
    events = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 7)],
        "event_id BIGINT, ts STRING, user_id BIGINT",
    ).withColumn("ts", F.to_timestamp("ts"))
    assert TR.user_gap_stats(events).count() == 0
