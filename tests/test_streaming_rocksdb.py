"""RocksDB state store: the 100 TB streaming-state answer.

The default HDFS-backed store keeps every key in executor memory —
fine for bounded demo state, fatal for billions of keys. Spark
ships a RocksDB provider (spilling, incremental checkpoints); this
test runs a REAL stateful query (watermarked windowed counts) on
RocksDB and checks the result matches the batch equivalent, proving
the engine's stateful operators are provider-agnostic."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_jobs_spark.sources.readers import read_table
from etl_jobs_spark.streaming import pipelines as S
from tests.conftest import SF_DIR

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def test_windowed_counts_on_rocksdb_state(spark, tmp_path):
    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB)
    try:
        ev = read_table(spark, SF_DIR, "events")
        ev.coalesce(1).write.parquet(str(tmp_path / "raw"))
        src = S.file_stream_source(
            spark,
            str(tmp_path / "raw"),
            "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
            "event_type STRING, value DOUBLE, props STRING",
            "parquet",
            None,
        )
        got = S.run_to_memory(
            S.windowed_counts(src, "1 hour"),
            str(tmp_path / "ck"),
            "complete",
            state_partitions=4,
        ).toPandas()
        want = (
            ev.groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("value"), 2).alias("total_value"),
            )
            .toPandas()
        )
        cols = sorted(got.columns)
        got = got.reindex(cols, axis=1).sort_values(by=cols, ignore_index=True)
        want = want.reindex(cols, axis=1).sort_values(by=cols, ignore_index=True)
        assert got.equals(want)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
