"""transformWithStateInPandas (Spark 4 arbitrary stateful
processing). The API's Python side serializes state via protobuf,
which this container does not install; protobuf_compat shims in a
pure-Python runtime found on disk. The test skips only where that
probe also fails (no runtime anywhere)."""

from __future__ import annotations

import pytest

from etl_jobs_spark.protobuf_compat import ensure_protobuf

if not ensure_protobuf():
    pytest.skip("no google.protobuf runtime available", allow_module_level=True)

from pyspark.sql import functions as F

from etl_jobs_spark.queries.streaming import stream_tws_processor
from etl_jobs_spark.sources.readers import read_table
from tests.conftest import SF_DIR


def test_tws_running_totals(spark):
    got = stream_tws_processor(spark, SF_DIR).toPandas()
    want = (
        read_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")
            ).alias("total_cents"),
        )
        .toPandas()
    )
    g = got.sort_values("user_id", ignore_index=True)
    w = want.sort_values("user_id", ignore_index=True)
    assert g.equals(w)
