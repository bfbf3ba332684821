"""Property checks for the round-6 operators — invariants the
oracle hash can't state (bounds, monotonicity, internal
consistency). Oracle parity itself is covered by
tests/test_queries_oracle.py like every other query."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_jobs_spark import registry
from tests.conftest import SF_DIR

QUERIES = registry.all_queries()


def test_gini_bounds_and_totals(spark):
    rows = QUERIES["agg_gini_revenue"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # Gini of non-negative spend lies in [0, 1)
        assert 0.0 <= r.gini < 1.0
        assert r.n_customers > 0 and r.total_cents > 0


def test_interval_coverage_bounds(spark):
    df = QUERIES["ts_interval_coverage"](spark, SF_DIR)
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n_by_user = {
        r.user_id: r.n
        for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    for r in df.collect():
        n = n_by_user[r.user_id]
        # each event contributes a 1800s window; merged coverage is
        # at least one window and at most n disjoint windows
        assert 1800 <= r.coverage_sec <= n * 1800
        assert 1 <= r.n_islands <= n


def test_triangle_census_consistency(spark):
    r = QUERIES["graph_triangle_count"](spark, SF_DIR).collect()[0]
    # each triangle contains 3 wedges; wedges can't be fewer
    assert r.n_wedges >= 3 * r.n_triangles
    assert 0.0 <= r.global_clustering <= 1.0
    # handshake: wedge count implies at least the edge count's degree mass
    assert r.n_edges >= r.n_nodes - 1 or r.n_edges == 0


def test_recall_eval_bounds(spark):
    rows = QUERIES["ann_recall_eval"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_hits <= 10
        assert 0.0 <= r.recall_at_k <= 1.0
    # the IVF tier is tuned to recall >= 0.5 on the fixtures
    # (tests/test_ivf.py pins the stronger bar); the eval must agree
    mean_recall = sum(r.recall_at_k for r in rows) / len(rows)
    assert mean_recall >= 0.5


def test_rolling_median_within_frame_bounds(spark):
    df = QUERIES["ts_rolling_median_hourly"](spark, SF_DIR)
    agg = df.groupBy("event_type").agg(
        F.min("cnt").alias("lo"), F.max("cnt").alias("hi")
    )
    j = df.join(agg, "event_type").filter(
        (F.col("rolling_median") < F.col("lo"))
        | (F.col("rolling_median") > F.col("hi"))
    )
    assert j.count() == 0


def test_erasure_cascade_conservation(spark):
    rows = {
        r.table_name: r
        for r in QUERIES["governance_erasure_cascade"](spark, SF_DIR).collect()
    }
    assert set(rows) == {"customer", "orders", "lineitem", "events"}
    for r in rows.values():
        assert 0 <= r.rows_purged <= r.rows_before


def test_weighted_sample_rate_tracks_weight(spark):
    # global acceptance must be strictly between 0 and the 50% cap,
    # and sampled docs must be longer on average (weight ∝ length)
    df = QUERIES["sample_weighted_bernoulli"](spark, SF_DIR)
    t = df.agg(
        F.sum("n_docs").alias("n"),
        F.sum("n_sampled").alias("s"),
        F.sum("sampled_chars").alias("sc"),
    ).collect()[0]
    assert 0 < t.s < t.n
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    total_chars = docs.agg(F.sum("n_chars")).collect()[0][0]
    # mean chars of sampled docs >= corpus mean (longer docs favored)
    assert t.sc / t.s >= total_chars / docs.count()


def test_vacuum_report_counts(spark):
    r = QUERIES["maintenance_vacuum_report"](spark, SF_DIR).collect()[0]
    assert r.n_orphan_files == 3
    assert r.orphan_bytes == 3 * 1024
    ev_n = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    assert r.n_rows_active == ev_n


def test_mv_refresh_matches_recompute(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    full = ev.groupBy("event_type").count().collect()
    mv = (
        QUERIES["mv_incremental_refresh"](spark, SF_DIR)
        .groupBy("event_type")
        .agg(F.sum("n_events").alias("n"))
        .collect()
    )
    assert {r.event_type: r.n for r in mv} == {
        r.event_type: r["count"] for r in full
    }
