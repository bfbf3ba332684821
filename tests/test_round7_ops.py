"""Semantic contracts for round-7 operators beyond the hash oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_jobs_spark import registry
from tests.conftest import SF_DIR

QUERIES = registry.all_queries()


def test_kmeans_partitions_corpus(spark):
    rows = QUERIES["embed_kmeans_lloyd"](spark, SF_DIR).collect()
    n = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    assert sum(r.n_vecs for r in rows) == n  # every vector assigned once
    assert len(rows) == 4
    assert all(r.inertia >= 0 for r in rows)


def test_spatial_join_distance_contract(spark):
    rows = QUERIES["join_spatial_grid"](spark, SF_DIR).collect()
    from etl_jobs_spark.queries.spatial import GRID_RADIUS

    for r in rows:
        assert 0 <= r.min_dist2 <= GRID_RADIUS * GRID_RADIUS
        assert r.n_within >= 1
        assert r.a_event_id % 2 == 0 and r.nearest_b % 2 == 1


def test_m4_preserves_group_extremes(spark):
    m4 = QUERIES["ts_downsample_m4"](spark, SF_DIR)
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    truth = (
        ev.select(
            "event_type",
            F.expr(
                "unix_micros(CAST(ts AS TIMESTAMP)) DIV 3600000000"
            ).alias("bucket"),
            F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.min("cents").alias("lo"), F.max("cents").alias("hi"))
    )
    joined = m4.join(truth, ["event_type", "bucket"])
    bad = joined.filter(
        (F.col("min_cents") != F.col("lo"))
        | (F.col("max_cents") != F.col("hi"))
    ).count()
    assert bad == 0


def test_weighted_median_is_weighted_midpoint(spark):
    rows = QUERIES["agg_weighted_median"](spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    for r in rows:
        below = li.filter(
            (F.col("l_returnflag") == r.flag)
            & (
                F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)")
                <= r.weighted_median_cents
            )
        ).agg(F.sum(F.col("l_quantity").cast("bigint"))).collect()[0][0]
        assert 2 * below >= r.total_w  # at least half the weight at/below


def test_pip_counts_bounded_by_events(spark):
    rows = QUERIES["spatial_point_in_polygon"](spark, SF_DIR).collect()
    n = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    assert len(rows) == 4
    for r in rows:
        assert 0 <= r.n_points <= n


def test_stl_components_sum_back(spark):
    stl = QUERIES["ts_stl_decompose_hourly"](spark, SF_DIR)
    bad = stl.filter(
        F.col("cnt")
        != F.col("trend") + F.col("seasonal") + F.col("remainder")
    ).count()
    assert bad == 0


def test_decontam_hits_are_cross_split(spark):
    rows = QUERIES["decontam_substring_hits"](spark, SF_DIR).collect()
    assert rows, "expected natural eval-train substring hits at sf0.01"
    for r in rows:
        assert r.train_doc >= 50
        assert r.max_span_len >= 40
        assert r.total_span_chars >= r.max_span_len


def test_reservoir_sample_is_k_per_key(spark):
    rows = QUERIES["sample_reservoir_per_key"](spark, SF_DIR).collect()
    per_lang = {}
    for r in rows:
        per_lang.setdefault(r.lang, []).append(r.rk)
    for lang, rks in per_lang.items():
        assert sorted(rks) == [1, 2, 3], lang


def test_entity_resolution_contracts(spark):
    all_rows = QUERIES["pipeline_entity_resolution"](spark, SF_DIR).collect()
    # r10: every row carries the in-band cap disclosure, and exactly
    # one sentinel row (entity_id = -1, zero counts) survives even
    # when the cap empties the entity set; on the honest fixture the
    # cap never binds, so the disclosure reads zero everywhere.
    sentinels = [r for r in all_rows if r.entity_id == -1]
    rows = [r for r in all_rows if r.entity_id != -1]
    assert len(sentinels) == 1 and sentinels[0].n_records == 0
    assert all(r.capped_blocks == 0 and r.capped_pairs == 0 for r in all_rows)
    assert rows
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    n_cust = cust.count()
    keys = {r.c_custkey for r in cust.select("c_custkey").collect()}
    total_clustered = 0
    for r in rows:
        assert r.n_records >= 2  # only real clusters report
        assert r.golden_key in keys
        assert r.entity_id in keys  # min-member id is the label
        total_clustered += r.n_records
    assert total_clustered <= n_cust


def test_ks_matches_bruteforce(spark):
    r = QUERIES["dq_drift_ks"](spark, SF_DIR).collect()[0]
    import pandas as pd

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "value"
    ).toPandas()
    ev["v"] = (ev["value"] * 100).round().astype("int64")
    a = sorted(ev.loc[ev.event_id % 2 == 0, "v"])
    b = sorted(ev.loc[ev.event_id % 2 == 1, "v"])
    na, nb = len(a), len(b)
    vals = sorted(set(a) | set(b))
    import bisect

    d_num = max(
        abs(bisect.bisect_right(a, v) * nb - bisect.bisect_right(b, v) * na)
        for v in vals
    )
    assert (r.n_a, r.n_b) == (na, nb)
    assert r.d_numerator == d_num
    assert 0 <= r.ks_d_micro <= 1_000_000
