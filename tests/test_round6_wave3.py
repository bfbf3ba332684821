"""Property checks for the late round-6 operators (waves 7-9):
conservation laws and bound invariants the oracle hash can't state."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_jobs_spark import registry
from tests.conftest import SF_DIR

QUERIES = registry.all_queries()


def test_benford_digit_mass(spark):
    rows = QUERIES["dq_benford_first_digit"](spark, SF_DIR).collect()
    assert len(rows) == 9
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    n_pos = orders.filter(F.col("o_totalprice") > 0).count()
    assert sum(r.n for r in rows) == n_pos
    # per-mille shares sum to ~1000 (floor rounding loses < 9)
    tot_milli = sum(r.obs_milli for r in rows)
    assert 1000 - 9 <= tot_milli <= 1000
    assert all(r.dev_contrib >= 0 for r in rows)


def test_cusum_changepoint_within_series(spark):
    rows = QUERIES["ts_cusum_changepoint"](spark, SF_DIR).collect()
    assert {r.event_type for r in rows} == {
        "click", "error", "purchase", "signup", "view"
    }
    for r in rows:
        assert r.max_cusum >= 0
        assert r.n_hours > 0


def test_share_of_total_sums_per_region(spark):
    df = QUERIES["window_share_of_total"](spark, SF_DIR)
    per_region = df.groupBy("region").agg(
        F.sum("share_millis").alias("s"),
        F.count("*").alias("n"),
        F.max("rank_in_region").alias("mx"),
    )
    for r in per_region.collect():
        # floor rounding: sum in (1000 - n, 1000]
        assert 1000 - r.n < r.s <= 1000
        assert r.mx == r.n  # ranks are a permutation 1..n


def test_lateral_topn_matches_window_formulation(spark):
    from pyspark.sql import Window as W

    lat = QUERIES["join_lateral_topn"](spark, SF_DIR)
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    rk = F.row_number().over(
        W.partitionBy("o_custkey").orderBy(
            F.desc("o_totalprice"), "o_orderkey"
        )
    )
    win = (
        orders.withColumn("rk", rk)
        .filter(F.col("rk") <= 2)
        .select("o_custkey", "o_orderkey")
    )
    a = {(r.c_custkey, r.o_orderkey) for r in lat.collect()}
    b = {(r.o_custkey, r.o_orderkey) for r in win.collect()}
    assert a == b


def test_interval_suite_calendar_consistency(spark):
    df = QUERIES["fn_interval_suite"](spark, SF_DIR)
    bad = df.filter(
        (F.col("plus_3mo") <= F.col("minus_45d"))
        | (F.col("doy") < 1)
        | (F.col("doy") > 366)
        | (F.col("iso_week") < 1)
        | (F.col("iso_week") > 53)
    ).count()
    assert bad == 0


def test_langid_eval_consistent_with_classifier(spark):
    rows = QUERIES["text_langid_confusion_eval"](spark, SF_DIR).collect()
    docs_n = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert sum(r.n for r in rows) == docs_n
    correct = sum(
        r.n for r in rows if r.declared_lang == r.predicted_lang
    )
    bp = rows[0].overall_accuracy_bp
    assert bp == correct * 10000 // docs_n
    # the marker lexicon must beat 5-class chance (2000 bp) on the
    # fixtures; short synthetic docs cap it well below a real model
    assert bp > 2000


def test_quarantine_replay_conservation(spark):
    rows = {
        r.phase: r
        for r in QUERIES["pipeline_dq_quarantine_replay"](
            spark, SF_DIR
        ).collect()
    }
    ev_n = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    total = sum(r.n_rows for r in rows.values())
    assert total == ev_n
    # the repair policy fixes every failure mode the rules cover
    assert rows["still_quarantined"].n_rows == 0


def test_centroid_drift_nonnegative_and_halves(spark):
    rows = QUERIES["embed_centroid_drift"](spark, SF_DIR).collect()
    emb_n = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    assert sum(r.n_a + r.n_b for r in rows) == emb_n
    for r in rows:
        assert r.centroid_l2_drift >= 0.0
        assert r.n_a > 0 and r.n_b > 0


def test_bitmap_weekly_bounds(spark):
    rows = QUERIES["agg_bitmap_rollup_weekly"](spark, SF_DIR).collect()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    daily = (
        ev.groupBy(
            F.expr("date_trunc('week', CAST(ts AS DATE))").alias("week"),
            F.col("ts").cast("date").alias("day"),
        )
        .agg(F.countDistinct("user_id").alias("du"))
        .groupBy("week")
        .agg(F.max("du").alias("mx"), F.sum("du").alias("sm"))
    )
    bounds = {r.week: (r.mx, r.sm) for r in daily.collect()}
    for r in rows:
        mx, sm = bounds[r.week]
        # weekly uniques between the max daily and the sum of dailies
        assert mx <= r.n_users <= sm
