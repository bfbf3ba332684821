"""Property checks for the round-6 statistics / text / codec wave —
invariants beyond the oracle hash (sign constraints, conservation
laws, closed-form totals)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_jobs_spark import registry
from tests.conftest import SF_DIR

QUERIES = registry.all_queries()


def test_chi_square_nonnegative(spark):
    r = QUERIES["stat_chi_square_independence"](spark, SF_DIR).collect()[0]
    assert r.chi_square >= 0.0
    assert r.dof == 16  # 5 segments x 5 priorities
    assert r.n > 0


def test_ab_test_arms_partition_users(spark):
    r = QUERIES["stat_ab_test_zscore"](spark, SF_DIR).collect()[0]
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n_users = ev.select("user_id").distinct().count()
    assert r.n_a + r.n_b == n_users
    assert 0 <= r.conv_a <= r.n_a and 0 <= r.conv_b <= r.n_b
    assert r.z_score == r.z_score  # not NaN


def test_psi_contributions_nonnegative(spark):
    # (p-q)·ln(p/q) >= 0 for every bucket, by convexity
    rows = QUERIES["dq_drift_psi"](spark, SF_DIR).collect()
    assert len(rows) == 10
    for r in rows:
        assert r.psi_contrib_micro >= 0
        assert 1 <= r.p_m <= 1000 and 1 <= r.q_m <= 1000


def test_bpe_token_bounds(spark):
    rows = QUERIES["text_bpe_tokenize"](spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    chars = {r.doc_id: r.n_chars for r in docs.collect()}
    for r in rows:
        # merging can only shrink the symbol count below the char count
        assert 0 < r.n_tokens <= chars[r.doc_id]
        assert 0 <= r.n_merged <= r.n_tokens
        assert 1 <= r.n_vocab <= r.n_tokens


def test_feature_hashing_mass_conservation(spark):
    # sum of |bucket| values across a doc == its token count exactly
    # when no collisions cancel — weaker invariant that always holds:
    # sum of bucket values has the same parity as the token count,
    # and the absolute sum is bounded by it.
    fh = QUERIES["text_hashing_trick_features"](spark, SF_DIR)
    cols = [c for c in fh.columns if c.startswith("f")]
    absum = sum(F.abs(F.col(c)) for c in cols)
    sgnsum = sum(F.col(c) for c in cols)
    docs = QUERIES["text_bpe_tokenize"](spark, SF_DIR)  # any token count
    ev = fh.select("doc_id", absum.alias("a"), sgnsum.alias("s"))
    bad = ev.filter((F.abs(F.col("s")) > F.col("a"))).count()
    assert bad == 0


def test_image_histogram_pixel_conservation(spark):
    hist = QUERIES["multimodal_image_histogram"](spark, SF_DIR)
    per_doc = hist.groupBy("doc_id").agg(F.sum("n_px").alias("n"))
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    from etl_jobs_spark.operators import multimodal as MM

    expect = {
        r.doc_id: (r.doc_id % MM.IMG_W_MOD + MM.IMG_MIN)
        * (r.doc_id % MM.IMG_H_MOD + MM.IMG_MIN)
        * 3
        for r in docs.collect()
    }
    for r in per_doc.collect():
        assert r.n == expect[r.doc_id]


def test_seasonal_profile_totals_match(spark):
    prof = QUERIES["ts_seasonal_profile"](spark, SF_DIR)
    total = prof.agg(F.sum("total_events")).collect()[0][0]
    ev_n = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    assert total == ev_n


def test_scd2_merge_preserves_users(spark):
    rows = QUERIES["scd2_merge_apply"](spark, SF_DIR).collect()
    churn = [r for r in rows if r.state == "churned" and r.is_current]
    assert len(churn) == 1
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n_changed = (
        ev.select("user_id").distinct().filter(F.col("user_id") % 3 == 0)
    ).count()
    assert churn[0].n_users == n_changed
    # every changed user has exactly one open row (the churned one)
    open_rows = sum(r.n_rows for r in rows if r.is_current)
    n_users = ev.select("user_id").distinct().count()
    assert open_rows == n_users
