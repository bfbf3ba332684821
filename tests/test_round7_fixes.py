"""Regression tests for the round-7 advisor fixes."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_jobs_spark import registry
from etl_jobs_spark.operators import multimodal as MM
from tests.conftest import SF_DIR

QUERIES = registry.all_queries()


def test_image_histogram_non_divisor_buckets_conserve_pixels(spark):
    """n_buckets=5 (256 % 5 != 0): the former overflow bucket
    (intensity >= 5*51 = 255) must be clamped into the last bucket,
    not dropped — per-image counts still sum to W*H*channels."""
    from etl_jobs_spark.queries.multimodal import _stage_media

    media = spark.read.parquet(_stage_media(spark, SF_DIR)).limit(64)
    hist = MM.image_histogram(media, n_buckets=5)
    per_doc = {
        r.doc_id: r.n
        for r in hist.groupBy("doc_id")
        .agg(F.sum("n_px").alias("n"))
        .collect()
    }
    assert per_doc
    for doc_id, n in per_doc.items():
        w = doc_id % MM.IMG_W_MOD + MM.IMG_MIN
        h = doc_id % MM.IMG_H_MOD + MM.IMG_MIN
        assert n == w * h * 3, doc_id
    assert hist.agg(F.max("bucket")).collect()[0][0] <= 4


def test_chi_square_dof_derived_from_levels(spark):
    """dof must be (r-1)(c-1) from the DISTINCT level counts, not a
    hard-coded 5 — on the TPC-H fixture both give 16, but the shape
    is verified via the grid: 5 segments x 5 priorities."""
    r = QUERIES["stat_chi_square_independence"](spark, SF_DIR).collect()[0]
    assert r.dof == 16
    assert r.chi_square >= 0.0


def test_interval_coverage_stable_under_shuffled_input(spark):
    """Duplicate-timestamp ties must land in a deterministic island:
    recompute with the events input re-partitioned/shuffled and
    require identical per-user coverage."""
    base = {
        (r.user_id): (r.n_islands, r.coverage_sec)
        for r in QUERIES["ts_interval_coverage"](spark, SF_DIR).collect()
    }
    again = {
        (r.user_id): (r.n_islands, r.coverage_sec)
        for r in QUERIES["ts_interval_coverage"](spark, SF_DIR)
        .repartition(7)
        .collect()
    }
    assert base == again


def test_substring_spans_find_planted_prefixes(spark):
    """Every planted truncated copy (doc_id + 1e6, last 7 chars
    dropped) shares its whole text with the original — the span
    table must contain a (orig, plant) span covering ~the full
    truncated length, starting at position 1 on both sides."""
    from etl_jobs_spark.operators import dedup as DD
    from etl_jobs_spark.sources.readers import read_table

    corpus = DD.planted_corpus(
        read_table(spark, SF_DIR, "documents"), mutate=True
    )
    lens = {
        r.doc_id: r.l
        for r in corpus.select(
            "doc_id", F.length("n").alias("l")
        ).collect()
    }
    spans = QUERIES["dedup_substring_spans"](spark, SF_DIR).collect()
    by_pair = {}
    for r in spans:
        key = (r.doc_a, r.doc_b)
        by_pair[key] = max(by_pair.get(key, 0), r.span_len)
        assert r.span_len >= DD.SPAN_MIN_LEN
    found = 0
    for d in range(DD.PLANT_MAX_ID):
        plant = d + DD.PLANT_OFFSET
        if plant not in lens or lens[plant] < DD.SPAN_MIN_LEN:
            continue
        # stop-gram drops can trim a span's edges, but the planted
        # prefix must still dominate the pair's longest span
        assert by_pair.get((d, plant), 0) >= lens[plant] // 2, d
        found += 1
    assert found >= 20


def test_bpe_learn_merge_table_shape(spark):
    """8 ranked merges, no pair repeats (a merged pair's count drops
    to zero, so the greedy argmax can never pick it again), every
    symbol lowercase-alpha, counts positive."""
    rows = QUERIES["text_bpe_learn"](spark, SF_DIR).collect()
    assert [r.merge_rank for r in rows] == list(range(8))
    pairs = [(r.left_sym, r.right_sym) for r in rows]
    assert len(set(pairs)) == 8
    for r in rows:
        assert r.pair_count > 0
        assert r.left_sym.isalpha() and r.right_sym.isalpha()
