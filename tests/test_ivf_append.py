"""Incremental IVF maintenance contract (operators/similarity.
append_ivf_index): appended vectors are findable, exact where probed,
and the layout stays partition-pruned — no refit, no base rewrite."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_jobs_spark.operators import similarity as SIM
from etl_jobs_spark.queries.similarity import (
    embed_cosine_topk,
    embed_ivf_append_topk,
    ivf_append_index,
)
from etl_jobs_spark.sources.readers import read_table
from tests.conftest import SF_DIR


def test_appended_vectors_are_probe_hits(spark):
    """Query each APPENDED vector's embedding (under an offset query
    id — the probe excludes vec_id == query_id self-matches): the
    appended vector must come back at rank 1 with cosine 1.0, proving
    an appended row lands in its assignment cell, which is by
    definition the query's nearest cell, so n_probe >= 1 reaches it."""
    serve, centroids = ivf_append_index(spark, SF_DIR)
    offset = 1_000_000
    appended = (
        read_table(spark, SF_DIR, "embeddings")
        .filter(F.col("vec_id") % 10 == 0)
        .orderBy("vec_id")
        .limit(8)
        .select((F.col("vec_id") + offset).alias("vec_id"), "embedding")
    )
    res = SIM.cosine_topk_ivf(spark, serve, centroids, appended).toPandas()
    top1 = res[res.rnk == 1]
    assert (top1.query_id - offset == top1.vec_id).all(), top1
    assert (top1.cosine == 1.0).all()


def test_append_recall_matches_full_index_quality(spark):
    exact = embed_cosine_topk(spark, SF_DIR).toPandas()
    approx = embed_ivf_append_topk(spark, SF_DIR).toPandas()
    recalls = []
    for qid, grp in exact.groupby("query_id"):
        truth = set(grp["vec_id"])
        got = set(approx[approx.query_id == qid]["vec_id"])
        recalls.append(len(truth & got) / len(truth))
    mean_recall = sum(recalls) / len(recalls)
    # same bar as the from-scratch index (tests/test_ivf.py): the
    # incremental path must not degrade probe quality
    assert mean_recall >= 0.3, f"mean recall {mean_recall:.2f}"
    # where probed, ranking is exact
    merged = approx.merge(
        exact, on=["query_id", "vec_id"], suffixes=("_a", "_e")
    )
    assert (merged["cosine_a"] == merged["cosine_e"]).all()


def test_appended_layout_stays_partition_pruned(spark):
    plan = (
        embed_ivf_append_topk(spark, SF_DIR)
        ._jdf.queryExecution()
        .toString()
    )
    import re

    filters = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert any("cell" in f and "INSET" in f for f in filters), filters
