"""IVF ANN quality contract: recall@10 against the exact brute-force
ranking (no SQL oracle possible — k-means centroids aren't
SQL-reproducible)."""

from __future__ import annotations

from etl_jobs_spark.queries.similarity import embed_cosine_topk, embed_ivf_topk
from tests.conftest import SF_DIR


def test_ivf_recall_against_bruteforce(spark):
    exact = embed_cosine_topk(spark, SF_DIR).toPandas()
    approx = embed_ivf_topk(spark, SF_DIR).toPandas()
    assert set(approx.columns) == {"query_id", "vec_id", "cell", "cosine", "rnk"}
    recalls = []
    for qid, grp in exact.groupby("query_id"):
        truth = set(grp["vec_id"])
        got = set(approx[approx.query_id == qid]["vec_id"])
        recalls.append(len(truth & got) / len(truth))
    mean_recall = sum(recalls) / len(recalls)
    # random gaussian embeddings are a worst case for IVF (no real
    # cluster structure); probing 4/16 cells must still beat the
    # 25% random-cell baseline
    assert mean_recall >= 0.3, f"mean recall {mean_recall:.2f}"
    # within probed cells the ranking must be exact: every reported
    # neighbor's cosine matches the brute-force value
    merged = approx.merge(exact, on=["query_id", "vec_id"], suffixes=("_a", "_e"))
    assert (merged["cosine_a"] == merged["cosine_e"]).all()
