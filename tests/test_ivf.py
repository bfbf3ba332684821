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


def test_ivf_probe_prunes_partitions(spark):
    """The serving-layout contract: a probe reads only its n_probe
    cells — the physical scan must carry a PartitionFilters predicate
    on `cell`, not scan the whole corpus."""
    plan = embed_ivf_topk(spark, SF_DIR)._jdf.queryExecution().toString()
    import re

    # the plan has several scans (query side, centroid side); the
    # serve-layout scan is the one that must be cell-pruned
    filters = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert any("cell" in f and "INSET" in f for f in filters), (
        f"no cell INSET partition filter among {filters}"
    )


def test_quantizer_fit_is_sampled(spark, monkeypatch):
    """Guard the 100 TB property by EXERCISING it: fit_quantizer on
    a corpus much larger than its fit budget must collect only the
    bounded sample to the driver, never the full corpus."""
    from pyspark.sql import functions as F

    from etl_jobs_spark.operators.similarity import fit_quantizer

    n, n_cells, per_cell = 20_000, 4, 64  # budget: 256 of 20k rows
    vecs = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(F.rand(1), F.rand(2), F.rand(3)).alias("embedding"),
    )
    collected = []
    cls = type(vecs)  # the concrete DataFrame class this session uses
    orig = cls.collect

    def spy(self):
        rows = orig(self)
        collected.append(len(rows))
        return rows

    monkeypatch.setattr(cls, "collect", spy)
    cent = fit_quantizer(vecs, n, n_cells, fit_per_cell=per_cell)
    assert len(cent) == n_cells
    # every driver-side collect during the fit is the SAMPLE
    # (binomial around 256 rows), nowhere near the 20k corpus
    assert collected and max(collected) < 2 * per_cell * n_cells
