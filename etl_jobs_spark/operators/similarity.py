"""Approximate-nearest-neighbor search over embedding columns.

Beyond-reference surface (SURVEY.md §7 step 7): the reference has no
vector operations at all; an LLM-data pipeline needs similarity
search over `array<float>` embedding columns. Two strategies:

- **Brute-force top-k** (the exact baseline): broadcast the query
  set, compute cosine against every candidate, rank per query.
  The candidate scan is embarrassingly parallel; the only shuffle is
  the per-query top-k (a tiny window over ~|Q|·k rows after Spark
  pushes rank<=k down as a per-partition top-k via WindowGroupLimit).
- **Sign-LSH bucketed** (the scale path): 8 deterministic random
  hyperplanes → 8 sign bits → 256 buckets; candidates are scored
  only within the query's bucket (expected N/256 of the corpus per
  probe). At 100 TB the bucket id becomes a partition/bucketing key
  so a probe touches one partition — the same plan, just with the
  scan pruned by the bucket predicate. The IVF generalization swaps
  the hash for a k-means coarse quantizer (see
  ``dedup.embedding_cosine_pairs`` for the label-blocked variant).

All vector math is fully unrolled double arithmetic from
``hashing.py`` — fixed summation order makes results bit-identical
to the DuckDB oracle, and the expressions stay inside whole-stage
codegen (no UDFs, no Python in the hot path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_jobs_spark.operators.hashing import (
    dot_const_unrolled,
    dot_unrolled,
    hyperplanes,
    norm_unrolled,
)

EMBED_DIM = 64
N_PLANES = 8
DEFAULT_K = 10
#: Query set: a fixed, reproducible probe workload.
QUERY_IDS = (0, 1, 2, 3, 4)

_PLANES = hyperplanes(N_PLANES, EMBED_DIM)


def bucket_expr(col: str, engine: str) -> str:
    """Sign-LSH bucket id: one bit per hyperplane (dot > 0)."""
    bits = " + ".join(
        f"CASE WHEN {dot_const_unrolled(col, _PLANES[j], engine)} > 0 "
        f"THEN {1 << j} ELSE 0 END"
        for j in range(N_PLANES)
    )
    return f"CAST({bits} AS BIGINT)"


def _with_norm(emb: DataFrame) -> DataFrame:
    return emb.select(
        "vec_id",
        "embedding",
        F.expr(norm_unrolled("embedding", EMBED_DIM, "spark")).alias("nrm"),
    )


def cosine_topk_bruteforce(emb: DataFrame, k: int = DEFAULT_K) -> DataFrame:
    """Exact top-k cosine neighbors for the fixed query set.

    The query side is a handful of rows → explicit ``broadcast`` so
    the candidate scan never shuffles; ranking uses the raw
    (unrounded) cosine with vec_id tiebreak so the cut is stable."""
    vecs = _with_norm(emb)
    queries = F.broadcast(
        vecs.filter(F.col("vec_id").isin(*QUERY_IDS)).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("nrm").alias("q_nrm"),
        )
    )
    dot = dot_unrolled("q_emb", "embedding", EMBED_DIM, "spark")
    scored = (
        queries.crossJoin(vecs)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.expr(f"{dot} / (q_nrm * nrm)").alias("cos_raw"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_raw").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "query_id",
            "vec_id",
            F.round("cos_raw", 6).alias("cosine"),
            F.col("rnk").cast("long").alias("rnk"),
        )
    )


def cosine_topk_lsh(emb: DataFrame, k: int = DEFAULT_K) -> DataFrame:
    """Sign-LSH bucketed ANN: score only candidates in the query's
    bucket. The bucket equi-join replaces the cross join — at scale
    the corpus is written bucketed/partitioned by ``bucket`` and a
    probe prunes to one partition."""
    vecs = _with_norm(emb).withColumn(
        "bucket", F.expr(bucket_expr("embedding", "spark"))
    )
    queries = F.broadcast(
        vecs.filter(F.col("vec_id").isin(*QUERY_IDS)).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("nrm").alias("q_nrm"),
            F.col("bucket").alias("q_bucket"),
        )
    )
    dot = dot_unrolled("q_emb", "embedding", EMBED_DIM, "spark")
    scored = (
        queries.join(vecs, F.col("q_bucket") == F.col("bucket"))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.col("bucket"),
            F.expr(f"{dot} / (q_nrm * nrm)").alias("cos_raw"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_raw").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "query_id",
            "vec_id",
            "bucket",
            F.round("cos_raw", 6).alias("cosine"),
            F.col("rnk").cast("long").alias("rnk"),
        )
    )


#: IVF sizing: cells scale with the corpus (k ∝ n) so per-cell
#: candidate count stays ~constant as data grows — the property the
#: fixed-cell variant lacked (quadratic growth inside each cell).
IVF_TARGET_PER_CELL = 512
#: Quantizer fit sample: ~this many points per cell is plenty for a
#: coarse quantizer — the fit cost is bounded regardless of corpus
#: size (never fit k-means on 100 TB; the sample is the index).
IVF_FIT_PER_CELL = 64


def fit_quantizer(
    vecs: DataFrame,
    n_rows: int,
    n_cells: int,
    seed: int = 42,
    fit_per_cell: int = IVF_FIT_PER_CELL,
    max_iter: int = 5,
):
    """Fit the IVF coarse k-means quantizer on a SAMPLE of the
    corpus (``fit_per_cell × n_cells`` expected rows — bounded cost
    at any corpus size, so the Lloyd iterations run driver-side in
    numpy: the same shape faiss/ScaNN use, where quantizer training
    is a bounded-sample problem no matter how big the corpus is —
    never a distributed fit over the full data).

    Few iterations + sample-point init: a COARSE quantizer only
    needs roughly-balanced cells, not converged clusters.

    Returns the centroid matrix, shape (n_cells, dim) float64.
    """
    import numpy as np

    frac = min(1.0, (fit_per_cell * n_cells) / max(n_rows, 1))
    sampled = vecs.sample(False, frac, seed) if frac < 1.0 else vecs
    pts = np.array(
        [r["e"] for r in sampled.select(F.col("embedding").cast("array<double>").alias("e")).collect()],
        dtype=np.float64,
    )
    rng = np.random.default_rng(seed)
    cent = pts[rng.choice(len(pts), size=min(n_cells, len(pts)), replace=False)]
    for _ in range(max_iter):
        # argmin ||x-c||^2 = argmin |c|^2 - 2 x·c (one matmul)
        d = (cent * cent).sum(axis=1)[None, :] - 2.0 * (pts @ cent.T)
        lab = d.argmin(axis=1)
        for j in range(len(cent)):
            sel = pts[lab == j]
            if len(sel):
                cent[j] = sel.mean(axis=0)
    return cent


def assign_cells(centroids, vecs: DataFrame, keep: list[str]) -> DataFrame:
    """Map pass: attach the quantizer cell to every row via one
    Arrow-batched pandas UDF (a broadcast centroid matmul per batch
    — no shuffle, no per-row Python). Identical vectors always land
    in the same cell (numpy argmin takes the first minimum) — the
    property the planted dedup oracles rely on."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    cent = np.asarray(centroids, dtype=np.float64)
    c_sq = (cent * cent).sum(axis=1)

    def _nearest(emb):
        x = np.array(emb.tolist(), dtype=np.float64)
        d = c_sq[None, :] - 2.0 * (x @ cent.T)
        return pd.Series(d.argmin(axis=1))

    # real (non-string) annotations: `from __future__ import
    # annotations` would otherwise hide the Series hints pandas_udf
    # dispatches on
    _nearest.__annotations__ = {"emb": pd.Series, "return": pd.Series}
    nearest_cell = pandas_udf(_nearest, "int")

    return vecs.select(
        *keep, nearest_cell(F.col("embedding").cast("array<double>")).alias("cell")
    )


def build_ivf_index(
    emb: DataFrame,
    serve_dir: str,
    n_cells: int | None = None,
    target_per_cell: int = IVF_TARGET_PER_CELL,
    seed: int = 42,
    centroids=None,
):
    """Build the IVF serving layout: fit the coarse quantizer on a
    sample, assign every vector its cell (one map pass), and write
    the corpus **partitioned by cell**.

    This is the 100 TB serving design the probe relies on: a query
    touches its ``n_probe`` nearest cells as a partition-pruned scan
    (``PartitionFilters: [cell IN (...)]`` — asserted in
    tests/test_ivf.py), never the whole corpus. Index build is one
    bounded-sample fit + one linear write; k ∝ n keeps cells at
    ~``target_per_cell`` vectors as the corpus grows.

    Returns ``(centroids, n_cells)``.
    """
    if centroids is None:
        # row count from the source scan (parquet footer counts —
        # cheap; at cluster scale this is table-stats metadata, not
        # a scan)
        n = emb.count()
        if n_cells is None:
            n_cells = max(16, n // target_per_cell)
        centroids = fit_quantizer(emb, n, n_cells, seed)
    else:
        n_cells = len(centroids)
    assigned = assign_cells(
        centroids, _with_norm(emb), keep=["vec_id", "embedding", "nrm"]
    )
    # repartition by cell → one file per cell partition, the layout
    # a probe wants (AQE coalesces the tiny shuffle locally).
    (
        assigned.repartition("cell")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(serve_dir)
    )
    return centroids, n_cells


def centroid_table(spark, centroids) -> DataFrame:
    """The quantizer's centroids as a (tiny, broadcastable) table."""
    rows = [(i, [float(x) for x in c]) for i, c in enumerate(centroids)]
    return spark.createDataFrame(rows, "cell INT, centroid ARRAY<DOUBLE>")


def cosine_topk_ivf(
    spark,
    serve_dir: str,
    centroids,
    queries: DataFrame,
    k: int = DEFAULT_K,
    n_probe: int = 4,
) -> DataFrame:
    """IVF ANN probe: score only candidates in each query's
    ``n_probe`` nearest cells, read from the cell-partitioned
    serving layout with partition pruning. The third tier of the ANN
    ladder (brute force → sign-LSH → IVF): cells adapt to the data
    distribution. Results are approximate (recall measured in
    tests/test_ivf.py), hence no SQL oracle — the driver's rows-only
    check applies.

    ``queries``: (vec_id, embedding) rows — a handful of probes.
    """
    q = _with_norm(queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    # Rank cells by the SAME metric assign_cells used — Euclidean
    # argmin(|c|^2 - 2 q·c), expressed as (2 q·c - |c|^2) DESC. A raw
    # dot-product ranking silently disagrees with the assignment when
    # centroid norms vary: the query's Euclidean-nearest cell (where
    # its neighbors actually live) can fall outside the n_probe cut.
    cdot = (
        "aggregate(zip_with(q_emb, centroid, (x, y) -> CAST(x AS DOUBLE) * y), "
        "CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    c_sq = (
        "aggregate(transform(centroid, x -> x * x), "
        "CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    probe = (
        q.crossJoin(F.broadcast(centroid_table(spark, centroids)))
        .withColumn("cdist", F.expr(f"2.0 * ({cdot}) - ({c_sq})"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("cdist").desc(), F.col("cell").asc()
                )
            ),
        )
        .filter(F.col("rk") <= n_probe)
        .select("query_id", "q_emb", "q_nrm", "cell")
    )
    # The probe table is tiny (|queries|·n_probe rows) — materialize
    # it ONCE as plan literals: the cell list is what turns the
    # corpus scan into a partition-PRUNED scan (PartitionFilters, the
    # entire point of the cell-partitioned layout), and re-creating
    # the probe rows as a local DataFrame keeps the centroid-ranking
    # subplan from executing a second time inside the join.
    probe_rows = probe.collect()
    cells = sorted({r["cell"] for r in probe_rows})
    probe = spark.createDataFrame(
        probe_rows,
        "query_id BIGINT, q_emb ARRAY<DOUBLE>, q_nrm DOUBLE, cell INT",
    )
    corpus = spark.read.parquet(serve_dir).filter(F.col("cell").isin(cells))
    dot = dot_unrolled("q_emb", "embedding", EMBED_DIM, "spark")
    scored = (
        F.broadcast(probe).join(corpus, "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.col("cell").cast("int").alias("cell"),
            F.expr(f"{dot} / (q_nrm * nrm)").alias("cos_raw"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_raw").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "query_id",
            "vec_id",
            "cell",
            F.round("cos_raw", 6).alias("cosine"),
            F.col("rnk").cast("long").alias("rnk"),
        )
    )
