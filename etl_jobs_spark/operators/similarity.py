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


def cosine_topk_ivf(
    emb: DataFrame,
    k: int = DEFAULT_K,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF ANN: a k-means coarse quantizer (pyspark.ml) partitions
    the corpus into cells; a query scores only candidates in its
    ``n_probe`` nearest cells. The third tier of the ANN ladder
    (brute force → sign-LSH → IVF): cells adapt to the data
    distribution, and cell count scales with corpus size (k ∝ n
    keeps per-cell cost constant — see docs/SCALE.md).

    At 100 TB: fit the quantizer on a sample, write the corpus
    partitioned by ``cell``, and a probe prunes to n_probe
    partitions. Results are approximate (recall measured in
    tests/test_ivf.py), hence no SQL oracle — the driver's rows-only
    check applies.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vecs = _with_norm(emb).withColumn(
        "features", array_to_vector(F.col("embedding").cast("array<double>"))
    )
    km = KMeans(k=n_cells, seed=seed, featuresCol="features",
                predictionCol="cell")
    model = km.fit(vecs)
    assigned = model.transform(vecs).select(
        "vec_id", "embedding", "nrm", "cell"
    ).persist()

    # centroid table (tiny) — compute each query's n_probe cells
    centroids = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    spark = emb.sparkSession
    cent_df = spark.createDataFrame(
        centroids, "cell INT, centroid ARRAY<DOUBLE>"
    )
    queries = assigned.filter(F.col("vec_id").isin(*QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    cdot = (
        "aggregate(zip_with(q_emb, centroid, (x, y) -> CAST(x AS DOUBLE) * y), "
        "CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    probe = (
        queries.crossJoin(F.broadcast(cent_df))
        .withColumn("cdist", F.expr(cdot))
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
    dot = dot_unrolled("q_emb", "embedding", EMBED_DIM, "spark")
    scored = (
        F.broadcast(probe).join(assigned, "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            "cell",
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
