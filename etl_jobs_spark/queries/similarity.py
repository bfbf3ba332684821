"""Similarity-search query declarations (SURVEY.md §7 step 7).

Oracles share the exact unrolled vector arithmetic with the Spark
operators (``operators/hashing.py``) — fixed summation order makes
the doubles bit-identical, so ranking cuts agree too.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_jobs_spark import cache
from etl_jobs_spark.operators import similarity as SIM
from etl_jobs_spark.operators.hashing import (
    dot_unrolled,
    norm_unrolled,
)
from etl_jobs_spark.registry import register
from etl_jobs_spark.sources.readers import read_table

_QIDS = ", ".join(str(i) for i in SIM.QUERY_IDS)
_NRM = norm_unrolled("embedding", SIM.EMBED_DIM, "duckdb")
_DOT = dot_unrolled("q.q_emb", "c.embedding", SIM.EMBED_DIM, "duckdb")

_VECS = f"(SELECT vec_id, embedding, {_NRM} AS nrm FROM embeddings)"
_QUERIES = (
    f"(SELECT vec_id AS query_id, embedding AS q_emb, nrm AS q_nrm "
    f"FROM {_VECS} WHERE vec_id IN ({_QIDS}))"
)


@register(
    "embed_cosine_topk",
    oracle=f"""
    SELECT query_id, vec_id, round(cos_raw, 6) AS cosine,
           CAST(rnk AS BIGINT) AS rnk
    FROM (
      SELECT query_id, vec_id, cos_raw,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_raw DESC, vec_id ASC) AS rnk
      FROM (
        SELECT q.query_id, c.vec_id,
               {_DOT} / (q.q_nrm * c.nrm) AS cos_raw
        FROM {_QUERIES} q CROSS JOIN {_VECS} c
        WHERE c.vec_id <> q.query_id))
    WHERE rnk <= {SIM.DEFAULT_K}
    """,
)
def embed_cosine_topk(spark, sf_dir):
    """Brute-force exact cosine top-k (the ANN correctness baseline)."""
    return SIM.cosine_topk_bruteforce(read_table(spark, sf_dir, "embeddings"))


def _lsh_oracle() -> str:
    bucket = SIM.bucket_expr("embedding", "duckdb")
    vecs = (
        f"(SELECT vec_id, embedding, {_NRM} AS nrm, {bucket} AS bucket "
        f"FROM embeddings)"
    )
    queries = (
        f"(SELECT vec_id AS query_id, embedding AS q_emb, nrm AS q_nrm, "
        f"bucket AS q_bucket FROM {vecs} q0 WHERE vec_id IN ({_QIDS}))"
    )
    return f"""
    SELECT query_id, vec_id, bucket, round(cos_raw, 6) AS cosine,
           CAST(rnk AS BIGINT) AS rnk
    FROM (
      SELECT query_id, vec_id, bucket, cos_raw,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_raw DESC, vec_id ASC) AS rnk
      FROM (
        SELECT q.query_id, c.vec_id, c.bucket,
               {_DOT} / (q.q_nrm * c.nrm) AS cos_raw
        FROM {queries} q JOIN {vecs} c ON q.q_bucket = c.bucket
        WHERE c.vec_id <> q.query_id))
    WHERE rnk <= {SIM.DEFAULT_K}
    """


@register("embed_lsh_topk", oracle=_lsh_oracle())
def embed_lsh_topk(spark, sf_dir):
    """Sign-LSH bucketed ANN top-k (the 100 TB scale path: bucket id
    doubles as the storage partitioning key)."""
    return SIM.cosine_topk_lsh(read_table(spark, sf_dir, "embeddings"))


def ivf_quantizer(spark, sf_dir):
    """Coarse-quantizer centroids per corpus — the DETERMINISTIC
    engine-free fit (``SIM.fit_quantizer_file``: pyarrow-read
    bounded sample picked by an arithmetic rule, numpy Lloyd; its
    own process-wide memo). Deterministic so the same centroids can
    be embedded as literals in the IVF probe's SQL oracle (VERDICT
    r4 item 5) — and shared by every cell-map consumer
    (``dedup_embed_cosine``'s blocking key): fit once, assign
    anywhere."""
    return SIM.fit_quantizer_file(sf_dir)


def checked_embeddings(spark, sf_dir):
    """The embeddings table with the fit/probe-tier unique-id ingest
    contract verified ONCE per (session, corpus).

    require_unique_ids is an eager 3-scalar aggregate; running it at
    every query-construction made even plan-only consumers
    (explain/plan audits) pay a corpus scan per invocation (round-12
    ADVICE). The contract memoizes like the index builds: first
    touch of a corpus verifies, every later fit/probe reuses the
    verdict. A corpus that mutates in place under one session is
    outside the staging contract (same rule as the memoized
    indexes)."""
    from etl_jobs_spark.queries._shared import session_memo

    def build():
        return SIM.require_unique_ids(
            read_table(spark, sf_dir, "embeddings")
        )

    return session_memo(spark, "unique_ids_embeddings", sf_dir, build)


def ivf_index(spark, sf_dir):
    """One IVF index per (session, corpus): quantizer fit on a
    sample + cell-partitioned serving layout, built once and probed
    many times — the index-build/probe split every real ANN serving
    system has. Returns (serve_dir, centroids)."""
    from etl_jobs_spark.queries._shared import session_memo
    from etl_jobs_spark.scratch import scratch_dir

    def build():
        serve = str(scratch_dir("ivf_serve"))
        centroids = ivf_quantizer(spark, sf_dir)
        SIM.build_ivf_index(
            read_table(spark, sf_dir, "embeddings"),
            serve,
            centroids=centroids,
            assign="expr",
        )
        return serve, centroids

    return session_memo(spark, "ivf_index", sf_dir, build)


def pq_index(spark, sf_dir):
    """Memoized PQ index per (session, corpus): bounded-sample
    codebook fit + one encode pass; the codes table persists because
    every probe reads it (it IS the serving index)."""
    from etl_jobs_spark.queries._shared import session_memo

    def build():
        emb = read_table(spark, sf_dir, "embeddings")
        books = SIM.fit_pq_codebooks(emb, emb.count())
        codes = SIM.pq_encode(emb, books).persist()
        return books, codes

    return session_memo(spark, "pq_index", sf_dir, build)


def pq_index_expr(spark, sf_dir):
    """Memoized ORACLE-PARITY PQ index per (session, corpus):
    deterministic engine-free codebook fit
    (SIM.fit_pq_codebooks_file) + the expression encoder, so codes
    are bit-identical to the SQL oracle's join+window argmin. The
    numpy pandas_udf encoder (pq_index above) remains the
    cluster-scale alternative and still backs the IVF-PQ tier."""
    from etl_jobs_spark.queries._shared import session_memo

    def build():
        books = SIM.fit_pq_codebooks_file(sf_dir)
        codes = SIM.pq_codes_expr_df(
            read_table(spark, sf_dir, "embeddings"), books
        ).persist()
        return books, codes

    return session_memo(spark, "pq_index_expr", sf_dir, build)


#: sf dirs whose corpora the IVF oracle can recognize (the driver
#: grades at sf0.01, tests at sf0.001, bench at sf0.1).
_ORACLE_SF_DIRS = (
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
)


#: n_probe the registered IVF queries (and their oracles) use.
_IVF_N_PROBE = 4


def _corpus_signature(sf_dir: str) -> tuple[int, int]:
    """(row count, integer checksum) identifying a corpus — the pure
    Python twin of the SQL dispatch expression in ``_ivf_oracle``
    (same IEEE ops: float32→double, ×1e6, floor, integer sum)."""
    import math

    import pyarrow.parquet as pq

    col = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["embedding"]
    ).column("embedding")
    chk = 0
    n = 0
    for e in col.to_pylist():
        chk += int(math.floor(float(e[0]) * 1000000.0))
        n += 1
    return n, chk


def _ivf_oracle(base_only: bool) -> str:
    """Hash-checkable SQL oracle for the IVF probe (VERDICT r4 item
    5): the deterministically-fitted centroids are embedded as a
    literal VALUES table (one set per known corpus, selected by a
    count+checksum dispatch), and assignment + probe + rerank are
    reproduced with the shared fixed-evaluation-order vector math —
    ``|c|^2 - 2·(x·c)`` ranks cells, exact cosine ranks candidates —
    so every double is bit-identical to the Spark plan's.

    ``base_only=True`` yields the incremental-append variant's
    oracle: centroids frozen from the 90% base slice, assignment
    over the FULL corpus — which also PROVES append ≡ full rebuild.
    """
    import os

    rows = []
    cases = []
    for ci, d in enumerate(_ORACLE_SF_DIRS):
        if not os.path.isdir(d):
            continue
        cent = SIM.fit_quantizer_file(d, base_only=base_only)
        n, chk = _corpus_signature(d)
        cases.append(f"WHEN n = {n} AND chk = {chk} THEN {ci}")
        for cell, c in enumerate(cent):
            arr = ", ".join(SIM._lit_double(x) for x in c)
            rows.append(f"({ci}, {cell}, [{arr}])")
    d_q = SIM.cell_dist_expr("q.q_emb", "c.centroid", "duckdb")
    d_e = SIM.cell_dist_expr("e.embedding", "c.centroid", "duckdb")
    dot_qa = dot_unrolled("qc.q_emb", "a.embedding", SIM.EMBED_DIM, "duckdb")
    return f"""
    WITH cent AS (
      SELECT cell, centroid
      FROM (VALUES {", ".join(rows)}) AS t(corpus, cell, centroid)
      WHERE corpus = (
        SELECT CASE WHEN n = 0 THEN -2 {" ".join(cases)} ELSE error('unrecognized embeddings corpus: the literal-centroid oracle only knows the staged fixture corpora (round-12 dup-key axis: loud, never silently empty)') END FROM (
          SELECT count(*) AS n,
                 CAST(sum(CAST(floor(CAST(embedding[1] AS DOUBLE)
                                     * 1000000) AS BIGINT)) AS BIGINT) AS chk
          FROM embeddings))),
    q AS (SELECT vec_id AS query_id, embedding AS q_emb, {_NRM} AS q_nrm
          FROM embeddings WHERE vec_id IN ({_QIDS})),
    qc AS (
      SELECT query_id, q_emb, q_nrm, cell FROM (
        SELECT q.query_id, q.q_emb, q.q_nrm, c.cell,
               row_number() OVER (PARTITION BY q.query_id
                                  ORDER BY {d_q} ASC, c.cell ASC) AS rk
        FROM q CROSS JOIN cent c)
      WHERE rk <= {_IVF_N_PROBE}),
    a AS (
      SELECT vec_id, embedding, nrm, cell FROM (
        SELECT e.vec_id, e.embedding, {_NRM.replace("embedding", "e.embedding")} AS nrm, c.cell,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {d_e} ASC, c.cell ASC) AS rk
        FROM embeddings e CROSS JOIN cent c)
      WHERE rk = 1),
    scored AS (
      SELECT qc.query_id, a.vec_id, a.cell,
             ({dot_qa}) / (qc.q_nrm * a.nrm) AS cos_raw
      FROM qc JOIN a USING (cell)
      WHERE a.vec_id <> qc.query_id)
    SELECT query_id, vec_id, CAST(cell AS INT) AS cell,
           round(cos_raw, 6) AS cosine, CAST(rnk AS BIGINT) AS rnk
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cos_raw DESC, vec_id ASC)
                      AS rnk
          FROM scored)
    WHERE rnk <= {SIM.DEFAULT_K}
    """


@register("embed_ivf_topk", oracle=_ivf_oracle(base_only=False))
def embed_ivf_topk(spark, sf_dir):
    """IVF ANN top-k: coarse quantizer deterministically fit on a
    bounded sample, probe reads n_probe cells from the
    cell-partitioned serving layout via partition pruning
    (PartitionFilters + recall asserted in tests/test_ivf.py).
    Hash-checked since round 5: the oracle embeds the fitted
    centroids as literals and replays assignment + probe + rerank in
    fixed-evaluation-order SQL (``_ivf_oracle``)."""
    serve, centroids = ivf_index(spark, sf_dir)
    queries = (
        read_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id").isin(*SIM.QUERY_IDS))
        .select("vec_id", "embedding")
    )
    return SIM.cosine_topk_ivf(spark, serve, centroids, queries)


def ivfpq_index(spark, sf_dir):
    """Memoized IVF-PQ serving layout per (session, corpus): the PQ
    code words written INTO the IVF cell partitions — the composed
    index both structures exist to feed (faiss IVFPQ's file layout)."""
    from etl_jobs_spark.queries._shared import session_memo
    from etl_jobs_spark.scratch import scratch_dir

    def build():
        vec_serve, centroids = ivf_index(spark, sf_dir)
        books, codes = pq_index(spark, sf_dir)
        pq_serve = str(scratch_dir("ivfpq_serve"))
        SIM.build_ivfpq_index(
            read_table(spark, sf_dir, "embeddings"), codes, centroids, pq_serve
        )
        return pq_serve, vec_serve, centroids, books

    return session_memo(spark, "ivfpq_index", sf_dir, build)


def ivfpq_index_expr(spark, sf_dir):
    """Memoized ORACLE-PARITY IVF-PQ serving layout: coarse cells
    from the deterministic file-fit quantizer assigned by the
    expression path, PQ codes from the expression encoder, written
    partitioned by cell — every stored byte reproducible by the SQL
    oracle."""
    from etl_jobs_spark.queries._shared import session_memo
    from etl_jobs_spark.scratch import scratch_dir

    def build():
        emb = read_table(spark, sf_dir, "embeddings")
        centroids = SIM.fit_quantizer_file(sf_dir)
        books, codes = pq_index_expr(spark, sf_dir)
        serve = str(scratch_dir("ivfpq_serve_expr"))
        (
            SIM.assign_cells_expr(centroids, emb, keep=["vec_id"])
            .join(codes, "vec_id")
            .repartition("cell")
            .write.mode("overwrite")
            .partitionBy("cell")
            .parquet(serve)
        )
        return serve, centroids, books

    return session_memo(spark, "ivfpq_index_expr", sf_dir, build)


def ivf_append_index(spark, sf_dir):
    """Memoized incremental-ingest IVF index: built from 90% of the
    corpus, with the remaining 10% (vec_id % 10 == 0) appended
    afterwards against the frozen quantizer — the daily-ingest shape
    of a production ANN service."""
    from etl_jobs_spark.queries._shared import session_memo
    from etl_jobs_spark.scratch import scratch_dir

    def build():
        emb = read_table(spark, sf_dir, "embeddings")
        base = emb.filter(F.col("vec_id") % 10 != 0)
        # frozen quantizer fit on the BASE slice only — the
        # deterministic engine-free fit, so the append variant's
        # oracle can embed these exact centroids too
        centroids = SIM.fit_quantizer_file(sf_dir, base_only=True)
        serve = str(scratch_dir("ivf_append"))
        SIM.build_ivf_index(base, serve, centroids=centroids, assign="expr")
        SIM.append_ivf_index(
            emb.filter(F.col("vec_id") % 10 == 0), serve, centroids,
            assign="expr",
        )
        return serve, centroids

    return session_memo(spark, "ivf_append_index", sf_dir, build)


@register("embed_ivf_append_topk", oracle=_ivf_oracle(base_only=True))
def embed_ivf_append_topk(spark, sf_dir):
    """IVF ANN top-k over an INCREMENTALLY-MAINTAINED index: 90% of
    the corpus indexed up front, the rest appended later against the
    frozen quantizer (operators/similarity.append_ivf_index) — no
    refit, no base rewrite, partition pruning intact. Probes must
    surface appended vectors (tests/test_ivf_append.py asserts each
    appended query's own vector comes back at rank 1 and recall vs
    brute force holds). Hash-checked since round 5: the oracle
    embeds the frozen base-fit centroids and assigns the FULL corpus
    with them — a green row therefore also PROVES the incremental
    append produced exactly what a full rebuild would have."""
    serve, centroids = ivf_append_index(spark, sf_dir)
    queries = (
        read_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id").isin(*SIM.QUERY_IDS))
        .select("vec_id", "embedding")
    )
    return SIM.cosine_topk_ivf(spark, serve, centroids, queries)


#: Matryoshka prefix width: the truncated representation a serving
#: tier would index (EMBED_DIM=64 corpus → 4x cheaper vectors).
MRL_DIM = 16

_NRM16 = norm_unrolled("embedding", MRL_DIM, "duckdb")
_DOT16 = dot_unrolled("q.q_emb", "c.embedding", MRL_DIM, "duckdb")


@register(
    "embed_matryoshka_topk",
    oracle=f"""
    WITH vecs AS (
      SELECT vec_id, embedding, {_NRM16} AS nrm16,
             {_NRM} AS nrm64
      FROM embeddings),
    queries AS (
      SELECT vec_id AS query_id, embedding AS q_emb,
             nrm16 AS q_nrm16, nrm64 AS q_nrm64
      FROM vecs WHERE vec_id IN ({_QIDS})),
    full_k AS (
      SELECT query_id, vec_id FROM (
        SELECT q.query_id, c.vec_id,
               row_number() OVER (
                 PARTITION BY q.query_id
                 ORDER BY {_DOT} / (q.q_nrm64 * c.nrm64) DESC,
                          c.vec_id ASC) AS rnk
        FROM queries q CROSS JOIN vecs c
        WHERE c.vec_id <> q.query_id)
      WHERE rnk <= {SIM.DEFAULT_K}),
    trunc_k AS (
      SELECT query_id, vec_id, cos16, rnk FROM (
        SELECT q.query_id, c.vec_id,
               {_DOT16} / (q.q_nrm16 * c.nrm16) AS cos16,
               row_number() OVER (
                 PARTITION BY q.query_id
                 ORDER BY {_DOT16} / (q.q_nrm16 * c.nrm16) DESC,
                          c.vec_id ASC) AS rnk
        FROM queries q CROSS JOIN vecs c
        WHERE c.vec_id <> q.query_id)
      WHERE rnk <= {SIM.DEFAULT_K})
    SELECT t.query_id, t.vec_id, round(t.cos16, 6) AS cosine_trunc,
           CAST(t.rnk AS BIGINT) AS rnk,
           (f.vec_id IS NOT NULL) AS in_full_topk
    FROM trunc_k t
    LEFT JOIN full_k f
      ON t.query_id = f.query_id AND t.vec_id = f.vec_id
    """,
)
def embed_matryoshka_topk(spark, sf_dir):
    """Matryoshka-truncation retrieval evaluation: top-k under the
    16-dim PREFIX of each embedding (the representation an MRL-style
    serving tier would actually index — 4× smaller vectors, 4× the
    scan rate) with a per-neighbor flag marking whether the full
    64-dim top-k agrees. The flag column IS the quality report: its
    true-fraction is the prefix tier's recall@k, computed in the same
    pass that produces the truncated ranking. Both rankings use the
    shared fixed-evaluation-order vector math (operators/hashing.py)
    so the driver hash-checks ranking cuts AND the agreement flags
    bit-exactly. Scale shape: identical to embed_cosine_topk (tiny
    broadcast query side, one scan, TakeOrdered-style window cut) —
    the truncated dot just reads 16 of 64 array slots, which is the
    point."""
    nrm16_s = norm_unrolled("embedding", MRL_DIM, "spark", prefix=True)
    nrm64_s = norm_unrolled("embedding", SIM.EMBED_DIM, "spark")
    from pyspark.sql import Window

    emb = read_table(spark, sf_dir, "embeddings")
    vecs = emb.select(
        "vec_id",
        "embedding",
        F.expr(nrm16_s).alias("nrm16"),
        F.expr(nrm64_s).alias("nrm64"),
    )
    queries = F.broadcast(
        vecs.filter(F.col("vec_id").isin(*SIM.QUERY_IDS)).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("nrm16").alias("q_nrm16"),
            F.col("nrm64").alias("q_nrm64"),
        )
    )
    dot16 = dot_unrolled("q_emb", "embedding", MRL_DIM, "spark", prefix=True)
    dot64 = dot_unrolled("q_emb", "embedding", SIM.EMBED_DIM, "spark")
    scored = (
        queries.crossJoin(vecs)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.expr(f"{dot16} / (q_nrm16 * nrm16)").alias("cos16"),
            F.expr(f"{dot64} / (q_nrm64 * nrm64)").alias("cos64"),
        )
    )
    w16 = Window.partitionBy("query_id").orderBy(
        F.col("cos16").desc(), F.col("vec_id").asc()
    )
    w64 = Window.partitionBy("query_id").orderBy(
        F.col("cos64").desc(), F.col("vec_id").asc()
    )
    full_k = (
        scored.withColumn("rnk", F.row_number().over(w64))
        .filter(F.col("rnk") <= SIM.DEFAULT_K)
        .select(
            F.col("query_id").alias("f_query_id"),
            F.col("vec_id").alias("f_vec_id"),
        )
    )
    trunc_k = scored.withColumn("rnk", F.row_number().over(w16)).filter(
        F.col("rnk") <= SIM.DEFAULT_K
    )
    return (
        trunc_k.join(
            F.broadcast(full_k),
            (trunc_k.query_id == full_k.f_query_id)
            & (trunc_k.vec_id == full_k.f_vec_id),
            "left",
        )
        .select(
            "query_id",
            "vec_id",
            F.round("cos16", 6).alias("cosine_trunc"),
            F.col("rnk").cast("long").alias("rnk"),
            F.col("f_vec_id").isNotNull().alias("in_full_topk"),
        )
    )


def _pq_oracle() -> str:
    """Hash-checkable SQL oracle for the PQ-ADC probe — the PQ twin
    of ``_ivf_oracle``: deterministically-fitted codebooks embedded
    as a literal VALUES table (per known corpus, count+checksum
    dispatch), encoding reproduced as a join+window argmin over
    (vector × codebook) rows, the ADC rank key assembled with the
    one-row-per-term conditional-sum pivot so its 8 additions happen
    in the same fixed order as Spark's fold, then the identical
    shortlist cut and exact-cosine rerank. Every float op matches
    the expression encoder (operators/similarity.py
    ``pq_codes_expr_df`` / ``cosine_topk_pq_expr``) bit-for-bit."""
    import os

    m, ksub = SIM.PQ_M, SIM.PQ_KSUB
    d = SIM.EMBED_DIM // m
    rows = []
    cases = []
    for ci, sf in enumerate(_ORACLE_SF_DIRS):
        if not os.path.isdir(sf):
            continue
        books = SIM.fit_pq_codebooks_file(sf)
        n, chk = _corpus_signature(sf)
        cases.append(f"WHEN n = {n} AND chk = {chk} THEN {ci}")
        for i, book in enumerate(books):
            for j, c in enumerate(book):
                s = 0.0
                for x in c:
                    s += x * x
                arr = ", ".join(SIM._lit_double(x) for x in c)
                rows.append(
                    f"({ci}, {i}, {j}, {SIM._lit_double(s)}, [{arr}])"
                )
    # fixed-order dot of the normalized subvector against b.sub
    sub_dot = " + ".join(
        f"(CAST(v.embedding[(b.i * {d}) + {t + 1}] AS DOUBLE) / v.nrm)"
        f" * b.sub[{t + 1}]"
        for t in range(d)
    )
    q_dot = " + ".join(
        f"(CAST(q.q_emb[(b.i * {d}) + {t + 1}] AS DOUBLE) / q.q_nrm)"
        f" * b.sub[{t + 1}]"
        for t in range(d)
    )
    adc_pivot = " + ".join(
        f"sum(CASE WHEN i = {i} THEN term END)" for i in range(m)
    )
    dot_qa = dot_unrolled("q.q_emb", "a.embedding", SIM.EMBED_DIM, "duckdb")
    return f"""
    WITH books AS (
      SELECT i, j, csq, sub
      FROM (VALUES {", ".join(rows)}) AS t(corpus, i, j, csq, sub)
      WHERE corpus = (
        SELECT CASE WHEN n = 0 THEN -2 {" ".join(cases)} ELSE error('unrecognized embeddings corpus: the literal-centroid oracle only knows the staged fixture corpora (round-12 dup-key axis: loud, never silently empty)') END FROM (
          SELECT count(*) AS n,
                 CAST(sum(CAST(floor(CAST(embedding[1] AS DOUBLE)
                                     * 1000000) AS BIGINT)) AS BIGINT) AS chk
          FROM embeddings))),
    vecs AS (SELECT vec_id, embedding, {_NRM} AS nrm FROM embeddings),
    codes AS (
      SELECT vec_id, i, j AS code FROM (
        SELECT v.vec_id, b.i, b.j,
               row_number() OVER (PARTITION BY v.vec_id, b.i
                                  ORDER BY b.csq - 2.0 * ({sub_dot}) ASC,
                                           b.j ASC) AS rk
        FROM vecs v CROSS JOIN books b)
      WHERE rk = 1),
    q AS (SELECT vec_id AS query_id, embedding AS q_emb, nrm AS q_nrm
          FROM vecs WHERE vec_id IN ({_QIDS})),
    terms AS (
      SELECT q.query_id, c.vec_id, c.i,
             b.csq - 2.0 * ({q_dot}) AS term
      FROM q CROSS JOIN codes c
      JOIN books b ON b.i = c.i AND b.j = c.code
      WHERE c.vec_id <> q.query_id),
    adc AS (
      SELECT query_id, vec_id, ({adc_pivot}) AS adc
      FROM terms GROUP BY query_id, vec_id),
    short AS (
      SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY adc ASC, vec_id ASC) AS srnk
        FROM adc)
      WHERE srnk <= {SIM.DEFAULT_K * SIM.PQ_SHORTLIST_FACTOR}),
    scored AS (
      SELECT s.query_id, s.vec_id,
             ({dot_qa}) / (q.q_nrm * a.nrm) AS cos_raw
      FROM short s
      JOIN vecs a ON s.vec_id = a.vec_id
      JOIN q ON s.query_id = q.query_id)
    SELECT query_id, vec_id, round(cos_raw, 6) AS cosine,
           CAST(rnk AS BIGINT) AS rnk
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cos_raw DESC, vec_id ASC)
                      AS rnk
          FROM scored)
    WHERE rnk <= {SIM.DEFAULT_K}
    """


@register("embed_pq_topk", oracle=_pq_oracle())
def embed_pq_topk(spark, sf_dir):
    """Product-quantization ANN top-k: ~6-byte code words ADC-scored
    by a JVM aggregate() against constant-folded codebook literals,
    then exact rerank of the k×20 shortlist — the faiss IVFADC
    shape. HASH-CHECKED since round 5 (was rows-only): codebooks are
    fit deterministically engine-free, the encoder is a codegen
    projection bit-identical to the oracle's join+window argmin, and
    the ADC rank key drops the per-query ‖q‖² constant so its fixed
    8-term sum is SQL-reproducible (``_pq_oracle``). Recall vs brute
    force stays pinned in tests/test_pq.py."""
    books, codes = pq_index_expr(spark, sf_dir)
    return SIM.cosine_topk_pq_expr(
        read_table(spark, sf_dir, "embeddings"), books, codes
    )


def _ivfpq_oracle() -> str:
    """Hash-checkable SQL oracle for the IVF-PQ probe — the ladder's
    top tier composed from the two proven fragments: the coarse
    centroid dispatch + probe/assignment CTEs of ``_ivf_oracle`` and
    the codebook dispatch + encode/ADC CTEs of ``_pq_oracle``, with
    ADC candidates restricted to each query's probed cells."""
    import os

    m, ksub = SIM.PQ_M, SIM.PQ_KSUB
    d = SIM.EMBED_DIM // m
    cent_rows, book_rows, cases = [], [], []
    for ci, sf in enumerate(_ORACLE_SF_DIRS):
        if not os.path.isdir(sf):
            continue
        n, chk = _corpus_signature(sf)
        cases.append(f"WHEN n = {n} AND chk = {chk} THEN {ci}")
        for cell, c in enumerate(SIM.fit_quantizer_file(sf)):
            arr = ", ".join(SIM._lit_double(x) for x in c)
            cent_rows.append(f"({ci}, {cell}, [{arr}])")
        for i, book in enumerate(SIM.fit_pq_codebooks_file(sf)):
            for j, c in enumerate(book):
                s = 0.0
                for x in c:
                    s += x * x
                arr = ", ".join(SIM._lit_double(x) for x in c)
                book_rows.append(
                    f"({ci}, {i}, {j}, {SIM._lit_double(s)}, [{arr}])"
                )
    d_q = SIM.cell_dist_expr("q.q_emb", "c.centroid", "duckdb")
    d_e = SIM.cell_dist_expr("v.embedding", "c.centroid", "duckdb")
    sub_dot = " + ".join(
        f"(CAST(v.embedding[(b.i * {d}) + {t + 1}] AS DOUBLE) / v.nrm)"
        f" * b.sub[{t + 1}]"
        for t in range(d)
    )
    q_dot = " + ".join(
        f"(CAST(qc.q_emb[(b.i * {d}) + {t + 1}] AS DOUBLE) / qc.q_nrm)"
        f" * b.sub[{t + 1}]"
        for t in range(d)
    )
    adc_pivot = " + ".join(
        f"sum(CASE WHEN i = {i} THEN term END)" for i in range(m)
    )
    dot_qa = dot_unrolled("q.q_emb", "a.embedding", SIM.EMBED_DIM, "duckdb")
    return f"""
    WITH corpus_id AS (
      SELECT CASE WHEN n = 0 THEN -2 {" ".join(cases)} ELSE error('unrecognized embeddings corpus: the literal-centroid oracle only knows the staged fixture corpora (round-12 dup-key axis: loud, never silently empty)') END AS ci FROM (
        SELECT count(*) AS n,
               CAST(sum(CAST(floor(CAST(embedding[1] AS DOUBLE)
                                   * 1000000) AS BIGINT)) AS BIGINT) AS chk
        FROM embeddings)),
    cent AS (
      SELECT cell, centroid
      FROM (VALUES {", ".join(cent_rows)}) AS t(corpus, cell, centroid)
      WHERE corpus = (SELECT ci FROM corpus_id)),
    books AS (
      SELECT i, j, csq, sub
      FROM (VALUES {", ".join(book_rows)}) AS t(corpus, i, j, csq, sub)
      WHERE corpus = (SELECT ci FROM corpus_id)),
    vecs AS (SELECT vec_id, embedding, {_NRM} AS nrm FROM embeddings),
    q AS (SELECT vec_id AS query_id, embedding AS q_emb, nrm AS q_nrm
          FROM vecs WHERE vec_id IN ({_QIDS})),
    qc AS (
      SELECT query_id, q_emb, q_nrm, cell FROM (
        SELECT q.query_id, q.q_emb, q.q_nrm, c.cell,
               row_number() OVER (PARTITION BY q.query_id
                                  ORDER BY {d_q} ASC, c.cell ASC) AS rk
        FROM q CROSS JOIN cent c)
      WHERE rk <= {_IVF_N_PROBE}),
    acell AS (
      SELECT vec_id, cell FROM (
        SELECT v.vec_id, c.cell,
               row_number() OVER (PARTITION BY v.vec_id
                                  ORDER BY {d_e} ASC, c.cell ASC) AS rk
        FROM vecs v CROSS JOIN cent c)
      WHERE rk = 1),
    codes AS (
      SELECT vec_id, i, j AS code FROM (
        SELECT v.vec_id, b.i, b.j,
               row_number() OVER (PARTITION BY v.vec_id, b.i
                                  ORDER BY b.csq - 2.0 * ({sub_dot}) ASC,
                                           b.j ASC) AS rk
        FROM vecs v CROSS JOIN books b)
      WHERE rk = 1),
    terms AS (
      SELECT qc.query_id, cd.vec_id, ac.cell, cd.i,
             b.csq - 2.0 * ({q_dot}) AS term
      FROM qc
      JOIN acell ac ON ac.cell = qc.cell
      JOIN codes cd ON cd.vec_id = ac.vec_id
      JOIN books b ON b.i = cd.i AND b.j = cd.code
      WHERE ac.vec_id <> qc.query_id),
    adc AS (
      SELECT query_id, vec_id, cell, ({adc_pivot}) AS adc
      FROM terms GROUP BY query_id, vec_id, cell),
    short AS (
      SELECT query_id, vec_id, cell FROM (
        SELECT query_id, vec_id, cell,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY adc ASC, vec_id ASC) AS srnk
        FROM adc)
      WHERE srnk <= {SIM.DEFAULT_K * SIM.PQ_SHORTLIST_FACTOR}),
    scored AS (
      SELECT s.query_id, s.vec_id, s.cell,
             ({dot_qa}) / (q.q_nrm * a.nrm) AS cos_raw
      FROM short s
      JOIN vecs a ON s.vec_id = a.vec_id
      JOIN q ON s.query_id = q.query_id)
    SELECT query_id, vec_id, CAST(cell AS INT) AS cell,
           round(cos_raw, 6) AS cosine, CAST(rnk AS BIGINT) AS rnk
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cos_raw DESC, vec_id ASC)
                      AS rnk
          FROM scored)
    WHERE rnk <= {SIM.DEFAULT_K}
    """


@register("embed_ivfpq_topk", oracle=_ivfpq_oracle())
def embed_ivfpq_topk(spark, sf_dir):
    """IVF-PQ ANN top-k — the ladder's top tier: coarse cells prune
    the scan (PartitionFilters on the cell-partitioned code layout),
    PQ-ADC scores the survivors from ~6-byte code words
    (constant-folded codebook literals + JVM aggregate, no Python in
    the scan), exact cosine reranks the shortlist. A probe reads
    n_probe partitions of code words plus a shortlist of full
    vectors — at 100 TB that's MBs touched per query, not TBs.
    HASH-CHECKED since round 5 (was rows-only): both index
    structures are deterministically fit engine-free and every float
    op in assignment, encoding, probe ranking and the ADC shortlist
    cut is shared with the SQL oracle (``_ivfpq_oracle``); recall vs
    brute force stays pinned in tests/test_ivfpq.py."""
    serve, centroids, books = ivfpq_index_expr(spark, sf_dir)
    return SIM.cosine_topk_ivfpq_expr(
        spark,
        serve,
        read_table(spark, sf_dir, "embeddings"),
        centroids,
        books,
        n_probe=_IVF_N_PROBE,
    )


def _ann_recall_oracle() -> str:
    """Recall@k of the IVF tier against the exact baseline, stated
    entirely from the two already-registered oracles (nested as
    CTEs) — the eval is only as trustworthy as its inputs, and here
    both inputs are the driver-verified SQL restatements."""
    from etl_jobs_spark.registry import _REGISTRY

    ivf = _REGISTRY["embed_ivf_topk"].oracle
    exact = _REGISTRY["embed_cosine_topk"].oracle
    return f"""
    WITH ivf AS ({ivf}),
    exact AS ({exact})
    SELECT e.query_id,
           CAST(count(i.vec_id) AS BIGINT) AS n_hits,
           round(CAST(count(i.vec_id) AS DOUBLE) / {SIM.DEFAULT_K}, 4)
             AS recall_at_k
    FROM exact e LEFT JOIN ivf i
      ON e.query_id = i.query_id AND e.vec_id = i.vec_id
    GROUP BY e.query_id
    """


@register("ann_recall_eval", oracle=_ann_recall_oracle())
def ann_recall_eval(spark, sf_dir):
    """ANN index QUALITY EVALUATION as a first-class job: per-query
    recall@k of the IVF probe against the exact brute-force top-k —
    the metric that gates an index build before it serves traffic
    (the eval harness every retrieval pipeline schedules next to its
    index refresh). Composes the two registered operators and joins
    their result sets on (query, neighbor); recall is the matched
    fraction of the exact set. Scale shape: the expensive inputs are
    the operators themselves (each already scale-shaped and
    hash-verified); the eval adds one equi-join over q·k rows —
    negligible at any corpus size, so recall can be recomputed on
    every index rebuild. The driver row pins the eval END-TO-END:
    both inputs AND the recall arithmetic are restated in SQL."""
    ivf = embed_ivf_topk(spark, sf_dir).select("query_id", "vec_id")
    exact = embed_cosine_topk(spark, sf_dir).select("query_id", "vec_id")
    e, i = exact.alias("e"), ivf.alias("i")
    joined = e.join(
        i,
        (F.col("e.query_id") == F.col("i.query_id"))
        & (F.col("e.vec_id") == F.col("i.vec_id")),
        "left",
    )
    return joined.groupBy(F.col("e.query_id").alias("query_id")).agg(
        F.count(F.col("i.vec_id")).alias("n_hits"),
        F.round(
            F.count(F.col("i.vec_id")).cast("double") / SIM.DEFAULT_K, 4
        ).alias("recall_at_k"),
    )


#: Fixed-point grid shared with embed_centroid_labels' discipline:
#: quantize components BEFORE summing so both engines' centroid
#: integers are exact under any aggregation order.
_DRIFT_SCALE = 1_000_000


@register(
    "embed_centroid_drift",
    oracle=f"""
    WITH q AS (
      SELECT label, vec_id % 2 AS half,
             generate_subscripts(embedding, 1) - 1 AS dim,
             CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                        * {_DRIFT_SCALE} + 0.5) AS BIGINT) AS qv
      FROM embeddings),
    means AS (
      SELECT label, dim,
             CAST(sum(CASE WHEN half = 0 THEN qv END)
                  // sum(CASE WHEN half = 0 THEN 1 END) AS BIGINT)
               AS m_a,
             CAST(sum(CASE WHEN half = 1 THEN qv END)
                  // sum(CASE WHEN half = 1 THEN 1 END) AS BIGINT)
               AS m_b
      FROM q GROUP BY 1, 2),
    ssd AS (
      SELECT label,
             CAST(sum((m_a - m_b) * (m_a - m_b)) AS BIGINT) AS s
      FROM means GROUP BY 1),
    halves AS (
      SELECT label,
             CAST(count(DISTINCT CASE WHEN vec_id % 2 = 0
                                      THEN vec_id END) AS BIGINT) AS n_a,
             CAST(count(DISTINCT CASE WHEN vec_id % 2 = 1
                                      THEN vec_id END) AS BIGINT) AS n_b
      FROM embeddings GROUP BY 1)
    SELECT h.label, h.n_a, h.n_b,
           round(sqrt(CAST(s.s AS DOUBLE)) / {_DRIFT_SCALE}, 6)
             AS centroid_l2_drift
    FROM halves h JOIN ssd s ON h.label = s.label
    """,
)
def embed_centroid_drift(spark, sf_dir):
    """EMBEDDING drift monitor — the vector counterpart of
    dq_drift_psi's scalar PSI: per label, the L2 distance between
    the centroid of one half of the corpus (even vec_ids, standing
    in for last week's embeddings) and the other (odd ids, this
    week's) — the cheap first alarm that an embedding distribution
    moved (model update, upstream content shift) before any index
    rebuild. Bit-exact under distribution: components quantize to a
    fixed-point integer grid BEFORE summing (per-dim means are
    integer divisions of exact sums — no float-summation order
    anywhere), the squared-diff sum is exact BIGINT, and the only
    float ops are one sqrt + divide. Scale shape: one explode +
    (label, dim)-keyed aggregation — the same cost as one centroid
    build; the drift table is |labels| rows."""
    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.select(
        "label",
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode("embedding").alias("dim", "comp"),
    ).select(
        "label",
        "half",
        "dim",
        F.expr(
            f"CAST(floor(CAST(comp AS DOUBLE) * {_DRIFT_SCALE} + 0.5)"
            " AS BIGINT)"
        ).alias("qv"),
    )
    means = q.groupBy("label", "dim").agg(
        F.expr(
            "CAST(sum(CASE WHEN half = 0 THEN qv END)"
            " DIV sum(CASE WHEN half = 0 THEN 1 END) AS BIGINT)"
        ).alias("m_a"),
        F.expr(
            "CAST(sum(CASE WHEN half = 1 THEN qv END)"
            " DIV sum(CASE WHEN half = 1 THEN 1 END) AS BIGINT)"
        ).alias("m_b"),
    )
    ssd = means.groupBy("label").agg(
        F.sum((F.col("m_a") - F.col("m_b")) * (F.col("m_a") - F.col("m_b")))
        .cast("bigint")
        .alias("s")
    )
    halves = emb.groupBy("label").agg(
        F.countDistinct(
            F.when(F.col("vec_id") % 2 == 0, F.col("vec_id"))
        ).alias("n_a"),
        F.countDistinct(
            F.when(F.col("vec_id") % 2 == 1, F.col("vec_id"))
        ).alias("n_b"),
    )
    return halves.join(ssd, "label").select(
        "label",
        "n_a",
        "n_b",
        F.round(
            F.sqrt(F.col("s").cast("double")) / _DRIFT_SCALE, 6
        ).alias("centroid_l2_drift"),
    )


#: Lloyd k-means: cluster count, iteration budget, and the integer
#: quantization scale (embedding -> micro-units). ALL distance and
#: centroid arithmetic is exact BIGINT — k-means is famously
#: aggregation-order-sensitive in floats, so the quantized form is
#: what makes the fit bit-reproducible cross-engine (and cross-run
#: on a cluster, where partial-sum order is nondeterministic).
_KM_K = 4
_KM_ROUNDS = 3
_KM_SCALE = 1_000_000


def _km_quant(engine: str) -> str:
    """array<float> -> array<bigint> micro-unit quantization."""
    if engine == "spark":
        return (
            "transform(embedding, x -> "
            f"CAST(round(CAST(x AS DOUBLE) * {_KM_SCALE}) AS BIGINT))"
        )
    return (
        "list_transform(embedding, x -> "
        f"CAST(round(CAST(x AS DOUBLE) * {_KM_SCALE}) AS BIGINT))"
    )


def _kmeans_oracle() -> str:
    """The oracle RE-LEARNS the clustering: long-form (vec_id, dim,
    q) vectors, {_KM_ROUNDS} unrolled assign+update rounds, final
    assignment stats. Integer division is truncation-toward-zero in
    both engines (verified); sums stay exact BIGINTs."""
    parts = [
        f"""chk AS ({SIM.unique_ids_check_sql()}),
    v AS (
      SELECT vec_id, CAST(d AS INT) AS d, q FROM (
        SELECT vec_id, unnest({_km_quant("duckdb")}) AS q,
               generate_subscripts(embedding, 1) AS d
        FROM embeddings
        WHERE (SELECT ok FROM chk) = 1)),
    c0 AS (
      SELECT vec_id AS cid, d, q AS c FROM v
      WHERE vec_id < {_KM_K})"""
    ]
    for r in range(_KM_ROUNDS):
        parts.append(
            f"""d{r} AS (
      SELECT v.vec_id, c.cid,
             CAST(sum((v.q - c.c) * (v.q - c.c)) AS BIGINT) AS dist
      FROM v JOIN c{r} c USING (d)
      GROUP BY v.vec_id, c.cid),
    a{r} AS (
      SELECT vec_id, cid, dist FROM (
        SELECT vec_id, cid, dist,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY dist ASC, cid ASC) AS rk
        FROM d{r})
      WHERE rk = 1),
    c{r + 1} AS (
      SELECT a.cid, v.d,
             CAST(CAST(sum(v.q) AS BIGINT) // count(*) AS BIGINT) AS c
      FROM a{r} a JOIN v ON v.vec_id = a.vec_id
      GROUP BY a.cid, v.d)"""
        )
    R = _KM_ROUNDS
    parts.append(
        f"""df AS (
      SELECT v.vec_id, c.cid,
             CAST(sum((v.q - c.c) * (v.q - c.c)) AS BIGINT) AS dist
      FROM v JOIN c{R} c USING (d)
      GROUP BY v.vec_id, c.cid),
    af AS (
      SELECT vec_id, cid, dist FROM (
        SELECT vec_id, cid, dist,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY dist ASC, cid ASC) AS rk
        FROM df)
      WHERE rk = 1),
    sig AS (
      SELECT cid, CAST(sum(c) AS BIGINT) AS c_sum,
             CAST(sum(abs(c)) AS BIGINT) AS c_absum
      FROM c{R} GROUP BY cid)"""
    )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT af.cid AS cluster_id,
           CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(sum(af.dist) AS BIGINT) AS inertia,
           max(sig.c_sum) AS c_sum,
           max(sig.c_absum) AS c_absum
    FROM af JOIN sig ON sig.cid = af.cid
    GROUP BY af.cid"""
    )


@register("embed_kmeans_lloyd", oracle=_kmeans_oracle())
def embed_kmeans_lloyd(spark, sf_dir):
    """Distributed Lloyd k-means FIT over the embedding corpus —
    the clustering step behind IVF index building, corpus topic
    bucketing, and diversity sampling, here as a first-class
    oracle-verified operator (the IVF queries consume pre-exported
    centroids; this one LEARNS them, and the oracle independently
    re-learns the identical fit). Integer discipline end-to-end:
    vectors quantize to micro-unit BIGINTs, distances are exact
    integer sums, centroid updates are integer mean (truncating
    division — identical in both engines), argmin tie-breaks on
    cluster id. Scale shape per round: ONE broadcast-literal
    assignment projection (centroids ride into the closure as k·dim
    literals — no join, no shuffle for assignment) + ONE
    posexplode/groupBy(cid, dim) partial-agg shuffle for the
    update + a k·dim-row collect. Driver state is k·dim ints per
    round — the bounded-driver-data pattern of the BPE learner and
    the IVF fit. At 100 TB: assignment is map-only over the corpus,
    the update shuffle carries k·dim partial sums per task, and
    round count is fixed.

    Unique-vec_id ingest contract (round-12 duplicate-key axis): a
    fit over a corpus where one id carries two rows silently
    corrupts init seeding and assignment tie-breaks — fails loudly
    in BOTH engines instead."""
    emb = checked_embeddings(spark, sf_dir)
    return kmeans_lloyd_fit(emb)


def kmeans_lloyd_fit(emb, k=_KM_K, rounds=_KM_ROUNDS):
    """Integer Lloyd fit over any DataFrame with (vec_id,
    embedding array<float>) — separated from the fixture read so
    tests/test_kmeans_property.py can cross-check against a
    pure-Python reference with the identical integer rules."""
    spark = emb.sparkSession
    # persist the quantized corpus: the fit consumes qdf rounds+2
    # times (init collect, one assignment+update pass per round, the
    # final assignment), and without the cache every pass re-scans
    # parquet and re-quantizes (guide §5: reused AND recompute is a
    # full corpus pass — the textbook persist case for an iterative
    # fit). Measured at sf0.1: 2.4s -> 1.9s warm end-to-end.
    # MEMORY_AND_DISK default spills rather than OOMs at real scale.
    # cache.track (not a raw persist) so release_all() between
    # bench/sweep queries actually frees it — a raw persist here
    # pinned a new copy of the corpus per invocation (ADVICE r15)
    # and let run 2 of the retime pass silently reuse run 1's blocks.
    qdf = cache.track(
        emb.select("vec_id", F.expr(_km_quant("spark")).alias("q"))
    )
    by_id = {
        r.vec_id: list(r.q)
        for r in qdf.filter(F.col("vec_id") < k).collect()
    }
    # cents: ordered [(cid, vector)] — cid labels are STABLE across
    # rounds (an empty cluster drops out without renumbering the
    # rest, mirroring the oracle's grouped update exactly).
    cents = [(int(i), by_id[i]) for i in sorted(by_id)]
    if not cents:
        # empty corpus -> no init points -> no clusters; the oracle's
        # grouped re-fit over the same empty table is also empty
        # (round-11 empty-input axis)
        return spark.createDataFrame(
            [],
            "cluster_id INT, n_vecs BIGINT, inertia BIGINT, "
            "c_sum BIGINT, c_absum BIGINT",
        )

    def lit_arr(vals):
        return "array(" + ",".join(f"{v}L" for v in vals) + ")"

    def assign_expr(cs):
        structs = ", ".join(
            "struct(aggregate(zip_with(q, "
            + lit_arr(c)
            + ", (x, y) -> (x - y) * (x - y)), 0L, "
            "(acc, v) -> acc + v) AS dist, "
            f"{cid} AS cid)"
            for cid, c in cs
        )
        return f"array_min(array({structs}))"

    dim = len(cents[0][1])
    for _ in range(rounds):
        assigned = qdf.select(
            "vec_id", "q", F.expr(assign_expr(cents)).alias("best")
        )
        upd = (
            assigned.select(
                F.col("best.cid").alias("cid"),
                F.posexplode("q").alias("d", "qv"),
            )
            .groupBy("cid", "d")
            .agg(
                F.sum("qv").alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .select("cid", "d", F.expr("CAST(s DIV n AS BIGINT)").alias("c"))
            .collect()
        )
        new = {}
        for row in upd:
            new.setdefault(row.cid, [0] * dim)[row.d] = row.c
        cents = [(cid, new[cid]) for cid in sorted(new)]

    final = qdf.select(
        "vec_id", F.expr(assign_expr(cents)).alias("best")
    )
    stats = final.groupBy(F.col("best.cid").alias("cluster_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.sum("best.dist").cast("long").alias("inertia"),
    )
    sig = spark.createDataFrame(
        [
            (cid, int(sum(c)), int(sum(abs(x) for x in c)))
            for cid, c in cents
        ],
        "cluster_id int, c_sum long, c_absum long",
    )
    return stats.join(F.broadcast(sig), "cluster_id").select(
        "cluster_id", "n_vecs", "inertia", "c_sum", "c_absum"
    )


#: Power-iteration PCA constants: micro-unit quantization reuses
#: _KM_SCALE; the iterate is renormalized to max-abs _PCA_VS and the
#: per-vector dot is right-shifted by _PCA_SHIFT before the second
#: product so every sum stays far inside BIGINT (bound stated in the
#: docstring).
_PCA_VS = 1_000_000
_PCA_SHIFT = 4_194_304  # 2^22
_PCA_ITERS = 3
#: Renormalization branch point: above this max-abs the upscale
#: divides the DIVISOR down (w DIV (m DIV VS)) instead of
#: multiplying w up (w * VS DIV m), because w * VS would overflow
#: BIGINT — |w| reaches ~1e16 at 2k vectors (observed: the sf0.1
#: fixture overflowed the multiply; sf0.01 passed only on headroom).
#: Below it the multiply is exact and safe (|w| <= m < 1e12 so
#: w * VS < 1e18). Same truncating integer ops in both engines.
_PCA_BIG = 1_000_000_000_000  # 1e12


def _pca_oracle() -> str:
    parts = [
        f"""lf AS (
      SELECT vec_id, CAST(d AS INT) AS d, q FROM (
        SELECT vec_id, unnest({_km_quant("duckdb")}) AS q,
               generate_subscripts(embedding, 1) AS d
        FROM embeddings)),
    v0 AS (
      SELECT d, CAST({_PCA_VS} AS BIGINT) AS v
      FROM (SELECT DISTINCT d FROM lf))"""
    ]
    for r in range(_PCA_ITERS):
        parts.append(
            f"""t{r} AS (
      SELECT lf.vec_id,
             CAST(sum(lf.q * v{r}.v) // {_PCA_SHIFT} AS BIGINT) AS t
      FROM lf JOIN v{r} USING (d) GROUP BY lf.vec_id),
    w{r} AS (
      SELECT d, CAST(sum(lf.q * t{r}.t) AS BIGINT) AS w
      FROM lf JOIN t{r} USING (vec_id) GROUP BY d),
    m{r} AS (SELECT max(abs(w)) AS m FROM w{r}),
    v{r + 1} AS (
      SELECT d, CAST(CASE WHEN m >= {_PCA_BIG}
                          THEN w // (m // {_PCA_VS})
                          ELSE w * {_PCA_VS} // m END AS BIGINT) AS v
      FROM w{r}, m{r})"""
        )
    R = _PCA_ITERS
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT vf.d AS d, vf.v AS loading_scaled, wl.w AS w_last
    FROM v{R} vf JOIN w{R - 1} wl USING (d)"""
    )


@register("embed_pca_power_iter", oracle=_pca_oracle())
def embed_pca_power_iter(spark, sf_dir):
    """Top PRINCIPAL COMPONENT of the embedding corpus by {_PCA_ITERS}
    unrolled POWER ITERATIONS on X'X, entirely in exact integers:
    micro-unit quantized vectors (the integer-Lloyd discipline), the
    all-ones start, and per iteration (1) per-vector dot q.v,
    right-shifted 22 bits, (2) the d-dim co-product sum(q * t),
    (3) max-abs renormalization to 1e6 — truncating division is
    toward-zero in both engines, so the iterate is bit-identical and
    the oracle RE-RUNS the same three iterations. Overflow bound:
    |q| <= 1e6, |v| <= 1e6, dim 64 => |dot| <= 6.4e13, t <= 1.6e7,
    |w| <= n * 1.6e13 — the SUMS are safe to n ~ 5e5 vectors
    (beyond that raise _PCA_SHIFT, the float-free analogue of norm
    scaling); the renormalization branches on m >= _PCA_BIG so the
    upscale never forms w * 1e6 when w is already large (the sf0.1
    fixture overflowed that multiply at just 2k vectors — the sums
    were fine, the renorm product was not).
    Scale shape: X'X is NEVER materialized (d^2 would be
    fine, but n x d^2 intermediate wouldn't) — each iteration is two
    corpus joins: long-form x broadcast-v (64 rows), then the
    vec-keyed re-join for the co-product, both combinable
    aggregations; the iterate itself is always 64 rows. Ref: the
    classic two-pass matvec decomposition of power iteration
    (Halko/Martinsson/Tropp randomized-SVD literature)."""
    emb = read_table(spark, sf_dir, "embeddings")
    lf = cache.track(
        emb.select(
            "vec_id",
            F.posexplode(F.expr(_km_quant("spark"))).alias("d", "q"),
        )
    )
    v = (
        lf.select("d")
        .distinct()
        .select("d", F.lit(_PCA_VS).cast("bigint").alias("v"))
    )
    w = None
    for _ in range(_PCA_ITERS):
        t = (
            lf.join(F.broadcast(v), "d")
            .groupBy("vec_id")
            .agg(
                F.expr(
                    f"CAST(sum(q * v) DIV {_PCA_SHIFT} AS BIGINT)"
                ).alias("t")
            )
        )
        # Eager 64-row checkpoint per iteration (optimization r15,
        # guide §2.4/§5 lineage truncation): w feeds BOTH m and v,
        # and v feeds BOTH the next iteration's t and the final
        # join, so the lazily-composed loop duplicated the whole
        # per-iteration subtree ~2x per branch — the final plan
        # re-ran the two corpus joins for every duplicated copy
        # (measured: 164 Spark jobs / 4.8s at sf0.1 before; ~20
        # jobs after; identical integers — localCheckpoint changes
        # lineage, not arithmetic). The iterate is always exactly
        # `dim` rows, so the checkpoint materializes 64 rows.
        w = (
            lf.join(t, "vec_id")
            .groupBy("d")
            .agg(F.sum(F.col("q") * F.col("t")).cast("bigint").alias("w"))
            .localCheckpoint(eager=True)
        )
        m = w.agg(F.max(F.abs(F.col("w"))).alias("m"))
        v = w.crossJoin(F.broadcast(m)).select(
            "d",
            F.expr(
                f"CAST(CASE WHEN m >= {_PCA_BIG}"
                f" THEN w DIV (m DIV {_PCA_VS})"
                f" ELSE w * {_PCA_VS} DIV m END AS BIGINT)"
            ).alias("v"),
        )
    # posexplode is 0-based; the oracle's generate_subscripts is
    # 1-based — internal joins are self-consistent, only the output
    # key needs the +1 alignment.
    return v.join(w.withColumnRenamed("w", "w_last"), "d").select(
        (F.col("d") + 1).cast("int").alias("d"),
        F.col("v").alias("loading_scaled"),
        "w_last",
    )


# ---------------------------------------------------------------- #
# Quantized serving rungs: int8 scalar quantization + 1-bit binary #
# ---------------------------------------------------------------- #

_SQ_LEVELS = 127  # symmetric int8 code range [-127, 127]
_BIN_SHORTLIST = 50  # Hamming shortlist size before exact rerank


def _sq8_maxabs_cols(engine: str) -> str:
    """Per-dimension max-|x| over the corpus — the scalar
    quantizer's 64-value 'codebook' (one row)."""
    return ", ".join(
        f"max(abs(embedding[{i}])) AS m{i}"
        for i in range(1, SIM.EMBED_DIM + 1)
    )


def _sq8_code(engine: str, vec: str, i: int) -> str:
    """int8 code for one dimension: trunc-toward-zero of
    x * 127 / maxabs_dim (identical double arithmetic; Spark CAST
    truncates, DuckDB needs the explicit trunc())."""
    q = (
        f"CAST({vec}[{i}] AS DOUBLE) * {_SQ_LEVELS}.0 / "
        f"(CASE WHEN mm.m{i} > 0 THEN CAST(mm.m{i} AS DOUBLE) "
        f"ELSE 1.0 END)"
    )
    inner = f"trunc({q})" if engine == "duckdb" else q
    return f"CAST({inner} AS BIGINT)"


def _sq8_oracle() -> str:
    mx = f"(SELECT {_sq8_maxabs_cols('duckdb')} FROM embeddings)"
    codes = ", ".join(
        f"{_sq8_code('duckdb', 'v.embedding', i)} AS c{i}"
        for i in range(1, SIM.EMBED_DIM + 1)
    )
    qdot = " + ".join(
        f"q.c{i} * c.c{i}" for i in range(1, SIM.EMBED_DIM + 1)
    )
    return f"""
    WITH mx AS {mx},
    codes AS (
      SELECT v.vec_id, v.embedding, {_NRM.replace('embedding', 'v.embedding')} AS nrm, {codes}
      FROM embeddings v, mx mm),
    qs AS (SELECT * FROM codes WHERE vec_id IN ({_QIDS}))
    SELECT query_id, vec_id, qdot, round(cos_raw, 6) AS cosine,
           CAST(rnk AS BIGINT) AS rnk
    FROM (
      SELECT query_id, vec_id, qdot, cos_raw,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY qdot DESC, vec_id ASC) AS rnk
      FROM (
        SELECT q.vec_id AS query_id, c.vec_id,
               CAST({qdot} AS BIGINT) AS qdot,
               {dot_unrolled('q.embedding', 'c.embedding', SIM.EMBED_DIM, 'duckdb')} / (q.nrm * c.nrm) AS cos_raw
        FROM qs q JOIN codes c ON c.vec_id <> q.vec_id))
    WHERE rnk <= {SIM.DEFAULT_K}
    """


@register("embed_sq8_topk", oracle=_sq8_oracle())
def embed_sq8_topk(spark, sf_dir):
    """INT8 SCALAR-QUANTIZED ANN rung (the FAISS-SQ8 idea, public):
    per-dimension symmetric quantization x -> trunc(x*127/maxabs_d)
    shrinks each vector 4x (64 int8 codes vs 64 floats) and turns
    the scoring scan into an exact INTEGER dot product — BIGINT
    ranking, so the top-k cut is hash-stable with no float ordering
    anywhere on the ranking path (exact cosine is carried for
    display only). |code| <= 127 so |qdot| <= 64*127^2 ~ 1.03e6 —
    no overflow headroom needed. Scale shape: the quantizer 'fit'
    is ONE combinable 64-column max aggregate (a single row,
    broadcast back); encoding is map-only zip_with; the probe scan
    reads 64 B/vector instead of 256 B and stays whole-stage
    codegen. At cluster scale the codes column is written alongside
    the embedding at ingest and the probe never touches the float
    vectors except for the final-k rerank fetch."""
    emb = read_table(spark, sf_dir, "embeddings")
    mx = F.broadcast(
        emb.agg(
            F.array(
                *[
                    F.max(F.abs(F.element_at("embedding", i)))
                    .cast("double")
                    .alias(f"m{i}")
                    for i in range(1, SIM.EMBED_DIM + 1)
                ]
            ).alias("mx")
        )
    )
    code = (
        "zip_with(embedding, mx, (x, m) -> CAST(CAST(x AS DOUBLE)"
        f" * {_SQ_LEVELS}.0D / (CASE WHEN m > 0.0D THEN m ELSE 1.0D END)"
        " AS BIGINT))"
    )
    vecs = emb.crossJoin(mx).select(
        "vec_id",
        "embedding",
        F.expr(norm_unrolled("embedding", SIM.EMBED_DIM, "spark")).alias(
            "nrm"
        ),
        F.expr(code).alias("codes"),
    )
    queries = F.broadcast(
        vecs.filter(F.col("vec_id").isin(*SIM.QUERY_IDS)).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("nrm").alias("q_nrm"),
            F.col("codes").alias("q_codes"),
        )
    )
    qdot = (
        "aggregate(zip_with(q_codes, codes, (a, b) -> a * b),"
        " 0L, (acc, x) -> acc + x)"
    )
    cos = (
        dot_unrolled("q_emb", "embedding", SIM.EMBED_DIM, "spark")
        + " / (q_nrm * nrm)"
    )
    from pyspark.sql import Window as W

    scored = (
        queries.crossJoin(vecs)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.expr(qdot).cast("bigint").alias("qdot"),
            F.expr(cos).alias("cos_raw"),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("qdot").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= SIM.DEFAULT_K)
        .select(
            "query_id",
            "vec_id",
            "qdot",
            F.round("cos_raw", 6).alias("cosine"),
            F.col("rnk").cast("long").alias("rnk"),
        )
    )


def _bin_pack(engine: str, vec: str, start: int) -> str:
    """Pack 32 sign bits (dims start..start+31, 1-based) into one
    BIGINT, MSB-first — pure additive arithmetic on the DuckDB side
    (no dialect bitwise ops), a fold on the Spark side (same value:
    Horner MSB-first == the weighted bit sum)."""
    if engine == "spark":
        return (
            f"aggregate(slice({vec}, {start}, 32), 0L, "
            "(acc, x) -> acc * 2 + (CASE WHEN x >= CAST(0.0 AS FLOAT)"
            " THEN 1L ELSE 0L END))"
        )
    return (
        "("
        + " + ".join(
            f"CASE WHEN {vec}[{start + j}] >= 0 THEN {1 << (31 - j)} ELSE 0 END"
            for j in range(32)
        )
        + ")"
    )


def _bin_oracle() -> str:
    from etl_jobs_spark.operators.hashing import popcount_unrolled, xor_expr

    vecs = (
        f"(SELECT vec_id, embedding, {_NRM} AS nrm, "
        f"CAST({_bin_pack('duckdb', 'embedding', 1)} AS BIGINT) AS b_lo, "
        f"CAST({_bin_pack('duckdb', 'embedding', 33)} AS BIGINT) AS b_hi "
        f"FROM embeddings)"
    )
    ham = (
        f"({popcount_unrolled('x_lo', 32)} + "
        f"{popcount_unrolled('x_hi', 32)})"
    )
    return f"""
    WITH vecs AS (SELECT * FROM {vecs}),
    qs AS (SELECT vec_id AS query_id, embedding AS q_emb, nrm AS q_nrm,
                  b_lo AS q_lo, b_hi AS q_hi
           FROM vecs WHERE vec_id IN ({_QIDS})),
    pairs AS (
      SELECT query_id, vec_id, q_emb, q_nrm, embedding, nrm,
             {xor_expr('q_lo', 'b_lo', 'duckdb')} AS x_lo,
             {xor_expr('q_hi', 'b_hi', 'duckdb')} AS x_hi
      FROM qs JOIN vecs c ON c.vec_id <> qs.query_id),
    shortlist AS (
      SELECT query_id, vec_id, q_emb, q_nrm, embedding, nrm,
             CAST({ham} AS BIGINT) AS hamming,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY {ham} ASC, vec_id ASC) AS hrnk
      FROM pairs)
    SELECT query_id, vec_id, hamming, round(cos_raw, 6) AS cosine,
           CAST(rnk AS BIGINT) AS rnk
    FROM (
      SELECT query_id, vec_id, hamming, cos_raw,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_raw DESC, vec_id ASC) AS rnk
      FROM (
        SELECT query_id, vec_id, hamming,
               {dot_unrolled('q_emb', 'embedding', SIM.EMBED_DIM, 'duckdb')} / (q_nrm * nrm) AS cos_raw
        FROM shortlist WHERE hrnk <= {_BIN_SHORTLIST}))
    WHERE rnk <= {SIM.DEFAULT_K}
    """


@register("embed_binary_hamming_topk", oracle=_bin_oracle())
def embed_binary_hamming_topk(spark, sf_dir):
    """1-BIT BINARY-QUANTIZED ANN rung (sign-bit compaction +
    Hamming shortlist + exact rerank — the public binary-embedding
    serving pattern): each 64-dim float vector collapses to TWO
    BIGINTs of sign bits (32x smaller than the float vector), the
    shortlist scan ranks candidates by Hamming distance (integer —
    hash-stable cut, vec_id tiebreak), and only the top
    {_BIN_SHORTLIST} per query are reranked by exact cosine for the
    final k. Packing is an MSB-first fold (Spark) == weighted bit
    sum (DuckDB, pure additive arithmetic); Hamming is
    popcount(xor) over each 32-bit half via the dialect-neutral
    shift-and-mask popcount. Scale shape: the Hamming scan reads
    16 B/vector — at 100 TB of embeddings that is ~0.4 TB of packed
    codes, a map-only broadcast-query scan with no shuffle; the
    rerank refetches floats for shortlist x queries rows only. The
    fixture carries the full vectors through the shortlist window
    instead of re-fetching — at cluster scale the rerank is an
    id-equi-join against the float table (the IVF probe's fetch
    pattern)."""
    emb = read_table(spark, sf_dir, "embeddings")
    vecs = emb.select(
        "vec_id",
        "embedding",
        F.expr(norm_unrolled("embedding", SIM.EMBED_DIM, "spark")).alias(
            "nrm"
        ),
        F.expr(_bin_pack("spark", "embedding", 1)).alias("b_lo"),
        F.expr(_bin_pack("spark", "embedding", 33)).alias("b_hi"),
    )
    queries = F.broadcast(
        vecs.filter(F.col("vec_id").isin(*SIM.QUERY_IDS)).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("nrm").alias("q_nrm"),
            F.col("b_lo").alias("q_lo"),
            F.col("b_hi").alias("q_hi"),
        )
    )
    from etl_jobs_spark.operators.hashing import (
        popcount_unrolled,
        xor_expr,
    )
    from pyspark.sql import Window as W

    pairs = (
        queries.crossJoin(vecs)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            "q_emb",
            "q_nrm",
            "embedding",
            "nrm",
            F.expr(xor_expr("q_lo", "b_lo", "spark")).alias("x_lo"),
            F.expr(xor_expr("q_hi", "b_hi", "spark")).alias("x_hi"),
        )
    )
    ham = (
        f"CAST({popcount_unrolled('x_lo', 32)} + "
        f"{popcount_unrolled('x_hi', 32)} AS BIGINT)"
    )
    hw = W.partitionBy("query_id").orderBy(
        F.col("hamming").asc(), F.col("vec_id").asc()
    )
    shortlist = (
        pairs.withColumn("hamming", F.expr(ham))
        .withColumn("hrnk", F.row_number().over(hw))
        .filter(F.col("hrnk") <= _BIN_SHORTLIST)
    )
    cos = (
        dot_unrolled("q_emb", "embedding", SIM.EMBED_DIM, "spark")
        + " / (q_nrm * nrm)"
    )
    rw = W.partitionBy("query_id").orderBy(
        F.col("cos_raw").desc(), F.col("vec_id").asc()
    )
    return (
        shortlist.select(
            "query_id", "vec_id", "hamming", F.expr(cos).alias("cos_raw")
        )
        .withColumn("rnk", F.row_number().over(rw))
        .filter(F.col("rnk") <= SIM.DEFAULT_K)
        .select(
            "query_id",
            "vec_id",
            "hamming",
            F.round("cos_raw", 6).alias("cosine"),
            F.col("rnk").cast("long").alias("rnk"),
        )
    )


def _quantized_recall_oracle() -> str:
    """Recall@k of the two QUANTIZED rungs (int8 scalar, 1-bit
    binary) against the exact baseline — same nested-oracle
    discipline as _ann_recall_oracle: every input is a
    driver-verified SQL restatement, and the eval arithmetic is
    pinned end-to-end."""
    from etl_jobs_spark.registry import _REGISTRY

    sq8 = _REGISTRY["embed_sq8_topk"].oracle
    bin_ = _REGISTRY["embed_binary_hamming_topk"].oracle
    exact = _REGISTRY["embed_cosine_topk"].oracle

    def tier(name: str, cte: str) -> str:
        return f"""
      SELECT '{name}' AS tier, e.query_id,
             CAST(count(a.vec_id) AS BIGINT) AS n_hits,
             round(CAST(count(a.vec_id) AS DOUBLE) / {SIM.DEFAULT_K}, 4)
               AS recall_at_k
      FROM exact e LEFT JOIN {cte} a
        ON a.query_id = e.query_id AND a.vec_id = e.vec_id
      GROUP BY e.query_id"""

    return f"""
    WITH sq8 AS ({sq8}),
    bin AS ({bin_}),
    exact AS ({exact})
    {tier('sq8', 'sq8')}
    UNION ALL
    {tier('binary', 'bin')}
    """


@register("ann_quantized_recall_eval", oracle=_quantized_recall_oracle())
def ann_quantized_recall_eval(spark, sf_dir):
    """RECALL@k SELF-AUDIT for the two quantized serving rungs —
    extends the ann_recall_eval discipline (every approximate tier
    ships with its own eval against the exact anchor) to the int8
    scalar-quantized and 1-bit binary-Hamming rungs: per (tier,
    query), the fraction of the exact cosine top-k the quantized
    ranking reproduces. The number that decides how much fidelity
    the 4×/32× compression actually costs BEFORE the index serves
    traffic. Composes three registered operators; the eval adds two
    q·k equi-joins — negligible at any scale, recomputable on every
    re-encode."""
    exact = embed_cosine_topk(spark, sf_dir).select("query_id", "vec_id")

    def tier(name: str, df):
        a = df.select("query_id", "vec_id").alias("a")
        e = exact.alias("e")
        return (
            e.join(
                a,
                (F.col("a.query_id") == F.col("e.query_id"))
                & (F.col("a.vec_id") == F.col("e.vec_id")),
                "left",
            )
            .groupBy(F.col("e.query_id").alias("query_id"))
            .agg(
                F.count(F.col("a.vec_id")).cast("bigint").alias("n_hits"),
                F.round(
                    F.count(F.col("a.vec_id")).cast("double")
                    / SIM.DEFAULT_K,
                    4,
                ).alias("recall_at_k"),
            )
            .select(
                F.lit(name).alias("tier"),
                "query_id",
                "n_hits",
                "recall_at_k",
            )
        )

    return tier("sq8", embed_sq8_topk(spark, sf_dir)).unionAll(
        tier("binary", embed_binary_hamming_topk(spark, sf_dir))
    )


# ---------------------------------------------------------------- #
# MMR diversified retrieval: greedy re-rank, unrolled iterations   #
# ---------------------------------------------------------------- #

#: Hard ceiling on rows the MMR greedy stage may collect to the
#: driver (rel shortlist + pairwise sims across all queries). With
#: the defaults (3 queries, C=20) the actual volume is ~1.2k rows;
#: the limit leaves two orders of magnitude of headroom while still
#: rejecting any edit that would turn the collect into a
#: corpus-sized transfer. Mirrors CC_DRIVER_EDGE_LIMIT
#: (operators/dedup.py).
MMR_DRIVER_PAIR_LIMIT = 200_000

_MMR_C = 20  # candidate pool per query (by exact cosine)
_MMR_K = 5  # diversified picks per query
_MMR_SCALE = 1_000_000  # micro-unit cosine quantization
_MMR_L_REL = 7  # lambda = 0.7 as integer weights: 7*rel - 3*div
_MMR_L_DIV = 3


def _mmr_quant(cos_expr: str) -> str:
    """Micro-unit quantized cosine (floor(x*1e6 + 0.5) — the
    _DRIFT_SCALE discipline), so every MMR score is an exact
    BIGINT."""
    return f"CAST(floor(({cos_expr}) * {_MMR_SCALE} + 0.5) AS BIGINT)"


def _mmr_oracle(keep_cte: str = "") -> str:
    """Unrolled-round MMR oracle. ``keep_cte``, when given, is a CTE
    body selecting the doc_id set the CANDIDATE corpus is restricted
    to (probe queries always come from the full table — the serving
    shape: user query vs curated index)."""
    nrm = _NRM
    dotqc = dot_unrolled("q.q_emb", "c.embedding", SIM.EMBED_DIM, "duckdb")
    dotab = dot_unrolled("a.emb", "b.emb", SIM.EMBED_DIM, "duckdb")
    cand_join = "JOIN vecs c ON c.vec_id <> q.query_id"
    keep_parts = []
    if keep_cte:
        keep_parts = [f"keep AS MATERIALIZED ({keep_cte})"]
        cand_join += " JOIN keep k ON k.doc_id = c.vec_id"
    parts = keep_parts + [
        f"chk AS ({SIM.unique_ids_check_sql()})",
        f"""vecs AS MATERIALIZED (
      SELECT vec_id, embedding, {nrm} AS nrm FROM embeddings
      WHERE (SELECT ok FROM chk) = 1)""",
        f"""qs AS MATERIALIZED (
      SELECT vec_id AS query_id, embedding AS q_emb, nrm AS q_nrm
      FROM vecs WHERE vec_id IN ({_QIDS}))""",
        f"""cand AS MATERIALIZED (
      SELECT query_id, vec_id, emb, rel FROM (
        SELECT q.query_id, c.vec_id, c.embedding AS emb,
               {_mmr_quant(f'{dotqc} / (q.q_nrm * c.nrm)')} AS rel,
               row_number() OVER (
                 PARTITION BY q.query_id
                 ORDER BY {dotqc} / (q.q_nrm * c.nrm) DESC,
                          c.vec_id ASC) AS rn
        FROM qs q {cand_join})
      WHERE rn <= {_MMR_C})""",
        f"""sims AS MATERIALIZED (
      SELECT a.query_id, a.vec_id AS va, b.vec_id AS vb,
             {_mmr_quant(
                 f'{dotab} / (sqrt({dot_unrolled("a.emb", "a.emb", SIM.EMBED_DIM, "duckdb")})'
                 f' * sqrt({dot_unrolled("b.emb", "b.emb", SIM.EMBED_DIM, "duckdb")}))'
             )} AS sim
      FROM cand a JOIN cand b
        ON a.query_id = b.query_id AND a.vec_id <> b.vec_id)""",
        f"""sel1 AS MATERIALIZED (
      SELECT query_id, vec_id, rel, CAST(1 AS BIGINT) AS sel_round
      FROM (
        SELECT query_id, vec_id, rel,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY rel DESC, vec_id ASC) AS rn
        FROM cand)
      WHERE rn = 1)""",
    ]
    prev = "sel1"
    for r in range(2, _MMR_K + 1):
        parts.append(
            f"""pick{r} AS MATERIALIZED (
      SELECT query_id, vec_id, rel, CAST({r} AS BIGINT) AS sel_round
      FROM (
        SELECT c.query_id, c.vec_id, c.rel,
               row_number() OVER (
                 PARTITION BY c.query_id
                 ORDER BY {_MMR_L_REL} * c.rel - {_MMR_L_DIV} * mx.maxsim DESC,
                          c.vec_id ASC) AS rn
        FROM cand c
        JOIN (
          SELECT s.query_id, s.va AS vec_id, max(s.sim) AS maxsim
          FROM sims s
          JOIN {prev} p ON p.query_id = s.query_id AND p.vec_id = s.vb
          GROUP BY 1, 2) mx
          ON mx.query_id = c.query_id AND mx.vec_id = c.vec_id
        WHERE NOT EXISTS (
          SELECT 1 FROM {prev} p2
          WHERE p2.query_id = c.query_id AND p2.vec_id = c.vec_id))
      WHERE rn = 1)"""
        )
        parts.append(
            f"""sel{r} AS MATERIALIZED (
      SELECT * FROM {prev} UNION ALL SELECT * FROM pick{r})"""
        )
        prev = f"sel{r}"
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"\n    SELECT query_id, vec_id, rel AS rel_micro, sel_round"
        f" FROM {prev}"
    )


def _mmr_select(spark, sf_dir, keep=None):
    """Distributed candidate cut + pairwise sims, driver-coordinated
    greedy (see embed_mmr_diversified_topk). ``keep``: optional
    DataFrame of doc_id the CANDIDATE corpus is restricted to.

    Serving requires unique vec_ids (round-12 duplicate-key axis:
    the greedy's driver dicts dedup (q, v) keys where SQL would not
    — loud ingest contract instead, mirrored in the oracle; the
    check is memoized per (session, corpus) via
    checked_embeddings)."""
    from pyspark.sql import Window as W

    emb = checked_embeddings(spark, sf_dir)
    vecs = emb.select(
        "vec_id",
        "embedding",
        F.expr(norm_unrolled("embedding", SIM.EMBED_DIM, "spark")).alias(
            "nrm"
        ),
    )
    queries = F.broadcast(
        vecs.filter(F.col("vec_id").isin(*SIM.QUERY_IDS)).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("nrm").alias("q_nrm"),
        )
    )
    cands_src = vecs
    if keep is not None:
        cands_src = vecs.join(
            keep.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi"
        )
    dotqc = dot_unrolled("q_emb", "embedding", SIM.EMBED_DIM, "spark")
    cw = W.partitionBy("query_id").orderBy(
        F.col("cos_raw").desc(), F.col("vec_id").asc()
    )
    cand = cache.track(
        queries.crossJoin(cands_src)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.col("embedding").alias("emb"),
            F.expr(f"{dotqc} / (q_nrm * nrm)").alias("cos_raw"),
        )
        .withColumn("rn", F.row_number().over(cw))
        .filter(F.col("rn") <= _MMR_C)
        .select(
            "query_id",
            "vec_id",
            "emb",
            F.expr(_mmr_quant("cos_raw")).alias("rel"),
        )
    )
    a = cand.select(
        "query_id", F.col("vec_id").alias("va"), F.col("emb").alias("ea")
    )
    b = cand.select(
        F.col("query_id").alias("qb"),
        F.col("vec_id").alias("vb"),
        F.col("emb").alias("eb"),
    )
    dotab = dot_unrolled("ea", "eb", SIM.EMBED_DIM, "spark")
    na = norm_unrolled("ea", SIM.EMBED_DIM, "spark")
    nb = norm_unrolled("eb", SIM.EMBED_DIM, "spark")
    sims = cache.track(
        a.join(
            b,
            (F.col("qb") == F.col("query_id"))
            & (F.col("vb") != F.col("va")),
        ).select(
            "query_id",
            "va",
            "vb",
            F.expr(_mmr_quant(f"{dotab} / ({na} * {nb})")).alias("sim"),
        )
    )
    # Driver-side bound pin (VERDICT r13 item 6, same contract as
    # CC_DRIVER_EDGE_LIMIT in operators/dedup.py): the greedy MMR
    # fold collects the per-query shortlist rel rows plus up to
    # C*(C-1) sim pairs per query. Both are structurally capped by
    # the rn <= _MMR_C window filter above, but the cap must FAIL
    # LOUDLY if a future edit widens the shortlist or the query set
    # — a silent OOM on the driver is the one failure mode this
    # stage is not allowed to have at scale.
    n_queries_mmr = len(SIM.QUERY_IDS)
    rel_cap = n_queries_mmr * _MMR_C
    pair_cap = n_queries_mmr * _MMR_C * (_MMR_C - 1)
    if rel_cap + pair_cap > MMR_DRIVER_PAIR_LIMIT:
        raise RuntimeError(
            f"MMR driver-side shortlist would collect up to "
            f"{rel_cap + pair_cap} rows (queries={n_queries_mmr}, "
            f"C={_MMR_C}) > MMR_DRIVER_PAIR_LIMIT="
            f"{MMR_DRIVER_PAIR_LIMIT}; shrink the shortlist or move "
            "the greedy fold into applyInPandas per query group"
        )
    # Measured check AFTER collect (ADVICE r14): the static
    # rel_cap+pair_cap pre-check above already rejects any config
    # whose collect could be corpus-sized, so counting the plans
    # first only recomputed the full shortlist and pairwise-sim
    # stages to learn a number len() gives for free.
    rel_rows = cand.select("query_id", "vec_id", "rel").collect()
    sim_rows = sims.collect()
    if len(rel_rows) > rel_cap or len(sim_rows) > pair_cap:
        raise RuntimeError(
            f"MMR shortlist overflow: rel={len(rel_rows)} (cap "
            f"{rel_cap}), sim pairs={len(sim_rows)} (cap {pair_cap}) "
            "— the rn filter no longer bounds the driver collect"
        )
    rel = {(r.query_id, r.vec_id): r.rel for r in rel_rows}
    sim = {(r.query_id, r.va, r.vb): r.sim for r in sim_rows}
    by_q = {}
    for (q, v), rl in rel.items():
        by_q.setdefault(q, []).append((v, rl))
    picks = []
    for q, cands in sorted(by_q.items()):
        first = max(cands, key=lambda t: (t[1], -t[0]))
        chosen = [first[0]]
        picks.append((q, first[0], 1))
        for r in range(2, _MMR_K + 1):
            best = None
            for v, rl in cands:
                if v in chosen:
                    continue
                mx = max(sim[(q, v, c)] for c in chosen)
                score = _MMR_L_REL * rl - _MMR_L_DIV * mx
                key = (score, -v)
                if best is None or key > best[0]:
                    best = (key, v)
            picks.append((q, best[1], r))
            chosen.append(best[1])
    lit = F.broadcast(
        emb.sparkSession.createDataFrame(
            picks, "query_id long, vec_id long, sel_round long"
        )
    )
    return cand.join(lit, ["query_id", "vec_id"]).select(
        "query_id", "vec_id", F.col("rel").alias("rel_micro"), "sel_round"
    )


@register("embed_mmr_diversified_topk", oracle=_mmr_oracle())
def embed_mmr_diversified_topk(spark, sf_dir):
    """MAXIMAL MARGINAL RELEVANCE diversified retrieval: from each
    probe query's top-{_MMR_C} exact-cosine candidates, greedily
    pick {_MMR_K} results maximizing 7·relevance − 3·max-similarity-
    to-already-picked (λ=0.7 as integer weights) — the re-ranking
    that keeps a RAG context window from filling with five copies
    of the same paragraph. EXACT-INTEGER selection: relevance and
    pairwise similarities are micro-unit quantized BIGINTs
    (floor(x·1e6+0.5), the _DRIFT_SCALE discipline), so every
    greedy argmax — and therefore the whole selection SEQUENCE — is
    hash-stable with vec_id tiebreaks; the oracle RE-RUNS all
    {_MMR_K} unrolled rounds (the embed_pca_power_iter discipline
    applied to re-ranking). Scale shape: the candidate cut is the
    existing broadcast-query scan; everything after runs on
    q·{_MMR_C} rows and their q·{_MMR_C}² pairwise sims — driver-
    independent, loop-free on the data plane, each round two joins
    on tiny keyed tables."""
    return _mmr_select(spark, sf_dir)



def _cent_cte(base_only: bool = False) -> str:
    """The centroid-literal VALUES table + corpus dispatch used by
    the IVF oracles, as a reusable CTE body (same construction as
    _ivf_oracle's `cent`)."""
    import os

    rows = []
    cases = []
    for ci, d in enumerate(_ORACLE_SF_DIRS):
        if not os.path.isdir(d):
            continue
        cent = SIM.fit_quantizer_file(d, base_only=base_only)
        n, chk = _corpus_signature(d)
        cases.append(f"WHEN n = {n} AND chk = {chk} THEN {ci}")
        for cell, c in enumerate(cent):
            arr = ", ".join(SIM._lit_double(x) for x in c)
            rows.append(f"({ci}, {cell}, [{arr}])")
    return f"""
      SELECT cell, centroid
      FROM (VALUES {", ".join(rows)}) AS t(corpus, cell, centroid)
      WHERE corpus = (
        SELECT CASE WHEN n = 0 THEN -2 {" ".join(cases)} ELSE error('unrecognized embeddings corpus: the literal-centroid oracle only knows the staged fixture corpora (round-12 dup-key axis: loud, never silently empty)') END FROM (
          SELECT count(*) AS n,
                 CAST(sum(CAST(floor(CAST(embedding[1] AS DOUBLE)
                                     * 1000000) AS BIGINT)) AS BIGINT) AS chk
          FROM embeddings))"""


def _purity_oracle() -> str:
    d_e = SIM.cell_dist_expr("e.embedding", "c.centroid", "duckdb")
    return f"""
    WITH cent AS ({_cent_cte()}),
    assign AS (
      SELECT vec_id, label, cell FROM (
        SELECT e.vec_id, e.label, c.cell,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {d_e} ASC, c.cell ASC) AS rn
        FROM embeddings e CROSS JOIN cent c)
      WHERE rn = 1),
    counts AS (
      SELECT cell, label, CAST(count(*) AS BIGINT) AS n
      FROM assign GROUP BY 1, 2),
    maj AS (
      SELECT cell, label AS top_label, n AS top_n,
             row_number() OVER (PARTITION BY cell
                                ORDER BY n DESC, label ASC) AS rn
      FROM counts),
    tot AS (
      SELECT cell, CAST(sum(n) AS BIGINT) AS n_vecs,
             CAST(count(*) AS BIGINT) AS n_labels
      FROM counts GROUP BY 1)
    SELECT t.cell, t.n_vecs, t.n_labels,
           CAST(m.top_label AS BIGINT) AS top_label,
           m.top_n,
           CAST(1000 * m.top_n // t.n_vecs AS BIGINT) AS purity_permille
    FROM tot t JOIN maj m ON m.cell = t.cell AND m.rn = 1
    """


@register("embed_cell_label_purity", oracle=_purity_oracle())
def embed_cell_label_purity(spark, sf_dir):
    """CLUSTER-PURITY EVALUATION of the IVF coarse quantizer against
    the fixture's ground-truth label column: per cell, the majority
    label's share in permille — the standard external clustering
    metric (purity), and the eval that tells you whether the ANN
    index's cells respect the corpus's semantic grouping (pure
    cells → a probe rarely needs extra nprobe to find same-label
    neighbors). Assignment reuses the ORACLE-PARITY codegen
    projection (centroid literals, |c|²−2·x·c, ties to the lowest
    cell) against the same deterministically-fitted quantizer every
    IVF rung serves from; the census is exact-integer with
    (count desc, label) majority tiebreak. Scale shape: one map-only
    assignment pass + one combinable (cell, label) rollup; the
    purity table is n_cells rows."""
    emb = read_table(spark, sf_dir, "embeddings")
    centroids = ivf_quantizer(spark, sf_dir)
    assigned = SIM.assign_cells_expr(centroids, emb, keep=["vec_id", "label"])
    counts = assigned.groupBy("cell", "label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    from pyspark.sql import Window as W

    maj = (
        counts.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("cell").orderBy(
                    F.col("n").desc(), F.col("label").asc()
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .select(
            "cell",
            F.col("label").cast("bigint").alias("top_label"),
            F.col("n").alias("top_n"),
        )
    )
    tot = counts.groupBy("cell").agg(
        F.sum("n").cast("bigint").alias("n_vecs"),
        F.count(F.lit(1)).cast("bigint").alias("n_labels"),
    )
    return tot.join(maj, "cell").select(
        "cell",
        "n_vecs",
        "n_labels",
        "top_label",
        "top_n",
        F.expr("CAST(1000 * top_n DIV n_vecs AS BIGINT)").alias(
            "purity_permille"
        ),
    )


_DIMVAR_TOPN = 8


@register(
    "embed_dim_variance_topk",
    oracle=f"""
    WITH q AS (
      SELECT generate_subscripts(embedding, 1) AS d,
             CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                        * {_DRIFT_SCALE} + 0.5) AS BIGINT) AS qv
      FROM embeddings),
    m AS (
      SELECT d, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(qv) AS BIGINT) AS s,
             CAST(sum(qv * qv) AS BIGINT) AS sq
      FROM q GROUP BY 1),
    v AS (
      SELECT d, n,
             CAST(sq // n - (s // n) * (s // n) AS BIGINT)
               AS var_micro2
      FROM m)
    SELECT CAST(d AS INT) AS d, n, var_micro2,
           CAST(row_number() OVER (ORDER BY var_micro2 DESC, d ASC)
                AS BIGINT) AS rnk
    FROM v
    ORDER BY rnk LIMIT {_DIMVAR_TOPN}
    """,
)
def embed_dim_variance_topk(spark, sf_dir):
    """PER-DIMENSION VARIANCE RANKING of the embedding corpus (top
    {_DIMVAR_TOPN} dims) — the sanity profile behind every
    truncation decision (matryoshka prefix serving, PCA loading
    checks: if variance is flat across dims, prefix truncation is
    lossy; if concentrated, it is nearly free). Integer end-to-end
    via the micro-unit grid (_DRIFT_SCALE discipline) and the
    DIV-moment identity sq/n − (s/n)² with TRUNCATING division —
    a stated, engine-identical estimator (the exact-rational
    variance times 1±1e-6 grid error); overflow bound: Σq² ≤
    n·1e12, safe to n ~ 9e6 vectors, and the per-dim moments are
    combinable so the cluster-scale fix is a pre-shift, not a plan
    change. One posexplode + one (dim)-keyed aggregation — the
    embed_pca_power_iter long-form shape without the iterations."""
    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.select(
        F.posexplode(
            F.expr(
                f"transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)"
                f" * {_DRIFT_SCALE} + 0.5) AS BIGINT))"
            )
        ).alias("d0", "qv")
    )
    m = q.groupBy((F.col("d0") + 1).alias("d")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("qv").cast("bigint").alias("s"),
        F.sum(F.col("qv") * F.col("qv")).cast("bigint").alias("sq"),
    )
    v = m.select(
        F.col("d").cast("int").alias("d"),
        "n",
        F.expr("CAST(sq DIV n - (s DIV n) * (s DIV n) AS BIGINT)").alias(
            "var_micro2"
        ),
    )
    from pyspark.sql import Window as W

    # bounded global window (r16 audit): input is one row per
    # embedding dimension (<= 64) AND the rank-limit compiles to
    # TakeOrderedAndProject (plans/r16/embed_dim_variance_topk_after.txt)
    return (
        v.withColumn(
            "rnk",
            F.row_number()
            .over(W.orderBy(F.col("var_micro2").desc(), F.col("d").asc()))
            .cast("bigint"),
        )
        .filter(F.col("rnk") <= _DIMVAR_TOPN)
        .select("d", "n", "var_micro2", "rnk")
    )


@register(
    "embed_exact_dup_audit",
    oracle=f"""
    WITH q AS (
      SELECT vec_id,
             md5(array_to_string(list_transform(embedding,
               x -> CAST(CAST(floor(CAST(x AS DOUBLE) * {_DRIFT_SCALE}
                               + 0.5) AS BIGINT) AS VARCHAR)), ',')) AS h
      FROM embeddings),
    groups AS (
      SELECT h, CAST(count(*) AS BIGINT) AS n_copies,
             CAST(min(vec_id) AS BIGINT) AS keep_vec_id
      FROM q GROUP BY 1)
    SELECT CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(n_copies) AS BIGINT) AS n_vecs,
           CAST(sum(CASE WHEN n_copies >= 2 THEN n_copies - 1
                         ELSE 0 END) AS BIGINT) AS n_redundant,
           CAST(coalesce(max(CASE WHEN n_copies >= 2 THEN n_copies END),
                         0) AS BIGINT) AS max_group
    FROM groups
    """,
)
def embed_exact_dup_audit(spark, sf_dir):
    """EXACT-DUPLICATE VECTOR AUDIT — the vector-modality rung of
    the exact-dedup family (text md5, image dHash, audio
    fingerprint, and now embeddings): vectors are keyed by the md5
    of their micro-unit quantized integer string (the _DRIFT_SCALE
    grid, so float noise below 1e-6 does not split a group and the
    key is engine-identical), grouped, and summarized as redundancy
    counts — the audit a feature-store runs before paying to index
    the same vector twice (common after re-embedding retries or
    replayed ingestion). Scale shape: the md5 is computed map-side
    and ONLY the 16-byte key crosses the groupBy shuffle — never
    the 256-byte vector; the audit is one combinable rollup."""
    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.select(
        "vec_id",
        F.expr(
            f"md5(array_join(transform(embedding, x -> "
            f"CAST(CAST(floor(CAST(x AS DOUBLE) * {_DRIFT_SCALE} + 0.5)"
            f" AS BIGINT) AS STRING)), ','))"
        ).alias("h"),
    )
    groups = q.groupBy("h").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_copies"),
        F.min("vec_id").cast("bigint").alias("keep_vec_id"),
    )
    return groups.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum("n_copies").cast("bigint").alias("n_vecs"),
        F.sum(
            F.when(F.col("n_copies") >= 2, F.col("n_copies") - 1).otherwise(
                0
            )
        )
        .cast("bigint")
        .alias("n_redundant"),
        F.coalesce(
            F.max(F.when(F.col("n_copies") >= 2, F.col("n_copies"))),
            F.lit(0),
        )
        .cast("bigint")
        .alias("max_group"),
    )
