"""Property test: the distributed integer Lloyd fit matches a
pure-Python reference applying the identical rules (micro-unit
quantization, exact integer distances, argmin tie-break on cluster
id, truncating integer mean) on random vector sets — a
cross-implementation check independent of the unrolled SQL oracle."""

from __future__ import annotations

import random

from hypothesis import given, settings, strategies as st

from etl_jobs_spark.queries.similarity import kmeans_lloyd_fit

DIM = 6
K = 3
ROUNDS = 2
SCALE = 1_000_000


def _trunc_div(a: int, b: int) -> int:
    q = abs(a) // b
    return q if a >= 0 else -q


def _ref(vectors, k, rounds):
    q = {
        vid: [int(round(float(x) * SCALE)) for x in v]
        for vid, v in vectors
    }
    cents = [(i, q[i]) for i in sorted(q) if i < k]

    def assign(v):
        best = None
        for cid, c in cents:
            d = sum((a - b) * (a - b) for a, b in zip(v, c))
            if best is None or (d, cid) < best:
                best = (d, cid)
        return best

    for _ in range(rounds):
        groups = {}
        for vid, v in q.items():
            _, cid = assign(v)
            groups.setdefault(cid, []).append(v)
        cents = [
            (
                cid,
                [
                    _trunc_div(sum(v[d] for v in vs), len(vs))
                    for d in range(DIM)
                ],
            )
            for cid, vs in sorted(groups.items())
        ]
    stats = {}
    for vid, v in q.items():
        d, cid = assign(v)
        n, inertia = stats.get(cid, (0, 0))
        stats[cid] = (n + 1, inertia + d)
    return {
        cid: (
            stats[cid][0],
            stats[cid][1],
            sum(c),
            sum(abs(x) for x in c),
        )
        for cid, c in cents
        if cid in stats
    }


@settings(max_examples=5, deadline=None)
@given(st.integers(min_value=0, max_value=10**6))
def test_kmeans_matches_reference(spark, seed):
    rng = random.Random(seed)
    n = rng.randint(K + 2, 25)
    vectors = [
        (i, [round(rng.uniform(-1, 1), 4) for _ in range(DIM)])
        for i in range(n)
    ]
    df = spark.createDataFrame(
        vectors, "vec_id LONG, embedding ARRAY<FLOAT>"
    )
    rows = kmeans_lloyd_fit(df, k=K, rounds=ROUNDS).collect()
    got = {
        r.cluster_id: (r.n_vecs, r.inertia, r.c_sum, r.c_absum)
        for r in rows
    }
    # the reference quantizes from the float32-rounded values the
    # DataFrame stored, so re-read them back from Spark
    stored = [
        (r.vec_id, list(r.embedding))
        for r in df.orderBy("vec_id").collect()
    ]
    want = _ref(stored, K, ROUNDS)
    assert got == want
