"""Property test: SymSpell deletion-neighborhood fuzzy_pairs finds
EXACTLY the edit-distance<=1 pairs a brute-force all-pairs
Levenshtein scan finds — completeness of the deletion blocking, not
just its precision (the oracle already re-checks precision)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from etl_jobs_spark.operators.matching import fuzzy_pairs


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abc", min_size=1, max_size=5),
        min_size=2, max_size=10,
    )
)
def test_fuzzy_pairs_matches_bruteforce(spark, names):
    rows = list(enumerate(names))
    df = spark.createDataFrame(rows, "id BIGINT, name STRING")
    got = {
        (r["key_a"], r["key_b"], r["dist"])
        for r in fuzzy_pairs(df, "id", "name").collect()
    }
    want = {
        (i, j, _lev(a, b))
        for i, a in rows
        for j, b in rows
        if i < j and _lev(a, b) <= 1
    }
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.text(alphabet="ab ", min_size=3, max_size=30),
        min_size=2, max_size=8,
    )
)
def test_containment_matches_bruteforce(spark, texts):
    """ngram_containment_pairs finds exactly the pairs whose distinct
    word-3-gram containment crosses the threshold, per brute force
    over the same gram sets (completeness of the shared-gram join)."""
    from etl_jobs_spark.operators.dedup import (
        CONTAIN_THRESHOLD,
        ngram_containment_pairs,
    )

    def norm(t):
        return " ".join(t.lower().split())

    def grams(t):
        toks = norm(t).split(" ")
        if len(toks) < 3:
            return {norm(t)}
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    rows = [(i, "en", norm(t)) for i, t in enumerate(texts) if norm(t)]
    if len(rows) < 2:
        return
    df = spark.createDataFrame(rows, "doc_id BIGINT, lang STRING, n STRING")
    got = {
        (r["contained_doc"], r["container_doc"])
        for r in ngram_containment_pairs(df).collect()
    }
    want = set()
    for i, _, a in rows:
        for j, _, b in rows:
            if i >= j:
                continue
            ga, gb = grams(a), grams(b)
            inter = len(ga & gb)
            if not inter:
                continue
            ca = round(inter / len(ga), 4)
            cb = round(inter / len(gb), 4)
            if max(ca, cb) >= CONTAIN_THRESHOLD:
                if ca > cb:
                    want.add((i, j))
                elif cb > ca:
                    want.add((j, i))
                else:
                    want.add((max(i, j), min(i, j)))
    assert got == want
