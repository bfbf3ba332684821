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
