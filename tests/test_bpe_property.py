"""Property test: the distributed BPE learner produces EXACTLY the
merge table a pure-Python reference implementation of
byte-pair-encoding fitting produces (same normalization, fencing,
pair counting, and (count DESC, left, right) tie-break) on random
corpora — a cross-implementation check, independent of the DuckDB
oracle (which shares the SQL formulation)."""

from __future__ import annotations

import random
import re

from hypothesis import given, settings, strategies as st

from etl_jobs_spark.queries.text_analysis import fit_bpe_merges

WORDS = ["the", "then", "there", "ten", "net", "an", "and", "hand",
         "her", "here", "in", "inn", "thin", "to", "tore", "or"]


def _ref_bpe(texts, n_rounds):
    """Pure-Python reference: space out chars, fence words with '§',
    then n_rounds of (count adjacent pairs, merge argmax)."""
    docs = []
    for t in texts:
        base = re.sub(r"\s+", " ", re.sub(r"[^a-z ]", "", t.lower()))
        docs.append(
            " § ".join(" ".join(w) for w in base.split(" ") if w)
        )
    merges = []
    for r in range(n_rounds):
        counts = {}
        for s in docs:
            syms = s.split(" ")
            for x, y in zip(syms, syms[1:]):
                if "§" in (x, y) or "" in (x, y):
                    continue
                counts[(x, y)] = counts.get((x, y), 0) + 1
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), n = best
        merges.append((r, a, b, n))
        docs = [s.replace(f"{a} {b}", f"{a}{b}") for s in docs]
    return merges


@settings(max_examples=5, deadline=None)
@given(st.integers(min_value=0, max_value=10**6))
def test_bpe_fit_matches_reference(spark, seed):
    rng = random.Random(seed)
    texts = [
        " ".join(rng.choice(WORDS) for _ in range(rng.randint(3, 12)))
        for _ in range(rng.randint(2, 6))
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text STRING")
    got = fit_bpe_merges(df, 5)
    want = _ref_bpe(texts, 5)
    assert [(r, a, b, n) for r, a, b, n in got] == want
