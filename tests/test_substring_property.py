"""Property tests for the substring-span operator: SOUNDNESS (every
reported span is a true character-identical common substring at the
reported positions) and PLANTED COMPLETENESS (a long shared block
between two docs is found when no stop-gram drop interferes)."""

from __future__ import annotations

import random
import string

from hypothesis import given, settings, strategies as st

from etl_jobs_spark.operators import dedup as DD

ALPHA = string.ascii_lowercase


def _rand_text(rng: random.Random, n: int) -> str:
    return "".join(rng.choice(ALPHA) for _ in range(n))


@settings(max_examples=6, deadline=None)
@given(st.integers(min_value=0, max_value=10**6))
def test_spans_are_true_common_substrings(spark, seed):
    rng = random.Random(seed)
    texts = {}
    n_docs = rng.randint(3, 6)
    for d in range(n_docs):
        texts[d] = _rand_text(rng, rng.randint(45, 90))
    # plant one shared block between two random docs
    a, b = rng.sample(range(n_docs), 2)
    block = _rand_text(rng, rng.randint(DD.SPAN_MIN_LEN, 60))
    pa = rng.randint(0, max(0, len(texts[a]) - 1))
    pb = rng.randint(0, max(0, len(texts[b]) - 1))
    texts[a] = texts[a][:pa] + block + texts[a][pa:]
    texts[b] = texts[b][:pb] + block + texts[b][pb:]

    corpus = spark.createDataFrame(
        [(d, t) for d, t in texts.items()], "doc_id LONG, n STRING"
    )
    spans = DD.substring_spans(corpus).collect()

    # soundness: reported bytes really are identical
    for r in spans:
        sa = texts[r.doc_a][r.start_a - 1 : r.start_a - 1 + r.span_len]
        sb = texts[r.doc_b][r.start_b - 1 : r.start_b - 1 + r.span_len]
        assert sa == sb, (r, sa, sb)
        assert r.span_len >= DD.SPAN_MIN_LEN

    # planted completeness: the planted pair shows a span dominating
    # the block (random-text collisions at 26 letters cannot exceed
    # the stop-gram cap here, so the seed chain is intact)
    lo, hi = (a, b) if a < b else (b, a)
    best = max(
        (r.span_len for r in spans if (r.doc_a, r.doc_b) == (lo, hi)),
        default=0,
    )
    assert best >= len(block), (len(block), best)
