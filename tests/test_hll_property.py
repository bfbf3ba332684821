"""Property test: the custom HLL's registers, harmonic sum, and
estimate match a pure-Python reference implementing the identical
rules (portable md5 hash60, bucket = h % 256, rank from the 52
payload bits, integer-scaled harmonic sum) on random key sets."""

from __future__ import annotations

import hashlib
import random

from hypothesis import given, settings, strategies as st

from etl_jobs_spark.queries.analytics_ext import (
    _HLL_ALPHA,
    _HLL_M,
    hll_estimate,
)


def _hash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _ref(groups):
    out = {}
    for g, ks in groups.items():
        regs = [0] * _HLL_M
        for k in set(ks):
            h = _hash60(f"hll:{k}")
            b = h % _HLL_M
            w = h // _HLL_M
            rank = 53 - w.bit_length() if w > 0 else 53
            regs[b] = max(regs[b], rank)
        sum_scaled = sum(1 << (53 - r) for r in regs)
        v_zero = sum(1 for r in regs if r == 0)
        est_milli = int(round(
            _HLL_ALPHA * _HLL_M * _HLL_M * 9007199254740992.0 * 1000
            / sum_scaled
        ))
        n_exact = len(set(ks))
        err = abs(est_milli - n_exact * 1000) * 1000 // (n_exact * 1000)
        out[g] = (n_exact, v_zero, sum_scaled, est_milli, err)
    return out


@settings(max_examples=5, deadline=None)
@given(st.integers(min_value=0, max_value=10**6))
def test_hll_matches_reference(spark, seed):
    rng = random.Random(seed)
    groups = {
        f"g{i}": [rng.randint(-5000, 5000) for _ in range(rng.randint(5, 400))]
        for i in range(rng.randint(1, 3))
    }
    rows = [(g, k) for g, ks in groups.items() for k in ks]
    df = spark.createDataFrame(rows, "event_type STRING, k LONG")
    got = {
        r.event_type: (
            r.n_exact, r.v_zero, r.sum_scaled, r.est_milli, r.err_permille
        )
        for r in hll_estimate(df).collect()
    }
    assert got == _ref(groups)
