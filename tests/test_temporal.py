"""Unit + property tests for the as-of join composition.

The oracle comparison (DuckDB native ASOF JOIN) covers the fixture
distribution; these tests pin the edge semantics — no-prior-right
drops, same-instant visibility, tiebreaks — and fuzz the composition
against a brute-force per-row reference.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st

from etl_jobs_spark.operators.temporal import asof_join

BASE = dt.datetime(2026, 1, 1)


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def _run(spark, left_rows, right_rows):
    left = _df(spark, left_rows, "k INT, ts TIMESTAMP, lid INT")
    right = _df(spark, right_rows, "k INT, ts TIMESTAMP, rid INT")
    out = asof_join(
        left, right, key="k", ts="ts", tiebreak="rid",
        right_payload=["rid", "ts"], left_tiebreak="lid",
    )
    return {
        (r["k"], r["lid"]): (r["asof_rid"], r["asof_ts"])
        for r in out.collect()
    }


def _brute(left_rows, right_rows):
    exp = {}
    for k, lts, lid in left_rows:
        cands = [
            (rts, rid) for rk, rts, rid in right_rows
            if rk == k and rts <= lts
        ]
        if cands:
            rts, rid = max(cands, key=lambda c: (c[0], c[1]))
            exp[(k, lid)] = (rid, rts)
    return exp


def test_asof_edges(spark):
    t = lambda s: BASE + dt.timedelta(seconds=s)
    left = [(1, t(10), 100), (1, t(5), 101), (2, t(10), 102)]
    right = [(1, t(10), 7), (1, t(3), 8), (2, t(11), 9)]
    got = _run(spark, left, right)
    # same-instant right row IS visible (<=); later rows not; key 2
    # has no prior right row → dropped
    assert got == {(1, 100): (7, t(10)), (1, 101): (8, t(3))}


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 50), st.integers(0, 999)),
        min_size=0, max_size=12, unique_by=lambda r: r[2],
    ),
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 50), st.integers(0, 999)),
        min_size=0, max_size=12, unique_by=lambda r: r[2],
    ),
)
def test_asof_matches_bruteforce(spark, left_raw, right_raw):
    t = lambda s: BASE + dt.timedelta(seconds=s)
    # dedupe right rows sharing (k, ts): the operator's contract
    # (matching the oracle) picks the max-tiebreak row; brute force
    # does the same via the (ts, rid) max
    left = [(k, t(s), i) for k, s, i in left_raw]
    right = [(k, t(s), i) for k, s, i in right_raw]
    if not left or not right:
        return
    assert _run(spark, left, right) == _brute(left, right)


def _run_fwd(spark, left_rows, right_rows):
    from etl_jobs_spark.operators.temporal import asof_join_forward

    left = _df(spark, left_rows, "k INT, ts TIMESTAMP, lid INT")
    right = _df(spark, right_rows, "k INT, ts TIMESTAMP, rid INT")
    out = asof_join_forward(
        left, right, key="k", ts="ts", tiebreak="rid",
        right_payload=["rid", "ts"], left_tiebreak="lid",
    )
    return {
        (r["k"], r["lid"]): (r["next_rid"], r["next_ts"])
        for r in out.collect()
    }


def _brute_fwd(left_rows, right_rows):
    exp = {}
    for k, lts, lid in left_rows:
        cands = [
            (rts, rid) for rk, rts, rid in right_rows
            if rk == k and rts >= lts
        ]
        if cands:
            # earliest ts; among same-instant rows the MIN tiebreak
            rts, rid = min(cands, key=lambda c: (c[0], c[1]))
            exp[(k, lid)] = (rid, rts)
    return exp


def test_asof_forward_edges(spark):
    t = lambda s: BASE + dt.timedelta(seconds=s)
    left = [(1, t(10), 100), (1, t(5), 101), (2, t(12), 102)]
    right = [(1, t(10), 7), (1, t(3), 8), (2, t(11), 9)]
    got = _run_fwd(spark, left, right)
    # same-instant right row IS visible (>=); earlier rows not;
    # key 2's only right row precedes the left row → dropped
    assert got == {(1, 100): (7, t(10)), (1, 101): (7, t(10))}


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 50), st.integers(0, 999)),
        min_size=1, max_size=12, unique_by=lambda r: r[2],
    ),
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 50), st.integers(0, 999)),
        min_size=1, max_size=12, unique_by=lambda r: r[2],
    ),
)
def test_asof_forward_matches_bruteforce(spark, left_raw, right_raw):
    t = lambda s: BASE + dt.timedelta(seconds=s)
    left = [(k, t(s), i) for k, s, i in left_raw]
    right = [(k, t(s), i) for k, s, i in right_raw]
    assert _run_fwd(spark, left, right) == _brute_fwd(left, right)
