"""Distributed connected-components contract: the min-label
propagation fallback (edge sets too big for the driver union-find)
must produce the same min-reachable-id labels as the driver path —
and must refuse to return partial labels when the graph's diameter
exceeds the round budget, instead of silently splitting components.
"""

from __future__ import annotations

import pytest

from etl_jobs_spark.operators import dedup as DD


def _chain_edges(spark, n):
    """A single path graph 0-1-2-...-n (diameter n)."""
    return spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "doc_a BIGINT, doc_b BIGINT"
    )


def test_distributed_path_matches_contract(spark, monkeypatch):
    """Force the distributed branch (limit 0) on a chain + an island
    pair: every node's component must be the min reachable id."""
    monkeypatch.setattr(DD, "CC_DRIVER_EDGE_LIMIT", 0)
    edges = _chain_edges(spark, 12).union(
        spark.createDataFrame([(100, 101)], "doc_a BIGINT, doc_b BIGINT")
    )
    got = {
        r["doc_id"]: r["component"]
        for r in DD.connected_components(edges, max_iterations=30).collect()
    }
    want = {i: 0 for i in range(13)} | {100: 100, 101: 100}
    assert got == want


def test_distributed_path_diameter_equals_budget(spark, monkeypatch):
    """Boundary: a graph whose diameter EQUALS max_iterations must
    succeed — the budget counts propagation rounds, and the final
    zero-change round that proves convergence is free."""
    monkeypatch.setattr(DD, "CC_DRIVER_EDGE_LIMIT", 0)
    got = {
        r["doc_id"]: r["component"]
        for r in DD.connected_components(
            _chain_edges(spark, 5), max_iterations=5
        ).collect()
    }
    assert got == {i: 0 for i in range(6)}


def test_distributed_path_raises_when_not_converged(spark, monkeypatch):
    """Diameter > round budget: partial labels would violate the
    min-reachable-id contract, so the operator must fail loudly."""
    monkeypatch.setattr(DD, "CC_DRIVER_EDGE_LIMIT", 0)
    edges = _chain_edges(spark, 8)
    with pytest.raises(RuntimeError, match="did not converge"):
        DD.connected_components(edges, max_iterations=3)


def test_driver_path_same_labels(spark):
    """The default driver union-find gives identical labels on the
    same graph (path-parity between the two branches)."""
    edges = _chain_edges(spark, 12)
    got = {
        r["doc_id"]: r["component"]
        for r in DD.connected_components(edges).collect()
    }
    assert got == {i: 0 for i in range(13)}


def _py_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Reference union-find; labels = min reachable node id."""
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_random_graphs_match_union_find_both_paths(spark, monkeypatch):
    """Differential fuzz beyond chains/islands: deterministic
    pseudo-random graphs mixing hubs, long chains, dense cliques and
    self-loops — BOTH the driver union-find path and the forced
    distributed min-label path must agree with a reference
    union-find on every node label."""
    import random

    rng = random.Random(0xC0FFEE)
    for trial in range(6):
        n = rng.randrange(5, 60)
        edges = []
        # random sparse edges
        for _ in range(rng.randrange(1, 2 * n)):
            edges.append((rng.randrange(n), rng.randrange(n)))
        # a long chain fragment (stresses the iteration budget)
        base = rng.randrange(1000, 2000)
        chain_len = rng.randrange(2, 15)
        edges += [(base + i, base + i + 1) for i in range(chain_len)]
        # a hub (star) fragment
        hub = rng.randrange(5000, 6000)
        edges += [(hub, hub + 1 + i) for i in range(rng.randrange(1, 12))]
        expect = _py_components(edges)
        df = spark.createDataFrame(edges, "doc_a BIGINT, doc_b BIGINT")
        for limit in (5_000_000, 0):  # driver path, then distributed
            monkeypatch.setattr(DD, "CC_DRIVER_EDGE_LIMIT", limit)
            got = {
                r["doc_id"]: r["component"]
                for r in DD.connected_components(
                    df, max_iterations=64
                ).collect()
            }
            assert got == expect, (trial, limit)
