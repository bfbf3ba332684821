"""Property test: the 3x3 cell-blocked distance join finds EXACTLY
the pairs a brute-force scan finds — completeness of the grid
blocking (cells are radius-wide, so no within-radius neighbor can
sit outside the neighbor block), not just precision (the exact
distance filter already guarantees that)."""

from __future__ import annotations

import random

from hypothesis import given, settings, strategies as st

from etl_jobs_spark.queries.spatial import grid_distance_join

RADIUS = 10


@settings(max_examples=6, deadline=None)
@given(st.integers(min_value=0, max_value=10**6))
def test_grid_join_matches_bruteforce(spark, seed):
    rng = random.Random(seed)
    world = 60  # small world → plenty of within-radius pairs
    a_pts = [
        (i, rng.randint(0, world), rng.randint(0, world))
        for i in range(rng.randint(3, 12))
    ]
    b_pts = [
        (100 + i, rng.randint(0, world), rng.randint(0, world))
        for i in range(rng.randint(3, 12))
    ]
    a_df = spark.createDataFrame(a_pts, "a_id LONG, xa LONG, ya LONG")
    b_df = spark.createDataFrame(b_pts, "b_id LONG, xb LONG, yb LONG")
    got = {
        r.a_event_id: (r.n_within, r.min_dist2, r.nearest_b)
        for r in grid_distance_join(a_df, b_df, RADIUS).collect()
    }
    want = {}
    for aid, xa, ya in a_pts:
        hits = sorted(
            ((xa - xb) ** 2 + (ya - yb) ** 2, bid)
            for bid, xb, yb in b_pts
            if (xa - xb) ** 2 + (ya - yb) ** 2 <= RADIUS * RADIUS
        )
        if hits:
            want[aid] = (len(hits), hits[0][0], hits[0][1])
    assert got == want
