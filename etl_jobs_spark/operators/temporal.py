"""Temporal / advanced join operators: as-of join, range-band join,
time-bucketed rollups.

Beyond-reference surface: the reference has no joins at all
(SURVEY §2.5); these are the time-series operators a production
analytics engine needs that Spark has no single built-in for —
re-expressed as compositions of DataFrame primitives (the
"composition of existing ops" tier of the custom-operator ladder;
Pandas-UDF fallbacks are never needed here).

**As-of join** (latest right row with right.ts <= left.ts per key):
implemented as union → single window pass:

    tag sides → unionByName → last(right_payload, ignorenulls)
      OVER (PARTITION BY key ORDER BY ts, side ROWS UNBOUNDED PRECEDING)
    → keep left rows

One shuffle on the join key, one sort — the same cost profile as a
sort-merge join, with no range-explosion. At 100 TB this is THE
scalable as-of strategy: state is one carried struct per partition
stream, skewed keys can be salted by time-range, and the window
never buffers more than the sort run. (A backward broadcast probe
works when the right side is small; this composition needs neither
side small.)

**Range-band join** (value ∈ [lo, hi) against a bands dimension):
a broadcast inequality join — O(n·k) for k bands, ideal for small
dimension tables. For large band tables, the arithmetic band-key
equi-join (floor(value/width)) is the scale path; noted inline.

**Time rollup / cube**: hierarchical aggregates over time buckets —
Spark's ``rollup``/``cube`` produce the grouping-set lattice in ONE
shuffle (partial aggs per set map-side), the idiomatic form of a
hypertable continuous-aggregate backfill.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_jobs_spark.operators import money as M


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    tiebreak: str,
    right_payload: list[str],
    prefix: str = "asof_",
    left_tiebreak: str | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` within ``key`` (inner semantics: left
    rows with no prior right row are dropped).

    ``tiebreak`` (right side; ``left_tiebreak`` defaults to it)
    orders simultaneous rows deterministically; at equal ``ts`` the
    right row sorts first (side 0 < 1), so a same-instant right row
    IS visible to the left row — the <= contract. Multiple right
    rows at one instant resolve to the max-``tiebreak`` row (last
    wins in the carried window).
    """
    r = right.select(
        F.col(key),
        F.col(ts),
        F.lit(0).alias("_side"),
        F.col(tiebreak).alias("_tb"),
        F.struct(*[F.col(c) for c in right_payload]).alias("_rp"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType
        ).alias("_lp"),
    )
    lt = left.select(
        F.col(key),
        F.col(ts),
        F.lit(1).alias("_side"),
        F.col(left_tiebreak or tiebreak).alias("_tb"),
        F.lit(None).cast(r.schema["_rp"].dataType).alias("_rp"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lp"),
    )
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("_side").asc(), F.col("_tb").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = (
        r.unionByName(lt)
        .withColumn("_carry", F.last("_rp", ignorenulls=True).over(w))
        .filter((F.col("_side") == 1) & F.col("_carry").isNotNull())
    )
    out_cols = [F.col(f"_lp.{c}").alias(c) for c in left.columns] + [
        F.col(f"_carry.{c}").alias(f"{prefix}{c}") for c in right_payload
    ]
    return carried.select(*out_cols)


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    tiebreak: str,
    right_payload: list[str],
    prefix: str = "next_",
    left_tiebreak: str | None = None,
) -> DataFrame:
    """Forward as-of: for each left row, attach the EARLIEST right
    row with ``right.ts >= left.ts`` within ``key`` (inner
    semantics) — the lookahead mirror of :func:`asof_join`, same
    one-shuffle union+window plan with the traversal reversed
    (ts DESC, so the carried value is the nearest future right row).
    At equal ``ts`` the right row is visible (the >= contract);
    multiple right rows at one instant resolve to the min-``tiebreak``
    row (first wins in forward order)."""
    r = right.select(
        F.col(key),
        F.col(ts),
        F.lit(0).alias("_side"),
        F.col(tiebreak).alias("_tb"),
        F.struct(*[F.col(c) for c in right_payload]).alias("_rp"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType
        ).alias("_lp"),
    )
    lt = left.select(
        F.col(key),
        F.col(ts),
        F.lit(1).alias("_side"),
        F.col(left_tiebreak or tiebreak).alias("_tb"),
        F.lit(None).cast(r.schema["_rp"].dataType).alias("_rp"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lp"),
    )
    # descending time scan: `last(_rp)` over the running frame is the
    # smallest right ts that is still >= the left row's ts. Among
    # same-instant right rows, _tb DESC makes the min-tiebreak row
    # the one that survives the carry.
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).desc(), F.col("_side").asc(), F.col("_tb").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = (
        r.unionByName(lt)
        .withColumn("_carry", F.last("_rp", ignorenulls=True).over(w))
        .filter((F.col("_side") == 1) & F.col("_carry").isNotNull())
    )
    out_cols = [F.col(f"_lp.{c}").alias(c) for c in left.columns] + [
        F.col(f"_carry.{c}").alias(f"{prefix}{c}") for c in right_payload
    ]
    return carried.select(*out_cols)


def range_band_join(
    facts: DataFrame, bands: DataFrame, value_col: str
) -> DataFrame:
    """Join facts to a small bands dimension on
    ``lo <= value < hi`` — explicit broadcast so the inequality join
    is a nested-loop probe of an in-memory dimension, never a
    shuffle. (Large band tables → precompute an arithmetic band key
    and equi-join instead; inequality NLJ is O(n·k).)"""
    return facts.join(
        F.broadcast(bands),
        (F.col(value_col) >= F.col("lo")) & (F.col(value_col) < F.col("hi")),
    )


def rollup_time(events: DataFrame) -> DataFrame:
    """Hierarchical (hour, event_type) rollup — the grouping-set
    lattice in one shuffle. NULL grouping slots are coalesced to
    sentinels so the result is total-order comparable."""
    bucketed = events.select(
        F.date_trunc("hour", "ts").alias("bucket_hour"), "event_type", "value"
    )
    return (
        bucketed.rollup("bucket_hour", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            M.dsum("value").alias("total_value"),
        )
        .select(
            F.coalesce(
                "bucket_hour", F.to_timestamp(F.lit("1970-01-01"))
            ).alias("bucket_hour"),
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            "n",
            "total_value",
        )
    )


def cube_events(events: DataFrame) -> DataFrame:
    """CUBE over (day-of-week, event_type): all four grouping sets in
    one pass."""
    basis = events.select(
        F.dayofweek("ts").cast("long").alias("dow"), "event_type", "value"
    )
    return (
        basis.cube("dow", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            M.davg("value").alias("avg_value"),
        )
        .select(
            F.coalesce("dow", F.lit(-1)).alias("dow"),
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            "n",
            "avg_value",
        )
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    tiebreak: str,
    right_payload: list[str],
    left_id: str,
    prefix: str = "nearest_",
) -> DataFrame:
    """Nearest as-of: attach the right row minimizing |right.ts -
    left.ts| within ``key`` (ties prefer the earlier/backward row;
    left rows with no right row at all keep NULL payload — LEFT
    semantics). Composed from the backward and forward passes — two
    one-shuffle union+window scans — then a pick by microsecond
    distance; ``left_id`` must uniquely identify left rows so the two
    passes re-join without fan-out. Same cost class as two sort-merge
    joins; no range explosion, neither side needs to be small.

    ``ts`` must be listed in ``right_payload`` — the distance pick
    reads the carried right-side timestamp from the payload struct."""
    if ts not in right_payload:
        raise ValueError(
            f"asof_join_nearest: ts column {ts!r} must be in "
            f"right_payload {right_payload} (the nearest pick compares "
            "the carried right timestamps)"
        )
    slim = left.select(left_id, key, ts)
    prev = asof_join(
        slim, right, key, ts, tiebreak, right_payload, prefix="_p_"
    ).select(left_id, *[f"_p_{c}" for c in right_payload])
    nxt = asof_join_forward(
        slim, right, key, ts, tiebreak, right_payload, prefix="_n_"
    ).select(left_id, *[f"_n_{c}" for c in right_payload])
    j = left.join(prev, left_id, "left").join(nxt, left_id, "left")
    p_ts, n_ts = F.col(f"_p_{ts}"), F.col(f"_n_{ts}")

    # unix_micros wants TIMESTAMP, the fixtures carry TIMESTAMP_NTZ;
    # the session TZ is pinned UTC so the cast is value-preserving.
    def _us(c):
        return F.unix_micros(c.cast("timestamp"))

    use_prev = p_ts.isNotNull() & (
        n_ts.isNull()
        | (_us(F.col(ts)) - _us(p_ts) <= _us(n_ts) - _us(F.col(ts)))
    )
    out = [F.col(c) for c in left.columns]
    for c in right_payload:
        out.append(
            F.when(use_prev, F.col(f"_p_{c}"))
            .otherwise(F.col(f"_n_{c}"))
            .alias(f"{prefix}{c}")
        )
    return j.select(*out)
