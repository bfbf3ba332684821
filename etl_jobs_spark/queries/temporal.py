"""Temporal/advanced-join query declarations.

The as-of oracle uses DuckDB's native ASOF JOIN — an independent
implementation of the same semantics, so agreement is strong
evidence the union+window composition is correct.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_jobs_spark.operators import temporal as TP
from etl_jobs_spark.registry import register
from etl_jobs_spark.sources.readers import read_table

#: Irregular value bands (deliberately non-uniform so an arithmetic
#: band key canNOT express the join — a true range join).
BANDS = [(0.0, 5.0, "micro"), (5.0, 20.0, "small"), (20.0, 50.0, "mid"),
         (50.0, 150.0, "large"), (150.0, 1000.0, "jumbo")]


@register(
    "join_asof_events",
    oracle="""
    WITH clicks AS (
      SELECT user_id, ts, max(event_id) AS event_id
      FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
    purchases AS (
      SELECT event_id, user_id, ts, value
      FROM events WHERE event_type = 'purchase')
    SELECT p.event_id, p.user_id, CAST(p.ts AS TIMESTAMP_NS) AS ts, p.value,
           c.event_id AS asof_event_id, CAST(c.ts AS TIMESTAMP_NS) AS asof_ts
    FROM purchases p
    ASOF JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def join_asof_events(spark, sf_dir):
    """As-of join: each purchase gets the user's latest click at or
    before it (clicks deduped to one per instant). Spark side is the
    union+window composition; oracle is DuckDB's native ASOF JOIN."""
    ev = read_table(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("event_id"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    return TP.asof_join(
        purchases,
        clicks,
        key="user_id",
        ts="ts",
        tiebreak="event_id",
        right_payload=["event_id", "ts"],
    )


@register(
    "join_asof_forward",
    oracle="""
    WITH clicks AS (
      SELECT user_id, ts, min(event_id) AS event_id
      FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
    purchases AS (
      SELECT event_id, user_id, ts, value
      FROM events WHERE event_type = 'purchase')
    SELECT p.event_id, p.user_id, CAST(p.ts AS TIMESTAMP_NS) AS ts, p.value,
           c.event_id AS next_event_id, CAST(c.ts AS TIMESTAMP_NS) AS next_ts
    FROM purchases p
    ASOF JOIN clicks c
      ON p.user_id = c.user_id AND p.ts <= c.ts
    """,
)
def join_asof_forward(spark, sf_dir):
    """Forward as-of join: each purchase gets the user's NEXT click
    at or after it — the did-the-user-come-back lookahead
    (post-purchase engagement attribution). Same one-shuffle
    union+window composition as the backward join with the scan
    reversed; oracle is DuckDB's native ASOF JOIN with the
    inequality flipped — an independent implementation of the
    lookahead semantics."""
    ev = read_table(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.min("event_id").alias("event_id"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    return TP.asof_join_forward(
        purchases,
        clicks,
        key="user_id",
        ts="ts",
        tiebreak="event_id",
        right_payload=["event_id", "ts"],
    )


def _bands_values() -> str:
    return ", ".join(f"({lo}, {hi}, '{name}')" for lo, hi, name in BANDS)


@register(
    "join_range_band",
    oracle=f"""
    WITH bands(lo, hi, band) AS (VALUES {_bands_values()})
    SELECT band, CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS total_value
    FROM events JOIN bands ON value >= lo AND value < hi
    GROUP BY band
    """,
)
def join_range_band(spark, sf_dir):
    """Range join against an irregular bands dimension (broadcast
    inequality join), aggregated per band."""
    ev = read_table(spark, sf_dir, "events")
    bands = ev.sparkSession.createDataFrame(
        BANDS, "lo DOUBLE, hi DOUBLE, band STRING"
    )
    return (
        TP.range_band_join(ev, bands, "value")
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


@register(
    "agg_rollup_time",
    oracle="""
    SELECT CAST(coalesce(date_trunc('hour', ts), TIMESTAMP '1970-01-01')
                AS TIMESTAMP_NS) AS bucket_hour,
           coalesce(event_type, 'ALL') AS event_type,
           count(*) AS n, round(sum(value), 2) AS total_value
    FROM events
    GROUP BY ROLLUP (date_trunc('hour', ts), event_type)
    """,
)
def agg_rollup_time(spark, sf_dir):
    """Hierarchical time rollup (hour → type → grand total) — the
    hypertable continuous-aggregate shape, one shuffle."""
    return TP.rollup_time(read_table(spark, sf_dir, "events"))


@register(
    "agg_cube_events",
    oracle="""
    SELECT coalesce(dayofweek(ts) + 1, -1) AS dow,
           coalesce(event_type, 'ALL') AS event_type,
           count(*) AS n, round(avg(value), 4) AS avg_value
    FROM events
    GROUP BY CUBE (dayofweek(ts) + 1, event_type)
    """,
)
def agg_cube_events(spark, sf_dir):
    """CUBE over (day-of-week, event_type): the full grouping-set
    lattice in one pass (Spark dayofweek is 1=Sunday; DuckDB's is
    0-based, offset in the oracle)."""
    return TP.cube_events(read_table(spark, sf_dir, "events"))


#: Bucket width for the arithmetic range-join key: the coarsest
#: width <= every band's span, so each fact row lands in exactly one
#: bucket and each band explodes to a handful of buckets.
AUTOBUCKET_W = 5.0


@register(
    "join_range_autobucket",
    oracle=f"""
    WITH bands(lo, hi, band) AS (VALUES {_bands_values()})
    SELECT band, CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS total_value
    FROM events JOIN bands ON value >= lo AND value < hi
    GROUP BY band
    """,
)
def join_range_autobucket(spark, sf_dir):
    """Range join via an arithmetic bucket key — the scale path
    :func:`operators.temporal.range_band_join`'s docstring promises
    for when the band table is too large to broadcast-NLJ. Both
    sides compute bucket = floor(value / W); each band explodes to
    the buckets it overlaps (map-only, proportional to span/W, on
    the BAND side — never the fact side); the join is then a plain
    equi-join on the bucket, post-filtered by the exact bounds.
    Identical answer to join_range_band (same oracle), shuffle-
    hash-joinable at any band-table size instead of O(n·k)
    nested-loop. The inequality never leaves the small side."""
    ev = read_table(spark, sf_dir, "events")
    bands = ev.sparkSession.createDataFrame(
        BANDS, "lo DOUBLE, hi DOUBLE, band STRING"
    )
    w = AUTOBUCKET_W
    band_buckets = bands.select(
        "lo",
        "hi",
        "band",
        F.explode(
            F.expr(
                f"sequence(CAST(floor(lo / {w}) AS BIGINT),"
                f" CAST(floor((hi - 1e-9) / {w}) AS BIGINT))"
            )
        ).alias("bucket"),
    )
    facts = ev.select(
        "value", F.expr(f"CAST(floor(value / {w}) AS BIGINT)").alias("bucket")
    )
    return (
        facts.join(band_buckets, "bucket")
        .filter((F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")))
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


@register(
    "join_asof_nearest",
    oracle="""
    WITH clicks AS (
      SELECT user_id, ts, max(event_id) AS event_id
      FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
    purchases AS (
      SELECT event_id, user_id, ts, value
      FROM events WHERE event_type = 'purchase'),
    prev AS (
      SELECT p.event_id AS pid, c.event_id AS cid, c.ts AS cts
      FROM purchases p
      ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts),
    nxt AS (
      SELECT p.event_id AS pid, c.event_id AS cid, c.ts AS cts
      FROM purchases p
      ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts <= c.ts)
    SELECT p.event_id, p.user_id, CAST(p.ts AS TIMESTAMP_NS) AS ts, p.value,
           CASE WHEN pv.cts IS NOT NULL AND (nx.cts IS NULL
                      OR epoch_us(p.ts) - epoch_us(pv.cts)
                         <= epoch_us(nx.cts) - epoch_us(p.ts))
                THEN pv.cid ELSE nx.cid END AS nearest_event_id,
           CAST(CASE WHEN pv.cts IS NOT NULL AND (nx.cts IS NULL
                      OR epoch_us(p.ts) - epoch_us(pv.cts)
                         <= epoch_us(nx.cts) - epoch_us(p.ts))
                THEN pv.cts ELSE nx.cts END AS TIMESTAMP_NS) AS nearest_ts
    FROM purchases p
    JOIN prev pv ON pv.pid = p.event_id
    JOIN nxt nx ON nx.pid = p.event_id
    """,
)
def join_asof_nearest(spark, sf_dir):
    """Nearest as-of join: each purchase gets the user's CLOSEST
    click in time, before or after (ties prefer the earlier click) —
    the attribution variant when sessions can start on either side of
    the conversion. Composed from the backward + forward union+window
    passes re-joined on the purchase id; the oracle composes DuckDB's
    native ASOF LEFT JOIN both ways and picks by microsecond
    distance — an independent implementation of the same semantics."""
    ev = read_table(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("event_id"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    return TP.asof_join_nearest(
        purchases,
        clicks,
        key="user_id",
        ts="ts",
        tiebreak="event_id",
        right_payload=["event_id", "ts"],
        left_id="event_id",
    )


#: Maintenance/campaign windows for the interval-overlap join —
#: deliberately mixed spans (1 hour .. 7 days) over the fixture's
#: January range, half-open [start, end).
OVERLAP_WINDOWS = [
    ("w1", "2024-01-03 06:00:00", "2024-01-03 18:00:00"),
    ("w2", "2024-01-07 00:00:00", "2024-01-09 00:00:00"),
    ("w3", "2024-01-12 20:00:00", "2024-01-13 04:00:00"),
    ("w4", "2024-01-15 00:00:00", "2024-01-22 00:00:00"),
    ("w5", "2024-01-25 09:30:00", "2024-01-25 10:30:00"),
    ("w6", "2024-01-28 00:00:00", "2024-01-31 00:00:00"),
]

#: Interval-join bucket width: 1 hour in microseconds.
_OVL_BUCKET_US = 3_600_000_000


def _overlap_windows_values() -> str:
    return ", ".join(
        f"('{n}', TIMESTAMP '{s}', TIMESTAMP '{e}')"
        for n, s, e in OVERLAP_WINDOWS
    )


@register(
    "join_interval_overlap",
    oracle=f"""
    WITH w(wname, ws, we) AS (VALUES {_overlap_windows_values()}),
    act AS (
        SELECT user_id, CAST(ts AS DATE) AS adate,
               min(ts) AS a_min, max(ts) AS a_max
        FROM events GROUP BY 1, 2
    )
    SELECT wname,
           CAST(count(*) AS BIGINT) AS n_intervals,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM act JOIN w ON a_min < we AND a_max >= ws
    GROUP BY wname
    """,
)
def join_interval_overlap(spark, sf_dir):
    """Interval-OVERLAP join: per-user daily activity intervals
    [first event, last event] against a table of maintenance/campaign
    windows — which users were active during which window. A naive
    inequality join is a cartesian nested loop; the scale plan
    explodes BOTH interval sets to the hour buckets they cover,
    equi-joins on the bucket (candidate pairs only where intervals
    share an hour), de-duplicates pairs that met in several buckets,
    and post-filters the exact overlap predicate — the DuckDB oracle
    states the same join as the naive inequality, an independent
    implementation. Bucket fan-out is span/1h per interval and lands
    on the SMALL side's buckets for long windows; the fact side's
    daily intervals explode to at most 24 buckets."""
    ev = read_table(spark, sf_dir, "events")
    us = "unix_micros(CAST({} AS TIMESTAMP))"
    act = (
        ev.groupBy(
            "user_id", F.expr("CAST(ts AS DATE)").alias("adate")
        )
        .agg(F.min("ts").alias("a_min"), F.max("ts").alias("a_max"))
        .select(
            "user_id",
            "adate",
            "a_min",
            "a_max",
            F.explode(
                F.expr(
                    f"sequence({us.format('a_min')} DIV {_OVL_BUCKET_US},"
                    f" {us.format('a_max')} DIV {_OVL_BUCKET_US})"
                )
            ).alias("bucket"),
        )
    )
    w = spark.createDataFrame(
        [(n, s, e) for n, s, e in OVERLAP_WINDOWS],
        "wname STRING, ws_s STRING, we_s STRING",
    ).select(
        "wname",
        F.expr("CAST(ws_s AS TIMESTAMP)").alias("ws"),
        F.expr("CAST(we_s AS TIMESTAMP)").alias("we"),
    )
    wb = w.select(
        "wname",
        "ws",
        "we",
        F.explode(
            F.expr(
                f"sequence(unix_micros(ws) DIV {_OVL_BUCKET_US},"
                f" (unix_micros(we) - 1) DIV {_OVL_BUCKET_US})"
            )
        ).alias("bucket"),
    )
    pairs = (
        act.join(wb, "bucket")
        .filter((F.col("a_min") < F.col("we")) & (F.col("a_max") >= F.col("ws")))
        .select("user_id", "adate", "wname")
        .distinct()
    )
    return pairs.groupBy("wname").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.countDistinct("user_id").alias("n_users"),
    )


@register(
    "ts_anomaly_mad",
    oracle="""
    WITH hourly AS (
      SELECT event_type,
             CAST(date_trunc('hour', ts) AS TIMESTAMP_NS) AS window_start,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
    med AS (
      SELECT event_type, quantile_cont(n, 0.5) AS med
      FROM hourly GROUP BY event_type),
    dev AS (
      SELECT h.event_type, h.window_start, h.n, m.med,
             abs(h.n - m.med) AS dev
      FROM hourly h JOIN med m USING (event_type)),
    mad AS (
      SELECT event_type, quantile_cont(dev, 0.5) AS mad
      FROM dev GROUP BY event_type)
    SELECT d.event_type, d.window_start, d.n, d.med, ma.mad, d.dev,
           (d.dev > 1.5 * ma.mad AND ma.mad > 0) AS is_anomaly
    FROM dev d JOIN mad ma USING (event_type)
    """,
)
def ts_anomaly_mad(spark, sf_dir):
    """Robust time-series anomaly detection: per-type hourly event
    counts scored by median absolute deviation — the
    outlier-resistant alternative to z-scores (one hot hour can't
    drag its own threshold the way it drags a mean/stddev). Every
    hour is emitted with its deviation and an ``is_anomaly`` flag so
    the result doubles as the monitoring series. Float discipline:
    counts are integers and both medians are linear interpolations of
    integer (then half-integer) inputs, so every value is an exactly-
    representable binary fraction — the cross-engine comparison is
    bit-exact with NO rounding step. Scale shape: two keyed
    aggregations over (type, hour) partials (map-side combined) and
    two broadcast-sized joins back onto the hourly series — the
    per-type stats table is |event_types| rows no matter how many
    fact rows; nothing driver-side."""
    ev = read_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("window_start")
    ).agg(F.count(F.lit(1)).alias("n"))
    med = hourly.groupBy("event_type").agg(
        F.expr("percentile(n, 0.5)").alias("med")
    )
    dev = hourly.join(F.broadcast(med), "event_type").withColumn(
        "dev", F.abs(F.col("n") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(dev, 0.5)").alias("mad")
    )
    return dev.join(F.broadcast(mad), "event_type").select(
        "event_type",
        "window_start",
        "n",
        "med",
        "mad",
        "dev",
        ((F.col("dev") > 1.5 * F.col("mad")) & (F.col("mad") > 0)).alias(
            "is_anomaly"
        ),
    )


#: EWMA window: trailing 16 hourly buckets, decay 1/2 per step,
#: fixed-point weights 2^(15-j) — integer-exact in both engines.
_EWMA_LAGS = 16


def _ewma_terms(engine: str) -> str:
    terms = [
        f"coalesce(lag(n, {j}) OVER w, 0) * {1 << (_EWMA_LAGS - 1 - j)}"
        for j in range(_EWMA_LAGS)
    ]
    return " + ".join(terms)


@register(
    "ts_ewma_hourly",
    oracle=f"""
    WITH hourly AS (
      SELECT event_type,
             CAST(date_trunc('hour', ts) AS TIMESTAMP_NS) AS window_start,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2)
    SELECT event_type, window_start, n,
           CAST({_ewma_terms('duckdb')} AS BIGINT) AS ewma_scaled
    FROM hourly
    WINDOW w AS (PARTITION BY event_type ORDER BY window_start)
    """,
)
def ts_ewma_hourly(spark, sf_dir):
    """Exponentially-weighted trailing smoother over the hourly
    event series — the standard recurrence ewma_t = x_t/2 +
    ewma_{t-1}/2, which is sequential and therefore unexpressible as
    a plain aggregate, UNROLLED into its closed form: a trailing-16
    window of lag() terms with fixed-point weights 2^(15-j) (beyond
    16 steps the 1/2-decay contribution is below one count). All
    arithmetic is integer (the _POW_SCALE float discipline taken to
    its limit: no floats at all), so the driver compare is bit-exact.
    Scale shape: ONE window pass per type partition — the unrolled
    lags share a single sort/frame, no self-joins, no recursion; at
    100 TB this is a keyed window over (type, hour) partials exactly
    like ts_anomaly_mad's input stage."""
    ev = read_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("window_start")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = (
        "OVER (PARTITION BY event_type ORDER BY window_start)"
    )
    expr = _ewma_terms("spark").replace("OVER w", w)
    return hourly.select(
        "event_type",
        "window_start",
        "n",
        F.expr(f"CAST({expr} AS BIGINT)").alias("ewma_scaled"),
    )


#: As-of tolerance: matches older than this are nulled out (the
#: feature-store staleness cap).
_ASOF_TOL_US = 30 * 60 * 1_000_000


@register(
    "join_asof_tolerance",
    oracle=f"""
    WITH clicks AS (
      SELECT user_id, ts, max(event_id) AS event_id
      FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
    purchases AS (
      SELECT event_id, user_id, ts, value
      FROM events WHERE event_type = 'purchase')
    SELECT p.event_id, p.user_id, CAST(p.ts AS TIMESTAMP_NS) AS ts, p.value,
           CASE WHEN c.ts IS NOT NULL
                 AND epoch_us(CAST(p.ts AS TIMESTAMP))
                     - epoch_us(CAST(c.ts AS TIMESTAMP)) <= {_ASOF_TOL_US}
                THEN c.event_id END AS asof_event_id,
           CASE WHEN c.ts IS NOT NULL
                 AND epoch_us(CAST(p.ts AS TIMESTAMP))
                     - epoch_us(CAST(c.ts AS TIMESTAMP)) <= {_ASOF_TOL_US}
                THEN CAST(c.ts AS TIMESTAMP_NS) END AS asof_ts
    FROM purchases p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def join_asof_tolerance(spark, sf_dir):
    """As-of join with a STALENESS TOLERANCE — the feature-store
    contract (pandas merge_asof's ``tolerance``): each purchase gets
    the user's latest prior click ONLY if it is at most 30 minutes
    old; staler matches are nulled, and purchases with no prior
    click at all survive with nulls (LEFT semantics). A feature
    older than the cap is a training-serving skew bug — this
    operator is where that rule lives. Composition: the shared
    union+window as-of kernel (one keyed window pass, no range
    join), tolerance applied as an integer-microsecond projection,
    unmatched left rows restored by an anti-join union (both extra
    steps map-only or broadcast-sized; the window shuffle is still
    the only fact shuffle)."""
    ev = read_table(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("event_id"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    inner = TP.asof_join(
        purchases,
        clicks,
        key="user_id",
        ts="ts",
        tiebreak="event_id",
        right_payload=["event_id", "ts"],
    )
    within = F.expr(
        f"unix_micros(cast(ts as timestamp))"
        f" - unix_micros(cast(asof_ts as timestamp)) <= {_ASOF_TOL_US}"
    )
    matched = inner.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.when(within, F.col("asof_event_id")).alias("asof_event_id"),
        F.when(within, F.col("asof_ts")).alias("asof_ts"),
    )
    unmatched = purchases.join(
        inner.select("event_id"), "event_id", "left_anti"
    ).select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.lit(None).cast(inner.schema["asof_event_id"].dataType).alias(
            "asof_event_id"
        ),
        F.lit(None).cast(inner.schema["asof_ts"].dataType).alias("asof_ts"),
    )
    return matched.unionByName(unmatched)
