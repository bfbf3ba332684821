"""Spatial (2-D) operators: grid-blocked distance joins and density
maps.

A new operator family beyond the reference's relational surface
(generalizing its band/range joins — src/etl_2022.py joins are all
1-D): points live on an integer grid, and every pairwise operation
is BLOCKED through fixed-size cells, so the only joins are equi-joins
on cell keys — the standard distributed spatial-join plan (the same
seed-block-verify discipline as the dedup ladder, in two dimensions).

Coordinates are derived deterministically from event_id (the fixture
carries no geo columns), with multiplicative scattering that fills
the grid uniformly — integer arithmetic end-to-end, so both engines
agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_jobs_spark.registry import register
from etl_jobs_spark.sources.readers import read_table

#: World size (coordinates in [0, GRID_WORLD)), neighbor radius, and
#: the cell width — cells are exactly the radius, so all neighbors
#: within the radius sit in the 3x3 surrounding cell block.
GRID_WORLD = 10_000
GRID_RADIUS = 25

from etl_jobs_spark.operators.hashing import hash60

#: Portable md5-derived scatter: a LINEAR map (id * prime % world)
#: lays points on sparse lattice lines and the even/odd split onto
#: parallel lines that never come within the join radius — the
#: hash scatter is what makes the fixture genuinely uniform.
_HX_D = hash60("'gx:' || CAST(event_id AS VARCHAR)", "duckdb")
_HY_D = hash60("'gy:' || CAST(event_id AS VARCHAR)", "duckdb")
_HX_S = hash60("'gx:' || CAST(event_id AS STRING)", "spark")
_HY_S = hash60("'gy:' || CAST(event_id AS STRING)", "spark")
_X_D = f"({_HX_D}) % 10000"
_Y_D = f"({_HY_D}) % 10000"
_X_S = f"({_HX_S}) % 10000"
_Y_S = f"({_HY_S}) % 10000"


def grid_distance_join(a_df, b_df, radius: int):
    """Generic grid-blocked 2-D distance join: for every row of
    ``a_df`` (a_id, xa, ya), all rows of ``b_df`` (b_id, xb, yb)
    within L2 ``radius``, returned as the per-a nearest/count rollup
    (a_event_id, n_within, min_dist2, nearest_b). Cells are exactly
    ``radius`` wide, so the 3x3 neighbor block provably contains
    every candidate: |dx| <= radius implies the cell indexes differ
    by at most 1 (tests/test_spatial_property.py checks completeness
    against brute force). Extracted from join_spatial_grid so the
    blocking logic is testable on arbitrary point sets."""
    spark = a_df.sparkSession
    b = b_df.select(
        "b_id",
        "xb",
        "yb",
        F.expr(f"xb DIV {radius}").alias("cx"),
        F.expr(f"yb DIV {radius}").alias("cy"),
    )
    offsets = spark.range(-1, 2).select(F.col("id").alias("dx")).crossJoin(
        spark.range(-1, 2).select(F.col("id").alias("dy"))
    )
    a_exp = a_df.crossJoin(F.broadcast(offsets)).select(
        "a_id",
        "xa",
        "ya",
        (F.expr(f"xa DIV {radius}") + F.col("dx")).alias("cx"),
        (F.expr(f"ya DIV {radius}") + F.col("dy")).alias("cy"),
    )
    d2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    cand = (
        a_exp.join(b, ["cx", "cy"])
        .withColumn("d2", d2)
        .filter(F.col("d2") <= radius * radius)
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("a_id")
    ranked = cand.select(
        "a_id",
        "b_id",
        "d2",
        F.row_number()
        .over(w.orderBy(F.col("d2").asc(), F.col("b_id").asc()))
        .alias("rk"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_within"),
    )
    return ranked.filter(F.col("rk") == 1).select(
        F.col("a_id").alias("a_event_id"),
        "n_within",
        F.col("d2").cast("long").alias("min_dist2"),
        F.col("b_id").alias("nearest_b"),
    )


@register(
    "join_spatial_grid",
    oracle=f"""
    WITH pts AS (
      SELECT event_id,
             CAST({_X_D} AS BIGINT) AS x,
             CAST({_Y_D} AS BIGINT) AS y
      FROM events),
    a AS (SELECT event_id AS a_id, x AS xa, y AS ya FROM pts
          WHERE event_id % 2 = 0),
    b AS (SELECT event_id AS b_id, x AS xb, y AS yb,
                 xb // {GRID_RADIUS} AS cx, yb // {GRID_RADIUS} AS cy
          FROM pts WHERE event_id % 2 = 1),
    cand AS (
      SELECT a.a_id, a.xa, a.ya, b.b_id,
             (a.xa - b.xb) * (a.xa - b.xb)
             + (a.ya - b.yb) * (a.ya - b.yb) AS d2
      FROM a
      CROSS JOIN range(-1, 2) dx(dx)
      CROSS JOIN range(-1, 2) dy(dy)
      JOIN b ON b.cx = a.xa // {GRID_RADIUS} + dx.dx
            AND b.cy = a.ya // {GRID_RADIUS} + dy.dy
      WHERE (a.xa - b.xb) * (a.xa - b.xb)
            + (a.ya - b.yb) * (a.ya - b.yb)
            <= {GRID_RADIUS * GRID_RADIUS}),
    ranked AS (
      SELECT a_id, b_id, d2,
             row_number() OVER (PARTITION BY a_id
                                ORDER BY d2 ASC, b_id ASC) AS rk,
             CAST(count(*) OVER (PARTITION BY a_id) AS BIGINT)
               AS n_within
      FROM cand)
    SELECT a_id AS a_event_id, n_within,
           CAST(d2 AS BIGINT) AS min_dist2,
           b_id AS nearest_b
    FROM ranked WHERE rk = 1
    """,
)
def join_spatial_grid(spark, sf_dir):
    """Distance join on a 2-D integer grid: for every even-id point
    find all odd-id points within GRID_RADIUS (L2), report neighbor
    count + deterministic nearest (tie-break on id). The scale plan:
    cell = coordinate DIV radius, the probe side expands to its 3x3
    neighbor cells (a 9-row explode — constant), and the ONLY join
    is an equi-join on cell keys; the exact distance predicate then
    filters candidates. Never an all-pairs product, never a
    theta-join: output and work are bounded by point density per
    cell. At 100 TB the cell width is the knob (match it to the
    query radius; repartition by cell co-locates both sides), and
    skewed hot cells split by salting the cell key — same playbook
    as every blocked join in the repo. Generalizes the 1-D
    band/as-of joins (queries/temporal.py) to two dimensions."""
    ev = read_table(spark, sf_dir, "events")
    pts = ev.select(
        "event_id",
        F.expr(f"CAST({_X_S} AS BIGINT)").alias("x"),
        F.expr(f"CAST({_Y_S} AS BIGINT)").alias("y"),
    )
    a = pts.filter(F.col("event_id") % 2 == 0).select(
        F.col("event_id").alias("a_id"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
    )
    b = pts.filter(F.col("event_id") % 2 == 1).select(
        F.col("event_id").alias("b_id"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
    )
    return grid_distance_join(a, b, GRID_RADIUS)


#: Density-map cell width (coarser than the join cells).
DENSITY_CELL = 250


@register(
    "geo_grid_density",
    oracle=f"""
    WITH pts AS (
      SELECT CAST({_X_D} AS BIGINT) // {DENSITY_CELL} AS cx,
             CAST({_Y_D} AS BIGINT) // {DENSITY_CELL} AS cy,
             value
      FROM events),
    cells AS (
      SELECT cx, cy, CAST(count(*) AS BIGINT) AS n_points,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS value_cents
      FROM pts GROUP BY cx, cy)
    SELECT cx, cy, n_points, value_cents,
           CAST(rk AS BIGINT) AS rk
    FROM (
      SELECT cx, cy, n_points, value_cents,
             row_number() OVER (ORDER BY n_points DESC, cx ASC, cy ASC)
               AS rk
      FROM cells)
    WHERE rk <= 20
    """,
)
def geo_grid_density(spark, sf_dir):
    """Top-20 densest grid cells (a heatmap tile census): points
    bucket into coarse cells, ONE keyed aggregation counts and sums
    integer-cent values, and the global top-20 compiles to
    TakeOrderedAndProject (no full sort — per-partition top-20s
    merge on the driver). The hot-cell ranking a geo dashboard or a
    partition-skew monitor reads. Deterministic: counts break ties
    on (cx, cy)."""
    ev = read_table(spark, sf_dir, "events")
    cells = (
        ev.select(
            F.expr(f"CAST({_X_S} AS BIGINT) DIV {DENSITY_CELL}").alias("cx"),
            F.expr(f"CAST({_Y_S} AS BIGINT) DIV {DENSITY_CELL}").alias("cy"),
            F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
        )
        .groupBy("cx", "cy")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_points"),
            F.sum("cents").cast("long").alias("value_cents"),
        )
    )
    from pyspark.sql import Window as W

    order = [
        F.col("n_points").desc(),
        F.col("cx").asc(),
        F.col("cy").asc(),
    ]
    # limit-first: the global cut compiles to TakeOrderedAndProject
    # (per-partition top-20s merged on the driver); the rank window
    # then runs over exactly 20 rows.
    top = cells.orderBy(*order).limit(20)
    return top.withColumn(
        "rk", F.row_number().over(W.orderBy(*order)).cast("long")
    )


#: Convex test polygons (integer vertices, counter-clockwise). A
#: point is inside iff every edge cross product is >= 0 — exact
#: integer arithmetic, unrolled per polygon into ONE scan projection
#: (the polygon table is literal, like the k-means centroids).
POLYGONS = {
    1: [(1000, 1000), (4000, 1200), (3800, 4200), (900, 3900)],
    2: [(5000, 5000), (9000, 5200), (9500, 9000), (7000, 9800), (4800, 8800)],
    3: [(200, 6000), (2500, 6200), (1500, 9500)],
    4: [(6000, 500), (9500, 700), (9000, 3500), (6200, 3300)],
}


def _inside_expr(poly) -> str:
    terms = []
    n = len(poly)
    for i in range(n):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % n]
        terms.append(
            f"(({x2} - {x1}) * (y - {y1}) - ({y2} - {y1}) * (x - {x1})) >= 0"
        )
    return "(" + " AND ".join(terms) + ")"


def _pip_oracle() -> str:
    rows = []
    for pid, poly in POLYGONS.items():
        rows.append(f"""
    SELECT {pid} AS polygon_id,
           CAST(sum(CASE WHEN {_inside_expr(poly)} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_points,
           CAST(sum(CASE WHEN {_inside_expr(poly)}
                         THEN CAST(round(value * 100) AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS value_cents
    FROM pts""")
    return f"""
    WITH pts AS (
      SELECT CAST({_X_D} AS BIGINT) AS x,
             CAST({_Y_D} AS BIGINT) AS y,
             value
      FROM events)
    {" UNION ALL ".join(rows)}
    """


@register("spatial_point_in_polygon", oracle=_pip_oracle())
def spatial_point_in_polygon(spark, sf_dir):
    """Point-in-polygon containment census over convex regions: for
    each literal polygon, count contained points and sum their
    integer-cent values. The convex test is k exact integer cross
    products per polygon, fully unrolled into the scan projection —
    NO join, NO shuffle beyond the final 4-row reduce; the polygon
    set rides into the closure exactly like a broadcast dim. At
    100 TB with thousands of polygons the same plan becomes a
    cell-blocked candidate join (polygon bounding boxes rasterized
    to the join_spatial_grid cells) followed by this exact test —
    the standard two-phase spatial filter-refine."""
    ev = read_table(spark, sf_dir, "events")
    pts = ev.select(
        F.expr(f"CAST({_X_S} AS BIGINT)").alias("x"),
        F.expr(f"CAST({_Y_S} AS BIGINT)").alias("y"),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
    )
    parts = []
    for pid, poly in POLYGONS.items():
        inside = F.expr(_inside_expr(poly))
        parts.append(
            pts.agg(
                F.lit(pid).alias("polygon_id"),
                F.sum(F.when(inside, 1).otherwise(0))
                .cast("bigint")
                .alias("n_points"),
                F.sum(F.when(inside, F.col("cents")).otherwise(0))
                .cast("bigint")
                .alias("value_cents"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


#: Morton (Z-order) geometry: 14 bits per axis covers the
#: [0, GRID_WORLD) integer coordinates; tiles are Morton prefixes at
#: depth 6 (m >> 16 — each tile is a 156x156 world square).
MORTON_BITS = 14
MORTON_TILE_SHIFT = 16


def _morton_expr(x_expr: str, y_expr: str, engine: str) -> str:
    """Bit-interleaved Morton code from pure integer arithmetic
    (DIV/%/multiply — no dialect bitwise operators), identical in
    both engines on the non-negative coordinate domain."""
    div = "DIV" if engine == "spark" else "//"
    terms = []
    for i in range(MORTON_BITS):
        p2, p4 = 1 << i, 1 << (2 * i)
        terms.append(f"((({x_expr}) {div} {p2}) % 2) * {p4}")
        terms.append(f"((({y_expr}) {div} {p2}) % 2) * {2 * p4}")
    return "(" + " + ".join(terms) + ")"


@register(
    "spatial_morton_tiles",
    oracle=f"""
    WITH pts AS (
      SELECT {_morton_expr(f"CAST({_X_D} AS BIGINT)",
                           f"CAST({_Y_D} AS BIGINT)", "duckdb")} AS m,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events),
    tiles AS (
      SELECT m // {1 << MORTON_TILE_SHIFT} AS tile,
             CAST(count(*) AS BIGINT) AS n_points,
             CAST(sum(cents) AS BIGINT) AS value_cents,
             CAST(min(m) AS BIGINT) AS min_morton,
             CAST(max(m) AS BIGINT) AS max_morton
      FROM pts GROUP BY 1)
    SELECT CAST(tile AS BIGINT) AS tile, n_points, value_cents,
           min_morton, max_morton, CAST(rk AS BIGINT) AS rk
    FROM (
      SELECT *, row_number() OVER (
               ORDER BY n_points DESC, tile ASC) AS rk
      FROM tiles)
    WHERE rk <= 20
    """,
)
def spatial_morton_tiles(spark, sf_dir):
    """Z-ORDER (MORTON) SPATIAL INDEXING: interleave the 14-bit x/y
    coordinates into a Morton code — pure integer arithmetic
    (DIV/mod/multiply), no dialect bitwise ops — and census the
    top-20 Morton-prefix tiles (depth-6 squares) by point count,
    with each tile's min/max code span. The Morton code is THE
    locality-preserving layout key for spatial data at scale: range
    scans over a Z-curve prefix touch one contiguous key range, so
    sorting/partitioning 100 TB of points by this code gives every
    square tile contiguous storage (the 2-D companion of
    zorder_layout_stats' multi-column layout audit, here with the
    real bit-interleave). Plan: the code is a map-only projection;
    the tile census is ONE combinable aggregation on the prefix;
    the global top-20 compiles to TakeOrderedAndProject — no full
    sort, no joins."""
    from pyspark.sql import Window as W

    ev = read_table(spark, sf_dir, "events")
    m = _morton_expr(
        f"CAST({_X_S} AS BIGINT)", f"CAST({_Y_S} AS BIGINT)", "spark"
    )
    tiles = (
        ev.select(
            F.expr(m).alias("m"),
            F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
        )
        .groupBy(
            F.expr(f"m DIV {1 << MORTON_TILE_SHIFT}").alias("tile")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_points"),
            F.sum("cents").cast("long").alias("value_cents"),
            F.min("m").cast("long").alias("min_morton"),
            F.max("m").cast("long").alias("max_morton"),
        )
    )
    order = [F.col("n_points").desc(), F.col("tile").asc()]
    top = tiles.orderBy(*order).limit(20)
    return top.withColumn(
        "rk", F.row_number().over(W.orderBy(*order)).cast("long")
    ).select(
        F.col("tile").cast("long").alias("tile"),
        "n_points",
        "value_cents",
        "min_morton",
        "max_morton",
        "rk",
    )
