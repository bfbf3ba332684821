"""Classic warehouse query shapes over the TPC-H-ish fixture tables
(round-3 breadth): multi-way join pipelines with selective filters,
top-k, and a sketch-based approx-distinct — the shapes that exercise
Catalyst's join reordering, filter pushdown, broadcast selection, and
TakeOrderedAndProject at 100 TB.

The reference computes fixed-report aggregations over one table at a
time (src/etl_2016.py:38-63, src/etl_2022.py:75-118); these queries
generalize that reporting surface to the multi-table analytics a
warehouse user actually runs. Shapes follow the public TPC-H spec
(Q3/Q5/Q6/Q10 analogues), adapted to the fixture's columns.

Scale notes (verified via .explain on each):
- dimension sides (region/nation/customer/supplier) broadcast — the
  fact table (lineitem) is never shuffled before its aggregation;
- date/segment filters push into the parquet scans (PushedFilters);
- top-k uses TakeOrderedAndProject (no global sort, no full shuffle);
- every aggregate is rounded identically on both sides, and top-k
  ties are broken by a unique key so the result SET is deterministic.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from etl_jobs_spark.operators import money as M
from etl_jobs_spark.operators.hashing import hash60
from etl_jobs_spark.registry import register
from etl_jobs_spark.sources.readers import read_table


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: pure filter + single-row aggregate. The whole
    predicate reaches the parquet scan (PushedFilters on shipdate /
    discount / quantity), so at 100 TB this reads only row groups
    whose min/max stats overlap one shipdate year — the canonical
    proof that declarative filters beat hand-written loops."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            M.dsum2("l_extendedprice", "l_discount").alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST((1 - l_discount) AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue,
           o_orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-06-01'
      AND l_shipdate  > TIMESTAMP '1997-06-01'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: 3-way join, selective filters on both dims,
    top-10 by revenue. Customer (filtered to one segment) broadcasts;
    lineitem only shuffles for the final per-order aggregation; the
    limit compiles to TakeOrderedAndProject — per-partition heaps, a
    10-row driver merge, no global sort. Ties broken by l_orderkey so
    the 10-row SET is identical on both sides."""
    cust = read_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1997-06-01"
    )
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1997-06-01"
    )
    return (
        li.join(
            F.broadcast(orders), li.l_orderkey == orders.o_orderkey
        )
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            M.dsum2(
                "l_extendedprice", F.lit(1) - F.col("l_discount")
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name AS nation_name,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST((1 - l_discount) AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND c_nationkey = s_nationkey
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape: six-way join where every dimension broadcasts
    and the local-supplier predicate (customer and supplier in the
    same nation) is a post-join filter. lineitem flows through a
    chain of BroadcastHashJoins without a single fact-side shuffle
    until the 5-row nation aggregation."""
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    orders = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    supp = read_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    )
    return (
        li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            M.dsum2(
                "l_extendedprice", F.lit(1) - F.col("l_discount")
            ).alias("revenue")
        )
    )


@register(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST((1 - l_discount) AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue,
           n_name AS nation_name
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate <  TIMESTAMP '1996-10-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: who returned the most revenue last quarter.
    Broadcast dims, one fact aggregation keyed by customer, top-20
    via TakeOrderedAndProject with a c_custkey tiebreak."""
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    orders = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-07-01")
        & (F.col("o_orderdate") < "1996-10-01")
    )
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    nation = read_table(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation_name"))
        .agg(
            M.dsum2(
                "l_extendedprice", F.lit(1) - F.col("l_discount")
            ).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "nation_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


#: Fixed-point grid for centroid averaging: float32 components are
#: quantized to integers before summing so the mean is bit-identical
#: under any summation order on both engines (same rationale as
#: operators/udfs.py RMS_SCALE).
_CENTROID_SCALE = 1_000_000


@register(
    "embed_centroid_labels",
    oracle=f"""
    SELECT label, dim,
           round(sum(q) / ({_CENTROID_SCALE} * count(*)), 6) AS centroid_val
    FROM (
      SELECT label,
             generate_subscripts(embedding, 1) - 1 AS dim,
             floor(CAST(unnest(embedding) AS DOUBLE) * {_CENTROID_SCALE}
                   + 0.5) AS q
      FROM embeddings)
    GROUP BY label, dim
    """,
)
def embed_centroid_labels(spark, sf_dir):
    """Per-label centroid of the embedding corpus: posexplode the
    vector column and aggregate each (label, dimension) cell — the
    class-prototype computation behind centroid classifiers and
    k-means init. Map-side partial aggregation means the shuffle
    carries |labels|*dim partial sums, not vectors; at 100 TB the
    full corpus reduces to a few-KB result without any driver-side
    vector math. Components are fixed-point-quantized so the mean is
    summation-order-independent (exact oracle parity)."""
    emb = read_table(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.posexplode("embedding").alias("dim", "v"))
        .withColumn(
            "q",
            F.floor(
                F.col("v").cast("double") * _CENTROID_SCALE + F.lit(0.5)
            ),
        )
        .groupBy("label", F.col("dim").cast("bigint").alias("dim"))
        .agg(
            F.round(
                F.sum("q") / (F.lit(_CENTROID_SCALE) * F.count(F.lit(1))), 6
            ).alias("centroid_val")
        )
    )


@register(
    "agg_mode_value_bucket",
    oracle="""
    SELECT event_type, bucket AS mode_bucket,
           CAST(n AS BIGINT) AS n_in_mode
    FROM (
      SELECT event_type, bucket, n,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY n DESC, bucket ASC) AS rk
      FROM (
        SELECT event_type,
               CAST(floor(value / 10) AS BIGINT) AS bucket,
               count(*) AS n
        FROM events GROUP BY 1, 2))
    WHERE rk = 1
    """,
)
def agg_mode_value_bucket(spark, sf_dir):
    """Per-group mode (most frequent value bucket) — the missing
    built-in aggregate, composed scale-safely: one hash aggregation
    to (group, bucket) counts (map-side combine shrinks the shuffle
    to distinct pairs), then a row_number window over the tiny count
    table. Ties break toward the smallest bucket so the winner is
    deterministic on both engines. Never collects a value histogram
    to the driver."""
    ev = read_table(spark, sf_dir, "events")
    counts = ev.groupBy(
        "event_type",
        F.floor(F.col("value") / 10).cast("bigint").alias("bucket"),
    ).agg(F.count(F.lit(1)).alias("n"))
    w = W.partitionBy("event_type").orderBy(
        F.col("n").desc(), F.col("bucket").asc()
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("bucket").alias("mode_bucket"),
            F.col("n").alias("n_in_mode"),
        )
    )


#: KMV sketch size. Estimate uses the classic (k-1)/F(h_k) unbiased
#: estimator (Bar-Yossef et al. 2002) over a 60-bit portable hash.
_KMV_K = 256


@register(
    "approx_distinct_kmv",
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT {hash60("CAST(user_id AS VARCHAR)", "duck")} AS hv
      FROM events),
    kth AS (
      SELECT max(hv) AS hk, CAST(count(*) AS BIGINT) AS k
      FROM (SELECT hv FROM h ORDER BY hv LIMIT {_KMV_K}))
    SELECT k,
           CAST(round(({_KMV_K} - 1) * pow(2.0, 60) / hk, 0) AS BIGINT)
             AS est_distinct
    FROM kth
    """,
)
def approx_distinct_kmv(spark, sf_dir):
    """K-minimum-values distinct-count sketch, fully deterministic:
    hash every key with the engine-portable 60-bit md5 hash, keep the
    k smallest DISTINCT hashes (TakeOrderedAndProject — per-partition
    heaps of k, no global sort), estimate n_distinct = (k-1)·2^60 /
    h_k. Unlike approx_count_distinct's HLL (whose registers are
    implementation-defined), the KMV sketch is reproducible in ANSI
    SQL, so the ORACLE CHECKS THE SKETCH ITSELF, not just the shape.
    At 100 TB: the scan reduces to k 8-byte values per partition,
    merged on the driver — the sketch never grows with data."""
    ev = read_table(spark, sf_dir, "events")
    h = (
        ev.select(
            F.expr(
                hash60("CAST(user_id AS STRING)", "spark")
            ).alias("hv")
        )
        .distinct()
        .orderBy("hv")
        .limit(_KMV_K)
    )
    return h.agg(
        F.count(F.lit(1)).alias("k"),
        F.expr(
            f"CAST(round(({_KMV_K} - 1) * pow(2.0, 60) / max(hv), 0)"
            " AS BIGINT)"
        ).alias("est_distinct"),
    )


def _kmv_sketch_sql(etype: str) -> str:
    return f"""
      SELECT hv FROM (
        SELECT DISTINCT {hash60("CAST(user_id AS VARCHAR)", "duck")} AS hv
        FROM events WHERE event_type = '{etype}')
      ORDER BY hv LIMIT {_KMV_K}"""


@register(
    "agg_kmv_intersect_types",
    oracle=f"""
    WITH ha AS ({_kmv_sketch_sql("click")}),
         hb AS ({_kmv_sketch_sql("purchase")}),
         th AS (
           SELECT least(ta.th, tb.th) AS theta,
                  ta.k AS k_click, tb.k AS k_purchase
           FROM (SELECT max(hv) AS th, CAST(count(*) AS BIGINT) AS k FROM ha) ta,
                (SELECT max(hv) AS th, CAST(count(*) AS BIGINT) AS k FROM hb) tb),
         c AS (
           SELECT CAST(count(*) AS BIGINT) AS n_common
           FROM ha JOIN hb USING (hv) CROSS JOIN th
           WHERE ha.hv < th.theta)
    SELECT th.k_click, th.k_purchase, c.n_common,
           CAST(round(c.n_common * pow(2.0, 60) / th.theta, 0) AS BIGINT)
             AS est_intersect
    FROM th, c
    """,
)
def agg_kmv_intersect_types(spark, sf_dir):
    """Theta-sketch-style DISTINCT-COUNT INTERSECTION — the set
    operation HLL cannot do (HLL unions; intersections need
    inclusion-exclusion with exploding error). Build a KMV sketch per
    event type (k smallest distinct 60-bit hashes), take
    theta = min of the two k-th minima, and estimate
    |click-users ∩ purchase-users| = |common hashes < theta| * 2^60 /
    theta. Like approx_distinct_kmv, the sketch is fully
    deterministic, so the oracle CHECKS THE SKETCH ITSELF.
    At 100 TB each sketch is k 8-byte values reduced per partition
    (TakeOrdered, no global sort); the intersection joins two
    256-value sets — driver-scale work after a linear scan."""
    from etl_jobs_spark import cache

    ev = read_table(spark, sf_dir, "events")

    def sketch(etype: str):
        # each sketch feeds 2-3 plan branches (theta, common-count,
        # final projection); persist the <=256-row result so the
        # corpus scan + distinct + TakeOrdered runs once per side
        return cache.track(
            ev.filter(F.col("event_type") == etype)
            .select(
                F.expr(hash60("CAST(user_id AS STRING)", "spark")).alias("hv")
            )
            .distinct()
            .orderBy("hv")
            .limit(_KMV_K)
        )

    ha, hb = sketch("click"), sketch("purchase")
    th = (
        ha.agg(F.max("hv").alias("tha"), F.count(F.lit(1)).alias("k_click"))
        .crossJoin(
            hb.agg(
                F.max("hv").alias("thb"),
                F.count(F.lit(1)).alias("k_purchase"),
            )
        )
        .select(
            F.least("tha", "thb").alias("theta"), "k_click", "k_purchase"
        )
    )
    c = (
        ha.join(hb, "hv")
        .crossJoin(th.select("theta"))
        .filter(F.col("hv") < F.col("theta"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return th.crossJoin(c).select(
        "k_click",
        "k_purchase",
        "n_common",
        F.expr(
            "CAST(round(n_common * pow(2.0, 60) / theta, 0) AS BIGINT)"
        ).alias("est_intersect"),
    )


@register(
    "q14_promo_effect",
    oracle="""
    SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP_NS) AS ship_month,
           CAST(round(COALESCE(sum(CASE WHEN p_type = 'PROMO'
                          THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
                               CAST((1 - l_discount) AS DECIMAL(18,2))
                          END), 0), 2) AS DOUBLE) AS promo_revenue,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST((1 - l_discount) AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY 1
    """,
)
def q14_promo_effect(spark, sf_dir):
    """TPC-H Q14 shape (promotion effect), extended to a monthly
    breakdown: one year of lineitem joined to part, promo vs total
    revenue per ship month. The date filter reaches the lineitem
    parquet scan (row-group pruning on shipdate min/max stats); part
    is the small side and BROADCASTS, so the fact table never
    shuffles — scan, broadcast probe, partial agg, |months| rows.
    Revenue sums round to cents on both engines (the q6 float
    discipline)."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    )
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice").cast(M.DEC2) * (
        F.lit(1) - F.col("l_discount")
    ).cast(M.DEC2)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.date_trunc("month", "l_shipdate").alias("ship_month"))
        .agg(
            F.round(
                F.coalesce(
                    F.sum(F.when(F.col("p_type") == "PROMO", rev)),
                    F.lit(0),
                ),
                2,
            )
            .cast("double")
            .alias("promo_revenue"),
            F.round(F.sum(rev), 2).cast("double").alias("total_revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


_Q19_PRED = """
    (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
        AND l_quantity BETWEEN 1 AND 11)
    OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 25
        AND l_quantity BETWEEN 10 AND 20)
    OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 35
        AND l_quantity BETWEEN 20 AND 30)
"""


@register(
    "q19_bracket_revenue",
    oracle=f"""
    SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST((1 - l_discount) AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(count(DISTINCT p_brand) AS BIGINT) AS n_brands
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE {_Q19_PRED}
    """,
)
def q19_bracket_revenue(spark, sf_dir):
    """TPC-H Q19 shape: revenue under an OR of conjunctive brackets
    spanning BOTH join sides (brand+size on part, quantity on
    lineitem). The optimizer's job is to split the disjunction:
    Catalyst derives the single-side implications — p_brand IN
    (1,2,3) pushes into the part scan, quantity <= 30 into the
    lineitem scan — so the scans skip before the broadcast probe and
    the full OR evaluates only on surviving pairs. The predicate
    string is shared verbatim with the oracle."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = read_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(F.expr(_Q19_PRED))
        .agg(
            M.dsum2(
                "l_extendedprice", F.lit(1) - F.col("l_discount")
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
            F.countDistinct("p_brand").alias("n_brands"),
        )
    )


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH cost AS (
      SELECT l.l_partkey, l.l_suppkey,
             min(l.l_extendedprice) AS min_price
      FROM lineitem l GROUP BY 1, 2),
    best AS (
      SELECT c.l_partkey, c.l_suppkey, c.min_price,
             row_number() OVER (PARTITION BY c.l_partkey
                                ORDER BY c.min_price ASC,
                                         c.l_suppkey ASC) AS rn
      FROM cost c)
    SELECT p.p_partkey, p.p_name, p.p_brand,
           s.s_name AS supplier_name, n.n_name AS nation_name,
           round(b.min_price, 2) AS best_price
    FROM best b
    JOIN part p ON b.l_partkey = p.p_partkey
    JOIN supplier s ON b.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE b.rn = 1 AND p.p_size >= 40
    """,
)
def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape: the ARGMIN JOIN — for each large part, the
    supplier quoting the lowest observed price (the classic
    correlated-subquery query, realized scale-correctly). Plan:
    one (partkey, suppkey) hash aggregation over the fact table
    (map-side combined — the only fact shuffle), a per-part window
    argmin with a unique tiebreak (suppkey) so the pick is
    deterministic, then broadcast joins onto part/supplier/nation.
    The correlated subquery a 100 TB engine must NOT run per-row is
    exactly what the oracle states declaratively; Catalyst's window
    + broadcast pipeline computes it in two shuffles total (agg +
    window partitioning, both on partkey-derived keys)."""
    part = read_table(spark, sf_dir, "part").filter(F.col("p_size") >= 40)
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    # the selective part filter lands BEFORE the fact aggregation: a
    # broadcast semi join prunes ~3/4 of lineitem out of the shuffle
    # (the optimizer can't infer this cross-table implication itself)
    li = li.join(
        F.broadcast(part.select("p_partkey")),
        li.l_partkey == F.col("p_partkey"),
        "left_semi",
    )
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min("l_extendedprice").alias("min_price")
    )
    w = W.partitionBy("l_partkey").orderBy(
        F.col("min_price").asc(), F.col("l_suppkey").asc()
    )
    best = (
        cost.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    return (
        best.join(F.broadcast(part), best.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), best.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select(
            "p_partkey",
            "p_name",
            "p_brand",
            F.col("s_name").alias("supplier_name"),
            F.col("n_name").alias("nation_name"),
            F.round("min_price", 2).alias("best_price"),
        )
    )


@register(
    "agg_kmv_difference_types",
    oracle=f"""
    WITH ha AS ({_kmv_sketch_sql("click")}),
         hb AS ({_kmv_sketch_sql("purchase")}),
         th AS (
           SELECT least(ta.th, tb.th) AS theta,
                  ta.k AS k_click, tb.k AS k_purchase
           FROM (SELECT max(hv) AS th, CAST(count(*) AS BIGINT) AS k FROM ha) ta,
                (SELECT max(hv) AS th, CAST(count(*) AS BIGINT) AS k FROM hb) tb),
         d AS (
           SELECT CAST(count(*) AS BIGINT) AS n_only_click
           FROM ha CROSS JOIN th
           WHERE ha.hv < th.theta
             AND ha.hv NOT IN (SELECT hv FROM hb))
    SELECT th.k_click, th.k_purchase, d.n_only_click,
           CAST(round(d.n_only_click * pow(2.0, 60) / th.theta, 0) AS BIGINT)
             AS est_difference
    FROM th, d
    """,
)
def agg_kmv_difference_types(spark, sf_dir):
    """Theta-sketch-style DISTINCT-COUNT DIFFERENCE — completing the
    KMV set algebra (union ≈ approx_distinct_kmv over the merged
    stream, intersection = agg_kmv_intersect_types, difference =
    THIS): |click-users \\ purchase-users| estimated as the count of
    click-sketch hashes below theta that are absent from the
    purchase sketch, scaled by 2^60/theta. The A-and-not-B audience
    question (reach exclusion, churn-without-return) that neither
    HLL nor plain counts can answer mergeably. Sketch is
    deterministic → the oracle CHECKS THE SKETCH ITSELF; same
    TakeOrdered 256-value build, anti-join of two 256-row sets."""
    from etl_jobs_spark import cache

    ev = read_table(spark, sf_dir, "events")

    def sketch(etype: str):
        return cache.track(
            ev.filter(F.col("event_type") == etype)
            .select(
                F.expr(hash60("CAST(user_id AS STRING)", "spark")).alias("hv")
            )
            .distinct()
            .orderBy("hv")
            .limit(_KMV_K)
        )

    ha, hb = sketch("click"), sketch("purchase")
    th = (
        ha.agg(F.max("hv").alias("tha"), F.count(F.lit(1)).alias("k_click"))
        .crossJoin(
            hb.agg(
                F.max("hv").alias("thb"),
                F.count(F.lit(1)).alias("k_purchase"),
            )
        )
        .select(
            F.least("tha", "thb").alias("theta"), "k_click", "k_purchase"
        )
    )
    d = (
        ha.join(hb, "hv", "left_anti")
        .crossJoin(th.select("theta"))
        .filter(F.col("hv") < F.col("theta"))
        .agg(F.count(F.lit(1)).alias("n_only_click"))
    )
    return th.crossJoin(d).select(
        "k_click",
        "k_purchase",
        "n_only_click",
        F.expr(
            "CAST(round(n_only_click * pow(2.0, 60) / theta, 0) AS BIGINT)"
        ).alias("est_difference"),
    )


@register(
    "q4_priority_exists",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
    GROUP BY o.o_orderpriority
    """,
)
def q4_priority_exists(spark, sf_dir):
    """TPC-H Q4 shape: orders counted per priority where at least
    one line item shipped late (>30 days after order date) — the
    canonical correlated-EXISTS query. Scale realization: EXISTS
    with a correlated date comparison is a LEFT SEMI join on the
    order key with the inequality as the join residual — one
    shuffle on l_orderkey/o_orderkey, and the semi join ships only
    the lineitem key+date, never its payload; duplicate qualifying
    lines cost nothing (semi joins short-circuit). The anti-pattern
    this replaces (per-row subquery execution) doesn't exist in
    Spark — Catalyst plans the same semi join from either the SQL
    EXISTS text or this DataFrame form."""
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    o = orders.alias("o")
    l = li.alias("l")
    late = o.join(
        l,
        (F.col("l.l_orderkey") == F.col("o.o_orderkey"))
        & (
            F.col("l.l_shipdate")
            > F.expr("o.o_orderdate + INTERVAL 30 DAY")
        ),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@register(
    "q12_priority_by_flag",
    oracle="""
    SELECT l.l_returnflag,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY l.l_returnflag
    """,
)
def q12_priority_by_flag(spark, sf_dir):
    """TPC-H Q12 shape: line items classed by return flag, split
    into high/low order-priority counts — the conditional-aggregate-
    after-join pattern (ONE pass computes both classes; the naive
    form runs two filtered joins). Scale shape: the only shuffle is
    the orderkey equi-join (orders projects just key+priority, a
    2-column shuffle payload); both CASE sums fold into one
    map-side-combinable aggregate on the tiny flag key."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag"
    )
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0))
            .cast("bigint")
            .alias("high_line_count"),
            F.sum(F.when(hi, 0).otherwise(1))
            .cast("bigint")
            .alias("low_line_count"),
        )
    )


@register(
    "q18_large_orders",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, sum(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 180)
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           CAST(o.o_orderdate AS TIMESTAMP_NS) AS o_orderdate,
           o.o_totalprice,
           round(b.total_qty, 2) AS total_qty
    FROM big b
    JOIN orders o ON b.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
)
def q18_large_orders(spark, sf_dir):
    """TPC-H Q18 shape (large-volume customers): orders whose total
    line-item quantity exceeds a threshold, joined back to customer,
    top-100 by price — the HAVING-subquery + join + top-k composite.
    Scale realization: the quantity rollup aggregates lineitem FIRST
    (map-side combinable, one shuffle on the order key) and the
    HAVING filter cuts it to a tiny key set BEFORE any join — so the
    expensive table is touched once and both joins run over the
    filtered survivors (customer broadcasts). Top-100 compiles to
    TakeOrderedAndProject with a deterministic (price, orderkey)
    tiebreak — no global sort. l_quantity is an integral double, so
    the rounded sum is exact on both engines."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 180)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(
            F.broadcast(cust.select("c_custkey", "c_name")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.round("total_qty", 2).alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


#: Round-then-sum integer cents for the TPC-H revenue expression:
#: the per-row DOUBLE product is IEEE-identical on identical
#: operands in both engines, and the BIGINT sum is order-free.
_REV_CENTS = (
    "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"
)


@register(
    "q7_nation_volume",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(o.o_orderdate) AS BIGINT) AS ship_year,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum({_REV_CENTS}) AS BIGINT) AS revenue_cents
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE n1.n_nationkey <> n2.n_nationkey
    GROUP BY 1, 2, 3
    """,
)
def q7_nation_volume(spark, sf_dir):
    """TPC-H Q7 shape (cross-nation shipping volume): revenue
    between every (supplier nation, customer nation) pair per order
    year — the five-way snowflake join whose scale story is that
    ONLY lineitem⋈orders is big: customer, supplier, and both
    nation legs broadcast, so the fact side shuffles exactly once
    (the orderkey join) and the rest is map-side. (The fixture has
    no partsupp table, so the generalization keeps ALL nation pairs
    instead of TPC-H's two literals — a bigger but
    constant-bounded |nations|² output.) Revenue is round-then-sum
    integer cents — order-free, bit-stable."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    n1 = F.broadcast(
        nation.select(
            F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation")
        )
    )
    n2 = F.broadcast(
        nation.select(
            F.col("n_nationkey").alias("ck"), F.col("n_name").alias("cust_nation")
        )
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(
            F.broadcast(cust.select("c_custkey", "c_nationkey")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .join(
            F.broadcast(supp.select("s_suppkey", "s_nationkey")),
            li.l_suppkey == F.col("s_suppkey"),
        )
        .join(n1, F.col("s_nationkey") == F.col("sk"))
        .join(n2, F.col("c_nationkey") == F.col("ck"))
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("o_orderdate").cast("bigint").alias("ship_year"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(F.expr(_REV_CENTS)).cast("bigint").alias("revenue_cents"),
        )
    )


@register(
    "q13_order_count_distribution",
    oracle="""
    WITH per_cust AS (
      SELECT c.c_custkey,
             CAST(count(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON o.o_custkey = c.c_custkey
       AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey)
    SELECT c_count, CAST(count(*) AS BIGINT) AS n_customers
    FROM per_cust GROUP BY c_count
    """,
)
def q13_order_count_distribution(spark, sf_dir):
    """TPC-H Q13 shape (customer order-count distribution): LEFT
    OUTER join with the filter INSIDE the join predicate (urgent
    orders don't count, but order-less customers still appear with
    count 0 — moving the predicate to WHERE silently drops them,
    the classic outer-join bug this query exists to catch), then the
    histogram of counts. (The fixture has no o_comment, so the
    'special requests' exclusion is the priority flag.) Scale: one
    shuffle on custkey for the count, a second tiny one for the
    distribution; the filter rides the scan."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (orders.o_custkey == cust.c_custkey)
            & (orders.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers")
    )


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey AS suppkey,
             CAST(sum({_REV_CENTS}) AS BIGINT) AS total_cents
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY 1)
    SELECT s.s_suppkey, s.s_name, r.total_cents
    FROM rev r JOIN supplier s ON s.s_suppkey = r.suppkey
    WHERE r.total_cents = (SELECT max(total_cents) FROM rev)
    """,
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape (top supplier): quarterly revenue per
    supplier, keep the one(s) equal to the GLOBAL max — the
    view-plus-scalar-subquery pattern. Realization: the revenue
    rollup is computed ONCE and persisted (it feeds both the max
    and the final filter — TPC-H's CREATE VIEW made the same
    point); the scalar max is a 1-row broadcast cross join, so
    nothing rescans lineitem. Ties all surface (revenue is exact
    integer cents, so 'equal to max' is well-defined — the float
    version of this query is famously tie-broken by luck)."""
    from etl_jobs_spark import cache

    li = read_table(spark, sf_dir, "lineitem")
    supp = read_table(spark, sf_dir, "supplier")
    rev = cache.track(
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1996-04-01")
        )
        .groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(F.sum(F.expr(_REV_CENTS)).cast("bigint").alias("total_cents"))
    )
    mx = rev.agg(F.max("total_cents").alias("mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_cents") == F.col("mx"))
        .join(
            F.broadcast(supp.select("s_suppkey", "s_name")),
            F.col("suppkey") == F.col("s_suppkey"),
        )
        .select("s_suppkey", "s_name", "total_cents")
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    WITH q AS (
      SELECT l_partkey,
             CAST(round(l_quantity) AS BIGINT) AS qty,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem),
    stats AS (
      SELECT l_partkey, qty, cents,
             CAST(sum(qty) OVER (PARTITION BY l_partkey) AS BIGINT)
               AS part_qty,
             CAST(count(*) OVER (PARTITION BY l_partkey) AS BIGINT)
               AS part_n
      FROM q)
    SELECT CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(cents) AS BIGINT) AS revenue_cents,
           CAST(sum(cents) // 7 AS BIGINT) AS avg_yearly_cents
    FROM stats
    WHERE 5 * qty * part_n < part_qty
    """,
)
def q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 shape (small-quantity-order revenue): lines whose
    quantity is below 20% of their part's average — the correlated
    scalar-subquery pattern, decorrelated to ONE per-part window
    (TPC-H's per-row subquery would rescan lineitem per part; the
    window computes every part's average in the same single sort).
    The 0.2·avg comparison is cleared of floats entirely:
    qty < sum/(5·n)  ⇔  5·qty·n < sum — exact BIGINTs, no division
    at all. Scale: one partkey-partitioned window + a global
    reduce; no join (the fixture carries no part-brand filter
    column constraint — the window IS the correlation)."""
    li = read_table(spark, sf_dir, "lineitem")
    from pyspark.sql import Window as W

    q = li.select(
        "l_partkey",
        F.expr("CAST(round(l_quantity) AS BIGINT)").alias("qty"),
        F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias(
            "cents"
        ),
    )
    w = W.partitionBy("l_partkey")
    stats = q.select(
        "qty",
        "cents",
        F.sum("qty").over(w).cast("bigint").alias("part_qty"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("part_n"),
    )
    return stats.filter(
        5 * F.col("qty") * F.col("part_n") < F.col("part_qty")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum("cents").cast("bigint").alias("revenue_cents"),
        F.expr("CAST(sum(cents) DIV 7 AS BIGINT)").alias(
            "avg_yearly_cents"
        ),
    )


@register(
    "q21_suppliers_kept_waiting",
    oracle="""
    WITH lines AS (
      SELECT l.l_orderkey, l.l_suppkey,
             CASE WHEN epoch_us(l.l_shipdate) // 86400000000
                       - epoch_us(o.o_orderdate) // 86400000000 > 90
                  THEN 1 ELSE 0 END AS late
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'),
    per_supp AS (
      SELECT l_orderkey, l_suppkey,
             CAST(max(late) AS BIGINT) AS supp_late
      FROM lines GROUP BY 1, 2),
    per_order AS (
      SELECT l_orderkey,
             CAST(count(*) AS BIGINT) AS n_supps,
             CAST(sum(supp_late) AS BIGINT) AS n_late
      FROM per_supp GROUP BY 1),
    blamed AS (
      SELECT ps.l_suppkey
      FROM per_supp ps
      JOIN per_order po ON po.l_orderkey = ps.l_orderkey
      WHERE ps.supp_late = 1 AND po.n_supps >= 2 AND po.n_late = 1)
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM blamed b JOIN supplier s ON s.s_suppkey = b.l_suppkey
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
)
def q21_suppliers_kept_waiting(spark, sf_dir):
    """TPC-H Q21 shape (suppliers who kept orders waiting): in
    finished multi-supplier orders, blame the supplier who was the
    ONLY late one. The textbook form is EXISTS + NOT-EXISTS
    self-joins on lineitem (three scans); here the correlation
    decorrelates to a two-level aggregation — per (order, supplier)
    lateness, then per-order supplier/late counts — so lineitem
    shuffles ONCE on the order key and the 'exactly one late
    supplier among ≥2' predicate is arithmetic over the rollup.
    ('Late' = shipped >90 days after order date in integer day
    indexes — the fixture has no commit/receipt dates.) Top-20 is
    TakeOrderedAndProject with the (count, name) tiebreak."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    supp = read_table(spark, sf_dir, "supplier")
    day = "epoch_us_day"
    lines = (
        li.join(
            orders.filter(F.col("o_orderstatus") == "F").select(
                "o_orderkey", "o_orderdate"
            ),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .select(
            "l_orderkey",
            "l_suppkey",
            F.expr(
                "CASE WHEN unix_micros(CAST(l_shipdate AS TIMESTAMP))"
                " DIV 86400000000"
                " - unix_micros(CAST(o_orderdate AS TIMESTAMP))"
                " DIV 86400000000 > 90 THEN 1 ELSE 0 END"
            ).alias("late"),
        )
    )
    per_supp = lines.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("late").cast("bigint").alias("supp_late")
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_supps"),
        F.sum("supp_late").cast("bigint").alias("n_late"),
    )
    blamed = (
        per_supp.join(per_order, "l_orderkey")
        .filter(
            (F.col("supp_late") == 1)
            & (F.col("n_supps") >= 2)
            & (F.col("n_late") == 1)
        )
        .select("l_suppkey")
    )
    return (
        blamed.join(
            F.broadcast(supp.select("s_suppkey", "s_name")),
            blamed.l_suppkey == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


@register(
    "q22_global_sales_opportunity",
    oracle="""
    WITH avg_bal AS (
      SELECT CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT))
                  // count(*) AS BIGINT) AS cutoff_cents
      FROM customer WHERE c_acctbal > 0),
    rich_idle AS (
      SELECT c.c_nationkey,
             CAST(round(c.c_acctbal * 100) AS BIGINT) AS bal_cents
      FROM customer c CROSS JOIN avg_bal a
      WHERE CAST(round(c.c_acctbal * 100) AS BIGINT) > a.cutoff_cents
        AND NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderdate >= TIMESTAMP '2000-01-01'))
    SELECT c_nationkey,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(bal_cents) AS BIGINT) AS total_bal_cents
    FROM rich_idle GROUP BY c_nationkey
    """,
)
def q22_global_sales_opportunity(spark, sf_dir):
    """TPC-H Q22 shape (global sales opportunity): customers with
    above-average positive balance with NO RECENT order (nothing
    since 2000 — the lapsed-customer slice; the fixture's order
    history is dense enough that literally-never-ordered is empty),
    rolled up per nation — the scalar-aggregate-subquery +
    anti-join composite. Realization: the balance cutoff is a 1-row broadcast
    computed as sum(cents) DIV count(*) on BOTH sides (avg-then-cast
    is NOT portable: DuckDB's CAST(avg AS BIGINT) rounds
    half-away-from-zero while Spark's .cast('bigint') truncates, so
    the cutoff would diverge by 1 whenever the mean's fraction is
    >= 0.5), the never-ordered predicate is a LEFT ANTI join on
    custkey (never a NOT IN, whose null semantics are the classic
    trap), and the rollup shuffles only the tiny survivor set. (The
    fixture has no phone column, so the country-code slice is the
    nation key itself.)"""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    cents = F.expr("CAST(round(c_acctbal * 100) AS BIGINT)")
    cutoff = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(
            F.expr(
                "CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT))"
                " DIV count(*) AS BIGINT)"
            ).alias("cutoff_cents")
        )
    )
    rich = (
        cust.select("c_custkey", "c_nationkey", cents.alias("bal_cents"))
        .crossJoin(F.broadcast(cutoff))
        .filter(F.col("bal_cents") > F.col("cutoff_cents"))
    )
    idle = rich.join(
        orders.filter(F.col("o_orderdate") >= "2000-01-01").select(
            "o_custkey"
        ),
        rich.c_custkey == F.col("o_custkey"),
        "left_anti",
    )
    return idle.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("bal_cents").cast("bigint").alias("total_bal_cents"),
    )


# ---------------------------------------------------------------------------
# Round 8: the six remaining TPC-H shapes (Q8, Q9, Q11, Q16, Q19,
# Q20) — completing all 22. The fixture has no partsupp table, so
# the three partsupp-dependent queries substitute lineitem's
# (l_partkey, l_suppkey) relationship as the supplier-part link and
# p_retailprice as the unit-cost basis; each docstring states the
# substitution. All money is round-then-sum integer cents
# (_REV_CENTS); all ratios are integer DIV.
# ---------------------------------------------------------------------------


@register(
    "q8_national_market_share",
    oracle=f"""
    WITH sales AS (
      SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
             s.s_nationkey,
             {_REV_CENTS} AS cents
      FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
      JOIN region r   ON cn.n_regionkey = r.r_regionkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE r.r_regionkey = 2)
    SELECT o_year,
           CAST(sum(CASE WHEN s_nationkey = 3 THEN cents ELSE 0 END)
                AS BIGINT) AS nation_cents,
           CAST(sum(cents) AS BIGINT) AS region_cents,
           CAST(CASE WHEN sum(cents) >= 1000000000000
                     THEN sum(CASE WHEN s_nationkey = 3 THEN cents
                              ELSE 0 END)
                          // (sum(cents) // 1000)
                     ELSE sum(CASE WHEN s_nationkey = 3 THEN cents
                              ELSE 0 END)
                          * 1000 // sum(cents) END
                AS BIGINT) AS share_permille
    FROM sales GROUP BY o_year
    """,
)
def q8_national_market_share(spark, sf_dir):
    """TPC-H Q8 shape (national market share): within orders from
    customers in one region (r_regionkey 2), the per-year revenue
    share captured by suppliers of one nation (n_nationkey 3) — the
    eight-way snowflake whose answer is a conditional-aggregate
    ratio. Plan: ONLY lineitem⋈orders shuffles; customer, supplier,
    nation, and the region filter all broadcast, and the share is a
    CASE-sum over the one grouped pass (never two scans). Share is
    exact integer per-mille (cents * 1000 DIV cents)."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    asia_cust = (
        cust.join(
            F.broadcast(nation.filter(F.col("n_regionkey") == 2)),
            cust.c_nationkey == F.col("n_nationkey"),
            "left_semi",
        ).select("c_custkey")
    )
    sales = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(asia_cust), orders.o_custkey == F.col("c_custkey"))
        .join(
            F.broadcast(supp.select("s_suppkey", "s_nationkey")),
            li.l_suppkey == F.col("s_suppkey"),
        )
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            F.col("s_nationkey"),
            F.expr(_REV_CENTS).alias("cents"),
        )
    )
    return sales.groupBy("o_year").agg(
        F.expr(
            "CAST(sum(CASE WHEN s_nationkey = 3 THEN cents ELSE 0 END)"
            " AS BIGINT)"
        ).alias("nation_cents"),
        F.sum("cents").cast("bigint").alias("region_cents"),
        # branch so the per-mille scaling never multiplies a
        # corpus-sized revenue sum by 1000 (the embed_pca_power_iter
        # renormalization lesson); inert below ~1e12 cents/region-year
        F.expr(
            "CAST(CASE WHEN sum(cents) >= 1000000000000"
            " THEN sum(CASE WHEN s_nationkey = 3 THEN cents ELSE 0 END)"
            "      DIV (sum(cents) DIV 1000)"
            " ELSE sum(CASE WHEN s_nationkey = 3 THEN cents ELSE 0 END)"
            "      * 1000 DIV sum(cents) END AS BIGINT)"
        ).alias("share_permille"),
    )


@register(
    "q9_product_type_profit",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           CAST(sum({_REV_CENTS}
                    - CAST(round(p.p_retailprice * 100) AS BIGINT)
                      * CAST(l.l_quantity AS BIGINT) * 9 // 10)
                AS BIGINT) AS profit_cents
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%g%'
    GROUP BY 1, 2
    """,
)
def q9_product_type_profit(spark, sf_dir):
    """TPC-H Q9 shape (product-type profit): profit per supplier
    nation per year over parts whose name matches a pattern. The
    fixture has no partsupp, so unit cost substitutes 90% of
    p_retailprice (ps_supplycost's role), making
    profit = revenue_cents - qty * cost_cents — exact BIGINTs, DIV
    by 10 AFTER the multiply so both engines truncate identically.
    Plan: the name filter prunes part BEFORE its broadcast join
    (predicate pushdown to the part scan), lineitem shuffles once
    for the orders join, supplier/nation broadcast."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    orders = read_table(spark, sf_dir, "orders")
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    gp = part.filter(F.col("p_name").like("%g%")).select(
        "p_partkey", "p_retailprice"
    )
    return (
        li.join(F.broadcast(gp), li.l_partkey == F.col("p_partkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(
            F.broadcast(supp.select("s_suppkey", "s_nationkey")),
            li.l_suppkey == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(
                nation.select("n_nationkey", F.col("n_name").alias("nation"))
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("nation", F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            F.sum(
                F.expr(
                    f"{_REV_CENTS} - CAST(round(p_retailprice * 100) AS"
                    " BIGINT) * CAST(l_quantity AS BIGINT) * 9 DIV 10"
                )
            )
            .cast("bigint")
            .alias("profit_cents")
        )
    )


@register(
    "q11_important_stock",
    oracle=f"""
    WITH vals AS (
      SELECT l.l_partkey,
             CAST(sum({_REV_CENTS}) AS BIGINT) AS value_cents
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE s.s_nationkey = 7
      GROUP BY l.l_partkey),
    total AS (SELECT CAST(sum(value_cents) AS BIGINT) AS t FROM vals)
    SELECT v.l_partkey AS p_partkey, v.value_cents
    FROM vals v CROSS JOIN total
    WHERE v.value_cents * 5000 > total.t
    """,
)
def q11_important_stock(spark, sf_dir):
    """TPC-H Q11 shape (important stock): parts whose inventory
    value held via one nation's suppliers (s_nationkey 7) exceeds a
    fixed fraction (1/5000) of that nation's total — the
    group-by-HAVING-scalar-subquery pattern. partsupp substitution:
    value = revenue cents of the nation's lineitems per part. Plan:
    ONE part-keyed aggregation over the (nation-pruned, broadcast
    semi-joined) fact slice; the total is a 1-row broadcast; the
    fraction test is integer cross-multiplication (value*5000 > t),
    no division anywhere."""
    li = read_table(spark, sf_dir, "lineitem")
    supp = read_table(spark, sf_dir, "supplier")
    nat7 = supp.filter(F.col("s_nationkey") == 7).select("s_suppkey")
    vals = (
        li.join(F.broadcast(nat7), li.l_suppkey == F.col("s_suppkey"), "left_semi")
        .groupBy(F.col("l_partkey"))
        .agg(F.sum(F.expr(_REV_CENTS)).cast("bigint").alias("value_cents"))
    )
    total = vals.agg(F.sum("value_cents").cast("bigint").alias("t"))
    return (
        vals.crossJoin(F.broadcast(total))
        .filter(F.col("value_cents") * 5000 > F.col("t"))
        .select(F.col("l_partkey").alias("p_partkey"), "value_cents")
    )


@register(
    "q16_supplier_part_count",
    oracle="""
    SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#9'
      AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_suppkey % 10 = 7)
    GROUP BY 1, 2, 3
    """,
)
def q16_supplier_part_count(spark, sf_dir):
    """TPC-H Q16 shape (supplier-part relationship census): distinct
    suppliers per (brand, type, size) over a size IN-list, excluding
    one brand and a flagged-supplier set (the complaint filter;
    the fixture has no s_comment, so flagged = s_suppkey % 10 = 7).
    The NOT IN realizes as a LEFT ANTI join — the null-semantics
    trap TPC-H's Q16 is famous for never applies to an anti-join.
    Plan: part prunes on brand+size IN-list at the scan, broadcasts
    onto the fact; the anti side broadcasts; one distinct-agg
    shuffle keyed by the (brand, type, size) group."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    supp = read_table(spark, sf_dir, "supplier")
    sized = part.filter(
        (F.col("p_brand") != "Brand#9")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    flagged = supp.filter(F.col("s_suppkey") % 10 == 7).select("s_suppkey")
    return (
        li.join(F.broadcast(sized), li.l_partkey == F.col("p_partkey"))
        .join(
            F.broadcast(flagged),
            li.l_suppkey == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", F.col("p_size").cast("bigint").alias("p_size"))
        .agg(
            F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt")
        )
    )


@register(
    "q19_discounted_revenue",
    oracle=f"""
    SELECT CAST(sum({_REV_CENTS}) AS BIGINT) AS revenue_cents,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_discounted_revenue(spark, sf_dir):
    """TPC-H Q19 shape (discounted revenue): revenue over the
    DISJUNCTION of three brand/size/quantity branches — the query
    that punishes engines which can't push a disjunctive predicate
    into a join. Realization: the part side pre-filters to the
    UNION of the three brand/size envelopes (so the broadcast
    carries only candidate parts), and the full branch disjunction
    evaluates post-join in one codegen'd predicate. Single-row
    exact-cents output."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    env = part.filter(
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 5))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15))
    ).select("p_partkey", "p_brand", "p_size")
    joined = li.join(F.broadcast(env), li.l_partkey == F.col("p_partkey"))
    branch = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return joined.filter(branch).agg(
        F.sum(F.expr(_REV_CENTS)).cast("bigint").alias("revenue_cents"),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
    )


@register(
    "q20_potential_promotion",
    oracle="""
    WITH sq AS (
      SELECT l.l_partkey, l.l_suppkey,
             CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS supp_qty
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      WHERE p.p_name LIKE 'small%'
        AND l.l_shipdate >= TIMESTAMP '1999-01-01'
      GROUP BY 1, 2),
    pt AS (
      SELECT l_partkey,
             CAST(sum(supp_qty) AS BIGINT) AS part_qty
      FROM sq GROUP BY 1),
    dominant AS (
      SELECT sq.l_suppkey, sq.l_partkey
      FROM sq JOIN pt ON sq.l_partkey = pt.l_partkey
      WHERE sq.supp_qty * 3 > pt.part_qty)
    SELECT s.s_suppkey, s.s_name,
           CAST(count(*) AS BIGINT) AS n_dominated_parts
    FROM dominant d JOIN supplier s ON d.l_suppkey = s.s_suppkey
    GROUP BY 1, 2
    """,
)
def q20_potential_promotion(spark, sf_dir):
    """TPC-H Q20 shape (potential part promotion): suppliers who
    DOMINATE the recent flow of a name-matched part — shipped more
    than a third of that part's total since the cutoff (availqty's role,
    partsupp substitution). TPC-H states it as nested correlated
    subqueries; the scale realization decorrelates to TWO keyed
    aggregations over the same pruned slice (per (part, supp), then
    per part via a second rollup OF THE FIRST — the fact is read
    once) joined back with an integer cross-multiplication
    (3*supp_qty > part_qty). Suppliers roll up with their dominated-
    part census."""
    from etl_jobs_spark import cache

    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    supp = read_table(spark, sf_dir, "supplier")
    small = part.filter(F.col("p_name").like("small%")).select("p_partkey")
    sq = (
        li.filter(F.col("l_shipdate") >= "1999-01-01")
        .join(F.broadcast(small), li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(F.col("l_quantity").cast("bigint"))
            .cast("bigint")
            .alias("supp_qty")
        )
    )
    sq = cache.track(sq)
    pt = sq.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum("supp_qty").cast("bigint").alias("part_qty")
    )
    dominant = sq.join(
        F.broadcast(pt), sq.l_partkey == F.col("pk")
    ).filter(F.col("supp_qty") * 3 > F.col("part_qty"))
    return (
        dominant.join(
            F.broadcast(supp.select("s_suppkey", "s_name")),
            dominant.l_suppkey == F.col("s_suppkey"),
        )
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("n_dominated_parts"))
    )
