"""Relational query declarations (SURVEY §7 step 4 breadth)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_jobs_spark.operators import relational as R
from etl_jobs_spark.registry import register
from etl_jobs_spark.sources.readers import read_table


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                          AS sum_qty,
           round(sum(l_extendedprice), 2)                                     AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)                  AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)    AS sum_charge,
           round(avg(l_quantity), 4)                                          AS avg_qty,
           round(avg(l_extendedprice), 4)                                     AS avg_price,
           round(avg(l_discount), 4)                                          AS avg_disc,
           count(*)                                                           AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    return R.pricing_summary(read_table(spark, sf_dir, "lineitem"))


@register(
    "join_star_revenue",
    oracle="""
    SELECT r_name AS region_name, n_name AS nation_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*)                                          AS n_lineitems,
           count(DISTINCT o_orderkey)                        AS n_orders
    FROM lineitem
    JOIN orders   ON l_orderkey  = o_orderkey
    JOIN customer ON o_custkey   = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def join_star_revenue(spark, sf_dir):
    return R.star_join_revenue(
        read_table(spark, sf_dir, "lineitem"),
        read_table(spark, sf_dir, "orders"),
        read_table(spark, sf_dir, "customer"),
        read_table(spark, sf_dir, "nation"),
        read_table(spark, sf_dir, "region"),
    )


@register(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def topk_orders(spark, sf_dir):
    return R.top_orders(read_table(spark, sf_dir, "orders"), k=10)


@register(
    "window_rank_events",
    oracle="""
    SELECT user_id, event_id, event_type, value, rnk FROM (
      SELECT user_id, event_id, event_type, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY value DESC, event_id ASC) AS rnk
      FROM events)
    WHERE rnk <= 3
    """,
)
def window_rank_events(spark, sf_dir):
    return R.window_rank_events(read_table(spark, sf_dir, "events"), k=3)


@register(
    "window_running_sum",
    oracle="""
    SELECT user_id, event_id,
           round(sum(value) OVER (PARTITION BY user_id
                                  ORDER BY ts ASC, event_id ASC
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
             AS running_value
    FROM events
    """,
)
def window_running_sum(spark, sf_dir):
    return R.window_running_sum(read_table(spark, sf_dir, "events"))


@register(
    "setop_union_all",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
    UNION ALL
    SELECT c_custkey, c_name, c_mktsegment FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
)
def setop_union_all(spark, sf_dir):
    """Union-all of two filtered scans (ref: pd.concat
    src/etl_2020.py:157 — Qkey setop_union_all)."""
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    return R.union_all(
        cust.filter(F.col("c_mktsegment") == "AUTOMOBILE"),
        cust.filter(F.col("c_mktsegment") == "BUILDING"),
    )


@register(
    "setop_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
    """,
)
def setop_intersect(spark, sf_dir):
    """Customers with both urgent and low-priority orders."""
    o = read_table(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
        .intersect(o.filter(F.col("o_orderpriority") == "5-LOW").select("o_custkey"))
    )


@register(
    "setop_except",
    oracle="""
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders
    """,
)
def setop_except(spark, sf_dir):
    """Customers with no orders (EXCEPT distinct semantics)."""
    return (
        read_table(spark, sf_dir, "customer")
        .select("c_custkey")
        .exceptAll(
            read_table(spark, sf_dir, "orders")
            .select(F.col("o_custkey").alias("c_custkey"))
        )
        .distinct()
    )


@register(
    "json_extract_props",
    oracle="""
    SELECT event_id, event_type,
           CAST(json_extract(props, '$.k') AS INTEGER) AS props_k
    FROM events
    """,
)
def json_extract_props(spark, sf_dir):
    return R.extract_json_props(read_table(spark, sf_dir, "events"))


@register(
    "agg_events_by_type",
    oracle="""
    SELECT event_type,
           count(*)                   AS n_events,
           round(sum(value), 2)       AS total_value,
           round(avg(value), 4)       AS avg_value,
           count(DISTINCT user_id)    AS n_users
    FROM events
    GROUP BY event_type
    """,
)
def agg_events_by_type(spark, sf_dir):
    return R.grouped_agg_events(read_table(spark, sf_dir, "events"))


@register(
    "agg_salted_events",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2)     AS total_value,
           round(sum(value) / count(*), 4) AS avg_value
    FROM events
    GROUP BY event_type
    """,
)
def agg_salted_events(spark, sf_dir):
    """Two-phase salted aggregation — same answer as a direct
    groupBy (the oracle), different physical plan (skew-resistant)."""
    return R.salted_agg_events(read_table(spark, sf_dir, "events"))
