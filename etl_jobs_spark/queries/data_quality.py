"""Data-quality / governance checks over warehouse tables:
k-anonymity audit, referential-integrity orphan scan, feed
staleness. The dbt-test / Great-Expectations family of operators,
generalizing the reference's per-row validation era
(src/etl_2018.py:19-31, src/etl_2022.py:140-188) to whole-table
contract checks.

Scale shapes: k-anonymity is one hash aggregation on the
quasi-identifier tuple; orphan scans are LEFT ANTI joins (the dim
side broadcasts when small, and at 100 TB the anti-join is the same
shuffle the fact table's next join would pay anyway); staleness is
a tiny per-key agg against a broadcast corpus watermark."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_jobs_spark.registry import register
from etl_jobs_spark.sources.readers import read_table

#: k-anonymity threshold: quasi-identifier groups smaller than this
#: are re-identification risks.
K_ANON = 5

#: Simulated upstream deletion for the orphan scan: every 97th
#: customer key is dropped from the dim (fixtures ship referentially
#: intact, so the check needs a deterministic violation source).
ORPHAN_MOD = 97


@register(
    "dq_k_anonymity",
    oracle=f"""
    SELECT c_mktsegment, c_nationkey,
           CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
           CAST(count(*) AS BIGINT) AS n
    FROM customer
    GROUP BY 1, 2, 3
    HAVING count(*) < {K_ANON}
    """,
)
def dq_k_anonymity(spark, sf_dir):
    """k-anonymity audit: quasi-identifier groups (segment ×
    nation × coarse balance band) with fewer than k=5 members —
    each output row is a re-identification risk a privacy gate
    must suppress or generalize. One hash aggregation; the QI
    tuple is the grouping key, so the shuffle carries only the
    tuple + partial counts."""
    cust = read_table(spark, sf_dir, "customer")
    return (
        cust.select(
            "c_mktsegment",
            "c_nationkey",
            F.expr("CAST(floor(c_acctbal / 1000) AS BIGINT)").alias(
                "bal_band"
            ),
        )
        .groupBy("c_mktsegment", "c_nationkey", "bal_band")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") < K_ANON)
    )


@register(
    "dq_referential_orphans",
    oracle=f"""
    WITH dim AS (
        SELECT c_custkey FROM customer WHERE c_custkey % {ORPHAN_MOD} <> 0
    ),
    ev AS (
        SELECT CAST(count(*) AS BIGINT) AS n_facts,
               CAST(sum(CAST(user_id NOT IN (SELECT c_custkey FROM dim)
                    AS INTEGER)) AS BIGINT) AS n_orphans
        FROM events
    ),
    ords AS (
        SELECT CAST(count(*) AS BIGINT) AS n_facts,
               CAST(sum(CAST(o_custkey NOT IN (SELECT c_custkey FROM dim)
                    AS INTEGER)) AS BIGINT) AS n_orphans
        FROM orders
    )
    SELECT 'events.user_id->customer' AS check_name, n_facts, n_orphans,
           round(CAST(n_orphans AS DOUBLE) / n_facts, 6) AS orphan_rate
    FROM ev
    UNION ALL
    SELECT 'orders.o_custkey->customer', n_facts, n_orphans,
           round(CAST(n_orphans AS DOUBLE) / n_facts, 6)
    FROM ords
    """,
)
def dq_referential_orphans(spark, sf_dir):
    """Referential-integrity scan: fact rows whose foreign key has
    no dim match (dim simulates upstream deletions by dropping every
    97th key). LEFT ANTI join per fact table — the dim key column
    broadcasts; counting orphans costs one map-side pass over each
    fact table, no fact-side shuffle."""
    cust = read_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") % ORPHAN_MOD != 0
    )
    dim = F.broadcast(cust.select("c_custkey"))

    def check(fact, key, name):
        orphans = fact.join(
            dim, fact[key] == dim["c_custkey"], "left_anti"
        )
        return (
            fact.agg(F.count(F.lit(1)).alias("n_facts"))
            .crossJoin(
                orphans.agg(F.count(F.lit(1)).alias("n_orphans"))
            )
            .select(
                F.lit(name).alias("check_name"),
                "n_facts",
                "n_orphans",
                F.expr(
                    "round(CAST(n_orphans AS DOUBLE) / n_facts, 6)"
                ).alias("orphan_rate"),
            )
        )

    ev = check(
        read_table(spark, sf_dir, "events"),
        "user_id",
        "events.user_id->customer",
    )
    orders = check(
        read_table(spark, sf_dir, "orders"),
        "o_custkey",
        "orders.o_custkey->customer",
    )
    return ev.unionByName(orders)


@register(
    "dq_stale_feeds",
    oracle="""
    WITH mx AS (SELECT max(ts) AS corpus_max FROM events),
    per AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               max(ts) AS last_ts
        FROM events GROUP BY event_type
    )
    SELECT event_type, n, last_ts,
           CAST(floor((epoch(corpus_max) - epoch(last_ts)) / 60)
                AS BIGINT) AS minutes_behind,
           CAST(floor((epoch(corpus_max) - epoch(last_ts)) / 60) > 1440
                AS BIGINT) AS is_stale
    FROM per, mx
    """,
)
def dq_stale_feeds(spark, sf_dir):
    """Feed-freshness check: each event type's high watermark vs the
    corpus watermark (a pinned reference point, so the check is
    deterministic — production would use current_timestamp()).
    Tiny per-key agg + broadcast of the 1-row corpus max."""
    ev = read_table(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("corpus_max"))
    per = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.max("ts").alias("last_ts")
    )
    # seconds-epoch double arithmetic (not interval division): the
    # same floor((a - b) / 60) both engines state; casts route
    # through TIMESTAMP for NTZ-stored sources.
    lag_min = (
        "floor((CAST(CAST(corpus_max AS TIMESTAMP) AS DOUBLE)"
        " - CAST(CAST(last_ts AS TIMESTAMP) AS DOUBLE)) / 60)"
    )
    return per.crossJoin(F.broadcast(mx)).select(
        "event_type",
        "n",
        "last_ts",
        F.expr(f"CAST({lag_min} AS BIGINT)").alias("minutes_behind"),
        F.expr(f"CAST({lag_min} > 1440 AS BIGINT)").alias("is_stale"),
    )


#: Declarative expectation suite: (rule name, violation predicate in
#: BOTH dialects — the fragments are engine-portable SQL).
_EXPECTATIONS = [
    ("not_null_value", "value_n IS NULL"),
    ("not_null_event_type", "event_type_n IS NULL"),
    (
        "value_in_range",
        "value_n IS NOT NULL AND NOT (value_n BETWEEN 0 AND 150)",
    ),
    (
        "type_in_domain",
        "event_type_n IS NOT NULL AND event_type_n NOT IN "
        "('click','view','purchase','signup','error')",
    ),
]


def _expectations_oracle() -> str:
    from etl_jobs_spark.queries._shared import DIRTY_SQL

    selects = [
        f"""SELECT '{name}' AS rule,
               CAST(count(*) AS BIGINT) AS n_checked,
               CAST(sum(CASE WHEN {pred} THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_violations
        FROM d"""
        for name, pred in _EXPECTATIONS
    ] + [
        """SELECT 'unique_event_id' AS rule,
               CAST(count(*) AS BIGINT) AS n_checked,
               CAST(count(*) - count(DISTINCT event_id) AS BIGINT)
                 AS n_violations
        FROM d"""
    ]
    body = "\n        UNION ALL\n        ".join(selects)
    return f"""
    WITH d AS ({DIRTY_SQL})
    SELECT rule, n_checked, n_violations,
           CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS passed
    FROM ({body})
    """


@register("dq_expectations_suite", oracle=_expectations_oracle())
def dq_expectations_suite(spark, sf_dir):
    """Declarative expectation suite evaluated in ONE table pass (the
    dbt-test / Great-Expectations rollup): every rule's violation
    count is a conditional sum in a single aggregate over the dirty
    projection — adding a rule adds a column to the map-side partial
    agg, not another scan — then unpivoted to the per-rule report.
    The uniqueness expectation rides the same pass as a
    count-distinct. Generalizes the reference's row-at-a-time
    validator (src/etl_2018.py:19-31) to a suite-level contract
    report."""
    from etl_jobs_spark.queries._shared import dirty_events

    d = dirty_events(spark, sf_dir)
    aggs = [
        F.sum(F.when(F.expr(pred), 1).otherwise(0)).alias(name)
        for name, pred in _EXPECTATIONS
    ] + [
        F.count(F.lit(1)).alias("_n"),
        (F.count(F.lit(1)) - F.countDistinct("event_id")).alias(
            "unique_event_id"
        ),
    ]
    one = d.agg(*aggs)
    rules = [name for name, _ in _EXPECTATIONS] + ["unique_event_id"]
    stack = ", ".join(f"'{r}', {r}" for r in rules)
    return one.selectExpr(
        f"stack({len(rules)}, {stack}) AS (rule, n_violations)", "_n"
    ).select(
        "rule",
        F.col("_n").alias("n_checked"),
        "n_violations",
        F.when(F.col("n_violations") == 0, 1).otherwise(0).alias("passed"),
    )


@register(
    "governance_column_masking",
    oracle="""
    SELECT c_custkey,
           'cust_' || lpad(CAST(('0x' || substr(md5(c_name), 1, 15))::BIGINT
                                % 100000000 AS VARCHAR), 8, '0') AS pseudonym,
           '***' || substr(c_name, length(c_name) - 3, 4) AS name_masked,
           CAST(floor(c_acctbal / 1000) * 1000 AS BIGINT) AS acctbal_band,
           c_mktsegment, c_nationkey
    FROM customer
    """,
)
def governance_column_masking(spark, sf_dir):
    """Column-level masking policy applied as a projection — the
    row-level-security / PII-governance view a warehouse serves to
    untrusted consumers: direct identifiers pseudonymized with a
    deterministic keyed token (joinable across tables, not
    reversible), the display name generalized to its
    trailing digits (partial reveal), and the account balance
    coarsened to a $1000 band; columns with no policy entry are
    suppressed entirely (never selected — column pruning means their
    bytes are never read from parquet). All
    masking ops are engine-portable built-ins (md5 token via
    operators/hashing.hash60), so the policy is a pure map-only
    projection: zero shuffles, fully codegen'd, and at 100 TB it
    costs exactly one scan of the columns that survive the policy.
    Complements dq_k_anonymity (which AUDITS quasi-identifier risk;
    this ENFORCES the masking that mitigates it) and text_pii_scrub
    (regex redaction inside document text)."""
    from etl_jobs_spark.operators.hashing import hash60

    cust = read_table(spark, sf_dir, "customer")
    token = f"({hash60('c_name', 'spark')}) % 100000000"
    return cust.select(
        "c_custkey",
        F.expr(
            f"concat('cust_', lpad(cast({token} as string), 8, '0'))"
        ).alias("pseudonym"),
        F.expr(
            "concat('***', substr(c_name, length(c_name) - 3, 4))"
        ).alias("name_masked"),
        F.expr("cast(floor(c_acctbal / 1000) * 1000 as bigint)").alias(
            "acctbal_band"
        ),
        "c_mktsegment",
        "c_nationkey",
    )


@register(
    "dq_l_diversity",
    oracle="""
    WITH grouped AS (
      SELECT c_nationkey AS nation,
             CAST(floor(c_acctbal / 2000) AS INT) AS bal_band,
             CAST(count(*) AS BIGINT) AS group_size,
             CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS l_distinct
      FROM customer GROUP BY 1, 2)
    SELECT nation, bal_band, group_size, l_distinct
    FROM grouped WHERE l_distinct < 3
    """,
)
def dq_l_diversity(spark, sf_dir):
    """l-diversity audit — the privacy check k-anonymity misses: a
    quasi-identifier group can be large (k-anonymous) yet still leak
    the SENSITIVE attribute if every member shares it. Each
    (nation × balance-band) QI group is scored by the number of
    distinct sensitive values (market segment); groups with l < 3
    are homogeneity-attack risks that a release would need to
    generalize or suppress. Companion to dq_k_anonymity (same QI
    discipline, different failure mode). Scale shape: one groupBy
    with a distinct-count — Spark plans it as a two-phase expand +
    hash aggregate, map-side combinable, no joins."""
    cust = read_table(spark, sf_dir, "customer")
    grouped = cust.groupBy(
        F.col("c_nationkey").alias("nation"),
        F.floor(F.col("c_acctbal") / 2000).cast("int").alias("bal_band"),
    ).agg(
        F.count(F.lit(1)).alias("group_size"),
        F.countDistinct("c_mktsegment").alias("l_distinct"),
    )
    return grouped.filter(F.col("l_distinct") < 3)


@register(
    "governance_erasure_cascade",
    oracle="""
    WITH erased AS (
      SELECT c_custkey FROM customer WHERE c_custkey % 101 = 7),
    eo AS (
      SELECT o_orderkey FROM orders
      WHERE o_custkey IN (SELECT c_custkey FROM erased))
    SELECT 'customer' AS table_name,
           CAST((SELECT count(*) FROM customer) AS BIGINT) AS rows_before,
           CAST((SELECT count(*) FROM erased) AS BIGINT) AS rows_purged
    UNION ALL
    SELECT 'orders',
           CAST((SELECT count(*) FROM orders) AS BIGINT),
           CAST((SELECT count(*) FROM eo) AS BIGINT)
    UNION ALL
    SELECT 'lineitem',
           CAST((SELECT count(*) FROM lineitem) AS BIGINT),
           CAST((SELECT count(*) FROM lineitem
                 WHERE l_orderkey IN (SELECT o_orderkey FROM eo)) AS BIGINT)
    UNION ALL
    SELECT 'events',
           CAST((SELECT count(*) FROM events) AS BIGINT),
           CAST((SELECT count(*) FROM events
                 WHERE user_id IN (SELECT c_custkey FROM erased)) AS BIGINT)
    """,
)
def governance_erasure_cascade(spark, sf_dir):
    """Right-to-erasure (GDPR Art. 17) impact cascade: a
    deterministic erasure cohort (custkey ≡ 7 mod 101 — standing in
    for the month's deletion requests) is propagated through every
    table that references the person — directly (orders, events by
    user key) and transitively (lineitem through the erased orders)
    — and the job reports per-table purge counts, the audit artifact
    a deletion run must produce BEFORE the destructive write. Scale
    shape: the cohort is a ~1% key set, so every membership check is
    a BROADCAST left-semi join against the fact tables (no fact
    shuffle anywhere); the lineitem cascade first semi-joins orders
    to the cohort, then broadcasts the surviving order keys. The
    actual delete is these same semi-joins flipped to anti — one
    pass per table, partition-overwrite on write."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    ev = read_table(spark, sf_dir, "events")
    erased = cust.filter(F.col("c_custkey") % 101 == 7).select("c_custkey")
    eo = orders.join(
        F.broadcast(erased),
        orders.o_custkey == erased.c_custkey,
        "left_semi",
    ).select("o_orderkey")

    def report(name, df, purged_df):
        return df.agg(F.count(F.lit(1)).alias("rows_before")).crossJoin(
            purged_df.agg(F.count(F.lit(1)).alias("rows_purged"))
        ).select(
            F.lit(name).alias("table_name"), "rows_before", "rows_purged"
        )

    li_purged = li.join(
        F.broadcast(eo), li.l_orderkey == eo.o_orderkey, "left_semi"
    )
    ev_purged = ev.join(
        F.broadcast(erased), ev.user_id == erased.c_custkey, "left_semi"
    )
    return (
        report("customer", cust, erased)
        .unionAll(report("orders", orders, eo))
        .unionAll(report("lineitem", li, li_purged))
        .unionAll(report("events", ev, ev_purged))
    )
