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
               CAST(coalesce(sum(CAST(user_id NOT IN
                    (SELECT c_custkey FROM dim) AS INTEGER)), 0)
                    AS BIGINT) AS n_orphans
        FROM events
    ),
    ords AS (
        SELECT CAST(count(*) AS BIGINT) AS n_facts,
               CAST(coalesce(sum(CAST(o_custkey NOT IN
                    (SELECT c_custkey FROM dim) AS INTEGER)), 0)
                    AS BIGINT) AS n_orphans
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
                # try_divide: an EMPTY fact table must yield a NULL
                # rate (DuckDB x/0 -> NULL), not an ANSI
                # DIVIDE_BY_ZERO crash (round-11 empty-input axis)
                F.expr(
                    "round(try_divide(CAST(n_orphans AS DOUBLE), n_facts), 6)"
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


@register(
    "stat_chi_square_independence",
    oracle="""
    WITH obs AS (
      SELECT c.c_mktsegment AS seg, o.o_orderpriority AS pri,
             CAST(count(*) AS BIGINT) AS n
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2),
    segs AS (SELECT DISTINCT seg FROM obs),
    pris AS (SELECT DISTINCT pri FROM obs),
    filled AS (
      SELECT g.seg, g.pri, CAST(coalesce(o.n, 0) AS BIGINT) AS n
      FROM (SELECT seg, pri FROM segs CROSS JOIN pris) g
      LEFT JOIN obs o ON g.seg = o.seg AND g.pri = o.pri),
    dims AS (
      SELECT CAST(count(DISTINCT seg) AS BIGINT) AS r,
             CAST(count(DISTINCT pri) AS BIGINT) AS c
      FROM obs),
    tot AS (
      SELECT seg, pri, n,
             CAST(sum(n) OVER (PARTITION BY seg) AS BIGINT) AS row_n,
             CAST(sum(n) OVER (PARTITION BY pri) AS BIGINT) AS col_n,
             CAST(sum(n) OVER () AS BIGINT) AS grand_n
      FROM filled),
    cells AS (
      SELECT (CAST(n AS DOUBLE)
              - CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE)
                / CAST(grand_n AS DOUBLE))
             * (CAST(n AS DOUBLE)
                - CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE)
                  / CAST(grand_n AS DOUBLE))
             / (CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE)
                / CAST(grand_n AS DOUBLE)) AS term,
             grand_n
      FROM tot)
    SELECT round(sum(term), 6) AS chi_square,
           CAST((max(d.r) - 1) * (max(d.c) - 1) AS BIGINT) AS dof,
           CAST(max(grand_n) AS BIGINT) AS n
    FROM cells CROSS JOIN dims d
    """,
)
def stat_chi_square_independence(spark, sf_dir):
    """Chi-square test of independence between customer segment and
    order priority — the categorical-association test a warehouse
    runs before trusting a segmentation (is priority mix actually
    different across segments, or noise?). Contingency counts, row/
    column marginals (three window sums over the TINY cell table —
    never a second scan of the facts), expected = row·col/N, and
    Σ(obs−exp)²/exp. Every input to the float arithmetic is an exact
    BIGINT and every float op is IEEE correctly-rounded on identical
    operands, so round(…, 6) is bit-stable cross-engine. The
    statistic and degrees of freedom are reported; the p-value
    lookup is a client-side constant table (the CDF is not data
    work). The observed cells are grid-completed over the full
    seg×pri cross product (zero-observation cells contribute their
    full (0−exp)²/exp = exp term) and dof is derived from the
    DISTINCT level counts — correct for any input, not just one
    where every cell is occupied. Scale shape: ONE fact-table
    aggregation to r×c cells; everything after is constant-size."""
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    from pyspark.sql import Window as W

    obs = (
        orders.join(
            F.broadcast(cust.select("c_custkey", "c_mktsegment")),
            orders.o_custkey == cust.c_custkey,
        )
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.col("o_orderpriority").alias("pri"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    grid = obs.select("seg").distinct().crossJoin(
        obs.select("pri").distinct()
    )
    filled = (
        grid.join(obs, ["seg", "pri"], "left")
        .withColumn("n", F.coalesce(F.col("n"), F.lit(0)).cast("bigint"))
    )
    dims = obs.agg(
        F.countDistinct("seg").cast("bigint").alias("r"),
        F.countDistinct("pri").cast("bigint").alias("c"),
    )
    tot = (
        filled.withColumn(
            "row_n", F.sum("n").over(W.partitionBy("seg")).cast("bigint")
        )
        .withColumn(
            "col_n", F.sum("n").over(W.partitionBy("pri")).cast("bigint")
        )
        .withColumn(
            "grand_n", F.sum("n").over(W.partitionBy()).cast("bigint")
        )
    )
    exp = (
        F.col("row_n").cast("double")
        * F.col("col_n").cast("double")
        / F.col("grand_n").cast("double")
    )
    term = (F.col("n") - exp) * (F.col("n") - exp) / exp
    agg = tot.select(term.alias("term"), "grand_n").agg(
        F.round(F.sum("term"), 6).alias("chi_square"),
        F.max("grand_n").cast("bigint").alias("n"),
    )
    return agg.crossJoin(F.broadcast(dims)).select(
        "chi_square",
        # dof is undefined (NULL) for an empty table — (0-1)*(0-1)
        # would fabricate dof=1 where the oracle's max() over zero
        # cells is NULL (round-11 empty-input axis)
        F.when(
            (F.col("r") > 0) & (F.col("c") > 0),
            (F.col("r") - 1) * (F.col("c") - 1),
        )
        .cast("bigint")
        .alias("dof"),
        "n",
    )


@register(
    "stat_ab_test_zscore",
    oracle="""
    WITH assigned AS (
      SELECT user_id,
             ('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 15))
               ::BIGINT % 2 AS arm,
             max(CASE WHEN event_type = 'purchase' AND value > 150
                      THEN 1 ELSE 0 END) AS converted
      FROM events GROUP BY 1),
    arms AS (
      SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             CAST(sum(CASE WHEN arm = 0 THEN converted ELSE 0 END)
                  AS BIGINT) AS conv_a,
             CAST(sum(CASE WHEN arm = 1 THEN converted ELSE 0 END)
                  AS BIGINT) AS conv_b
      FROM assigned)
    SELECT n_a, n_b, conv_a, conv_b,
           round((CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                  - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                 / sqrt((CAST(conv_a + conv_b AS DOUBLE)
                         / CAST(n_a + n_b AS DOUBLE))
                        * (1 - CAST(conv_a + conv_b AS DOUBLE)
                               / CAST(n_a + n_b AS DOUBLE))
                        * (1.0 / CAST(n_a AS DOUBLE)
                           + 1.0 / CAST(n_b AS DOUBLE))), 6) AS z_score
    FROM arms
    """,
)
def stat_ab_test_zscore(spark, sf_dir):
    """Two-proportion A/B z-test over a HASH-ASSIGNED experiment:
    users split into arms by the portable md5 hash (deterministic,
    balanced, rerun-stable — the assignment discipline real
    experiment platforms use, never rand()), outcome = a BIG-TICKET
    conversion (any purchase over 150 — a ~45% base rate, so both arms
    carry variance at every fixture scale), pooled-variance z-score for the rate
    difference.
    All counts are exact integers; the z arithmetic is divisions and
    one sqrt over exact operands — IEEE-identical both engines,
    round 6. One user-keyed aggregation + one single-row reduce; at
    100 TB the per-user outcome rollup is the only shuffle."""
    from etl_jobs_spark.operators.hashing import hash60

    ev = read_table(spark, sf_dir, "events")
    arm = (
        F.expr(hash60("concat('ab:', cast(user_id as string))", "spark"))
        % 2
    )
    assigned = ev.groupBy("user_id").agg(
        F.first(arm).alias("arm"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") > 150),
                1,
            ).otherwise(0)
        ).alias("converted"),
    )
    arms = assigned.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_b"),
        F.sum(F.when(F.col("arm") == 0, F.col("converted")).otherwise(0))
        .cast("bigint")
        .alias("conv_a"),
        F.sum(F.when(F.col("arm") == 1, F.col("converted")).otherwise(0))
        .cast("bigint")
        .alias("conv_b"),
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    ca, cb = F.col("conv_a").cast("double"), F.col("conv_b").cast("double")
    pool = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    z = (ca / na - cb / nb) / F.sqrt(
        pool * (1 - pool) * (1.0 / na + 1.0 / nb)
    )
    return arms.select(
        "n_a", "n_b", "conv_a", "conv_b", F.round(z, 6).alias("z_score")
    )


#: Micro-log2 lookup 1..1024 — same construction as
#: text_analysis._L2M (duplicated to keep module import order
#: untouched); both engines index the identical literal array, so
#: every "log" in the PSI below is bit-exact integer math.
_L2M_DQ = [
    round(__import__("math").log2(i) * 1_000_000) for i in range(1, 1025)
]


def _psi_oracle() -> str:
    lut = "[" + ",".join(str(v) for v in _L2M_DQ) + "]"
    return f"""
    WITH base AS (
      SELECT CAST(least(floor(value / 50), 9) AS INT) AS bucket,
             CAST(count(*) AS BIGINT) AS a
      FROM events WHERE event_type = 'view' GROUP BY 1),
    cur AS (
      SELECT CAST(least(floor(value / 50), 9) AS INT) AS bucket,
             CAST(count(*) AS BIGINT) AS b
      FROM events WHERE event_type = 'purchase' GROUP BY 1),
    grid AS (SELECT unnest(range(0, 10)) AS bucket),
    joined AS (
      SELECT g.bucket,
             coalesce(base.a, 0) AS a, coalesce(cur.b, 0) AS b,
             (SELECT sum(a) FROM base) AS ta,
             (SELECT sum(b) FROM cur) AS tb
      FROM grid g
      LEFT JOIN base ON g.bucket = base.bucket
      LEFT JOIN cur ON g.bucket = cur.bucket),
    permille AS (
      SELECT bucket, a, b,
             greatest(CAST(a * 1000 // ta AS BIGINT), 1) AS p_m,
             greatest(CAST(b * 1000 // tb AS BIGINT), 1) AS q_m
      FROM joined)
    SELECT bucket, a AS n_base, b AS n_current, p_m, q_m,
           CAST((p_m - q_m) * ({lut}[CAST(p_m AS INT)]
                               - {lut}[CAST(q_m AS INT)])
                * 693147 // 1000000000 AS BIGINT) AS psi_contrib_micro
    FROM permille
    """


@register("dq_drift_psi", oracle=_psi_oracle())
def dq_drift_psi(spark, sf_dir):
    """Population Stability Index drift monitor: the value
    distribution of the CURRENT feed (purchases) vs the BASELINE
    (views), 10 fixed-width buckets, per-bucket PSI contribution
    (p−q)·ln(p/q) — the standard model-monitoring drift score
    (PSI > 0.1 = investigate, > 0.25 = act). Bit-exact by
    construction: proportions quantize to integer PER-MILLE (clamped
    ≥ 1‰, the conventional zero-bucket epsilon), logs come from the
    shared micro-log2 literal LUT, and ln2 is a rational constant —
    every engine computes identical BIGINTs, no libm anywhere
    (ln() is NOT cross-engine reproducible; the LUT is the same
    discipline text_token_entropy established). Scale shape: two
    filtered one-pass bucket counts (map-side combinable), a
    10-row grid join, integer arithmetic — the monitor costs two
    aggregations regardless of volume."""
    ev = read_table(spark, sf_dir, "events")
    lut = "array(" + ",".join(str(v) for v in _L2M_DQ) + ")"
    bucket = F.expr("CAST(least(floor(value / 50), 9) AS INT)")

    def side(t, alias):
        return (
            ev.filter(F.col("event_type") == t)
            .select(bucket.alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias(alias))
        )

    base, cur = side("view", "a"), side("purchase", "b")
    grid = spark.range(0, 10).select(F.col("id").cast("int").alias("bucket"))
    joined = (
        grid.join(F.broadcast(base), "bucket", "left")
        .join(F.broadcast(cur), "bucket", "left")
        .select(
            "bucket",
            F.coalesce("a", F.lit(0)).cast("bigint").alias("a"),
            F.coalesce("b", F.lit(0)).cast("bigint").alias("b"),
        )
        .crossJoin(
            F.broadcast(
                base.agg(F.sum("a").cast("bigint").alias("ta")).crossJoin(
                    cur.agg(F.sum("b").cast("bigint").alias("tb"))
                )
            )
        )
    )
    permille = joined.select(
        "bucket",
        "a",
        "b",
        F.greatest(F.expr("CAST(a * 1000 DIV ta AS BIGINT)"), F.lit(1)).alias(
            "p_m"
        ),
        F.greatest(F.expr("CAST(b * 1000 DIV tb AS BIGINT)"), F.lit(1)).alias(
            "q_m"
        ),
    )
    return permille.select(
        "bucket",
        F.col("a").alias("n_base"),
        F.col("b").alias("n_current"),
        "p_m",
        "q_m",
        F.expr(
            f"CAST((p_m - q_m) * (element_at({lut}, CAST(p_m AS INT))"
            f" - element_at({lut}, CAST(q_m AS INT)))"
            " * 693147 DIV 1000000000 AS BIGINT)"
        ).alias("psi_contrib_micro"),
    )


#: Benford's-law expected first-digit proportions, per-mille
#: (round(log10(1+1/d)·1000) for d = 1..9) — literal on both engines.
_BENFORD_MILLI = (301, 176, 125, 97, 79, 67, 58, 51, 46)


@register(
    "dq_benford_first_digit",
    oracle=f"""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                              AS VARCHAR), 1, 1) AS INT) AS digit
      FROM orders WHERE o_totalprice > 0),
    counts AS (
      SELECT digit, CAST(count(*) AS BIGINT) AS n FROM digits GROUP BY 1),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM counts),
    expected(digit, exp_milli) AS (VALUES {", ".join(
        f"({d}, {m})" for d, m in enumerate(_BENFORD_MILLI, start=1))})
    SELECT e.digit,
           coalesce(c.n, 0) AS n,
           CAST(coalesce(c.n, 0) * 1000 // t.total AS BIGINT)
             AS obs_milli,
           CAST(e.exp_milli AS BIGINT) AS exp_milli,
           CAST((coalesce(c.n, 0) * 1000 // t.total - e.exp_milli)
                * (coalesce(c.n, 0) * 1000 // t.total - e.exp_milli)
                // e.exp_milli AS BIGINT) AS dev_contrib
    FROM expected e LEFT JOIN counts c ON e.digit = c.digit
    CROSS JOIN tot t
    """,
)
def dq_benford_first_digit(spark, sf_dir):
    """Benford's-law first-digit audit of order amounts — the
    classic fraud/fabrication screen (organically-generated amounts
    follow log10(1+1/d); fabricated ones usually don't). First
    digits come from exact integer CENTS (never float formatting),
    observed proportions quantize to per-mille, and the per-digit
    deviation contribution (obs−exp)²/exp is pure integer arithmetic
    against the literal Benford table — bit-stable everywhere. A
    spike in dev_contrib localizes WHICH digit is off, the number an
    auditor acts on. One aggregation over the facts; the audit table
    is 9 rows at any scale. (The fixture amounts are uniform-ish, so
    this run SHOWS non-conformance — the screen working, not
    failing.)"""
    orders = read_table(spark, sf_dir, "orders")
    digit = F.expr(
        "CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)"
        " AS STRING), 1, 1) AS INT)"
    )
    counts = (
        orders.filter(F.col("o_totalprice") > 0)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = counts.agg(F.sum("n").cast("bigint").alias("total"))
    expected = orders.sparkSession.createDataFrame(
        [(d, m) for d, m in enumerate(_BENFORD_MILLI, start=1)],
        "digit INT, exp_milli BIGINT",
    )
    j = (
        expected.join(F.broadcast(counts), "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n"),
            F.expr(
                "CAST(coalesce(n, 0) * 1000 DIV total AS BIGINT)"
            ).alias("obs_milli"),
            "exp_milli",
        )
    )
    return j.select(
        "digit",
        "n",
        "obs_milli",
        "exp_milli",
        F.expr(
            "CAST((obs_milli - exp_milli) * (obs_milli - exp_milli)"
            " DIV exp_milli AS BIGINT)"
        ).alias("dev_contrib"),
    )


@register(
    "pipeline_dq_quarantine_replay",
    oracle="""
    WITH dirty AS (
      SELECT event_id, user_id,
             CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS value_n,
             CASE WHEN event_id % 11 = 0 THEN NULL
                  ELSE event_type END AS event_type_n
      FROM events),
    flagged AS (
      SELECT *,
             (value_n IS NOT NULL AND event_type_n IS NOT NULL
              AND event_type_n <> '' AND value_n >= 0 AND value_n <= 150)
               AS ok
      FROM dirty),
    repaired AS (
      SELECT event_id, user_id,
             least(greatest(coalesce(value_n, 0.0), 0.0), 150.0) AS value_r,
             CASE WHEN event_type_n IS NULL OR event_type_n = ''
                  THEN 'unknown' ELSE event_type_n END AS type_r
      FROM flagged WHERE NOT ok)
    SELECT 'valid_first_pass' AS phase,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(round(value_n * 100) AS BIGINT)) AS BIGINT)
             AS value_cents
    FROM flagged WHERE ok
    UNION ALL
    SELECT 'repaired_replayed',
           CAST(count(*) AS BIGINT),
           CAST(sum(CAST(round(value_r * 100) AS BIGINT)) AS BIGINT)
    FROM repaired
    WHERE value_r >= 0 AND value_r <= 150 AND type_r <> ''
    UNION ALL
    SELECT 'still_quarantined', CAST(count(*) AS BIGINT),
           CAST(0 AS BIGINT)
    FROM repaired
    WHERE NOT (value_r >= 0 AND value_r <= 150 AND type_r <> '')
    """,
)
def pipeline_dq_quarantine_replay(spark, sf_dir):
    """Quarantine → repair → REPLAY: the operational loop behind
    every validation gate (filter_rejected_rows produces the
    quarantine; this closes it): rows failing the rule set are
    repaired by policy (null value → 0, out-of-range → clamped into
    [0,150], missing type → 'unknown'), re-validated by the SAME
    rules, and the job reports the three-phase census — first-pass
    valid, repaired-and-replayed, and still-quarantined (the rows
    needing a human). Monetary sums ride as integer cents so the
    repaired total is exact evidence the repairs applied. Scale
    shape: two map-only projections over the feed + one conditional
    aggregation; the replay is a filter flip, not a second scan of
    anything."""
    from etl_jobs_spark.queries._shared import dirty_events

    d = dirty_events(spark, sf_dir)
    ok = (
        F.col("value_n").isNotNull()
        & F.col("event_type_n").isNotNull()
        & (F.col("event_type_n") != "")
        & (F.col("value_n") >= 0)
        & (F.col("value_n") <= 150)
    )
    flagged = d.withColumn("ok", ok)
    repaired = flagged.filter(~F.col("ok")).select(
        "event_id",
        F.least(
            F.greatest(F.coalesce("value_n", F.lit(0.0)), F.lit(0.0)),
            F.lit(150.0),
        ).alias("value_r"),
        F.when(
            F.col("event_type_n").isNull() | (F.col("event_type_n") == ""),
            "unknown",
        )
        .otherwise(F.col("event_type_n"))
        .alias("type_r"),
    )
    re_ok = (
        (F.col("value_r") >= 0)
        & (F.col("value_r") <= 150)
        & (F.col("type_r") != "")
    )
    valid = flagged.filter("ok").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.expr("CAST(round(value_n * 100) AS BIGINT)"))
        .cast("bigint")
        .alias("value_cents"),
    ).select(F.lit("valid_first_pass").alias("phase"), "n_rows", "value_cents")
    replayed = repaired.filter(re_ok).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.expr("CAST(round(value_r * 100) AS BIGINT)"))
        .cast("bigint")
        .alias("value_cents"),
    ).select(
        F.lit("repaired_replayed").alias("phase"), "n_rows", "value_cents"
    )
    stuck = repaired.filter(~re_ok).agg(
        F.count(F.lit(1)).alias("n_rows")
    ).select(
        F.lit("still_quarantined").alias("phase"),
        "n_rows",
        F.lit(0).cast("bigint").alias("value_cents"),
    )
    return valid.unionAll(replayed).unionAll(stuck)


@register(
    "dq_order_lineitem_reconcile",
    oracle="""
    WITH li AS (
      SELECT l_orderkey,
             CAST(sum(CAST(round(l_extendedprice
                                 * (1 - l_discount) * (1 + l_tax)
                                 * 100) AS BIGINT)) AS BIGINT)
               AS gross_cents
      FROM lineitem GROUP BY 1),
    rec AS (
      SELECT o.o_orderkey,
             CAST(round(o.o_totalprice * 100) AS BIGINT) AS header_cents,
             coalesce(li.gross_cents, 0) AS detail_cents,
             CASE WHEN li.l_orderkey IS NULL THEN 1 ELSE 0 END
               AS headless
      FROM orders o LEFT JOIN li ON li.l_orderkey = o.o_orderkey)
    SELECT
      CAST(count(*) AS BIGINT) AS n_orders,
      CAST(sum(headless) AS BIGINT) AS n_without_lines,
      CAST(sum(CASE WHEN headless = 0
                     AND header_cents = detail_cents
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_match,
      CAST(sum(CASE WHEN headless = 0
                     AND abs(header_cents - detail_cents) > 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatch,
      CAST(max(CASE WHEN headless = 0
                    THEN abs(header_cents - detail_cents)
                    ELSE 0 END) AS BIGINT) AS max_abs_diff_cents,
      CAST(sum(CASE WHEN headless = 0
                    THEN abs(header_cents - detail_cents)
                    ELSE 0 END) AS BIGINT) AS total_abs_diff_cents
    FROM rec
    """,
)
def dq_order_lineitem_reconcile(spark, sf_dir):
    """Header-vs-detail RECONCILIATION: every order's stored
    o_totalprice against the recomputed gross of its line items
    (price·(1−discount)·(1+tax), round-then-sum integer cents) —
    the daily finance-close check every warehouse runs between a
    summary table and its fact detail. Census output: exact
    matches, mismatches, headless orders (LEFT JOIN keeps them —
    the reconciliation bug an inner join hides), worst and total
    absolute drift. One orderkey-keyed rollup + one join — at
    100 TB both sides shuffle once on the same key, or zero times
    if the tables are co-bucketed on orderkey
    (join_bucketed_colocated's layout)."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    detail = li.groupBy("l_orderkey").agg(
        F.sum(
            F.expr(
                "CAST(round(l_extendedprice * (1 - l_discount)"
                " * (1 + l_tax) * 100) AS BIGINT)"
            )
        )
        .cast("bigint")
        .alias("gross_cents")
    )
    rec = orders.join(
        detail, orders.o_orderkey == detail.l_orderkey, "left"
    ).select(
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias(
            "header_cents"
        ),
        F.coalesce("gross_cents", F.lit(0)).alias("detail_cents"),
        F.when(F.col("l_orderkey").isNull(), 1).otherwise(0).alias(
            "headless"
        ),
    )
    live = F.col("headless") == 0
    diff = F.abs(F.col("header_cents") - F.col("detail_cents"))
    return rec.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("headless").cast("bigint").alias("n_without_lines"),
        F.sum(
            F.when(live & (diff == 0), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_exact_match"),
        F.sum(F.when(live & (diff > 0), 1).otherwise(0))
        .cast("bigint")
        .alias("n_mismatch"),
        F.max(F.when(live, diff).otherwise(0))
        .cast("bigint")
        .alias("max_abs_diff_cents"),
        F.sum(F.when(live, diff).otherwise(0))
        .cast("bigint")
        .alias("total_abs_diff_cents"),
    )


@register(
    "governance_access_report",
    oracle="""
    WITH cohort AS (
      SELECT c_custkey FROM customer WHERE c_custkey % 101 = 7),
    o AS (
      SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders WHERE o_custkey IN (SELECT c_custkey FROM cohort)
      GROUP BY 1),
    e AS (
      SELECT user_id AS k, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events WHERE user_id IN (SELECT c_custkey FROM cohort)
      GROUP BY 1)
    SELECT c.c_custkey AS subject,
           coalesce(o.n, 0) AS n_orders,
           coalesce(o.cents, 0) AS order_cents,
           coalesce(e.n, 0) AS n_events,
           coalesce(e.cents, 0) AS event_cents
    FROM cohort c
    LEFT JOIN o ON o.k = c.c_custkey
    LEFT JOIN e ON e.k = c.c_custkey
    """,
)
def governance_access_report(spark, sf_dir):
    """Right-of-access (GDPR Art. 15) subject-access report — the
    erasure cascade's read-side twin (same deterministic cohort,
    custkey ≡ 7 mod 101): for every requesting subject, a per-table
    footprint census (row counts + integer-cent value totals across
    orders and events), LEFT-joined so subjects with NO footprint
    still get their (correct, all-zero) report — the access-report
    bug an inner join causes is a compliance violation, not a
    perf choice. Scale shape: the cohort (~1%) broadcasts into a
    semi-filter on each fact table; each fact aggregates ONCE keyed
    by subject. The pair (erasure cascade + access report) is the
    complete data-subject-rights surface a governed lakehouse
    needs."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    events = read_table(spark, sf_dir, "events")
    cohort = cust.filter(F.col("c_custkey") % 101 == 7).select(
        F.col("c_custkey").alias("subject")
    )
    bc = F.broadcast(cohort)
    o = (
        orders.join(bc, orders.o_custkey == cohort.subject, "left_semi")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
            .cast("bigint")
            .alias("order_cents"),
        )
    )
    e = (
        events.join(bc, events.user_id == cohort.subject, "left_semi")
        .groupBy(F.col("user_id").alias("k"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
            .cast("bigint")
            .alias("event_cents"),
        )
    )
    return (
        cohort.join(o, cohort.subject == o.k, "left")
        .join(e, cohort.subject == e.k, "left")
        .select(
            "subject",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("order_cents", F.lit(0)).alias("order_cents"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("event_cents", F.lit(0)).alias("event_cents"),
        )
    )


@register(
    "dq_drift_ks",
    oracle="""
    WITH tagged AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS v,
             CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END AS in_a,
             CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END AS in_b,
             event_id
      FROM events WHERE value IS NOT NULL),
    tot AS (
      SELECT CAST(sum(in_a) AS BIGINT) AS n_a,
             CAST(sum(in_b) AS BIGINT) AS n_b
      FROM tagged),
    cum AS (
      SELECT v,
             CAST(sum(in_a) OVER (ORDER BY v, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS ca,
             CAST(sum(in_b) OVER (ORDER BY v, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cb
      FROM tagged),
    steps AS (
      -- evaluate the CDF gap at value boundaries: the max per v of
      -- the running counts IS the CDF numerator at that v
      SELECT v, max(ca) AS ca, max(cb) AS cb
      FROM cum GROUP BY v),
    d AS (
      SELECT max(abs(ca * t.n_b - cb * t.n_a)) AS d_num,
             max(t.n_a) AS n_a, max(t.n_b) AS n_b
      FROM steps CROSS JOIN tot t)
    SELECT n_a, n_b,
           CAST(d_num AS BIGINT) AS d_numerator,
           CAST(CASE WHEN n_a * n_b >= 1000000000000
                     THEN d_num // ((n_a * n_b) // 1000000)
                     ELSE d_num * 1000000 // (n_a * n_b) END
                AS BIGINT) AS ks_d_micro
    FROM d
    """,
)
def dq_drift_ks(spark, sf_dir):
    """Two-sample KOLMOGOROV–SMIRNOV drift statistic — the
    nonparametric sibling of dq_drift_psi (PSI needs binning; KS
    compares whole CDFs): the event value distribution split into
    two deterministic halves (even/odd event_id — standing in for
    reference vs candidate window), D = max |F_a(v) − F_b(v)|.
    Float-free: with integer-cent values, D's numerator is
    max |c_a·n_b − c_b·n_a| over value boundaries — exact BIGINTs;
    the reported statistic is micro-scaled integer division. The
    CDFs only need evaluating at value boundaries, so the engine
    pre-aggregates per-value counts (keyed, parallel) and runs the
    cumulative window over the |distinct v| aggregate rows — never a
    single-partition sort of the raw sample. The oracle keeps the
    textbook row-level running-sum form; per-value max at step
    boundaries makes the two formulations identical."""
    # null sample points carry no distributional information and
    # their sort position diverges across engines (Spark NULLS FIRST
    # vs DuckDB NULLS LAST) — exclude them explicitly (null-injection
    # differential, round 10)
    ev = read_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    from pyspark.sql import Window as W

    tagged = ev.select(
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("v"),
        F.when(F.col("event_id") % 2 == 0, 1).otherwise(0).alias("in_a"),
        F.when(F.col("event_id") % 2 == 1, 1).otherwise(0).alias("in_b"),
    )
    tot = tagged.agg(
        F.sum("in_a").cast("bigint").alias("n_a"),
        F.sum("in_b").cast("bigint").alias("n_b"),
    )
    # pre-aggregate per value BEFORE the cumulative window (VERDICT
    # r15 item 1): the oracle's row-level running sums are only ever
    # read at value boundaries (steps takes max per v), and the max
    # of a (v, event_id)-ordered running count within group v IS the
    # cumulative count through all of v — so summing per-v first is
    # exact. The unpartitioned window then sorts |distinct v| rows
    # (bounded: v = round(value*100), the integer-cent value domain)
    # instead of EVERY event row — at 100 TB the difference between
    # a single-partition sort of the fact table and of a few
    # thousand aggregate rows. Same shape stat_mann_whitney_u
    # already uses.
    per_v = tagged.groupBy("v").agg(
        F.sum("in_a").cast("bigint").alias("na"),
        F.sum("in_b").cast("bigint").alias("nb"),
    )
    w = W.orderBy("v").rowsBetween(W.unboundedPreceding, 0)
    steps = per_v.select(
        "v",
        F.sum("na").over(w).cast("bigint").alias("ca"),
        F.sum("nb").over(w).cast("bigint").alias("cb"),
    )
    d = steps.crossJoin(F.broadcast(tot)).agg(
        F.max(
            F.abs(F.col("ca") * F.col("n_b") - F.col("cb") * F.col("n_a"))
        ).alias("d_num"),
        F.max("n_a").alias("n_a"),
        F.max("n_b").alias("n_b"),
    )
    return d.select(
        "n_a",
        "n_b",
        F.col("d_num").cast("bigint").alias("d_numerator"),
        # branch on the product size so the micro-scaling never
        # forms d_num * 1e6 once d_num is itself n_a*n_b-sized
        # (the embed_pca_power_iter renormalization lesson); at
        # driver SFs the product is < 1e12 so values are unchanged
        F.expr(
            "CAST(CASE WHEN n_a * n_b >= 1000000000000"
            " THEN d_num DIV ((n_a * n_b) DIV 1000000)"
            " ELSE d_num * 1000000 DIV (n_a * n_b) END AS BIGINT)"
        ).alias("ks_d_micro"),
    )


@register(
    "stat_mann_whitney_u",
    oracle="""
    WITH s AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS v,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS in_a,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS in_b
      FROM events
      WHERE event_type IN ('click', 'purchase')
        AND value IS NOT NULL),
    per_v AS (
      SELECT v, CAST(sum(in_a) AS BIGINT) AS ca,
             CAST(sum(in_b) AS BIGINT) AS cb
      FROM s GROUP BY v),
    ranked AS (
      SELECT ca, cb, ca + cb AS t,
             CAST(coalesce(sum(ca + cb) OVER (ORDER BY v
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS BIGINT) AS below
      FROM per_v),
    tots AS (
      SELECT CAST(sum(ca) AS BIGINT) AS n_a,
             CAST(sum(cb) AS BIGINT) AS n_b,
             CAST(sum(ca * (2 * below + t + 1)) AS BIGINT) AS two_r_a,
             CAST(sum(t * t * t - t) AS BIGINT) AS tie_correction
      FROM ranked)
    SELECT n_a, n_b, two_r_a,
           CAST(two_r_a - n_a * (n_a + 1) AS BIGINT) AS two_u_a,
           CAST(2 * n_a * n_b - (two_r_a - n_a * (n_a + 1)) AS BIGINT)
             AS two_u_b,
           tie_correction
    FROM tots
    """,
)
def stat_mann_whitney_u(spark, sf_dir):
    """MANN-WHITNEY U (Wilcoxon rank-sum): does the 'click' value
    distribution stochastically dominate 'purchase'? Exact-integer
    formulation: ranks never materialize per row — group both
    samples by value (cents), one cumulative window over DISTINCT
    values gives each tie-group's rank block, and 2x the average
    rank (2*below + t + 1) keeps the .5 tie-midpoints integral.
    Emits doubled rank/U statistics plus the tie-correction term
    sum(t^3 - t) so a caller can form the normal approximation; the
    statistics themselves are bit-exact BIGINTs in both engines.
    Scale: the corpus-sized work is ONE combinable groupBy(v); the
    window runs over |distinct values| rows only (the same
    distinct-value-staircase shape as dq_drift_ks above)."""
    from pyspark.sql import Window as W

    s = (
        read_table(spark, sf_dir, "events")
        # null samples carry no rank information and sort
        # differently across engines — excluded explicitly
        .filter(
            F.col("event_type").isin("click", "purchase")
            & F.col("value").isNotNull()
        )
        .select(
            F.expr("CAST(round(value * 100) AS BIGINT)").alias("v"),
            F.when(F.col("event_type") == "click", 1).otherwise(0).alias("in_a"),
            F.when(F.col("event_type") == "purchase", 1)
            .otherwise(0)
            .alias("in_b"),
        )
    )
    per_v = s.groupBy("v").agg(
        F.sum("in_a").cast("bigint").alias("ca"),
        F.sum("in_b").cast("bigint").alias("cb"),
    )
    # row bound (r16 audit): per_v is one row per distinct integer
    # cent value — the value domain, not the event count
    w = W.orderBy("v").rowsBetween(W.unboundedPreceding, -1)
    ranked = per_v.select(
        "ca",
        "cb",
        (F.col("ca") + F.col("cb")).alias("t"),
        F.coalesce(
            F.sum(F.col("ca") + F.col("cb")).over(w), F.lit(0)
        )
        .cast("bigint")
        .alias("below"),
    )
    tots = ranked.agg(
        F.sum("ca").cast("bigint").alias("n_a"),
        F.sum("cb").cast("bigint").alias("n_b"),
        F.sum(F.col("ca") * (2 * F.col("below") + F.col("t") + 1))
        .cast("bigint")
        .alias("two_r_a"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("bigint")
        .alias("tie_correction"),
    )
    return tots.select(
        "n_a",
        "n_b",
        "two_r_a",
        F.expr("CAST(two_r_a - n_a * (n_a + 1) AS BIGINT)").alias("two_u_a"),
        F.expr(
            "CAST(2 * n_a * n_b - (two_r_a - n_a * (n_a + 1)) AS BIGINT)"
        ).alias("two_u_b"),
        "tie_correction",
    )


@register(
    "stat_kendall_tau",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS rev,
             CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1),
    pairs AS (
      SELECT CASE WHEN (a.rev - b.rev) * (a.cnt - b.cnt) > 0
                  THEN 1 ELSE 0 END AS conc,
             CASE WHEN (a.rev - b.rev) * (a.cnt - b.cnt) < 0
                  THEN 1 ELSE 0 END AS disc,
             CASE WHEN a.rev = b.rev AND a.cnt <> b.cnt
                  THEN 1 ELSE 0 END AS tie_x,
             CASE WHEN a.cnt = b.cnt AND a.rev <> b.rev
                  THEN 1 ELSE 0 END AS tie_y,
             CASE WHEN a.rev = b.rev AND a.cnt = b.cnt
                  THEN 1 ELSE 0 END AS tie_xy
      FROM daily a JOIN daily b ON a.d < b.d)
    SELECT CAST((SELECT count(*) FROM daily) AS BIGINT) AS n_days,
           CAST(sum(conc) AS BIGINT) AS n_concordant,
           CAST(sum(disc) AS BIGINT) AS n_discordant,
           CAST(sum(tie_x) AS BIGINT) AS ties_rev_only,
           CAST(sum(tie_y) AS BIGINT) AS ties_cnt_only,
           CAST(sum(tie_xy) AS BIGINT) AS ties_both,
           CAST(sum(conc) - sum(disc) AS BIGINT) AS tau_numerator
    FROM pairs
    """,
)
def stat_kendall_tau(spark, sf_dir):
    """KENDALL TAU rank correlation (the effect-size companion
    VERDICT r7 item 8 asked for, pairing stat_mann_whitney_u):
    does daily revenue co-move with daily event volume? Exact-
    integer formulation: concordant / discordant / tie pair counts
    over the DAILY AGGREGATE series — tau-b's numerator (nc - nd)
    and every denominator ingredient emitted as BIGINTs, no square
    roots engine-side. Scale: the corpus-sized work is ONE
    combinable day-keyed rollup; the O(k²) pair comparison runs on
    the CALENDAR-bounded aggregate (k = distinct days, a few
    thousand at any corpus size), the same bounded-quadratic
    rationale as the ER oracle — never on raw rows."""
    daily = (
        read_table(spark, sf_dir, "events")
        .groupBy(F.col("ts").cast("date").alias("d"))
        .agg(
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
            .cast("bigint")
            .alias("rev"),
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
        )
    )
    a, b = daily.alias("a"), daily.alias("b")
    pairs = a.join(b, F.col("a.d") < F.col("b.d")).select(
        (F.col("a.rev") - F.col("b.rev")).alias("dx"),
        (F.col("a.cnt") - F.col("b.cnt")).alias("dy"),
    )
    n_days = daily.agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    agg = pairs.agg(
        F.sum(F.expr("CASE WHEN dx * dy > 0 THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("n_concordant"),
        F.sum(F.expr("CASE WHEN dx * dy < 0 THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("n_discordant"),
        F.sum(F.expr("CASE WHEN dx = 0 AND dy <> 0 THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("ties_rev_only"),
        F.sum(F.expr("CASE WHEN dy = 0 AND dx <> 0 THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("ties_cnt_only"),
        F.sum(F.expr("CASE WHEN dx = 0 AND dy = 0 THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("ties_both"),
    )
    return (
        n_days.crossJoin(agg)
        .withColumn(
            "tau_numerator",
            (F.col("n_concordant") - F.col("n_discordant")).cast("bigint"),
        )
    )


#: Derandomized-bootstrap geometry: B resamples; per (row, b) the
#: resample weight comes from 2 bits of the cross-engine md5 hash —
#: weight 0/1/1/2 (mean 1, so each resample is an unbiased draw;
#: variance 0.5 vs the Poisson bootstrap's 1.0, stated explicitly —
#: the CI is a hair narrow, and it is DETERMINISTIC, which is what
#: a hash-checked oracle needs).
BOOT_B = 32


def _boot_oracle() -> str:
    from etl_jobs_spark.operators.hashing import hash60

    h = hash60("(CAST(event_id AS VARCHAR) || ':' || CAST(bb.b AS VARCHAR))", "duckdb")
    return f"""
    WITH base AS (
      SELECT event_id, CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'),
    weighted AS (
      SELECT bb.b, base.cents,
             CASE ({h}) % 4 WHEN 0 THEN 0 WHEN 3 THEN 2 ELSE 1 END AS w
      FROM base CROSS JOIN range(0, {BOOT_B}) bb(b)),
    means AS (
      SELECT b, CAST(sum(w * cents) // sum(w) AS BIGINT) AS mean_cents
      FROM weighted GROUP BY b),
    ordered AS (
      SELECT mean_cents,
             row_number() OVER (ORDER BY mean_cents, b) AS rn
      FROM means),
    point AS (
      SELECT CAST(sum(cents) // count(*) AS BIGINT) AS point_mean_cents,
             CAST(count(*) AS BIGINT) AS n_rows
      FROM base)
    SELECT p.n_rows, CAST({BOOT_B} AS BIGINT) AS n_resamples,
           p.point_mean_cents,
           (SELECT mean_cents FROM ordered WHERE rn = 2) AS ci_lo_cents,
           (SELECT mean_cents FROM ordered WHERE rn = {BOOT_B - 1})
             AS ci_hi_cents
    FROM point p
    """


@register("stat_bootstrap_ci_mean", oracle=_boot_oracle())
def stat_bootstrap_ci_mean(spark, sf_dir):
    """BOOTSTRAP CONFIDENCE INTERVAL for the mean purchase value via
    DERANDOMIZED resampling (VERDICT r7 item 8): every (row,
    resample) weight is 2 bits of the cross-engine md5 hash mapped
    to 0/1/1/2 (mean 1 — unbiased; variance 0.5 vs Poisson's 1.0,
    so the CI is slightly narrow and says so here), making all
    {BOOT_B} resample means — and therefore the order-statistic CI
    (2nd / 31st of 32, ~94% nominal) — bit-reproducible with no
    rand() anywhere. Plan shape at 100 TB: the explode is map-only
    (B narrow int rows per input row) feeding ONE combinable
    groupBy(b) of B groups — partial aggregation collapses the
    amplification inside each task; the order statistics run over B
    rows. One pass, one tiny shuffle."""
    from pyspark.sql import Window as W

    from etl_jobs_spark.operators.hashing import hash60

    h = hash60(
        "(CAST(event_id AS STRING) || ':' || CAST(b AS STRING))", "spark"
    )
    base = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
        )
    )
    weighted = base.select(
        "cents",
        F.explode(F.expr(f"sequence(0, {BOOT_B - 1})")).alias("b"),
        "event_id",
    ).select(
        "b",
        "cents",
        F.expr(
            f"CASE ({h}) % 4 WHEN 0 THEN 0 WHEN 3 THEN 2 ELSE 1 END"
        ).alias("w"),
    )
    means = weighted.groupBy("b").agg(
        F.expr("CAST(sum(w * cents) DIV sum(w) AS BIGINT)").alias(
            "mean_cents"
        )
    )
    # row bound (r16 audit): means is one row per bootstrap
    # replicate — exactly BOOT_B rows at any corpus size
    ordered = means.withColumn(
        "rn", F.row_number().over(W.orderBy("mean_cents", "b"))
    )
    # max() over the single selected rank keeps lo/hi ONE-row
    # (NULL on an empty corpus) so the crossJoin spine matches the
    # oracle's scalar subqueries (round-11 empty-input axis)
    lo = ordered.filter(F.col("rn") == 2).agg(
        F.max("mean_cents").alias("ci_lo_cents")
    )
    hi = ordered.filter(F.col("rn") == BOOT_B - 1).agg(
        F.max("mean_cents").alias("ci_hi_cents")
    )
    point = base.agg(
        F.expr("CAST(sum(cents) DIV count(*) AS BIGINT)").alias(
            "point_mean_cents"
        ),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
    )
    return (
        point.crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
        .select(
            "n_rows",
            F.lit(BOOT_B).cast("bigint").alias("n_resamples"),
            "point_mean_cents",
            "ci_lo_cents",
            "ci_hi_cents",
        )
    )


#: Shared SQL fragments for the rank-statistic pair below: the daily
#: (revenue, volume) series (identical text to stat_kendall_tau's
#: oracle) and the tie-corrected Spearman rho from its exact-integer
#: ingredients — ONE string used verbatim by both the DuckDB oracle
#: and the Spark F.expr, so the only float ops (three divisions, one
#: sqrt — all IEEE correctly-rounded) evaluate identically.
_DAILY_SQL = """
    SELECT CAST(ts AS DATE) AS d,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             AS rev,
           CAST(count(*) AS BIGINT) AS cnt
    FROM events GROUP BY 1
"""

_RHO_EXPR = """
    CASE WHEN n_days > 1
          AND (n_days * n_days * n_days - n_days - tie_x) > 0
          AND (n_days * n_days * n_days - n_days - tie_y) > 0
    THEN round(
      ( CAST(n_days * n_days * n_days - n_days - tie_x AS DOUBLE) / 12.0
      + CAST(n_days * n_days * n_days - n_days - tie_y AS DOUBLE) / 12.0
      - CAST(sum_d2_x4 AS DOUBLE) / 4.0 )
      / (2.0 * sqrt(
          (CAST(n_days * n_days * n_days - n_days - tie_x AS DOUBLE) / 12.0)
        * (CAST(n_days * n_days * n_days - n_days - tie_y AS DOUBLE) / 12.0)))
      , 6)
    END
"""


@register(
    "stat_spearman_rho",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}),
    rx AS (
      SELECT rev AS v, CAST(count(*) AS BIGINT) AS t,
             CAST(coalesce(sum(count(*)) OVER (ORDER BY rev
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS below
      FROM daily GROUP BY rev),
    ry AS (
      SELECT cnt AS v, CAST(count(*) AS BIGINT) AS t,
             CAST(coalesce(sum(count(*)) OVER (ORDER BY cnt
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS below
      FROM daily GROUP BY cnt),
    ranked AS (
      SELECT (2 * x.below + x.t + 1) AS r2x,
             (2 * y.below + y.t + 1) AS r2y
      FROM daily JOIN rx x ON daily.rev = x.v
                 JOIN ry y ON daily.cnt = y.v),
    ingredients AS (
      SELECT CAST((SELECT count(*) FROM daily) AS BIGINT) AS n_days,
             CAST(sum((r2x - r2y) * (r2x - r2y)) AS BIGINT) AS sum_d2_x4,
             (SELECT CAST(sum(t * t * t - t) AS BIGINT) FROM rx) AS tie_x,
             (SELECT CAST(sum(t * t * t - t) AS BIGINT) FROM ry) AS tie_y
      FROM ranked)
    SELECT n_days, sum_d2_x4, tie_x, tie_y,
           ({_RHO_EXPR}) AS rho
    FROM ingredients
    """,
)
def stat_spearman_rho(spark, sf_dir):
    """SPEARMAN RANK CORRELATION (tie-corrected) between daily
    revenue and daily event volume — completes the rank-statistic
    tier (stat_mann_whitney_u's rank-sum, stat_kendall_tau's pair
    counts) with the third classic: Pearson on ranks. Exact-integer
    formulation: average ranks are carried DOUBLED (2·avg-rank =
    2·below + t + 1, an integer — the same trick as mann_whitney's
    two_r_a), so the rank-difference sum is the BIGINT sum_d2_x4 =
    4·Σd², and tie corrections Σ(t³−t) are BIGINTs; rho is ONE
    shared float expression over those integers (identical text in
    both engines, round 6). Scale: the corpus-sized work is the
    combinable day rollup; ranking runs on the CALENDAR-bounded
    aggregate (k distinct days), where n³ ≈ 5e10 at ten years —
    well inside BIGINT. Degenerate (constant) series yield NULL rho
    identically in both engines via the guarded CASE."""
    from pyspark.sql import Window as W

    daily = (
        read_table(spark, sf_dir, "events")
        .groupBy(F.col("ts").cast("date").alias("d"))
        .agg(
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
            .cast("bigint")
            .alias("rev"),
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
        )
    )

    def two_rank(col: str):
        per_v = daily.groupBy(F.col(col).alias("v")).agg(
            F.count(F.lit(1)).cast("bigint").alias("t")
        )
        # row bound (r16 audit): per_v is one row per distinct
        # DAILY aggregate value — calendar-bounded
        w = W.orderBy("v").rowsBetween(W.unboundedPreceding, -1)
        return per_v.select(
            "v",
            "t",
            F.coalesce(F.sum("t").over(w), F.lit(0))
            .cast("bigint")
            .alias("below"),
        )

    rx, ry = two_rank("rev"), two_rank("cnt")
    ranked = daily.join(
        rx.select(
            F.col("v").alias("rev"),
            (2 * F.col("below") + F.col("t") + 1).alias("r2x"),
        ),
        "rev",
    ).join(
        ry.select(
            F.col("v").alias("cnt"),
            (2 * F.col("below") + F.col("t") + 1).alias("r2y"),
        ),
        "cnt",
    )
    n_days = daily.agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    d2 = ranked.agg(
        F.sum((F.col("r2x") - F.col("r2y")) * (F.col("r2x") - F.col("r2y")))
        .cast("bigint")
        .alias("sum_d2_x4")
    )
    tie_x = rx.agg(
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("bigint")
        .alias("tie_x")
    )
    tie_y = ry.agg(
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("bigint")
        .alias("tie_y")
    )
    return (
        n_days.crossJoin(d2)
        .crossJoin(tie_x)
        .crossJoin(tie_y)
        .select(
            "n_days",
            "sum_d2_x4",
            "tie_x",
            "tie_y",
            F.expr(_RHO_EXPR).alias("rho"),
        )
    )


#: Wald–Wolfowitz z from the exact run/sign counts — one shared
#: float expression (see _RHO_EXPR note).
_RUNS_Z_EXPR = """
    CASE WHEN (n_up + n_down) > 1 AND n_up > 0 AND n_down > 0
         AND (2 * n_up * n_down) > (n_up + n_down)
    THEN round(
      ( CAST(n_runs AS DOUBLE)
      - (1.0 + CAST(2 * n_up * n_down AS DOUBLE)
               / CAST(n_up + n_down AS DOUBLE)) )
      / sqrt(
          CAST(2 * n_up * n_down AS DOUBLE)
        * (CAST(2 * n_up * n_down AS DOUBLE)
           - CAST(n_up + n_down AS DOUBLE))
        / ( CAST(n_up + n_down AS DOUBLE)
          * CAST(n_up + n_down AS DOUBLE)
          * (CAST(n_up + n_down AS DOUBLE) - 1.0)))
      , 6)
    END
"""


@register(
    "stat_runs_test",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}),
    deltas AS (
      SELECT d, rev - lag(rev) OVER (ORDER BY d) AS delta FROM daily),
    signs AS (
      SELECT d, CASE WHEN delta > 0 THEN 1 ELSE -1 END AS s
      FROM deltas WHERE delta IS NOT NULL AND delta <> 0),
    flips AS (
      SELECT s, CASE WHEN lag(s) OVER (ORDER BY d) IS NULL THEN 1
                     WHEN s <> lag(s) OVER (ORDER BY d) THEN 1
                     ELSE 0 END AS new_run
      FROM signs),
    agg AS (
      SELECT CAST(coalesce(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END), 0)
               AS BIGINT) AS n_up,
             CAST(coalesce(sum(CASE WHEN s = -1 THEN 1 ELSE 0 END), 0)
               AS BIGINT) AS n_down,
             CAST(coalesce(sum(new_run), 0) AS BIGINT) AS n_runs
      FROM flips)
    SELECT n_up, n_down, n_runs, ({_RUNS_Z_EXPR}) AS z
    FROM agg
    """,
)
def stat_runs_test(spark, sf_dir):
    """WALD–WOLFOWITZ RUNS TEST for randomness of the daily revenue
    series: count maximal runs of same-sign day-over-day deltas
    (zero deltas dropped — stated, and applied identically in both
    engines), emit the exact BIGINT counts (n_up, n_down, n_runs)
    and the normal-approximation z from ONE float expression shared
    verbatim with the oracle. The trend-shape companion to
    ts_cusum_changepoint: CUSUM finds a level shift, the runs test
    scores whether up/down moves cluster at all. Scale: one
    combinable day rollup, then two lag windows over the
    CALENDAR-bounded series — 2·n_up·n_down ≈ 6.7e6 at ten years,
    nowhere near BIGINT."""
    from pyspark.sql import Window as W

    daily = (
        read_table(spark, sf_dir, "events")
        .groupBy(F.col("ts").cast("date").alias("d"))
        .agg(
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
            .cast("bigint")
            .alias("rev")
        )
    )
    # row bound (r16 audit): daily is one row per calendar day
    w = W.orderBy("d")
    signs = (
        daily.select(
            "d", (F.col("rev") - F.lag("rev").over(w)).alias("delta")
        )
        .filter(F.col("delta").isNotNull() & (F.col("delta") != 0))
        .select(
            "d",
            F.when(F.col("delta") > 0, F.lit(1)).otherwise(F.lit(-1)).alias("s"),
        )
    )
    flips = signs.select(
        "s",
        F.when(F.lag("s").over(w).isNull(), F.lit(1))
        .when(F.col("s") != F.lag("s").over(w), F.lit(1))
        .otherwise(F.lit(0))
        .alias("new_run"),
    )
    agg = flips.agg(
        F.coalesce(
            F.sum(F.when(F.col("s") == 1, 1).otherwise(0)), F.lit(0)
        )
        .cast("bigint")
        .alias("n_up"),
        F.coalesce(
            F.sum(F.when(F.col("s") == -1, 1).otherwise(0)), F.lit(0)
        )
        .cast("bigint")
        .alias("n_down"),
        F.coalesce(F.sum("new_run"), F.lit(0)).cast("bigint").alias("n_runs"),
    )
    return agg.select(
        "n_up", "n_down", "n_runs", F.expr(_RUNS_Z_EXPR).alias("z")
    )


# ---------------------------------------------------------------- #
# Effect-size / multi-group tests: Welch t, one-way ANOVA F,       #
# Cramér's V — the companions the two-sample tier was missing      #
# ---------------------------------------------------------------- #

#: Fixed group order for the fixed-order float discipline: every
#: double addition below is written out explicitly in this order, so
#: neither engine's aggregate-ordering freedom can touch the result.
_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def _welch_expr(pfx_a: str, pfx_b: str) -> tuple[str, str]:
    """Welch t statistic + Welch–Satterthwaite dof from the six
    exact BIGINT moments (n, Σcents, Σcents²) of two groups — ONE
    shared expression text, so the float ops are IEEE-identical in
    both engines. Squares of sums are formed in DOUBLE (sum² would
    overflow BIGINT at ~3e9 cents)."""

    def var_over_n(p: str) -> str:
        return (
            f"((CAST({p}_ssq AS DOUBLE) - CAST({p}_sum AS DOUBLE)"
            f" * CAST({p}_sum AS DOUBLE) / CAST({p}_n AS DOUBLE))"
            f" / (CAST({p}_n AS DOUBLE) - 1.0)) / CAST({p}_n AS DOUBLE)"
        )

    va, vb = var_over_n(pfx_a), var_over_n(pfx_b)
    md = (
        f"(CAST({pfx_a}_sum AS DOUBLE) / CAST({pfx_a}_n AS DOUBLE)"
        f" - CAST({pfx_b}_sum AS DOUBLE) / CAST({pfx_b}_n AS DOUBLE))"
    )
    t = f"({md} / sqrt({va} + {vb}))"
    dof = (
        f"(({va} + {vb}) * ({va} + {vb})"
        f" / (({va} * {va}) / (CAST({pfx_a}_n AS DOUBLE) - 1.0)"
        f" + ({vb} * {vb}) / (CAST({pfx_b}_n AS DOUBLE) - 1.0)))"
    )
    return t, dof


_WELCH_T, _WELCH_DOF = _welch_expr("a", "b")


@register(
    "stat_welch_t",
    oracle=f"""
    WITH m AS (
      SELECT
        CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS a_n,
        CAST(sum(CASE WHEN event_type = 'view' THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS a_sum,
        CAST(sum(CASE WHEN event_type = 'view' THEN CAST(round(value * 100) AS BIGINT) * CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS a_ssq,
        CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS b_n,
        CAST(sum(CASE WHEN event_type = 'purchase' THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS b_sum,
        CAST(sum(CASE WHEN event_type = 'purchase' THEN CAST(round(value * 100) AS BIGINT) * CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS b_ssq
      FROM events WHERE event_type IN ('view', 'purchase'))
    SELECT a_n, a_sum, a_ssq, b_n, b_sum, b_ssq,
           round({_WELCH_T}, 6) AS t_stat,
           round({_WELCH_DOF}, 4) AS dof
    FROM m
    """,
)
def stat_welch_t(spark, sf_dir):
    """WELCH'S UNEQUAL-VARIANCE t-TEST between 'view' and 'purchase'
    event values — the two-sample mean test that does NOT assume
    equal variances (the safe default the classic Student t lacks),
    completing the two-sample tier next to stat_mann_whitney_u's
    rank test and stat_ab_test_zscore's proportion test. All six
    moments (n, Σcents, Σcents²) are exact BIGINTs from ONE
    conditional-aggregation pass; t and the Welch–Satterthwaite dof
    are one shared expression text over those integers, so every
    double op sees identical operands in both engines. Overflow
    bound: cents ≤ 5e4 → Σcents² ≤ 2.5e9·n — safe to n ~ 3.7e9
    rows/group; beyond that shift to per-group DECIMAL(38) or
    centered two-pass moments (stated, not silent). Scale shape:
    one combinable map-side aggregation over the fact table, one
    result row — no shuffle beyond the 6-value final combine."""
    cents = "CAST(round(value * 100) AS BIGINT)"
    ev = read_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )

    def side(p: str, t: str):
        c = F.expr(f"CASE WHEN event_type = '{t}' THEN {cents} ELSE 0 END")
        return [
            F.sum(
                F.when(F.col("event_type") == t, 1).otherwise(0)
            )
            .cast("bigint")
            .alias(f"{p}_n"),
            F.sum(c).cast("bigint").alias(f"{p}_sum"),
            F.sum(c * c).cast("bigint").alias(f"{p}_ssq"),
        ]

    m = ev.agg(*(side("a", "view") + side("b", "purchase")))
    return m.select(
        "a_n",
        "a_sum",
        "a_ssq",
        "b_n",
        "b_sum",
        "b_ssq",
        F.round(F.expr(_WELCH_T), 6).alias("t_stat"),
        F.round(F.expr(_WELCH_DOF), 4).alias("dof"),
    )


def _anova_exprs() -> tuple[str, str, str]:
    """One-way ANOVA F from the 15 exact BIGINT group moments —
    FIXED-ORDER float additions (the _EVENT_TYPES order, written
    out term by term) so neither engine's aggregate ordering can
    perturb the doubles. Returns (ssb, ssw, f) expression texts."""
    ks = range(len(_EVENT_TYPES))

    def d(x: str) -> str:
        return f"CAST({x} AS DOUBLE)"

    within = " + ".join(
        f"({d(f'g{i}_ssq')} - {d(f'g{i}_sum')} * {d(f'g{i}_sum')}"
        f" / {d(f'g{i}_n')})"
        for i in ks
    )
    between_gsum = " + ".join(
        f"{d(f'g{i}_sum')} * {d(f'g{i}_sum')} / {d(f'g{i}_n')}" for i in ks
    )
    tot_n = " + ".join(f"g{i}_n" for i in ks)
    tot_s = " + ".join(f"g{i}_sum" for i in ks)
    k = len(_EVENT_TYPES)
    ssb = (
        f"(({between_gsum}) - {d(f'({tot_s})')} * {d(f'({tot_s})')}"
        f" / {d(f'({tot_n})')})"
    )
    ssw = f"({within})"
    f_stat = (
        f"(({ssb} / {k - 1}.0) / ({ssw} / ({d(f'({tot_n})')} - {k}.0)))"
    )
    return ssb, ssw, f_stat


_ANOVA_SSB, _ANOVA_SSW, _ANOVA_F = _anova_exprs()


def _anova_moment_cols() -> str:
    cents = "CAST(round(value * 100) AS BIGINT)"
    cols = []
    for i, t in enumerate(_EVENT_TYPES):
        cols += [
            f"CAST(sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS g{i}_n",
            f"CAST(sum(CASE WHEN event_type = '{t}' THEN {cents} ELSE 0 END) AS BIGINT) AS g{i}_sum",
            f"CAST(sum(CASE WHEN event_type = '{t}' THEN {cents} * {cents} ELSE 0 END) AS BIGINT) AS g{i}_ssq",
        ]
    return ", ".join(cols)


@register(
    "stat_anova_f",
    oracle=f"""
    WITH m AS (SELECT {_anova_moment_cols()} FROM events)
    SELECT CAST({' + '.join(f'g{i}_n' for i in range(len(_EVENT_TYPES)))} AS BIGINT) AS n,
           CAST({len(_EVENT_TYPES)} AS BIGINT) AS k,
           CAST({' + '.join(f'g{i}_sum' for i in range(len(_EVENT_TYPES)))} AS BIGINT) AS sum_cents,
           CAST({' + '.join(f'g{i}_ssq' for i in range(len(_EVENT_TYPES)))} AS BIGINT) AS ssq_cents,
           round({_ANOVA_F}, 6) AS f_stat
    FROM m
    """,
)
def stat_anova_f(spark, sf_dir):
    """ONE-WAY ANOVA F across the five event types' values — the
    k-group generalization of stat_welch_t (does ANY event type
    differ in mean value?). The engine computes the 15 group
    moments (n, Σcents, Σcents²) in ONE conditional-aggregation
    pass with the groups as FIXED literals in _EVENT_TYPES order;
    F is one shared expression text whose double additions are
    written out term-by-term in that order — the fixed-order float
    discipline. The AUDIT columns are the exact BIGINT moment
    totals, NOT rounded SSB/SSW floats: round(x, 4) of a ~1e11
    double is cross-engine UNSTABLE (Spark rounds via exact
    BigDecimal, DuckDB via double multiply — 3-ulp divergence
    observed at sf0.01), so only the small-magnitude statistic is
    rounded. Groups are the five fixture
    event types; an unseen type is excluded by construction (the
    conditional sums) — generalizing to data-driven groups means
    sorting group moments into a deterministic order first (stated).
    Overflow: same Σcents² ≤ 2.5e9·n bound as stat_welch_t.
    Scale shape: one combinable map-side pass over the facts, one
    result row."""
    cents = "CAST(round(value * 100) AS BIGINT)"
    moments = []
    for i, t in enumerate(_EVENT_TYPES):
        c = F.expr(f"CASE WHEN event_type = '{t}' THEN {cents} ELSE 0 END")
        one = F.when(F.col("event_type") == t, 1).otherwise(0)
        moments += [
            F.sum(one).cast("bigint").alias(f"g{i}_n"),
            F.sum(c).cast("bigint").alias(f"g{i}_sum"),
            F.sum(c * c).cast("bigint").alias(f"g{i}_ssq"),
        ]
    m = read_table(spark, sf_dir, "events").agg(*moments)
    n_expr = " + ".join(f"g{i}_n" for i in range(len(_EVENT_TYPES)))
    s_expr = " + ".join(f"g{i}_sum" for i in range(len(_EVENT_TYPES)))
    q_expr = " + ".join(f"g{i}_ssq" for i in range(len(_EVENT_TYPES)))
    return m.select(
        F.expr(f"CAST({n_expr} AS BIGINT)").alias("n"),
        F.lit(len(_EVENT_TYPES)).cast("bigint").alias("k"),
        F.expr(f"CAST({s_expr} AS BIGINT)").alias("sum_cents"),
        F.expr(f"CAST({q_expr} AS BIGINT)").alias("ssq_cents"),
        F.round(F.expr(_ANOVA_F), 6).alias("f_stat"),
    )


_CRAMER_CHI = "sum(term)"
_CRAMER_V = (
    "sqrt(sum(term) / (CAST(max(grand_n) AS DOUBLE)"
    " * (CAST(least(max(dr), max(dc)) AS DOUBLE) - 1.0)))"
)


@register(
    "stat_cramers_v",
    oracle="""
    WITH obs AS (
      SELECT c_nationkey AS nk, c_mktsegment AS seg,
             CAST(count(*) AS BIGINT) AS n
      FROM customer GROUP BY 1, 2),
    nks AS (SELECT DISTINCT nk FROM obs),
    segs AS (SELECT DISTINCT seg FROM obs),
    filled AS (
      SELECT g.nk, g.seg, CAST(coalesce(o.n, 0) AS BIGINT) AS n
      FROM (SELECT nk, seg FROM nks CROSS JOIN segs) g
      LEFT JOIN obs o ON g.nk = o.nk AND g.seg = o.seg),
    dims AS (
      SELECT CAST(count(DISTINCT nk) AS BIGINT) AS dr,
             CAST(count(DISTINCT seg) AS BIGINT) AS dc
      FROM obs),
    tot AS (
      SELECT n,
             CAST(sum(n) OVER (PARTITION BY nk) AS BIGINT) AS row_n,
             CAST(sum(n) OVER (PARTITION BY seg) AS BIGINT) AS col_n,
             CAST(sum(n) OVER () AS BIGINT) AS grand_n
      FROM filled),
    cells AS (
      SELECT (CAST(n AS DOUBLE)
              - CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE)
                / CAST(grand_n AS DOUBLE))
             * (CAST(n AS DOUBLE)
                - CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE)
                  / CAST(grand_n AS DOUBLE))
             / (CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE)
                / CAST(grand_n AS DOUBLE)) AS term,
             grand_n
      FROM tot)
    SELECT round(sum(term), 6) AS chi_square,
           round(sqrt(sum(term) / (CAST(max(grand_n) AS DOUBLE)
                 * (CAST(least(max(d.dr), max(d.dc)) AS DOUBLE) - 1.0))), 6)
             AS cramers_v,
           CAST(max(d.dr) AS BIGINT) AS r,
           CAST(max(d.dc) AS BIGINT) AS c,
           CAST(max(grand_n) AS BIGINT) AS n
    FROM cells CROSS JOIN dims d
    """,
)
def stat_cramers_v(spark, sf_dir):
    """CRAMÉR'S V — the [0,1] EFFECT-SIZE companion to
    stat_chi_square_independence (a chi-square over a huge corpus is
    'significant' at trivial association strength; V answers 'how
    strong?'): V = sqrt(chi² / (N·(min(r,c)−1))) over the customer
    nation × market-segment contingency (25×5 — a different, wider
    table than the chi-square query's 5×5, so the grid-completion
    path is exercised with r ≠ c). Same machinery and float
    discipline as the sibling: exact BIGINT cell counts, marginals
    by window sums over the tiny cell table, the cell-term sum
    shares the chi-square precedent (125 doubles summed over a
    single-combine tiny aggregate; every operand exact). Scale
    shape: ONE combinable fact aggregation to r·c cells; everything
    after runs on the cells."""
    cust = read_table(spark, sf_dir, "customer")
    obs = cust.groupBy(
        F.col("c_nationkey").alias("nk"),
        F.col("c_mktsegment").alias("seg"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    nks = obs.select("nk").distinct()
    segs = obs.select("seg").distinct()
    filled = (
        nks.crossJoin(segs)
        .join(obs, ["nk", "seg"], "left")
        .select("nk", "seg", F.coalesce("n", F.lit(0)).cast("bigint").alias("n"))
    )
    dims = obs.agg(
        F.countDistinct("nk").cast("bigint").alias("dr"),
        F.countDistinct("seg").cast("bigint").alias("dc"),
    )
    from pyspark.sql import Window as W

    tot = filled.select(
        "n",
        F.sum("n").over(W.partitionBy("nk")).cast("bigint").alias("row_n"),
        F.sum("n").over(W.partitionBy("seg")).cast("bigint").alias("col_n"),
        F.sum("n").over(W.partitionBy()).cast("bigint").alias("grand_n"),
    )
    exp = (
        "CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE)"
        " / CAST(grand_n AS DOUBLE)"
    )
    cells = tot.select(
        F.expr(
            f"(CAST(n AS DOUBLE) - {exp}) * (CAST(n AS DOUBLE) - {exp})"
            f" / ({exp})"
        ).alias("term"),
        "grand_n",
    ).crossJoin(F.broadcast(dims))
    return cells.agg(
        F.round(F.expr(_CRAMER_CHI), 6).alias("chi_square"),
        F.round(F.expr(_CRAMER_V), 6).alias("cramers_v"),
        F.max("dr").cast("bigint").alias("r"),
        F.max("dc").cast("bigint").alias("c"),
        F.max("grand_n").cast("bigint").alias("n"),
    )


#: Randomization-test resamples (same derandomized-hash discipline
#: as BOOT_B).
PERM_B = 32


def _perm_oracle() -> str:
    from etl_jobs_spark.operators.hashing import hash60

    h = hash60(
        "(CAST(event_id AS VARCHAR) || ':' || CAST(bb.b AS VARCHAR))",
        "duckdb",
    )
    return f"""
    WITH base AS (
      SELECT event_id, event_type,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type IN ('view', 'purchase')),
    obs AS (
      SELECT CAST(sum(CASE WHEN event_type = 'view' THEN cents END)
                  // sum(CASE WHEN event_type = 'view' THEN 1 END)
                - sum(CASE WHEN event_type = 'purchase' THEN cents END)
                  // sum(CASE WHEN event_type = 'purchase' THEN 1 END)
                  AS BIGINT) AS diff_obs,
             CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_a,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_b
      FROM base),
    relabeled AS (
      SELECT bb.b, base.cents, ({h}) % 2 AS g
      FROM base CROSS JOIN range(0, {PERM_B}) bb(b)),
    diffs AS (
      SELECT b,
             CAST(sum(CASE WHEN g = 0 THEN cents END)
                  // sum(CASE WHEN g = 0 THEN 1 END)
                - sum(CASE WHEN g = 1 THEN cents END)
                  // sum(CASE WHEN g = 1 THEN 1 END) AS BIGINT) AS d
      FROM relabeled GROUP BY b)
    SELECT o.n_a, o.n_b, o.diff_obs,
           CAST({PERM_B} AS BIGINT) AS n_resamples,
           CAST((SELECT count(*) FROM diffs
                 WHERE abs(d) >= abs(o.diff_obs)) AS BIGINT) AS n_exceed,
           CAST(1000 * (SELECT count(*) FROM diffs
                        WHERE abs(d) >= abs(o.diff_obs))
                // {PERM_B} AS BIGINT) AS p_permille
    FROM obs o
    """


@register("stat_permutation_test", oracle=_perm_oracle())
def stat_permutation_test(spark, sf_dir):
    """RANDOMIZATION TEST for the view-vs-purchase mean difference:
    PERM_B derandomized relabelings (each row's group in resample b
    is one md5-hash bit — random REASSIGNMENT rather than a
    size-preserving permutation, stated: group sizes are binomial
    around n/2, the standard large-n approximation), p estimated as
    the fraction of resamples whose |mean gap| reaches the observed
    gap. The distribution-free companion to stat_welch_t — same
    question, no normality assumption. All arithmetic is integer
    (cent sums, truncating mean DIV, exceedance counts; p reported
    in permille) so the row is hash-stable by construction. Scale
    shape: the ×PERM_B explode is map-only and collapses inside
    each task via partial aggregation to PERM_B groups — the
    bootstrap plan; the exceedance count runs over PERM_B rows."""
    from etl_jobs_spark.operators.hashing import hash60

    base = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("view", "purchase"))
        .select(
            "event_id",
            "event_type",
            F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
        )
    )
    obs = base.agg(
        F.expr(
            "CAST(sum(CASE WHEN event_type = 'view' THEN cents END)"
            " DIV sum(CASE WHEN event_type = 'view' THEN 1 END)"
            " - sum(CASE WHEN event_type = 'purchase' THEN cents END)"
            " DIV sum(CASE WHEN event_type = 'purchase' THEN 1 END)"
            " AS BIGINT)"
        ).alias("diff_obs"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("n_b"),
    )
    h = hash60(
        "(CAST(event_id AS STRING) || ':' || CAST(b AS STRING))", "spark"
    )
    relabeled = base.select(
        "cents",
        "event_id",
        F.explode(F.expr(f"sequence(0, {PERM_B - 1})")).alias("b"),
    ).select("b", "cents", F.expr(f"({h}) % 2").alias("g"))
    diffs = relabeled.groupBy("b").agg(
        F.expr(
            "CAST(sum(CASE WHEN g = 0 THEN cents END)"
            " DIV sum(CASE WHEN g = 0 THEN 1 END)"
            " - sum(CASE WHEN g = 1 THEN cents END)"
            " DIV sum(CASE WHEN g = 1 THEN 1 END) AS BIGINT)"
        ).alias("d")
    )
    exceed = diffs.crossJoin(F.broadcast(obs.select("diff_obs"))).agg(
        # count(when): zero resamples (empty corpus) is 0 exceedances
        # like the oracle's filtered count(*), not a NULL sum
        # (round-11 empty-input axis)
        F.count(
            F.when(F.abs(F.col("d")) >= F.abs(F.col("diff_obs")), F.lit(1))
        )
        .cast("bigint")
        .alias("n_exceed")
    )
    return obs.crossJoin(F.broadcast(exceed)).select(
        "n_a",
        "n_b",
        "diff_obs",
        F.lit(PERM_B).cast("bigint").alias("n_resamples"),
        "n_exceed",
        F.expr(f"CAST(1000 * n_exceed DIV {PERM_B} AS BIGINT)").alias(
            "p_permille"
        ),
    )


def _cohens_d_exprs() -> str:
    """Cohen's d from the six Welch moments — pooled-SD effect size,
    ONE shared expression text (same operands as _WELCH_T)."""

    def var(p: str) -> str:
        return (
            f"((CAST({p}_ssq AS DOUBLE) - CAST({p}_sum AS DOUBLE)"
            f" * CAST({p}_sum AS DOUBLE) / CAST({p}_n AS DOUBLE))"
            f" / (CAST({p}_n AS DOUBLE) - 1.0))"
        )

    md = (
        "(CAST(a_sum AS DOUBLE) / CAST(a_n AS DOUBLE)"
        " - CAST(b_sum AS DOUBLE) / CAST(b_n AS DOUBLE))"
    )
    pooled = (
        f"sqrt(((CAST(a_n AS DOUBLE) - 1.0) * {var('a')}"
        f" + (CAST(b_n AS DOUBLE) - 1.0) * {var('b')})"
        " / (CAST(a_n AS DOUBLE) + CAST(b_n AS DOUBLE) - 2.0))"
    )
    return f"({md} / {pooled})"


_COHENS_D = _cohens_d_exprs()


@register(
    "stat_cohens_d",
    oracle=f"""
    WITH m AS (
      SELECT
        CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS a_n,
        CAST(sum(CASE WHEN event_type = 'view' THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS a_sum,
        CAST(sum(CASE WHEN event_type = 'view' THEN CAST(round(value * 100) AS BIGINT) * CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS a_ssq,
        CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS b_n,
        CAST(sum(CASE WHEN event_type = 'purchase' THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS b_sum,
        CAST(sum(CASE WHEN event_type = 'purchase' THEN CAST(round(value * 100) AS BIGINT) * CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS b_ssq
      FROM events WHERE event_type IN ('view', 'purchase'))
    SELECT a_n, b_n, round({_COHENS_D}, 6) AS cohens_d
    FROM m
    """,
)
def stat_cohens_d(spark, sf_dir):
    """COHEN'S d — the standardized effect size that turns
    stat_welch_t's 'is there a difference' into 'how big, in
    pooled-SD units' (the number meta-analyses and power
    calculations consume; pairs with stat_cramers_v on the
    categorical side). Same six exact BIGINT moments as
    stat_welch_t, one shared float expression (pooled SD, not
    Welch's unpooled — stated; with near-equal fixture group sizes
    the distinction is cosmetic but the formula is the textbook
    one). Scale: one combinable conditional-aggregation pass."""
    cents = "CAST(round(value * 100) AS BIGINT)"
    ev = read_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )

    def side(p: str, t: str):
        c = F.expr(f"CASE WHEN event_type = '{t}' THEN {cents} ELSE 0 END")
        return [
            F.sum(F.when(F.col("event_type") == t, 1).otherwise(0))
            .cast("bigint")
            .alias(f"{p}_n"),
            F.sum(c).cast("bigint").alias(f"{p}_sum"),
            F.sum(c * c).cast("bigint").alias(f"{p}_ssq"),
        ]

    m = ev.agg(*(side("a", "view") + side("b", "purchase")))
    return m.select(
        "a_n", "b_n", F.round(F.expr(_COHENS_D), 6).alias("cohens_d")
    )


#: Wilson CI z-score (95%): carried as an exact decimal literal in
#: the shared expression text.
_WILSON_Z = "1.96"


def _wilson_exprs() -> tuple[str, str]:
    """Wilson score interval bounds from the two exact BIGINTs
    (x successes, n trials) — one shared expression text."""
    x = "CAST(x AS DOUBLE)"
    # nullif: zero trials (empty-input axis) must yield NULL bounds
    # on both engines, not an ANSI divide-by-zero in Spark
    n = "CAST(nullif(n, 0) AS DOUBLE)"
    z = _WILSON_Z
    p = f"({x} / {n})"
    center = f"({p} + {z} * {z} / (2.0 * {n}))"
    half = (
        f"({z} * sqrt({p} * (1.0 - {p}) / {n}"
        f" + {z} * {z} / (4.0 * {n} * {n})))"
    )
    denom = f"(1.0 + {z} * {z} / {n})"
    return (
        f"(({center} - {half}) / {denom})",
        f"(({center} + {half}) / {denom})",
    )


_WILSON_LO, _WILSON_HI = _wilson_exprs()


@register(
    "stat_proportion_ci_wilson",
    oracle=f"""
    WITH m AS (
      SELECT CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS x,
             CAST(count(*) AS BIGINT) AS n
      FROM events WHERE event_type IN ('view', 'purchase'))
    SELECT x, n,
           CAST(1000 * x // nullif(n, 0) AS BIGINT) AS p_permille,
           round({_WILSON_LO}, 6) AS ci_lo,
           round({_WILSON_HI}, 6) AS ci_hi
    FROM m
    """,
)
def stat_proportion_ci_wilson(spark, sf_dir):
    """WILSON SCORE INTERVAL for the view→purchase conversion rate —
    the binomial-proportion CI that stays inside [0,1] and behaves
    at small n or extreme rates, where the naive Wald interval
    (stat_ab_test_zscore's asymptotic regime) collapses; the number
    a dashboard should put around every conversion-rate tile. Two
    exact BIGINTs (successes, trials) from one conditional
    aggregation; both bounds are one shared expression text over
    those integers (z = 1.96 as a literal), round 6. Scale: one
    combinable pass, one row."""
    m = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("view", "purchase"))
        .agg(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            .cast("bigint")
            .alias("x"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )
    return m.select(
        "x",
        "n",
        F.expr("CAST(1000 * x DIV nullif(n, 0) AS BIGINT)").alias("p_permille"),
        F.round(F.expr(_WILSON_LO), 6).alias("ci_lo"),
        F.round(F.expr(_WILSON_HI), 6).alias("ci_hi"),
    )


_PETTITT_P = (
    "round(2.0 * exp(-6.0 * CAST(k_stat AS DOUBLE)"
    " * CAST(k_stat AS DOUBLE)"
    " / (CAST(n_days AS DOUBLE) * CAST(n_days AS DOUBLE)"
    " * CAST(n_days AS DOUBLE)"
    " + CAST(n_days AS DOUBLE) * CAST(n_days AS DOUBLE))), 6)"
)


@register(
    "stat_pettitt_changepoint",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}),
    s AS (
      SELECT a.d,
             CAST(sum(CASE WHEN b.rev > a.rev THEN 1
                           WHEN b.rev < a.rev THEN -1
                           ELSE 0 END) AS BIGINT) AS st
      FROM daily a JOIN daily b ON b.d <> a.d
      GROUP BY a.d),
    u AS (
      SELECT d, CAST(sum(st) OVER (ORDER BY d
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ut
      FROM s),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n_days,
                  max(d) AS last_d FROM daily),
    best AS (
      SELECT u.d AS cp_day, u.ut AS u_at_cp, abs(u.ut) AS k_stat,
             row_number() OVER (ORDER BY abs(u.ut) DESC, u.d ASC) AS rn
      FROM u, nn WHERE u.d < nn.last_d)
    SELECT nn.n_days, b.cp_day, b.u_at_cp,
           CAST(b.k_stat AS BIGINT) AS k_stat,
           {_PETTITT_P} AS p_approx
    FROM best b, nn WHERE b.rn = 1
    """,
)
def stat_pettitt_changepoint(spark, sf_dir):
    """PETTITT CHANGEPOINT TEST on the daily-revenue series — the
    rank-based (distribution-free) changepoint detector next to
    ts_cusum_changepoint's mean-shift CUSUM: U_t counts
    sign-agreements across every (before, after) split, K = max|U_t|
    marks the most probable break day. Exact integers end-to-end via
    the O(k²)-pairs identity U_t = U_{t-1} + Σ_j sgn(x_j − x_t)
    (one pairwise join over the CALENDAR-bounded daily table — the
    ts_theil_sen_trend cost envelope, never the fact table — then
    ONE running-sum window); the split-day argmax ties to the
    earliest day. The approximate significance 2·exp(−6K²/(n³+n²))
    is one shared float expression over the exact integers, round 6.
    Scale shape: one combinable daily rollup from the facts;
    everything pairwise runs on k days."""
    from pyspark.sql import Window as W

    daily = (
        read_table(spark, sf_dir, "events")
        .groupBy(F.col("ts").cast("date").alias("d"))
        .agg(
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
            .cast("bigint")
            .alias("rev")
        )
    )
    b = daily.select(F.col("d").alias("bd"), F.col("rev").alias("brev"))
    s = (
        daily.join(b, F.col("bd") != F.col("d"))
        .groupBy("d")
        .agg(
            F.sum(
                F.when(F.col("brev") > F.col("rev"), 1)
                .when(F.col("brev") < F.col("rev"), -1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("st")
        )
    )
    # row bound (r16 audit): s is one row per calendar day; the
    # rank below additionally plans WindowGroupLimit (rn == 1)
    u = s.select(
        "d",
        F.sum("st")
        .over(W.orderBy("d").rowsBetween(W.unboundedPreceding, 0))
        .cast("bigint")
        .alias("ut"),
    )
    nn = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.max("d").alias("last_d"),
    )
    best = (
        u.crossJoin(F.broadcast(nn))
        .filter(F.col("d") < F.col("last_d"))
        .withColumn(
            "rn",
            F.row_number().over(
                W.orderBy(F.abs(F.col("ut")).desc(), F.col("d").asc())
            ),
        )
        .filter(F.col("rn") == 1)
    )
    return best.select(
        "n_days",
        F.col("d").alias("cp_day"),
        F.col("ut").alias("u_at_cp"),
        F.abs(F.col("ut")).cast("bigint").alias("k_stat"),
        F.expr(_PETTITT_P).alias("p_approx"),
    )


def _bf_moment_cols() -> str:
    """Conditional-aggregation moments of z = |cents − group median|
    per fixed group (the ANOVA fixed-order discipline); the median
    itself is the type-1 order statistic (value at row
    ceil(n/2)) under the total order (cents, event_id)."""
    cols = []
    for i, t in enumerate(_EVENT_TYPES):
        cols += [
            f"CAST(sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS g{i}_n",
            f"CAST(sum(CASE WHEN event_type = '{t}' THEN z ELSE 0 END) AS BIGINT) AS g{i}_sum",
            f"CAST(sum(CASE WHEN event_type = '{t}' THEN z * z ELSE 0 END) AS BIGINT) AS g{i}_ssq",
        ]
    return ", ".join(cols)


@register(
    "stat_levene_bf",
    oracle=f"""
    WITH cents AS (
      SELECT event_type, event_id,
             CAST(round(value * 100) AS BIGINT) AS c
      FROM events WHERE value IS NOT NULL),
    ranked AS (
      SELECT event_type, c,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY c ASC, event_id ASC) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM cents),
    med AS (
      SELECT event_type,
             max(CASE WHEN rn = (2 * n + 3) // 4 THEN c END) AS med
      FROM ranked GROUP BY 1),
    z AS (
      SELECT c.event_type, abs(c.c - m.med) AS z
      FROM cents c JOIN med m ON m.event_type = c.event_type),
    m AS (SELECT {_bf_moment_cols()} FROM z)
    SELECT CAST({' + '.join(f'g{i}_n' for i in range(len(_EVENT_TYPES)))} AS BIGINT) AS n,
           CAST({len(_EVENT_TYPES)} AS BIGINT) AS k,
           CAST({' + '.join(f'g{i}_sum' for i in range(len(_EVENT_TYPES)))} AS BIGINT) AS sum_z,
           CAST({' + '.join(f'g{i}_ssq' for i in range(len(_EVENT_TYPES)))} AS BIGINT) AS ssq_z,
           round({_ANOVA_F}, 6) AS w_stat
    FROM m
    """,
)
def stat_levene_bf(spark, sf_dir):
    """BROWN–FORSYTHE TEST (Levene with the median center) for
    variance homogeneity across the five event types — the check
    that should run BEFORE anyone trusts a pooled-variance statistic
    (stat_cohens_d's pooled SD, classic ANOVA): W is the one-way
    ANOVA F computed on z = |x − group median|. Group medians are
    the same pure-integer type-1 order statistics as
    feat_robust_scale (no quantile interpolation float); z values
    are exact BIGINTs; W reuses stat_anova_f's fixed-order moment
    expressions verbatim. Scale shape: one keyed rank window for the
    medians (the documented exact-audit trade), then one combinable
    conditional-aggregation pass."""
    from pyspark.sql import Window as W

    cents = (
        read_table(spark, sf_dir, "events")
        # null samples excluded explicitly (cross-engine null sort
        # order diverges; a null |x - med| is meaningless)
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            "event_id",
            F.expr("CAST(round(value * 100) AS BIGINT)").alias("c"),
        )
    )
    ranked = cents.select(
        "event_type",
        "c",
        F.row_number()
        .over(W.partitionBy("event_type").orderBy("c", "event_id"))
        .alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("event_type")).alias("n"),
    )
    med = ranked.groupBy("event_type").agg(
        F.max(
            F.when(F.col("rn") == F.expr("(2 * n + 3) DIV 4"), F.col("c"))
        ).alias("med")
    )
    z = cents.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("c") - F.col("med")).alias("z")
    )
    moments = []
    for i, t in enumerate(_EVENT_TYPES):
        zc = F.expr(f"CASE WHEN event_type = '{t}' THEN z ELSE 0 END")
        one = F.when(F.col("event_type") == t, 1).otherwise(0)
        moments += [
            F.sum(one).cast("bigint").alias(f"g{i}_n"),
            F.sum(zc).cast("bigint").alias(f"g{i}_sum"),
            F.sum(zc * zc).cast("bigint").alias(f"g{i}_ssq"),
        ]
    m = z.agg(*moments)
    n_expr = " + ".join(f"g{i}_n" for i in range(len(_EVENT_TYPES)))
    s_expr = " + ".join(f"g{i}_sum" for i in range(len(_EVENT_TYPES)))
    q_expr = " + ".join(f"g{i}_ssq" for i in range(len(_EVENT_TYPES)))
    return m.select(
        F.expr(f"CAST({n_expr} AS BIGINT)").alias("n"),
        F.lit(len(_EVENT_TYPES)).cast("bigint").alias("k"),
        F.expr(f"CAST({s_expr} AS BIGINT)").alias("sum_z"),
        F.expr(f"CAST({q_expr} AS BIGINT)").alias("ssq_z"),
        F.round(F.expr(_ANOVA_F), 6).alias("w_stat"),
    )


_MK_Z = """
    CASE WHEN var18 <= 0 THEN NULL
         WHEN s_stat > 0 THEN round((CAST(s_stat AS DOUBLE) - 1.0)
              / sqrt(CAST(var18 AS DOUBLE) / 18.0), 6)
         WHEN s_stat < 0 THEN round((CAST(s_stat AS DOUBLE) + 1.0)
              / sqrt(CAST(var18 AS DOUBLE) / 18.0), 6)
         ELSE 0.0 END
"""


@register(
    "stat_mann_kendall_trend",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}),
    s AS (
      SELECT CAST(sum(CASE WHEN b.rev > a.rev THEN 1
                           WHEN b.rev < a.rev THEN -1
                           ELSE 0 END) AS BIGINT) AS s_stat
      FROM daily a JOIN daily b ON b.d > a.d),
    ties AS (
      SELECT CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0)
                  AS BIGINT) AS tie18
      FROM (SELECT CAST(count(*) AS BIGINT) AS t
            FROM daily GROUP BY rev)),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM daily),
    agg AS (
      SELECT nn.n_days, s.s_stat,
             CAST(nn.n_days * (nn.n_days - 1) * (2 * nn.n_days + 5)
                  - t.tie18 AS BIGINT) AS var18
      FROM nn, s, ties t)
    SELECT n_days, s_stat, var18, {_MK_Z} AS z
    FROM agg
    """,
)
def stat_mann_kendall_trend(spark, sf_dir):
    """MANN–KENDALL TREND TEST on the daily-revenue series — the
    rank-based monotone-trend detector that pairs with
    ts_theil_sen_trend's slope (MK answers 'is there a trend',
    Theil–Sen 'how steep'), on the SAME daily base as the
    kendall/spearman/pettitt family. S = Σ_{i<j} sgn(x_j − x_i) is
    one pairwise integer join over the CALENDAR-bounded daily
    table; the tie-corrected variance n(n−1)(2n+5) − Σt(t−1)(2t+5)
    is carried ×18 as an exact BIGINT (bound: n³ — safe beyond a
    century of days); the continuity-corrected z is one shared
    float expression over the exact integers, round 6, NULL on the
    degenerate all-tied series in both engines. Scale: one
    combinable daily rollup from the facts, k² pairwork on days."""
    daily = (
        read_table(spark, sf_dir, "events")
        .groupBy(F.col("ts").cast("date").alias("d"))
        .agg(
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
            .cast("bigint")
            .alias("rev")
        )
    )
    b = daily.select(F.col("d").alias("bd"), F.col("rev").alias("brev"))
    s = (
        daily.join(b, F.col("bd") > F.col("d"))
        .agg(
            F.sum(
                F.when(F.col("brev") > F.col("rev"), 1)
                .when(F.col("brev") < F.col("rev"), -1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("s_stat")
        )
    )
    ties = (
        daily.groupBy("rev")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("tie18")
        )
    )
    nn = daily.agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    agg = (
        nn.crossJoin(s)
        .crossJoin(ties)
        .select(
            "n_days",
            "s_stat",
            F.expr(
                "CAST(n_days * (n_days - 1) * (2 * n_days + 5)"
                " - tie18 AS BIGINT)"
            ).alias("var18"),
        )
    )
    return agg.select("n_days", "s_stat", "var18", F.expr(_MK_Z).alias("z"))


#: Retention TTL (days) for the deletion-backlog audit.
_TTL_DAYS = 20


@register(
    "governance_retention_ttl_audit",
    oracle=f"""
    WITH wm AS (
      SELECT max(CAST(ts AS DATE)) AS wm_d FROM events),
    ev AS (
      SELECT CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CASE WHEN CAST(ts AS DATE)
                              < wm.wm_d - {_TTL_DAYS} THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_expired
      FROM events, wm),
    ord AS (
      SELECT CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CASE WHEN CAST(o_orderdate AS DATE)
                              < wm.wm_d - {_TTL_DAYS} THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_expired
      FROM orders, wm)
    SELECT 'events' AS table_name, n_rows, n_expired,
           CAST(1000 * n_expired // n_rows AS BIGINT)
             AS expired_permille
    FROM ev
    UNION ALL
    SELECT 'orders', n_rows, n_expired,
           CAST(1000 * n_expired // n_rows AS BIGINT)
    FROM ord
    """,
)
def governance_retention_ttl_audit(spark, sf_dir):
    """RETENTION-TTL DELETION BACKLOG audit: per time-bearing table,
    how many rows are older than the {_TTL_DAYS}-day retention
    window measured from the corpus watermark — the number a
    GDPR/retention policy owner needs BEFORE scheduling the purge
    (governance_erasure_cascade deletes per-subject; this sizes the
    age-based sweep, and a fixed wall-clock 'now' would make the
    row unreproducible, so the watermark anchors it). Exact-integer
    date arithmetic; one combinable conditional-count pass per
    table with the 1-row watermark broadcast. Scale: at 100 TB the
    same predicate is the partition-pruning filter — date-
    partitioned layout makes the expired count a metadata read."""
    ev = read_table(spark, sf_dir, "events")
    orders = read_table(spark, sf_dir, "orders")
    wm = ev.agg(F.max(F.col("ts").cast("date")).alias("wm_d"))

    def audit(df, name, datecol):
        return (
            df.crossJoin(F.broadcast(wm))
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum(
                    F.when(
                        F.col(datecol).cast("date")
                        < F.date_sub(F.col("wm_d"), _TTL_DAYS),
                        1,
                    ).otherwise(0)
                )
                .cast("bigint")
                .alias("n_expired"),
            )
            .select(
                F.lit(name).alias("table_name"),
                "n_rows",
                "n_expired",
                F.expr(
                    "CAST(1000 * n_expired DIV n_rows AS BIGINT)"
                ).alias("expired_permille"),
            )
        )

    return audit(ev, "events", "ts").unionAll(
        audit(orders, "orders", "o_orderdate")
    )


#: Primary keys of every fixture table (the dbt `unique` test set).
_PK_COLS = {
    "region": "r_regionkey",
    "nation": "n_nationkey",
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}


def _uniq_oracle() -> str:
    rows = []
    for t, pk in _PK_COLS.items():
        rows.append(f"""
    SELECT '{t}' AS table_name, '{pk}' AS pk_col,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT {pk}) AS BIGINT) AS n_distinct,
           CAST(count(*) FILTER (WHERE {pk} IS NULL) AS BIGINT)
             AS n_null,
           CAST(count(*) - count(DISTINCT {pk}) AS BIGINT) AS n_dups
    FROM {t}""")
    li = """
    SELECT 'lineitem' AS table_name,
           'l_orderkey+l_linenumber' AS pk_col,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT l_orderkey * 128 + l_linenumber)
                AS BIGINT) AS n_distinct,
           CAST(count(*) FILTER (WHERE l_orderkey IS NULL
                                    OR l_linenumber IS NULL)
                AS BIGINT) AS n_null,
           CAST(count(*) - count(DISTINCT l_orderkey * 128
                                 + l_linenumber) AS BIGINT) AS n_dups
    FROM lineitem"""
    return "\n    UNION ALL\n".join(rows + [li])


@register("dq_pk_uniqueness_suite", oracle=_uniq_oracle())
def dq_pk_uniqueness_suite(spark, sf_dir):
    """PRIMARY-KEY UNIQUENESS + NOT-NULL suite over ALL TEN fixture
    tables in one report — the dbt `unique`/`not_null` test pair,
    batch-run (the two checks every contract starts with, and the
    ones whose silent failure corrupts every downstream join
    cardinality). Lineitem's composite key is folded to one BIGINT
    (orderkey·128 + linenumber — linenumber < 128 per TPC-H, bound
    stated) so the distinct-count shuffles one integer — and it
    FINDS a real violation: the synthetic fixture's lineitem
    composite key is NOT unique (~23% duplicate key pairs at every
    SF), which downstream joins on (orderkey, linenumber) would
    silently fan out on; the test suite locks this finding. Scale
    shape: each table contributes ONE combinable
    count/count-distinct pass; at 100 TB count(DISTINCT pk) swaps
    to the HLL/KMV tier for a first pass and exact only on
    suspects (stated: this is the exact audit)."""
    dfs = []
    for t, pk in _PK_COLS.items():
        df = read_table(spark, sf_dir, t).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.countDistinct(pk).cast("bigint").alias("n_distinct"),
            # count(when): 0 on an empty table, where sum(when)
            # would be NULL (round-11 empty-input axis)
            F.count(F.when(F.col(pk).isNull(), F.lit(1)))
            .cast("bigint")
            .alias("n_null"),
        ).select(
            F.lit(t).alias("table_name"),
            F.lit(pk).alias("pk_col"),
            "n_rows",
            "n_distinct",
            "n_null",
            (F.col("n_rows") - F.col("n_distinct"))
            .cast("bigint")
            .alias("n_dups"),
        )
        dfs.append(df)
    li = (
        read_table(spark, sf_dir, "lineitem")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.countDistinct(
                F.expr("l_orderkey * 128 + l_linenumber")
            )
            .cast("bigint")
            .alias("n_distinct"),
            F.count(
                F.when(
                    F.col("l_orderkey").isNull()
                    | F.col("l_linenumber").isNull(),
                    F.lit(1),
                )
            )
            .cast("bigint")
            .alias("n_null"),
        )
        .select(
            F.lit("lineitem").alias("table_name"),
            F.lit("l_orderkey+l_linenumber").alias("pk_col"),
            "n_rows",
            "n_distinct",
            "n_null",
            (F.col("n_rows") - F.col("n_distinct"))
            .cast("bigint")
            .alias("n_dups"),
        )
    )
    out = dfs[0]
    for df in dfs[1:] + [li]:
        out = out.unionAll(df)
    return out


@register(
    "stat_chi_square_residuals",
    oracle="""
    WITH obs AS (
      SELECT c.c_mktsegment AS seg, o.o_orderpriority AS pri,
             CAST(count(*) AS BIGINT) AS n
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2),
    segs AS (SELECT DISTINCT seg FROM obs),
    pris AS (SELECT DISTINCT pri FROM obs),
    filled AS (
      SELECT g.seg, g.pri, CAST(coalesce(o.n, 0) AS BIGINT) AS n
      FROM (SELECT seg, pri FROM segs CROSS JOIN pris) g
      LEFT JOIN obs o ON g.seg = o.seg AND g.pri = o.pri),
    tot AS (
      SELECT seg, pri, n,
             CAST(sum(n) OVER (PARTITION BY seg) AS BIGINT) AS row_n,
             CAST(sum(n) OVER (PARTITION BY pri) AS BIGINT) AS col_n,
             CAST(sum(n) OVER () AS BIGINT) AS grand_n
      FROM filled)
    SELECT seg, pri, n,
           round(CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE)
                 / CAST(grand_n AS DOUBLE), 4) AS expected,
           round((CAST(n AS DOUBLE)
                  - CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE)
                    / CAST(grand_n AS DOUBLE))
                 / sqrt(CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE)
                        / CAST(grand_n AS DOUBLE)
                        * (1.0 - CAST(row_n AS DOUBLE)
                                 / CAST(grand_n AS DOUBLE))
                        * (1.0 - CAST(col_n AS DOUBLE)
                                 / CAST(grand_n AS DOUBLE))), 4)
             AS std_residual
    FROM tot
    """,
)
def stat_chi_square_residuals(spark, sf_dir):
    """STANDARDIZED (adjusted) RESIDUALS of the segment × priority
    contingency — the cell-level drill-down behind
    stat_chi_square_independence's single number (WHICH cells drive
    the association: |residual| > 2 is the conventional callout),
    using Haberman's adjusted residual (obs−exp)/√(exp·(1−row/N)·
    (1−col/N)). Same grid-completed integer cell counts and window
    marginals as the sibling; expected and residual are per-cell
    float expressions over exact BIGINTs (magnitudes ~1e3 and ~units
    — both far inside the round-stability bound recorded in
    FLOAT_ORDER_AUDIT.md). Scale: one fact aggregation to r·c
    cells; everything else runs on the cells."""
    from pyspark.sql import Window as W

    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    obs = (
        orders.join(
            F.broadcast(cust.select("c_custkey", "c_mktsegment")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.col("o_orderpriority").alias("pri"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    segs = obs.select("seg").distinct()
    pris = obs.select("pri").distinct()
    filled = (
        segs.crossJoin(pris)
        .join(obs, ["seg", "pri"], "left")
        .select(
            "seg", "pri", F.coalesce("n", F.lit(0)).cast("bigint").alias("n")
        )
    )
    tot = filled.select(
        "seg",
        "pri",
        "n",
        F.sum("n").over(W.partitionBy("seg")).cast("bigint").alias("row_n"),
        F.sum("n").over(W.partitionBy("pri")).cast("bigint").alias("col_n"),
        F.sum("n").over(W.partitionBy()).cast("bigint").alias("grand_n"),
    )
    exp = (
        "CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE)"
        " / CAST(grand_n AS DOUBLE)"
    )
    resid = (
        f"(CAST(n AS DOUBLE) - {exp}) / sqrt({exp}"
        " * (1.0 - CAST(row_n AS DOUBLE) / CAST(grand_n AS DOUBLE))"
        " * (1.0 - CAST(col_n AS DOUBLE) / CAST(grand_n AS DOUBLE)))"
    )
    return tot.select(
        "seg",
        "pri",
        "n",
        F.round(F.expr(exp), 4).alias("expected"),
        F.round(F.expr(resid), 4).alias("std_residual"),
    )
