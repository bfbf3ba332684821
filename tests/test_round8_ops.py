"""Round-8 operator locks: physical-plan shape for the six TPC-H
completions (value correctness is covered by test_queries_oracle's
parametrized sweep; these pin the 100 TB-critical plans) and
pure-Python cross-implementation checks for the two exact-integer
effect-size stats."""

from __future__ import annotations

import hashlib
from itertools import combinations

import pandas as pd

from etl_jobs_spark.queries.data_quality import (
    BOOT_B,
    stat_bootstrap_ci_mean,
    stat_kendall_tau,
)
from etl_jobs_spark.queries.tpch_plus import (
    q8_national_market_share,
    q9_product_type_profit,
    q11_important_stock,
    q16_supplier_part_count,
    q19_discounted_revenue,
    q20_potential_promotion,
)
from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# TPC-H plan locks: every dimension broadcasts, the fact never
# SortMergeJoins, and single-row scalars ride broadcast cross joins.
# ---------------------------------------------------------------------------


def test_q8_one_fact_shuffle_rest_broadcast(spark):
    plan = _plan(q8_national_market_share(spark, SF_DIR))
    # customer-semi, supplier, and (inside the semi) nation broadcast
    assert plan.count("BroadcastHashJoin") >= 2, plan[:2000]
    # the only SortMergeJoin permitted is lineitem⋈orders (fact-fact)
    assert plan.count("SortMergeJoin") <= 1, plan[:2000]


def test_q9_part_filter_before_broadcast(spark):
    plan = _plan(q9_product_type_profit(spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 3, plan[:2000]
    assert plan.count("SortMergeJoin") <= 1, plan[:2000]
    # the LIKE filter must prune part BEFORE the exchange, not after
    # the join: it appears in the part scan's pushed filters
    assert "StringContains(p_name,g)" in plan or "p_name" in " ".join(
        line for line in plan.splitlines() if "PushedFilters" in line
    ), plan[:2000]


def test_q11_semi_join_and_no_division(spark):
    plan = _plan(q11_important_stock(spark, SF_DIR))
    # nation-pruned supplier list reaches lineitem as a broadcast
    # LEFT SEMI — the fact never widens
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan[:2000]
    # the 1/5000 fraction test is integer cross-multiplication
    assert "5000" in plan and "/" not in plan.split("Filter")[1][:120], plan[
        :2000
    ]


def test_q16_anti_join_broadcasts(spark):
    plan = _plan(q16_supplier_part_count(spark, SF_DIR))
    assert "LeftAnti" in plan, plan[:2000]
    assert plan.count("BroadcastHashJoin") >= 2, plan[:2000]
    assert "SortMergeJoin" not in plan, plan[:2000]


def test_q19_disjunction_single_scan(spark):
    plan = _plan(q19_discounted_revenue(spark, SF_DIR))
    # one lineitem scan (no union-of-branches rewrite), part broadcast
    assert plan.count("Scan parquet") <= 2, plan[:2000]
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "SortMergeJoin" not in plan, plan[:2000]


def test_q20_reads_fact_once(spark):
    plan = _plan(q20_potential_promotion(spark, SF_DIR))
    # the per-part rollup aggregates the cached per-(part,supp)
    # table, not a second lineitem scan
    assert plan.count("Scan parquet ") <= 3 or "InMemoryTableScan" in plan, (
        plan[:2000]
    )
    assert "SortMergeJoin" not in plan, plan[:2000]


# ---------------------------------------------------------------------------
# Stats cross-checks against an independent pure-Python computation.
# ---------------------------------------------------------------------------


def _events(sf_dir) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/events.parquet")


def test_kendall_tau_matches_bruteforce(spark):
    got = stat_kendall_tau(spark, SF_DIR).collect()[0].asDict()
    ev = _events(SF_DIR)
    daily = (
        ev.assign(
            d=pd.to_datetime(ev["ts"]).dt.date,
            cents=(ev["value"] * 100).round().astype("int64"),
        )
        .groupby("d")
        .agg(rev=("cents", "sum"), cnt=("cents", "size"))
        .reset_index()
        .sort_values("d")
    )
    nc = nd = tx = ty = txy = 0
    for (_, a), (_, b) in combinations(daily.iterrows(), 2):
        dx, dy = int(a.rev - b.rev), int(a.cnt - b.cnt)
        if dx * dy > 0:
            nc += 1
        elif dx * dy < 0:
            nd += 1
        elif dx == 0 and dy == 0:
            txy += 1
        elif dx == 0:
            tx += 1
        else:
            ty += 1
    assert got["n_days"] == len(daily)
    assert got["n_concordant"] == nc
    assert got["n_discordant"] == nd
    assert got["ties_rev_only"] == tx
    assert got["ties_cnt_only"] == ty
    assert got["ties_both"] == txy
    assert got["tau_numerator"] == nc - nd


def _hash60_py(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_bootstrap_ci_matches_python_resampler(spark):
    got = stat_bootstrap_ci_mean(spark, SF_DIR).collect()[0].asDict()
    ev = _events(SF_DIR)
    base = ev[ev["event_type"] == "purchase"]
    cents = (base["value"] * 100).round().astype("int64").tolist()
    ids = base["event_id"].tolist()
    means = []
    for b in range(BOOT_B):
        num = den = 0
        for eid, c in zip(ids, cents):
            w = [0, 1, 1, 2][_hash60_py(f"{eid}:{b}") % 4]
            num += w * c
            den += w
        means.append((num // den, b))
    means.sort()
    assert got["n_rows"] == len(cents)
    assert got["n_resamples"] == BOOT_B
    assert got["point_mean_cents"] == sum(cents) // len(cents)
    assert got["ci_lo_cents"] == means[1][0]
    assert got["ci_hi_cents"] == means[BOOT_B - 2][0]


def test_pca_renorm_big_branch_is_exercised_at_test_sf(spark):
    """Regression lock for the sf0.1 renormalization overflow: the
    iterate's max-abs must exceed _PCA_BIG even at the test SF, so
    the oracle sweep exercises the divide-the-divisor branch (the
    multiply branch overflowed BIGINT at 2k vectors)."""
    from pyspark.sql import functions as F

    from etl_jobs_spark.queries.similarity import (
        _PCA_BIG,
        _PCA_SHIFT,
        _PCA_VS,
        _km_quant,
    )
    from etl_jobs_spark.sources.readers import read_table

    emb = read_table(spark, SF_DIR, "embeddings")
    lf = emb.select(
        "vec_id", F.posexplode(F.expr(_km_quant("spark"))).alias("d", "q")
    )
    t = lf.groupBy("vec_id").agg(
        F.expr(f"CAST(sum(q * {_PCA_VS}) DIV {_PCA_SHIFT} AS BIGINT)").alias(
            "t"
        )
    )
    m0 = (
        lf.join(t, "vec_id")
        .groupBy("d")
        .agg(F.sum(F.col("q") * F.col("t")).alias("w"))
        .agg(F.max(F.abs(F.col("w"))))
        .collect()[0][0]
    )
    assert m0 >= _PCA_BIG, m0
