"""Behavioral + plan-shape tests for the corpus-governance and
warehouse round-2 additions (decontamination, repetition signals,
split, mixture rebalance, CDC apply, z-order layout)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from etl_jobs_spark.operators import governance as GV
from etl_jobs_spark.queries.corpus_governance import (
    decontam_ngram_overlap,
    mix_rebalance_sources,
    split_train_holdout,
)
from etl_jobs_spark.queries.warehouse_ext import (
    cdc_apply_changelog,
    zorder_layout_stats,
)
from etl_jobs_spark.sources.readers import read_table
from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_decontam_eval_side_broadcasts(spark):
    plan = _plan(decontam_ngram_overlap(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "SortMergeJoin" not in plan, plan[:2000]


def test_decontam_flags_planted_clone(spark):
    """A doc that IS an eval doc's text must be flagged at ~1.0
    overlap: plant a clone of an eval doc into the train side."""
    docs = read_table(spark, SF_DIR, "documents")
    eval_docs = docs.filter(F.expr(GV.eval_member_expr("spark")))
    clone_src = eval_docs.orderBy("doc_id").limit(1).collect()[0]
    # pick a train doc_id whose hash is NOT in the eval residue
    train_ids = (
        docs.filter(~F.expr(GV.eval_member_expr("spark")))
        .select("doc_id")
        .orderBy("doc_id")
        .limit(1)
        .collect()
    )
    clone_id = int(train_ids[0]["doc_id"])
    planted = docs.filter(F.col("doc_id") != clone_id).unionByName(
        spark.createDataFrame(
            [
                (
                    clone_id,
                    clone_src["text"],
                    clone_src["lang"],
                    clone_src["source"],
                    clone_src["n_chars"],
                )
            ],
            schema=docs.schema,
        )
    )
    flagged = GV.decontam_overlap(planted)
    hit = flagged.filter(F.col("doc_id") == clone_id).collect()
    assert len(hit) == 1, "clone of an eval doc must be flagged"
    assert hit[0]["overlap_frac"] >= 0.99


def test_split_fracs_sum_to_one(spark):
    rep = split_train_holdout(spark, SF_DIR).collect()
    by_lang: dict[str, float] = {}
    for r in rep:
        by_lang[r["lang"]] = by_lang.get(r["lang"], 0.0) + r["frac_of_lang"]
    for lang, s in by_lang.items():
        assert abs(s - 1.0) < 1e-3, (lang, s)


def test_mixture_quota_is_exact_and_stable(spark):
    kept = mix_rebalance_sources(spark, SF_DIR)
    per = {
        r["source"]: r["n"]
        for r in kept.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    docs = read_table(spark, SF_DIR, "documents")
    stats = {
        r["source"]: r["n"]
        for r in docs.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    total = sum(stats.values())
    # every source's kept count is its exact integer quota
    import hashlib

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    weights = {s: 1 + h60(s) % 4 for s in stats}
    w_total = sum(weights.values())
    budget = total * GV.MIX_BUDGET_BP / 10000
    for s, n in stats.items():
        expect = min(n, int(budget * weights[s] / w_total))
        assert per.get(s, 0) == expect, (s, per.get(s), expect)
    # rerun-stable: the same doc_ids come back
    a = {r["doc_id"] for r in kept.collect()}
    b = {r["doc_id"] for r in mix_rebalance_sources(spark, SF_DIR).collect()}
    assert a == b


def test_cdc_apply_covers_all_change_classes(spark):
    out = cdc_apply_changelog(spark, SF_DIR)
    statuses = {
        r["change_status"]
        for r in out.select("change_status").distinct().collect()
    }
    assert statuses == {"kept", "updated", "inserted"}, statuses
    # deletes actually removed keys: every latest-op-D key is absent
    ev = read_table(spark, SF_DIR, "events")
    cust = read_table(spark, SF_DIR, "customer")
    mx = cust.agg(F.max("c_custkey")).collect()[0][0]
    from pyspark.sql import Window

    ch = ev.select(
        F.expr(
            f"CASE WHEN event_type = 'signup' THEN {mx} + 1 + user_id"
            " ELSE user_id END"
        ).alias("key"),
        F.expr(
            "CASE WHEN event_type = 'signup' THEN 'I'"
            " WHEN event_type = 'error' THEN 'D' ELSE 'U' END"
        ).alias("op"),
        "ts",
        F.col("event_id").alias("seq"),
    )
    w = Window.partitionBy("key").orderBy(
        F.col("ts").desc(), F.col("seq").desc()
    )
    deleted = (
        ch.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") == "D"))
        .select("key")
    )
    leaked = out.join(
        deleted, out["c_custkey"] == deleted["key"], "inner"
    ).count()
    assert leaked == 0


def test_zorder_skips_better_than_single_dim_sort(spark):
    """The point of z-ordering: under a z-key layout, file envelopes
    are tight in BOTH dimensions, so the secondary column also
    prunes. Compare total vx-span of the z-layout's files against a
    ux-sorted layout's files (where vx is unclustered)."""
    z = zorder_layout_stats(spark, SF_DIR).collect()
    z_span = sum(r["vx_max"] - r["vx_min"] for r in z) / len(z)

    ev = read_table(spark, SF_DIR, "events").select(
        F.expr("CAST(user_id % 256 AS BIGINT)").alias("ux"),
        F.expr("least(255, CAST(floor(value / 2) AS BIGINT))").alias("vx"),
    )
    from pyspark.sql import Window

    n_files = len(z)
    w = Window.orderBy("ux")
    naive = (
        ev.withColumn("rn", F.row_number().over(w))
        .withColumn("file_bucket", F.expr(f"CAST(rn % {n_files} AS BIGINT)"))
        .groupBy("file_bucket")
        .agg(
            (F.max("vx") - F.min("vx")).alias("span"),
        )
        .collect()
    )
    naive_span = sum(r["span"] for r in naive) / len(naive)
    assert z_span < naive_span * 0.6, (z_span, naive_span)


def test_repetition_flags_degenerate_doc(spark):
    docs = read_table(spark, SF_DIR, "documents")
    degenerate = spark.createDataFrame(
        [(999_999, "spam spam spam spam spam spam spam spam", "en",
          "srcX", 40)],
        schema=docs.schema,
    )
    out = GV.repetition_signals(docs.unionByName(degenerate))
    row = out.filter(F.col("doc_id") == 999_999).collect()[0]
    assert row["is_repetitive"] == 1
    assert row["dup_word3_frac"] > 0.5
