"""Empty-input robustness: every operator family must degrade to an
empty (or identity) result on empty input, never crash — the
behavior that matters when a partition filter matches nothing or an
incremental run finds no new data."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_jobs_spark.operators import dedup as DD
from etl_jobs_spark.operators import training as TR


def _empty(spark, schema):
    return spark.createDataFrame([], schema)


def test_connected_components_empty_edges(spark):
    edges = _empty(spark, "doc_a BIGINT, doc_b BIGINT")
    assert DD.connected_components(edges).count() == 0


def test_exact_dedup_empty_corpus(spark):
    corpus = _empty(spark, "doc_id BIGINT, lang STRING, n STRING")
    assert DD.exact_dedup(corpus).count() == 0
    assert TR.keep_canonical(corpus).count() == 0


def test_pack_and_gap_empty(spark):
    docs = _empty(spark, "doc_id BIGINT, lang STRING, text STRING")
    assert TR.pack_sequences(docs).count() == 0
    events = _empty(spark, "event_id BIGINT, ts TIMESTAMP, user_id BIGINT")
    assert TR.user_gap_stats(events).count() == 0


def test_scrub_and_shard_empty(spark):
    docs = _empty(spark, "doc_id BIGINT, text STRING")
    assert TR.pii_scrub(docs).count() == 0
    assert TR.shard_assign(docs).count() == 0


def test_gap_stats_single_event_user(spark):
    """A user with one event has no gaps — must vanish from the
    result, not produce a null-gap row."""
    events = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 7)],
        "event_id BIGINT, ts STRING, user_id BIGINT",
    ).withColumn("ts", F.to_timestamp("ts"))
    assert TR.user_gap_stats(events).count() == 0


def test_governance_ops_empty_corpus(spark):
    from etl_jobs_spark.operators import governance as GV

    docs = _empty(
        spark, "doc_id BIGINT, text STRING, lang STRING, source STRING"
    )
    assert GV.decontam_overlap(docs).count() == 0
    assert GV.repetition_signals(docs).count() == 0
    assert GV.split_report(docs).count() == 0
    assert GV.mixture_rebalance(docs).count() == 0


def test_cdc_apply_empty_changelog(spark):
    from etl_jobs_spark.operators import warehouse as WH

    snap = spark.createDataFrame(
        [(1, "a", 10.0)], "c_custkey BIGINT, c_name STRING, c_acctbal DOUBLE"
    )
    changes = _empty(
        spark,
        "key BIGINT, op STRING, newbal DOUBLE, ts TIMESTAMP, seq BIGINT",
    )
    out = WH.cdc_latest_apply(snap, changes)
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["change_status"] == "kept"


def test_zorder_empty_events(spark):
    from etl_jobs_spark.operators import warehouse as WH

    ev = _empty(spark, "event_id BIGINT, user_id BIGINT, value DOUBLE")
    assert WH.zorder_layout_report(ev).count() == 0


def test_fuzzy_pairs_empty_and_singleton(spark):
    """No names -> no pairs; one name -> no pairs (the self-pair is
    excluded by key_a < key_b), never a crash in the variant explode."""
    from etl_jobs_spark.operators import matching as MT

    empty = _empty(spark, "c_custkey BIGINT, c_name STRING")
    assert MT.fuzzy_pairs(empty, "c_custkey", "c_name").count() == 0
    one = spark.createDataFrame(
        [(1, "alice")], "c_custkey BIGINT, c_name STRING"
    )
    assert MT.fuzzy_pairs(one, "c_custkey", "c_name").count() == 0


def test_kmv_fewer_keys_than_sketch(spark, tmp_path):
    """A corpus with fewer distinct keys than sketch slots must
    report k = exact distinct count, not a degenerate estimate."""
    from etl_jobs_spark.queries.tpch_plus import approx_distinct_kmv

    df = spark.createDataFrame(
        [(i, i % 3) for i in range(10)], "event_id BIGINT, user_id BIGINT"
    ).selectExpr(
        "event_id",
        "TIMESTAMP '2024-01-01' AS ts",
        "user_id",
        "'click' AS event_type",
        "1.0 AS value",
        "'{}' AS props",
    )
    df.write.parquet(str(tmp_path / "events.parquet"))
    row = approx_distinct_kmv(spark, str(tmp_path)).collect()[0]
    assert row["k"] == 3


def test_block_cap_audit_empty_is_all_zero(spark):
    """Empty corpus -> one all-zero disclosure row (a NULL row would
    read as 'audit broken', not 'nothing capped')."""
    from etl_jobs_spark.operators import matching as MT

    empty = _empty(spark, "c_custkey BIGINT, c_name STRING, g INT")
    row = MT.block_cap_audit(
        empty, "c_custkey", "c_name", block_cols=["g"], block_cap=5
    ).collect()[0]
    assert row.asDict() == {
        "kept_blocks": 0,
        "capped_blocks": 0,
        "kept_occurrences": 0,
        "dropped_occurrences": 0,
        "capped_pairs": 0,
    }
