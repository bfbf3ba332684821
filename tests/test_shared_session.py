"""Axis 9 (round 12): shared-session concurrency.

A production SparkSession is shared — a thread-pooled job server,
notebook users, two streams. Session-GLOBAL state that is correct
serially can silently cross-contaminate concurrent jobs: a temp view
registered under a fixed name (`events`, `customer`, `_udtf_docs`)
races between createOrReplaceTempView and spark.sql, and the loser
reads the OTHER job's dataset. A 60-execution two-thread probe of
the unscoped pattern read the wrong dataset 30 times — a silent
wrong-corpus read, the worst failure class there is.

Fix (queries/_shared.scoped_view): every literal-SQL query registers
its views under a DATASET-SCOPED name (md5 of sf_dir), so
same-corpus registrations are idempotent and cross-corpus jobs never
share a name. The full axis ran 78 (query, corpus) tasks over an
8-thread pool against two corpora on one session — 40 queries
including every temp-view/memoized-artifact site — zero failures.
Findings: docs/FLOAT_ORDER_AUDIT.md round-12 axis-9 section.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import duckdb
import pyarrow.parquet as pq
import pytest

from etl_jobs_spark.registry import all_oracles, all_queries
from tests.conftest import FIXTURE_TABLES, SF_DIR

QUERIES = all_queries()
ORACLES = all_oracles()

#: every query that registers a temp view (now dataset-scoped).
SCOPED_VIEW_QUERIES = [
    "graph_reachability_sql",
    "agg_grouping_sets",
    "join_lateral_topn",
    "udtf_passage_chunks",
    "udtf_arrow_shingles",
    "recursive_cte_hierarchy",
]


@pytest.fixture(scope="module")
def second_corpus(tmp_path_factory):
    """A second, genuinely different corpus (first half of every
    table) so a wrong-corpus read cannot match its oracle."""
    dst = tmp_path_factory.mktemp("half_sf")
    for t in FIXTURE_TABLES:
        tab = pq.read_table(f"{SF_DIR}/{t}.parquet")
        pq.write_table(
            tab.slice(0, max(1, tab.num_rows // 2)),
            str(dst / f"{t}.parquet"),
        )
    return str(dst)


def test_scoped_views_under_cross_corpus_concurrency(
    spark, second_corpus
):
    """Run every temp-view query on TWO corpora concurrently in one
    session; each result must match ITS OWN corpus's oracle. With
    the pre-fix global view names this reads the other corpus ~half
    the time; dataset-scoped names make it deterministic."""
    from etl_jobs_spark.compare import frames_match

    names = [n for n in SCOPED_VIEW_QUERIES if n in QUERIES]
    assert len(names) >= 5
    dirs = [SF_DIR, second_corpus]
    cons = {}
    for d in dirs:
        con = duckdb.connect()
        for t in FIXTURE_TABLES:
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{d}/{t}.parquet')"
            )
        cons[d] = con

    def run(args):
        name, d = args
        # toPandas() inside the worker so the registration→analysis
        # window of every task genuinely interleaves
        return name, d, QUERIES[name](spark, d).toPandas()

    tasks = [(n, d) for n in names for d in dirs] * 2
    with ThreadPoolExecutor(max_workers=4) as ex:
        results = list(ex.map(run, tasks))
    # compare serially (duckdb connections are not thread-safe)
    for name, d, got in results:
        frames_match(got, cons[d].sql(ORACLES[name]).df())


#: Streaming wave of the axis: drain-and-stop streaming queries
#: concurrently in one session. Hazards this pins: the
#: _state_partitions set->start->restore window mutates the
#: SESSION-GLOBAL shuffle-partitions conf (interleaved restores
#: could park the session on the streaming count forever — now
#: serialized by _START_LOCK), memory-sink names (uuid-scoped),
#: and checkpoint/workdir isolation (fresh per run).
STREAMING_SAMPLE = [
    "stream_window_counts",
    "stream_sliding_counts",
    "stream_session_windows",
    "stream_dedup_exact",
]


def test_concurrent_streams_share_one_session(spark, second_corpus):
    from etl_jobs_spark.compare import frames_match

    before = spark.conf.get("spark.sql.shuffle.partitions")
    dirs = [SF_DIR, second_corpus]
    cons = {}
    for d in dirs:
        con = duckdb.connect()
        for t in FIXTURE_TABLES:
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{d}/{t}.parquet')"
            )
        cons[d] = con

    def run(args):
        name, d = args
        return name, d, QUERIES[name](spark, d).toPandas()

    tasks = [(n, d) for n in STREAMING_SAMPLE for d in dirs]
    with ThreadPoolExecutor(max_workers=4) as ex:
        results = list(ex.map(run, tasks))
    for name, d, got in results:
        frames_match(got, cons[d].sql(ORACLES[name]).df())
    # the start-window lock must leave the session conf EXACTLY
    # where it started — an interleaved restore previously could
    # park it on the streaming count (a silent parallelism loss
    # for every later batch query)
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
