"""Round-13 ADVICE fixes, pinned.

Four low findings from the round-12 advisory, each with a permanent
regression sample: the stream-start lock leak + the n=None lock
bypass (streaming/pipelines._state_partitions), the fit-tier
unique-id check's NULL misreport + per-corpus memoization
(operators/similarity.require_unique_ids, queries/similarity.
checked_embeddings), the scoped temp-view catalog leak
(queries/_shared.release_scoped_views wired into cache.release_all),
and the axis-8 victim-picker index collisions
(scripts/axis8_dup_orphan._pick).
"""

from __future__ import annotations

import threading

import numpy as np
import pytest

from tests.conftest import SF_DIR


# ---------------------------------------------------------------
# _state_partitions: lock hygiene
# ---------------------------------------------------------------

def test_state_partitions_releases_lock_on_enter_failure(spark):
    """An exception inside __enter__ after the lock is acquired must
    release it — a leaked _START_LOCK deadlocks every later stream
    start in the session."""
    from etl_jobs_spark.streaming import pipelines as P

    class BoomConf:
        def get(self, *a):
            raise RuntimeError("conf backend unavailable")

        def set(self, *a):
            raise RuntimeError("conf backend unavailable")

    class BoomSpark:
        conf = BoomConf()

    with pytest.raises(RuntimeError, match="conf backend"):
        with P._state_partitions(BoomSpark(), 4):
            pass
    # the lock must be free again: a normal pinned start succeeds
    assert P._START_LOCK.acquire(timeout=5)
    P._START_LOCK.release()
    with P._state_partitions(spark, 4):
        assert spark.conf.get("spark.sql.shuffle.partitions") == "4"


def test_state_partitions_none_serializes_with_pinned_starts(spark):
    """An n=None start takes the lock too (without touching conf):
    planning concurrently with a pinned start would otherwise bake
    the OTHER query's partition count into its checkpoint."""
    from etl_jobs_spark.streaming import pipelines as P

    before = spark.conf.get("spark.sql.shuffle.partitions")
    inside = threading.Event()
    release = threading.Event()
    seen = {}

    def pinned_start():
        with P._state_partitions(spark, 3):
            inside.set()
            release.wait(timeout=10)

    t = threading.Thread(target=pinned_start)
    t.start()
    assert inside.wait(timeout=10)
    # while the pinned window is open, an unpinned enter must BLOCK
    done = threading.Event()

    def unpinned_start():
        with P._state_partitions(spark, None):
            seen["partitions"] = spark.conf.get(
                "spark.sql.shuffle.partitions"
            )
        done.set()

    t2 = threading.Thread(target=unpinned_start)
    t2.start()
    assert not done.wait(timeout=0.5), (
        "n=None start entered while a pinned start held the lock"
    )
    release.set()
    t.join(timeout=10)
    assert done.wait(timeout=10)
    t2.join(timeout=10)
    # the unpinned start planned with the RESTORED conf, not the
    # other thread's pinned value
    assert seen["partitions"] == before
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


# ---------------------------------------------------------------
# fit-tier ingest contract: NULL ids + memoization
# ---------------------------------------------------------------

def test_require_unique_ids_names_null_violation(spark):
    from pyspark.sql import functions as F

    from etl_jobs_spark.operators.similarity import require_unique_ids
    from etl_jobs_spark.sources.readers import read_table

    emb = read_table(spark, SF_DIR, "embeddings")
    nulled = emb.withColumn(
        "vec_id",
        F.when(F.col("vec_id") % 17 == 0, F.lit(None)).otherwise(
            F.col("vec_id")
        ),
    )
    with pytest.raises(ValueError, match="non-NULL vec_id"):
        require_unique_ids(nulled)
    # clean corpus still passes and returns the frame
    assert require_unique_ids(emb) is emb


def test_null_ids_loud_in_oracle_twin(tmp_path):
    import duckdb

    from etl_jobs_spark.operators.similarity import unique_ids_check_sql

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW embeddings AS SELECT * FROM (VALUES "
        "(1, [1.0]), (NULL, [2.0])) AS t(vec_id, embedding)"
    )
    with pytest.raises(duckdb.Error, match="non-NULL vec_id"):
        con.sql(unique_ids_check_sql()).df()


def test_checked_embeddings_memoizes_per_corpus(spark):
    from etl_jobs_spark.queries.similarity import checked_embeddings

    a = checked_embeddings(spark, SF_DIR)
    b = checked_embeddings(spark, SF_DIR)
    assert a is b, "unique-id check must run once per (session, corpus)"


# ---------------------------------------------------------------
# scoped temp views: bounded catalog
# ---------------------------------------------------------------

def test_release_all_drops_scoped_views(spark, oracle):
    # Unit-level on scoped_view itself: query-level registrations can
    # hide inside session memos (a prior full-suite invocation builds
    # the memo and later calls skip the registration), so the
    # query-path assertion below only checks oracle parity, while the
    # tracking/drop contract is asserted on a direct registration.
    from etl_jobs_spark import cache
    from etl_jobs_spark.queries import _shared
    from etl_jobs_spark.registry import all_oracles, all_queries
    from etl_jobs_spark.compare import frames_match
    from etl_jobs_spark.sources.readers import read_table

    name = _shared.scoped_view(
        read_table(spark, SF_DIR, "region"), "r13_release_probe", SF_DIR
    )
    app = spark.sparkContext.applicationId
    assert name in _shared._SCOPED_VIEWS.get(app, {}), (
        "scoped_view did not track its registration"
    )
    assert spark.catalog.tableExists(name)
    cache.release_all()
    assert not _shared._SCOPED_VIEWS
    assert not spark.catalog.tableExists(name), (
        f"release_all left scoped view {name} in the catalog"
    )
    # a scoped-view query still matches its oracle after the release
    # (re-registration or memoized plan — both must survive the drop)
    qname = "graph_reachability_sql"
    frames_match(
        all_queries()[qname](spark, SF_DIR).toPandas(),
        oracle.sql(all_oracles()[qname]).df(),
    )
    cache.release_all()


# ---------------------------------------------------------------
# axis-8 victim picker: distinct indices, exact count
# ---------------------------------------------------------------

@pytest.mark.parametrize(
    "n,frac,salt",
    [(100, 0.01, 1), (97, 0.03, 5), (7, 0.5, 3), (1, 0.9, 2),
     (60175, 0.01, 1), (1500, 0.01, 4), (33, 1.0, 7)],
)
def test_axis8_pick_distinct_and_exact(n, frac, salt):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "axis8", str(__import__("pathlib").Path(__file__).parents[1]
                     / "scripts" / "axis8_dup_orphan.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    idx = mod._pick(n, frac, salt)
    take = max(1, min(n, int(np.ceil(n * frac))))
    assert len(idx) == take, "collisions shrank the victim set"
    assert len(np.unique(idx)) == len(idx)
    assert idx.min() >= 0 and idx.max() < n
