"""Shared test fixtures: one SparkSession per test run, a DuckDB
connection with the fixture tables registered as views, and the
oracle-comparison helper that mimics the driver's t2 check
(row count + schema + order-insensitive value comparison)."""

from __future__ import annotations

import os
import sys
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd
import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

from etl_jobs_spark.sources.readers import FIXTURE_TABLES  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    from etl_jobs_spark.session import get_spark

    spark = get_spark(
        "etl_jobs_spark-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def oracle():
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, then rows by all values — the driver's
    order-insensitive comparison shape."""
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v
            )
    return df.sort_values(by=list(df.columns), ignore_index=True)


def assert_matches_oracle(spark_df, oracle_con, sql: str, float_rtol: float = 0.0):
    """Exact-match comparison between a Spark result and a DuckDB
    oracle result. float_rtol=0 on purpose: the driver hashes values,
    so anything needing tolerance must instead be rounded in BOTH
    queries before it gets here."""
    got = _normalize(spark_df.toPandas())
    want = _normalize(oracle_con.sql(sql).df())
    assert len(got) == len(want), f"row count {len(got)} != oracle {len(want)}"
    assert list(got.columns) == list(want.columns), (
        f"columns {list(got.columns)} != oracle {list(want.columns)}"
    )
    for c in got.columns:
        g, w = got[c], want[c]
        if np.issubdtype(g.dtype, np.floating) or np.issubdtype(w.dtype, np.floating):
            gv = g.astype(float).to_numpy()
            wv = w.astype(float).to_numpy()
            both_nan = np.isnan(gv) & np.isnan(wv)
            close = np.isclose(gv, wv, rtol=float_rtol, atol=0.0)
            bad = ~(both_nan | close)
            assert not bad.any(), (
                f"column {c}: {bad.sum()} mismatches, first: "
                f"{gv[bad][:3]} vs {wv[bad][:3]}"
            )
        else:
            eq = g.reset_index(drop=True).eq(w.reset_index(drop=True)) | (
                g.isna().reset_index(drop=True) & w.isna().reset_index(drop=True)
            )
            assert eq.all(), (
                f"column {c}: first mismatch at {int((~eq).idxmax())}: "
                f"{g[~eq.values].head(3).tolist()} vs {w[~eq.values].head(3).tolist()}"
            )
