"""Driver-shaped oracle verification for a NAMED subset of queries.

Same comparison as scripts/sweep_cost.py (Spark result vs DuckDB
oracle via etl_jobs_spark.compare.frames_match) but scoped to the
queries given on the command line — the per-change correctness gate
of the optimization rounds.

Usage: python scripts/opt_verify.py <sf_dir> name [name...]
Exit code 0 iff every named query matches.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import duckdb  # noqa: E402

from etl_jobs_spark import cache, registry  # noqa: E402
from etl_jobs_spark.compare import frames_match  # noqa: E402
from etl_jobs_spark.session import get_spark  # noqa: E402
from etl_jobs_spark.sources.readers import FIXTURE_TABLES  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark("opt-verify")
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        p = f"{sf_dir}/{t}.parquet"
        src = f"{p}/*.parquet" if Path(p).is_dir() else p
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    queries = registry.all_queries()
    oracles = registry.all_oracles()
    failed = []
    for name in names:
        t0 = time.perf_counter()
        try:
            got = queries[name](spark, sf_dir).toPandas()
            if name in oracles:
                frames_match(got, con.sql(oracles[name]).df())
            status = f"ok ({len(got)} rows)"
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            status = f"FAIL {type(e).__name__}: {e}"[:300]
        cache.release_all()
        print(f"# {name}: {status} [{time.perf_counter() - t0:.2f}s]")
    spark.stop()
    if failed:
        print(f"FAILED: {failed}")
        sys.exit(1)
    print(f"ALL {len(names)} MATCH")


if __name__ == "__main__":
    main()
