"""Oracle-check a NAMED SUBSET of registered queries (round-16
optimization helper): the driver-shaped value comparison of
scripts/sweep_cost.py, but only for the queries a change touched —
so a restructure can be verified at several SFs without paying the
full 381-query sweep each time.

Usage:
    python scripts/check_queries.py <sf_dir> name [name ...] [--cpus=N]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from etl_jobs_spark import cache, registry  # noqa: E402
from etl_jobs_spark.compare import frames_match  # noqa: E402
from etl_jobs_spark.session import get_spark  # noqa: E402
from etl_jobs_spark.sources.readers import FIXTURE_TABLES  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    cpus = 8
    for a in list(args):
        if a.startswith("--cpus="):
            cpus = int(a.split("=", 1)[1])
            args.remove(a)
    sf_dir, names = args[0], args[1:]
    spark = get_spark(
        "check-queries", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
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
                status = f"ok ({len(got)} rows, oracled)"
            else:
                status = f"ok ({len(got)} rows, NO ORACLE)"
        except Exception as e:
            status = f"FAIL {type(e).__name__}: {e}"[:300]
            failed.append(name)
        cache.release_all()
        print(f"# {name}: {status} [{time.perf_counter() - t0:.2f}s]")
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
