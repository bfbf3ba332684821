"""Time every registered query the way the driver's correctness
sweep does (Spark side + DuckDB oracle at sf0.01), printing a
per-query cost table so we can attack fixed overhead.

Usage: python scripts/time_sweep.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import duckdb  # noqa: E402

from etl_jobs_spark import registry  # noqa: E402
from etl_jobs_spark.session import get_spark  # noqa: E402
from etl_jobs_spark.sources.readers import FIXTURE_TABLES  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("time-sweep")
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = registry.all_queries()
    oracles = registry.all_oracles()
    rows = []
    t_total = time.time()
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            n = df.count()
            t_spark = time.time() - t0
            t1 = time.time()
            if name in oracles:
                con.sql(oracles[name]).df()
            t_oracle = time.time() - t1
            rows.append((name, t_spark, t_oracle, n, ""))
        except Exception as e:  # noqa: BLE001
            rows.append((name, time.time() - t0, 0.0, -1, str(e)[:80]))
        r = rows[-1]
        print(f"{r[0]:32s} spark={r[1]:6.2f}s oracle={r[2]:5.2f}s rows={r[3]} {r[4]}",
              flush=True)

    total = time.time() - t_total
    rows.sort(key=lambda r: -(r[1] + r[2]))
    print("\n=== slowest ===")
    for r in rows[:15]:
        print(f"{r[0]:32s} {r[1] + r[2]:6.2f}s")
    print(f"\nTOTAL {total:.1f}s for {len(rows)} queries")
    Path("/tmp/sweep_times.json").write_text(
        json.dumps({r[0]: round(r[1] + r[2], 2) for r in rows}, indent=1)
    )
    spark.stop()


if __name__ == "__main__":
    main()
