"""Per-query correctness-check cost telemetry.

Runs the driver-shaped check (Spark query + DuckDB oracle +
order-insensitive VALUE compare via etl_jobs_spark.compare) for EVERY
registered query at the driver's scale (sf0.01 by default) and records
per-query wall time to ``docs/SWEEP_COST.json``, ranked most-expensive
first. ``ok: true`` means row count + schema + values all matched the
oracle (rows-only queries: ran and returned a stable schema). The
goal: prove the full registry sweep fits in one round's budget, and
point at the queries worth trimming if it doesn't.

Usage: python scripts/sweep_cost.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

from etl_jobs_spark import cache, registry
from etl_jobs_spark.compare import frames_match
from etl_jobs_spark.session import get_spark

FIXTURE_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("sweep-cost", master="local[32]", shuffle_partitions=32)
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = registry.all_queries()
    oracles = registry.all_oracles()
    # absorb JVM/codegen startup so it doesn't bill the first query
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    rows: dict[str, dict] = {}
    for name, fn in queries.items():
        t0 = time.perf_counter()
        ok = True
        err = None
        try:
            got = fn(spark, sf_dir).toPandas()
            n = len(got)
            if name in oracles:
                # the same order-insensitive VALUE comparison the
                # driver performs — ok:true means value-level match
                frames_match(got, con.sql(oracles[name]).df())
        except Exception as e:  # keep sweeping; record the failure
            ok, err, n = False, f"{type(e).__name__}: {e}"[:200], -1
        cache.release_all()
        rows[name] = {
            "sec": round(time.perf_counter() - t0, 3),
            "rows": n,
            "oracled": name in oracles,
            "ok": ok,
            **({"error": err} if err else {}),
        }
        print(f"# {name}: {rows[name]['sec']:.2f}s", file=sys.stderr)

    ranked = dict(sorted(rows.items(), key=lambda kv: -kv[1]["sec"]))
    out = {
        "sf_dir": sf_dir,
        "total_sec": round(sum(r["sec"] for r in rows.values()), 1),
        "n_queries": len(rows),
        "queries": ranked,
    }
    Path("docs/SWEEP_COST.json").write_text(json.dumps(out, indent=1))
    print(json.dumps({k: out[k] for k in ("total_sec", "n_queries")}))
    spark.stop()


if __name__ == "__main__":
    main()
