"""1x/4x scale-stress protocol (docs/SCALE.md): stage a 4x
id-offset replica of the mutable fixture tables next to symlinks of
the rest, then time a query list at sf0.1 (1x) and at the replica
(4x) in one warm JVM.

Usage: python scripts/stress_4x.py <query> [query...]
"""

from __future__ import annotations

import os
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from etl_jobs_spark import registry  # noqa: E402
from etl_jobs_spark.session import get_spark  # noqa: E402
from etl_jobs_spark.sources.readers import (  # noqa: E402
    FIXTURE_TABLES,
    read_table,
)

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = "/tmp/etl_jobs_spark_stress4x"

#: id columns to offset per replica copy, per table.
OFFSETS = {
    "documents": {"doc_id": 10_000_000},
    "events": {"event_id": 10_000_000, "user_id": 1_000_000},
    "customer": {"c_custkey": 1_000_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    "embeddings": {"vec_id": 1_000_000},
}


def build_replica(spark) -> None:
    shutil.rmtree(DST, ignore_errors=True)
    os.makedirs(DST)
    for t in FIXTURE_TABLES:
        src_file = Path(SRC) / f"{t}.parquet"
        if t not in OFFSETS:
            os.symlink(src_file, Path(DST) / f"{t}.parquet")
            continue
        df = read_table(spark, SRC, t)
        parts = [df]
        for i in range(1, 4):
            c = df
            for col, step in OFFSETS[t].items():
                c = c.withColumn(col, F.col(col) + F.lit(i * step))
            parts.append(c)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(str(Path(DST) / f"{t}.parquet"))


def main() -> None:
    names = sys.argv[1:]
    queries = registry.all_queries()
    if not names:
        print("usage: stress_4x.py QUERY [QUERY ...]", file=sys.stderr)
        print("registered:", ", ".join(sorted(queries)), file=sys.stderr)
        sys.exit(2)
    unknown = [n for n in names if n not in queries]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        sys.exit(2)
    spark = get_spark("stress4x")
    build_replica(spark)
    # warm the JVM/codegen once
    queries[names[0]](spark, SRC).count()
    print(f"{'query':34s} {'1x':>8s} {'4x':>8s}  ratio")
    for n in names:
        t0 = time.time()
        r1 = queries[n](spark, SRC).count()
        t1x = time.time() - t0
        t0 = time.time()
        r4 = queries[n](spark, DST).count()
        t4x = time.time() - t0
        print(
            f"{n:34s} {t1x:7.2f}s {t4x:7.2f}s  x{t4x / max(t1x, 0.01):.1f}"
            f"  rows {r1}->{r4}",
            flush=True,
        )


if __name__ == "__main__":
    main()
