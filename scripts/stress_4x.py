"""1x/4x scale-stress protocol (docs/SCALE.md): stage a 4x
id-offset replica of the mutable fixture tables next to symlinks of
the rest, then time a query list at sf0.1 (1x) and at the replica
(4x) in one warm JVM.

With --skew the events replica is additionally made pathological:
half of all events collapse onto ONE hot user key and 3/4 onto one
hot event_type, and the hot keys stay hot across all four copies —
the workload the salted join/agg exist for. An id-offset replica
keeps keys uniform and therefore never actually stresses skew
handling.

Usage: python scripts/stress_4x.py [--skew] <query> [query...]
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

from etl_jobs_spark import cache, registry  # noqa: E402
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
    # l_orderkey steps with o_orderkey so each replica's lineitems
    # join their own replica's orders (join fan-out stays 1:1)
    "lineitem": {"l_orderkey": 10_000_000},
    "embeddings": {"vec_id": 1_000_000},
}


def build_replica(
    spark,
    dst: str = DST,
    skew: bool = False,
    skew_parts: bool = False,
    copies: int = 4,
    grow_parts: bool = False,
) -> None:
    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)
    for t in FIXTURE_TABLES:
        src_file = Path(SRC) / f"{t}.parquet"
        if t not in OFFSETS:
            os.symlink(src_file, Path(dst) / f"{t}.parquet")
            continue
        df = read_table(spark, SRC, t)
        if skew_parts and t == "lineitem":
            # Power-law hub injection for the co-purchase graph: 10%
            # of lineitems collapse onto ONE hot part (key 1), which
            # then co-occurs with a huge share of the catalog — the
            # hub whose wedge fan-out id-orientation cannot bound.
            # The hot key stays hot across all four replicas (only
            # l_orderkey is offset), so the 4x graph has ONE 4x-degree
            # hub, not four warm ones.
            df = df.withColumn(
                "l_partkey",
                F.expr(
                    "CASE WHEN (l_orderkey * 31 + l_linenumber) % 10 = 0"
                    " THEN 1 ELSE l_partkey END"
                ),
            )
        if skew and t == "events":
            # Hot-key injection: 50% of events hit user_id 7, 75% hit
            # event_type 'click'. Offsetting ONLY event_id across
            # copies keeps those keys hot across all four replicas,
            # so the 4x corpus has a 4x-hotter key, not four warm ones.
            df = df.withColumn(
                "user_id",
                F.expr("CASE WHEN event_id % 2 = 0 THEN 7 ELSE user_id END"),
            ).withColumn(
                "event_type",
                F.expr(
                    "CASE WHEN event_id % 4 < 3 THEN 'click'"
                    " ELSE event_type END"
                ),
            )
        offsets = (
            {"event_id": OFFSETS[t]["event_id"]}
            if skew and t == "events"
            else OFFSETS[t]
        )
        if grow_parts and t == "lineitem":
            # REAL edge growth for the co-purchase graph: offsetting
            # l_partkey per copy gives each replica its own disjoint
            # part universe, so distinct edges (and triangles) scale
            # ~linearly with copies. The plain id-offset replica only
            # offsets l_orderkey — every copy regenerates the SAME
            # (u, v) part pairs, the distinct edge set never grows,
            # and the census is trivially flat (the round-9 rows).
            offsets = {**offsets, "l_partkey": 10_000_000}
        parts = [df]
        for i in range(1, copies):
            c = df
            for col, step in offsets.items():
                c = c.withColumn(col, F.col(col) + F.lit(i * step))
            parts.append(c)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(str(Path(dst) / f"{t}.parquet"))


def main() -> None:
    names = sys.argv[1:]
    skew = "--skew" in names
    skew_parts = "--skew-parts" in names
    grow_parts = "--grow-parts" in names
    copies = 4
    for a in list(names):
        if a.startswith("--copies="):
            copies = int(a.split("=", 1)[1])
            names.remove(a)
    names = [
        n
        for n in names
        if n not in ("--skew", "--skew-parts", "--grow-parts")
    ]
    queries = registry.all_queries()
    if not names:
        print("usage: stress_4x.py [--skew] QUERY [QUERY ...]", file=sys.stderr)
        print("registered:", ", ".join(sorted(queries)), file=sys.stderr)
        sys.exit(2)
    unknown = [n for n in names if n not in queries]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        sys.exit(2)
    dst = DST + (
        "_skew"
        if skew
        else "_skewparts"
        if skew_parts
        else "_growparts"
        if grow_parts
        else ""
    )
    if copies != 4:
        dst += f"_{copies}x"
    spark = get_spark("stress4x")
    build_replica(
        spark,
        dst,
        skew=skew,
        skew_parts=skew_parts,
        copies=copies,
        grow_parts=grow_parts,
    )
    # warm the JVM/codegen once
    queries[names[0]](spark, SRC).count()
    base = f"{copies}x"
    label = (
        f"{base}-skew"
        if skew
        else f"{base}-hub"
        if skew_parts
        else f"{base}-grow"
        if grow_parts
        else base
    )
    print(f"{'query':34s} {'1x':>8s} {label:>8s}  ratio")
    for n in names:
        t0 = time.time()
        r1 = queries[n](spark, SRC).count()
        cache.release_all()  # don't let 1x persists bill the 4x run
        t1x = time.time() - t0
        t0 = time.time()
        r4 = queries[n](spark, dst).count()
        cache.release_all()
        t4x = time.time() - t0
        print(
            f"{n:34s} {t1x:7.2f}s {t4x:7.2f}s  x{t4x / max(t1x, 0.01):.1f}"
            f"  rows {r1}->{r4}",
            flush=True,
        )


if __name__ == "__main__":
    main()
