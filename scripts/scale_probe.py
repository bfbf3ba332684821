"""Scale-probe fixture builder + 8-vs-32-core runner (VERDICT r15
item 4): at sf0.1 every low/high-core ratio reads ~1 because per-job
scheduler overhead dominates sub-second queries, so the scaling axis
was uninformative. This script builds a DETERMINISTIC x10 scale-up
of sf0.1 (~sf1) under a scratch dir — fact tables unioned 10x with
shifted primary keys (copy 0 unshifted, so fixed probe workloads
like QUERY_IDS still resolve), dimensions untouched so FK joins
still land — and times a named query list with the noop sink at two
core counts. MEASUREMENT FIXTURE ONLY: never oracle-checked, never
read by bench.py, never under /root/testdata.

Usage:
  python scripts/scale_probe.py build <out_dir> [factor]
  python scripts/scale_probe.py run <dir> <cpus> name [name...]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SRC = "/root/testdata/sf0.1"

#: per-table key columns to shift per copy (facts); absent = copy 1x
SHIFT_KEYS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def build(out_dir: str, factor: int = 10) -> None:
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    for t in TABLES:
        src = pq.read_table(f"{SRC}/{t}.parquet")
        keys = SHIFT_KEYS.get(t)
        if not keys:
            pq.write_table(src, out / f"{t}.parquet")
            print(f"# {t}: copied ({src.num_rows} rows)")
            continue
        spans = {
            k: (pc.max(src.column(k)).as_py() or 0) + 1 for k in keys
        }
        copies = [src]
        for i in range(1, factor):
            c = src
            for k in keys:
                idx = c.schema.get_field_index(k)
                shifted = pc.add(c.column(k), pa.scalar(i * spans[k], c.schema.field(k).type))
                c = c.set_column(idx, c.schema.field(k), shifted)
            copies.append(c)
        big = pa.concat_tables(copies)
        pq.write_table(big, out / f"{t}.parquet")
        print(f"# {t}: x{factor} -> {big.num_rows} rows")


def run(sf_dir: str, cpus: int, names: list[str]) -> None:
    from etl_jobs_spark import cache, registry
    from etl_jobs_spark.session import get_spark

    spark = get_spark(
        f"scale-probe-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    sc = spark.sparkContext
    queries = registry.all_queries()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    # pre-stage shared fixtures exactly like bench.py / opt_plans.py
    from scripts.opt_plans import prestage

    prestage(spark, sf_dir, names)
    results = {}
    for name in names:
        sc.setJobDescription(f"scale-probe:{name}")
        runs = []
        for _ in range(2):
            cache.release_all()
            t0 = time.perf_counter()
            df = queries[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        cache.release_all()
        results[name] = min(runs)
        print(f"# {name}: {runs} -> {min(runs)}", file=sys.stderr)
        sc.setJobDescription(None)
    print(json.dumps({"cpus": cpus, "sf_dir": sf_dir, "noop_min2": results}))
    spark.stop()


if __name__ == "__main__":
    if sys.argv[1] == "build":
        build(sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 10)
    elif sys.argv[1] == "run":
        run(sys.argv[2], int(sys.argv[3]), sys.argv[4:])
    else:
        raise SystemExit("usage: build <out> [factor] | run <dir> <cpus> names...")
