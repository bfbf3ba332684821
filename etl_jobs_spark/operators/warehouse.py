"""Warehouse maintenance operators: MERGE upsert, unpivot.

The reference's load step is append-only (`src/etl_2016.py:31-33`,
`executemany` append `src/etl_2020.py:126-129`, `to_sql(...,
'append')` `src/etl_2022.py:220`); a real warehouse also needs
UPDATE/DELETE-by-key maintenance. Spark without a table format has
no MERGE INTO statement, so the engine ships merge-as-a-transform:
the standard full-outer-join rewrite every lakehouse MERGE compiles
to.

Scale design: MERGE is one shuffle — both sides hash-partition on
the merge key and sort-merge join. A full outer join cannot
broadcast (Spark needs both sides' unmatched rows), so the plan IS
the shuffle; what keeps it efficient at 100 TB is partition-pruned
input (only rewrite partitions the changes touch — the
sink_partition_overwrite pattern) and AQE handling change-batch
skew. Deletes ride the same join as a tombstone op code instead of
a second anti-join pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Change-row operation codes.
OP_UPSERT = "U"
OP_DELETE = "D"


def merge_upsert(
    base: DataFrame,
    changes: DataFrame,
    keys: list[str],
    op_col: str = "op",
) -> DataFrame:
    """Apply a keyed change batch to a base table and return the
    resulting table (MERGE INTO semantics as a pure transform).

    ``changes`` carries the base columns plus ``op_col``:
    ``'U'`` rows update-or-insert their key, ``'D'`` rows delete it.
    One full-outer sort-merge join on the key; matched-U rows take
    the change side's values, matched-D rows drop, unmatched base
    rows pass through.
    """
    val_cols = [c for c in base.columns if c not in keys]
    b = base.alias("b")
    c = changes.alias("c")
    joined = b.join(c, keys, "full_outer")
    keep = F.col(f"c.{op_col}").isNull() | (
        F.col(f"c.{op_col}") != F.lit(OP_DELETE)
    )
    merged = joined.filter(keep).select(
        *[F.col(k) for k in keys],
        *[
            F.when(
                F.col(f"c.{op_col}").isNotNull(), F.col(f"c.{v}")
            )
            .otherwise(F.col(f"b.{v}"))
            .alias(v)
            for v in val_cols
        ],
    )
    return merged


def unpivot_metrics(
    df: DataFrame, value_cols: dict[str, str]
) -> DataFrame:
    """Wide → long unpivot via ``stack()`` (one map-only generator
    projection, no shuffle): {metric_label: column} to rows of
    (metric, val)."""
    n = len(value_cols)
    args = ", ".join(f"'{lbl}', {col}" for lbl, col in value_cols.items())
    return df.selectExpr(f"stack({n}, {args}) AS (metric, val)")


def cdc_op_expr(engine: str) -> str:
    """Map the event feed to CDC operation codes: signups insert a
    NEW key (offset past the snapshot's key range), errors delete,
    everything else upserts. Purely illustrative mapping — the
    operator below is generic over any (key, op, ts) changelog."""
    return (
        "CASE WHEN event_type = 'signup' THEN 'I' "
        "WHEN event_type = 'error' THEN 'D' ELSE 'U' END"
    )


def cdc_latest_apply(
    snapshot: DataFrame, changes: DataFrame
) -> DataFrame:
    """Apply an out-of-order CDC changelog (Debezium/Delta-CDF
    shape: key, op ∈ I/U/D, new value, commit timestamp) to a
    snapshot: latest-wins per key, deletes drop, updates/inserts
    upsert. Returns the post-image with a ``change_status`` audit
    column.

    Scale design: changelog compaction (latest-per-key) is ONE
    row_number window partitioned by key — state bounded by key
    cardinality, skew handled by AQE; the apply is ONE full-outer
    join on the same key, so the window's shuffle partitioning is
    reused by the join (no second exchange of the change side).
    Compacting BEFORE joining is the part that matters at 100 TB:
    the join sees one row per changed key, not the whole log.

    ``changes`` columns: ``key``, ``op``, ``newbal``, ``ts``,
    ``seq`` (tiebreak for same-timestamp commits).
    """
    from pyspark.sql import Window

    w = Window.partitionBy("key").orderBy(
        F.col("ts").desc(), F.col("seq").desc()
    )
    latest = (
        changes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn", "ts", "seq")
    )
    snap = snapshot.alias("b")
    ch = latest.alias("c")
    joined = snap.join(
        ch, F.col("b.c_custkey") == F.col("c.key"), "full_outer"
    )
    return (
        joined.filter(
            F.col("c.op").isNull() | (F.col("c.op") != F.lit("D"))
        )
        .select(
            F.coalesce(F.col("b.c_custkey"), F.col("c.key")).alias(
                "c_custkey"
            ),
            F.coalesce(
                F.col("b.c_name"),
                F.concat(F.lit("cdc-"), F.col("c.key").cast("string")),
            ).alias("c_name"),
            F.round(
                F.when(F.col("c.op").isNotNull(), F.col("c.newbal"))
                .otherwise(F.col("b.c_acctbal")),
                2,
            ).alias("c_acctbal"),
            F.when(F.col("c.op").isNull(), F.lit("kept"))
            .when(F.col("b.c_custkey").isNull(), F.lit("inserted"))
            .otherwise(F.lit("updated"))
            .alias("change_status"),
        )
    )


#: Default Morton-key geometry for zorder_layout_report. The oracle
#: in queries/warehouse_ext.py derives its bucket width from these
#: same constants, so changing them cannot silently break parity.
ZORDER_BITS = 8
ZORDER_BUCKETS = 64


def zorder_bucket_width(bits: int = ZORDER_BITS, n_buckets: int = ZORDER_BUCKETS) -> int:
    """Width of one file bucket in z-key space."""
    return (1 << (2 * bits)) // n_buckets


def zorder_expr(x_col: str, y_col: str, bits: int) -> str:
    """Z-order (Morton) key: interleave ``bits`` low bits of two
    non-negative integer expressions. Emitted as floor-div/mod
    arithmetic that parses and evaluates identically in Spark SQL
    and DuckDB (no dialect-specific bit operators).

    This is the multi-dimensional clustering key behind data
    skipping: sorting a table by z(x, y) keeps each file's min/max
    envelope tight in BOTH dimensions, so a predicate on either
    column prunes files — a single-column sort only prunes its own
    column. At 100 TB the key feeds ``df.sort(zkey).write...``
    (range-partitioned layout); the report operator below audits the
    envelopes that layout produces.
    """
    terms = []
    for i in range(bits):
        terms.append(
            f"(CAST(floor({x_col} / {1 << i}) AS BIGINT) % 2)"
            f" * {1 << (2 * i + 1)}"
        )
        terms.append(
            f"(CAST(floor({y_col} / {1 << i}) AS BIGINT) % 2)"
            f" * {1 << (2 * i)}"
        )
    return "(" + " + ".join(terms) + ")"


def zorder_layout_report(
    events: DataFrame, bits: int = ZORDER_BITS, n_buckets: int = ZORDER_BUCKETS
) -> DataFrame:
    """Per-file-bucket min/max envelopes under a z-ordered layout:
    bucket the z-key range into ``n_buckets`` "files" and report
    each file's bounding box over (user bucket, value bucket) — the
    stats a scan consults to skip files. Tight boxes in both
    dimensions = both predicates prune."""
    ux = "(user_id % 256)"
    vx = "least(255, CAST(floor(value / 2) AS BIGINT))"
    z = zorder_expr(ux, vx, bits)
    width = zorder_bucket_width(bits, n_buckets)
    return (
        events.select(
            F.expr(f"CAST(floor({z} / {width}) AS BIGINT)").alias(
                "file_bucket"
            ),
            F.expr(f"CAST({ux} AS BIGINT)").alias("ux"),
            F.expr(vx).alias("vx"),
        )
        .groupBy("file_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("ux").alias("ux_min"),
            F.max("ux").alias("ux_max"),
            F.min("vx").alias("vx_min"),
            F.max("vx").alias("vx_max"),
        )
    )
