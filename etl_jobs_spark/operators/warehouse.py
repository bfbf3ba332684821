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
