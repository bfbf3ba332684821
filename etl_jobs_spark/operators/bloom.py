"""Portable mergeable Bloom filter as a relational runtime filter.

The pattern behind Spark's own runtime bloom-join pruning
(``spark.sql.optimizer.runtime.bloomFilter.enabled``), made explicit
so it also covers the plans the optimizer can't rewrite (pre-AQE
stages, custom Python data sources, stream-static joins): build a
fixed-size bit array over the small side's join keys with ONE tiny
aggregation, then apply it as a scan-side filter on the fact side so
most non-matching rows never enter the join shuffle. False positives
are removed by the exact join that follows; false negatives cannot
occur, so semantics are exactly the plain join's.

Scale shape (100 TB): the build is a ``groupBy(word).bit_or`` over
the dim keys — ``m_bits/64`` output rows regardless of key count —
collected once (bounded: 1024 longs = 8 KB for the default
``m_bits=2^16``) and shipped back into the plan as an array literal
(Catalyst constant-folds it into ONE ``Literal``; on a real cluster
the task binary carries it exactly like a broadcast scalar). The
probe is a pure column expression (md5-derived positions +
``element_at`` bit tests) that stays inside whole-stage codegen; no
UDF, no per-row array construction, no second shuffle. Sizing:
false-positive rate ≈ (1 - e^(-k·n/m))^k — the default (m=65536,
k=3) holds ~1e-3 at n≈3000 keys; pass a larger ``m_bits`` for
bigger dims (build cost unchanged, literal grows linearly).

Hash positions use the engine-portable 60-bit md5 hash
(operators/hashing.hash60) so the filter is deterministic across
engines, runs and retries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_jobs_spark.operators.hashing import hash60

__all__ = ["bloom_build", "bloom_probe_expr"]


def _position_sql(key_sql: str, i: int, m_bits: int) -> str:
    """Bit position of hash function ``i`` for ``key_sql``
    (a Spark SQL fragment producing the key)."""
    h = hash60(f"concat(cast({key_sql} as string), ':{i}')", "spark")
    return f"pmod({h}, {m_bits})"


def bloom_build(
    keys: DataFrame, key_col: str, m_bits: int = 1 << 16, k: int = 3
) -> list[int]:
    """Aggregate ``keys[key_col]`` into a Bloom bit array.

    One explode (k rows per key) + one hash aggregation to
    ``m_bits/64`` word rows, then a bounded driver collect (8 KB at
    the default size — the same bounded-staging-collect pattern as
    the IVF centroid fetch). Returns the word list, missing words
    zero-filled, ready for :func:`bloom_probe_expr`.
    """
    assert m_bits % 64 == 0
    # a NULL key cannot be a member (its hash positions are NULL and
    # would crash the word fold below with a None word_idx) — build
    # from the non-null keys only; probe-side NULL keys read
    # not-a-member via the coalesce in bloom_probe_expr
    keys = keys.filter(F.col(key_col).isNotNull())
    pos = F.explode(
        F.array(*[F.expr(_position_sql(key_col, i, m_bits)) for i in range(k)])
    ).alias("pos")
    words = (
        keys.select(pos)
        .groupBy((F.col("pos") / 64).cast("int").alias("word_idx"))
        .agg(
            F.expr("bit_or(shiftleft(1L, cast(pmod(pos, 64) as int)))").alias(
                "word"
            )
        )
        .collect()
    )
    arr = [0] * (m_bits // 64)
    for row in words:
        arr[row["word_idx"]] = row["word"]
    return arr


def bloom_probe_expr(words: list[int], key_sql: str, k: int = 3) -> Column:
    """Membership-test Column for ``key_sql`` against ``words``.

    All ``k`` bit tests must pass. The word array is inlined ONCE as
    an ``array(...)`` literal with foldable children — Catalyst's
    ConstantFolding collapses it to a single ``Literal`` — and the
    bit tests fold over it with higher-order ``transform`` +
    ``aggregate``, so the probe evaluates ``element_at`` against that
    one buffer per row (no per-row array construction, and the
    filter-sized literal appears once no matter how large ``m_bits``
    or ``k`` is).
    """
    m_bits = len(words) * 64
    arr_sql = "array(" + ",".join(f"{w}L" for w in words) + ")"
    positions = ", ".join(
        _position_sql(key_sql, i, m_bits) for i in range(k)
    )
    # coalesce(..., false): a NULL key (NULL hash positions → NULL
    # fold) is NOT a member — without it BOTH filter(probe) and
    # filter(~probe) drop the row, silently losing it from a
    # positive/negative split (string-null differential, round 10)
    return F.expr(
        f"coalesce(aggregate(transform(array({positions}), "
        f"p -> (shiftright(element_at({arr_sql}, "
        f"cast(p div 64 as int) + 1), cast(pmod(p, 64) as int)) & 1) = 1), "
        f"true, (acc, x) -> acc and x), false)"
    )
