"""Exact money/2dp-value aggregation (round-10 hardening).

The shuffle-fuzz harness (tests/test_order_invariance.py) caught the
flagship Q1's ``round(sum(price * (1 - discount)), 2)`` flipping a
cent when the SAME rows arrive in a different order: double
summation is not associative, Spark sums in partition order and
DuckDB in its own scan order, and the fixture had simply never
parked a group's sum within float-epsilon of a half-cent boundary.
On a real cluster every shuffle reorders rows, so an
order-DEPENDENT aggregate is a nondeterministic one.

Fix, applied to every rounded SUM over a 2-decimal money/value
column or product of such columns (the repo's fixtures keep
l_extendedprice / l_discount / l_tax / events.value at exactly two
decimals — asserted in tests/test_order_invariance.py): cast the
2dp factors to DECIMAL *before* multiplying/summing. Decimal
products and sums are EXACT, therefore order-free; the final cast
back to DOUBLE is one deterministic conversion of one exact value.
Cost at scale: Spark sums decimals with the same partial/final
hash-agg plan (exactness comes from 128-bit integer arithmetic, not
a different plan shape) — the shuffle still carries one fixed-width
value per group.

The same discipline already existed piecemeal (agg_unpivot_metrics'
DECIMAL(18,2) sums, the cents-BIGINT revenue in q7/q15/q21/q22,
FLOAT_ORDER_AUDIT.md's integer rank keys); this module is the shared
spelling for the remaining ~45 sites, with the DuckDB twin of each
helper so oracles stay textually in lockstep.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: DECIMAL(18,2) holds any 2dp column this engine aggregates
#: (|x| < 10^16) and Spark's sum widens to DECIMAL(28,2) — exact
#: headroom for ~10^10 rows of max-magnitude values.
DEC2 = "decimal(18,2)"


def dsum(col: Column | str, ndigits: int = 2) -> Column:
    """Order-free SUM of a 2dp double column, surfaced as DOUBLE:
    exact DECIMAL(18,2) sum -> decimal round (exact, half-up ==
    half-away for the non-negative money domain) -> ONE double
    conversion at the very end. Rounding BEFORE the double cast
    matters: a scale-4 product sum can land exactly on a half-cent,
    where the two engines' double-rounding paths are not worth
    betting on; decimal rounding is exact on both."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(DEC2)), ndigits).cast("double")


def dsum_sql(expr: str, ndigits: int = 2) -> str:
    """The DuckDB spelling of :func:`dsum` over ``expr``."""
    return (
        f"CAST(round(sum(CAST({expr} AS DECIMAL(18,2))), {ndigits})"
        f" AS DOUBLE)"
    )


def dsum2(a: Column | str, b: Column | str, ndigits: int = 2) -> Column:
    """Order-free SUM of a product of two 2dp columns/expressions
    (e.g. ``l_extendedprice * (1 - l_discount)``): each factor is
    cast to DECIMAL(18,2) first — exact since both ARE 2dp values —
    so the product (scale 4) and its sum are exact."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.round(
        F.sum(ca.cast(DEC2) * cb.cast(DEC2)), ndigits
    ).cast("double")


def dsum2_sql(a: str, b: str, ndigits: int = 2) -> str:
    """DuckDB twin of :func:`dsum2`."""
    return (
        f"CAST(round(sum(CAST({a} AS DECIMAL(18,2)) *"
        f" CAST({b} AS DECIMAL(18,2))), {ndigits}) AS DOUBLE)"
    )


def dsum3(
    a: Column | str, b: Column | str, c: Column | str, ndigits: int = 2
) -> Column:
    """Order-free SUM of a triple 2dp product (Q1's charge)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    cc = F.col(c) if isinstance(c, str) else c
    return F.round(
        F.sum(ca.cast(DEC2) * cb.cast(DEC2) * cc.cast(DEC2)), ndigits
    ).cast("double")


def dsum3_sql(a: str, b: str, c: str, ndigits: int = 2) -> str:
    """DuckDB twin of :func:`dsum3`."""
    return (
        f"CAST(round(sum(CAST({a} AS DECIMAL(18,2)) *"
        f" CAST({b} AS DECIMAL(18,2)) * CAST({c} AS DECIMAL(18,2))),"
        f" {ndigits}) AS DOUBLE)"
    )


def davg(col: Column | str, ndigits: int = 4) -> Column:
    """Order-free, TIE-EXACT AVG of a 2dp double column.

    The pre-r15 spelling (exact decimal sum, one double division,
    ``round``) was order-free but not tie-safe: when the exact
    quotient sits at a ``...5`` boundary in the (ndigits+1)-th
    place, the double cannot represent it exactly, and the engines
    round the SAME double differently — Spark's round goes through
    the shortest decimal repr (``BigDecimal(Double.toString)``),
    DuckDB rounds the binary value. The round-15 nulled axis caught
    the flip on agg_cube_events (55.6312 vs 55.6313).

    This spelling never rounds a double: with S = exact decimal sum
    and n = non-null count (SQL AVG semantics), the half-up rounded
    average in 10^-ndigits units is the exact integer
    ``(2·S·10^ndigits + n) div (2n)``, computed here with exact
    decimal arithmetic (the ``x - x % d`` subtraction makes the
    division integer-valued, so the decimal division is exact at
    any result scale). One final double division by 10^ndigits is
    deterministic IEEE on both engines. Negative sums round
    HALF-AWAY-FROM-ZERO via |S| and a sign factor — integer
    division semantics differ between the engines below zero
    (Spark's ``x − x%d`` truncates toward zero, DuckDB's ``//``
    floors; the round-15 axis-8 fixture's conflicting-duplicate
    rewrites produced the negative sums that caught it), so the
    magnitude math runs on absolute values where they agree.
    Quotient·10^ndigits < 2^63 — any physical average fits.
    All-null group → NULL on both engines."""
    c = F.col(col) if isinstance(col, str) else col
    scale = 10 ** ndigits
    m = (F.sum(c.cast(DEC2)) * scale).cast("decimal(38,0)")
    n = F.count(c)
    num = F.abs(m) * 2 + n
    den = n * 2
    q = ((num - num % den) / den).cast("long")
    sign = F.when(m < 0, F.lit(-1)).otherwise(F.lit(1))
    return (sign * q).cast("double") / scale


def davg_sql(expr: str, ndigits: int = 4) -> str:
    """DuckDB twin of :func:`davg` (integer half-away in HUGEINT —
    kept textually in lockstep with the Spark spelling)."""
    scale = 10 ** ndigits
    s = f"sum(CAST({expr} AS DECIMAL(18,2)))"
    return (
        f"CAST((CASE WHEN {s} < 0 THEN -1 ELSE 1 END) *"
        f" ((2 * abs(CAST({s} * {scale} AS HUGEINT)) + count({expr}))"
        f" // (2 * count({expr}))) AS DOUBLE) / {scale}"
    )
