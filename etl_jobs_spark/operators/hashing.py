"""Engine-portable deterministic hashing / text / vector-math
expression builders.

The driver's correctness gate hash-compares Spark results against a
DuckDB oracle, so every derived value must be computed *identically*
in both engines. Rather than maintaining two hand-written copies of
each formula, every primitive here is a tiny Python function that
emits the same computation as a SQL fragment for either dialect
(``engine in {"spark", "duckdb"}``). The Spark query wraps the
fragment in ``F.expr``; the oracle embeds it in the SQL string — one
source of truth, zero drift.

Primitives:

- ``hash60``: a 60-bit deterministic hash both engines agree on
  bit-for-bit: the first 15 hex digits of md5, parsed as an integer.
  (Spark's ``hash()`` is Murmur3 and DuckDB's is xxHash — never
  comparable; md5 is the portable common ground, and 15 hex digits
  keep it inside a signed 64-bit.)
- ``norm_text`` / ``char_shingles`` / ``word_tokens``: the shared
  normalization + shingling pipeline for the dedup family.
- ``minhash_params`` / ``hyperplanes``: seeded constants for
  MinHash permutations and random-hyperplane LSH, generated once in
  Python and embedded as literals in BOTH engines' SQL.
- ``dot_unrolled`` / ``norm_unrolled``: fully unrolled
  double-precision vector arithmetic. Unrolling fixes the summation
  ORDER, so the float result is bit-identical across engines
  (IEEE-754 double ops are correctly rounded and associativity is
  the only source of divergence).

Scale note: all fragments are pure column expressions — they stay
inside whole-stage codegen on the Spark side (no Python UDFs in any
hot path), so the same query text that passes the sf0.01 oracle runs
vectorized on a 1000-executor cluster.
"""

from __future__ import annotations

#: Mersenne prime 2^31-1: MinHash modulus. Bases are reduced mod p
#: BEFORE the affine step so a*base stays < 2^62 (no 64-bit overflow
#: in either engine).
MERSENNE_P = 2147483647


def hash60(col: str, engine: str) -> str:
    """60-bit md5-derived hash, identical across engines."""
    if engine == "spark":
        return f"cast(conv(substring(md5({col}), 1, 15), 16, 10) as bigint)"
    return f"('0x' || substr(md5({col}), 1, 15))::BIGINT"


def norm_text(col: str, engine: str) -> str:
    """Canonical text form: lowercase, trimmed, whitespace collapsed
    to single spaces. Same regex both engines (POSIX class-free)."""
    if engine == "spark":
        # Spark SQL string literals process backslash escapes: the
        # parser must see '\\s+' for the regex \s+.
        return f"regexp_replace(lower(trim({col})), '\\\\s+', ' ')"
    return f"regexp_replace(lower(trim({col})), '\\s+', ' ', 'g')"


def word_tokens(norm_col: str, engine: str) -> str:
    """Split normalized text on single spaces (non-regex split)."""
    if engine == "spark":
        return f"split({norm_col}, ' ')"
    return f"string_split({norm_col}, ' ')"


def char_shingles(norm_col: str, engine: str, n: int = 5) -> str:
    """Character n-gram shingle list (the MinHash/Jaccard unit).

    1-based substring in both dialects; a doc shorter than n yields
    its whole text as the single shingle.
    """
    if engine == "spark":
        return (
            f"case when length({norm_col}) < {n} then array({norm_col}) "
            f"else transform(sequence(1, length({norm_col}) - {n - 1}), "
            f"i -> substring({norm_col}, i, {n})) end"
        )
    return (
        f"case when length({norm_col}) < {n} then [{norm_col}] "
        f"else list_transform(range(1, length({norm_col}) - {n - 2}), "
        f"i -> substr({norm_col}, i, {n})) end"
    )


def minhash_params(k: int, seed: int = 42) -> list[tuple[int, int]]:
    """K affine-permutation (a, b) pairs, deterministic in ``seed``.

    Plain LCG instead of numpy so the constants are reproducible from
    the stdlib alone; a != 0 mod p guaranteed.
    """
    params: list[tuple[int, int]] = []
    state = seed & 0x7FFFFFFF
    while len(params) < k:
        state = (1103515245 * state + 12345) % (1 << 31)
        a = 1 + state % (MERSENNE_P - 1)
        state = (1103515245 * state + 12345) % (1 << 31)
        b = state % MERSENNE_P
        params.append((a, b))
    return params


def minhash_expr(base_col: str, a: int, b: int) -> str:
    """One MinHash permutation h(x) = (a*x + b) mod p — dialect-neutral
    (works verbatim in Spark SQL and DuckDB)."""
    return f"(({a} * {base_col} + {b}) % {MERSENNE_P})"


def hyperplanes(n_planes: int, dim: int, seed: int = 7) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes for sign-LSH, values
    in [-0.5, 0.5) rounded to 6 decimals (exact in both engines'
    literal parsers)."""
    planes: list[list[float]] = []
    state = seed & 0x7FFFFFFF
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (1103515245 * state + 12345) % (1 << 31)
            row.append(round(state / float(1 << 31) - 0.5, 6))
        planes.append(row)
    return planes


def _elem(col: str, i: int, engine: str) -> str:
    """0-based element access: Spark subscripts are 0-based, DuckDB
    lists are 1-based."""
    return f"{col}[{i}]" if engine == "spark" else f"{col}[{i + 1}]"


def dot_unrolled(
    a_col: str, b_col: str, dim: int, engine: str, prefix: bool = False
) -> str:
    """Σ a[i]·b[i] in fixed left-to-right double summation order.

    DuckDB side: fully unrolled terms. Spark side: a higher-order
    ``aggregate(zip_with(...))`` fold-left — bit-identical to the
    unrolled form (fold from +0.0 associates the same way; verified
    0 mismatches over the fixtures) but a ~200× smaller expression
    tree, so Janino never compiles multi-second giant methods and
    the surrounding stage stays codegen-able. Measured ~2× faster on
    the sf0.1 pair-join benches.

    PITFALL the ``prefix`` flag exists for: the Spark fold runs over
    the WHOLE array, so ``dim`` only bounds the DuckDB unrolling —
    callers must pass ``dim == len(array)`` (every full-dim caller
    does). To dot a true PREFIX of longer vectors (matryoshka
    truncation), pass ``prefix=True``: the Spark side then slices
    ``[1, dim]`` before folding, matching the dim-term DuckDB sum.
    Full-dim callers keep the slice-free expression (no per-row
    array copy in the pair-join hot paths).
    """
    if engine == "spark":
        a = f"slice({a_col}, 1, {dim})" if prefix else a_col
        b = f"slice({b_col}, 1, {dim})" if prefix else b_col
        return (
            f"aggregate(zip_with({a}, {b}, "
            f"(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
            f"CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
        )
    terms = " + ".join(
        f"CAST({_elem(a_col, i, engine)} AS DOUBLE) * "
        f"CAST({_elem(b_col, i, engine)} AS DOUBLE)"
        for i in range(dim)
    )
    return f"({terms})"


def dot_const_unrolled(col: str, consts: list[float], engine: str) -> str:
    """Σ col[i]·c_i with embedded literal constants (LSH planes);
    same fold-left/unrolled duality as :func:`dot_unrolled`."""
    if engine == "spark":
        arr = ", ".join(f"CAST({c!r} AS DOUBLE)" for c in consts)
        return (
            f"aggregate(zip_with({col}, array({arr}), "
            f"(x, w) -> CAST(x AS DOUBLE) * w), "
            f"CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
        )
    terms = " + ".join(
        f"CAST({_elem(col, i, engine)} AS DOUBLE) * {c!r}"
        for i, c in enumerate(consts)
    )
    return f"({terms})"


def norm_unrolled(
    col: str, dim: int, engine: str, prefix: bool = False
) -> str:
    """sqrt(Σ col[i]^2), unrolled (see dot_unrolled)."""
    return f"sqrt({dot_unrolled(col, col, dim, engine, prefix=prefix)})"


def xor_expr(a: str, b: str, engine: str) -> str:
    """Bitwise XOR: infix in Spark SQL, function-call in DuckDB."""
    return f"({a} ^ {b})" if engine == "spark" else f"xor({a}, {b})"


def popcount_unrolled(col: str, bits: int) -> str:
    """Population count as Σ ((x >> b) & 1) — dialect-neutral (both
    engines share `>>`/`&`), avoiding bit_count() portability."""
    return (
        "("
        + " + ".join(f"(({col} >> {b}) & 1)" for b in range(bits))
        + ")"
    )


def sig_match_frac(a_prefix: str, b_prefix: str, k: int) -> str:
    """Fraction of equal MinHash signature components between two
    signature rows with columns ``<prefix>.s0..s{k-1}`` —
    dialect-neutral, round(…, 4) applied by the caller."""
    matches = " + ".join(
        f"CASE WHEN {a_prefix}.s{i} = {b_prefix}.s{i} THEN 1 ELSE 0 END"
        for i in range(k)
    )
    # CAST(...AS DOUBLE), not a `/ k.0` literal: Spark parses `16.0`
    # as DECIMAL(3,1) and the result column becomes DecimalType,
    # which pandas renders as Decimal objects → driver hash mismatch.
    return f"(CAST({matches} AS DOUBLE) / {k})"


def word_ngrams(toks_col: str, norm_col: str, engine: str, n: int = 3) -> str:
    """Word n-gram list from a pre-split token array; a doc with
    fewer than n tokens contributes its whole normalized text."""
    if engine == "spark":
        parts = ", ".join(f"{toks_col}[i + {j}]" for j in range(n))
        return (
            f"case when size({toks_col}) < {n} then array({norm_col}) "
            f"else transform(sequence(0, size({toks_col}) - {n}), "
            f"i -> concat_ws(' ', {parts})) end"
        )
    parts = ", ".join(f"{toks_col}[i + {j}]" for j in range(n))
    return (
        f"case when len({toks_col}) < {n} then [{norm_col}] "
        f"else list_transform(range(1, len({toks_col}) - {n - 2}), "
        f"i -> concat_ws(' ', {parts})) end"
    )
