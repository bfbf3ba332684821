"""User-extension surface: Arrow-vectorized UDF hooks (SURVEY §2.9).

The reference's extensibility story is "edit the Python": the
row-level hook is ``DataValidator.validate_row`` (ref:
src/etl_2018.py:15-36, swapped in 2020 src/etl_2020.py:37-62), the
partition-level hook is ``process_chunk`` (ref: src/etl_2020.py:64-77),
the table-level hook ``_transform_data`` (ref: src/etl_2025.py:198-213).

Spark-first mapping — every hook becomes an Arrow-batched pandas
construct (never row-at-a-time Python UDFs, which serialize per row):

- row-level     → ``@pandas_udf`` scalar (vectorized Series→Series),
- partition-level → ``mapInPandas`` (see operators/multimodal.py),
- group-level   → ``applyInPandas`` grouped map (this module),
- stateful      → ``applyInPandasWithState`` (queries/streaming.py).

Built-in Column expressions remain the hot path (everything in
SURVEY §2.2-2.3 is expressible without UDFs); these hooks exist for
logic that genuinely needs Python — and the examples here are chosen
to be deterministic so even the UDF path is oracle-checked.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.functions import pandas_udf


def normalize_text_udf():
    """Row-level hook as a vectorized scalar pandas UDF (the
    ``validate_row``-style per-value transform, Arrow-batched:
    one Python call per ~10k values, not per row). Constructed
    lazily — pandas_udf DDL-type parsing needs an active session."""

    def _norm(s: pd.Series) -> pd.Series:
        return s.str.strip().str.lower()

    return pandas_udf(_norm, "string")


def rank_within_group(events: DataFrame) -> DataFrame:
    """Group-level hook: ``applyInPandas`` grouped map ranking events
    per type by value (the ``process_chunk`` shape — whole-group
    pandas logic — with Spark doing the shuffle/grouping).

    Integer ranks with a deterministic (value DESC, event_id ASC)
    order make the Python path exactly reproducible in SQL.

    NULL and NaN both rank LAST (tie-broken by event_id): Arrow
    hands pandas a float64 column where SQL NULL and a NaN payload
    are indistinguishable, while SQL ranks NaN as the LARGEST value
    and NULL last — so the query's contract is the pandas one,
    missing == NaN == last, and the oracle restates it with an
    explicit missing-bucket sort key (round-11 extremes axis)."""

    def rank(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.assign(_miss=pdf["value"].isna().astype(int)).sort_values(
            ["_miss", "value", "event_id"], ascending=[True, False, True]
        ).reset_index(drop=True)
        pdf["rnk"] = range(1, len(pdf) + 1)
        return pdf[["event_id", "event_type", "value", "rnk"]]

    return events.select("event_id", "event_type", "value").groupBy(
        "event_type"
    ).applyInPandas(
        rank, "event_id BIGINT, event_type STRING, value DOUBLE, rnk BIGINT"
    )


#: Quantization scale for the RMS UDAF: squares are rounded to this
#: fixed-point grid before summing so every addend is an
#: exactly-representable integer and the sum is bit-identical under
#: ANY summation order (numpy pairwise here, sequential in DuckDB's
#: avg). Without it the ~1e-12 relative drift between the two
#: summation orders is a latent round(...,6) hash flake. Exactness
#: holds while sum(round(v^2 * SCALE)) < 2^53 — at larger group
#: sizes, drop SCALE (trading grid resolution for headroom).
RMS_SCALE = 10_000


def rms_udaf():
    """Aggregate-level hook: a grouped-agg pandas UDF (true UDAF —
    Series in, scalar out, Arrow-batched per group). Root-mean-square
    is chosen because no single built-in computes it, yet it is
    exactly restatable in SQL for the oracle. Both sides sum
    RMS_SCALE-quantized squares (see above) so the comparison is
    exact, not merely close."""
    import numpy as np

    def _rms(v: pd.Series) -> float | None:
        # floor(x + 0.5), not np.round: half-to-even vs DuckDB's
        # half-away would disagree on exact .5 inputs. dropna first:
        # SQL aggregates skip NULLs, numpy propagates NaN — without
        # it a single null row NaN-poisons the whole group (caught
        # by the round-10 null-injection differential).
        x = v.dropna().astype(float).to_numpy()
        if len(x) == 0:
            # SQL aggregate over zero non-null rows is NULL, not NaN
            # (DuckDB oracle yields NULL; NaN would hash-diverge on
            # an all-null group).
            return None
        sq = np.floor(x ** 2 * RMS_SCALE + 0.5)
        return float(np.sqrt(sq.sum() / (RMS_SCALE * len(sq))))

    return pandas_udf(_rms, "double")


def count_udaf():
    """Companion grouped-agg UDF: Spark disallows mixing pandas and
    built-in aggregates in one ``agg()``, so the row count rides the
    same Arrow batch as the RMS."""

    def _n(v: pd.Series) -> int:
        # non-null count, matching SQL count(col) semantics
        return int(v.notna().sum())

    return pandas_udf(_n, "long")


#: Passage width (words) for the chunking UDTF.
CHUNK_WORDS = 16


def passage_chunk_udtf():
    """Table-level hook: a Python UDTF (one input row → N output
    rows) chunking normalized text into fixed-width passages — the
    retrieval-indexing segmentation step, and the generator shape
    flatMap-style parsers need. Lazily constructed; the caller
    registers it and invokes via LATERAL join."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx: bigint, passage: string")
    class PassageChunk:
        def eval(self, text: str):  # noqa: D401
            if text is not None:
                toks = text.split(" ")
                for i in range(0, len(toks), CHUNK_WORDS):
                    yield i // CHUNK_WORDS + 1, " ".join(
                        toks[i : i + CHUNK_WORDS]
                    )

    return PassageChunk


#: Word-shingle width for the Arrow-optimized n-gram UDTF.
SHINGLE_WORDS = 3


def word_shingle_udtf():
    """Arrow-optimized Python UDTF (Spark 4 ``useArrow=True``): one
    normalized document row → one row per overlapping SHINGLE_WORDS
    word shingle. Same generator contract as :func:`passage_chunk_udtf`
    but with Arrow-batched input/output transfer — the UDTF analogue
    of pandas_udf vs plain udf, and the shape shingle extraction for
    MinHash/decontamination takes at scale (overlapping windows, not
    disjoint chunks)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="gram_idx: bigint, gram: string", useArrow=True)
    class WordShingle:
        def eval(self, text: str):  # noqa: D401
            if text is not None:
                toks = text.split(" ")
                for i in range(max(len(toks) - SHINGLE_WORDS + 1, 0)):
                    yield i + 1, " ".join(toks[i : i + SHINGLE_WORDS])

    return WordShingle


def metric_fanout_udtf():
    """Arrow-optimized UDTF for the WRITE path: fan a per-type batch
    AGGREGATE row out into long-format metric rows (the 2022-era
    metrics file written per batch, src/etl_2022.py:161-165, as row
    fan-out instead of a dict dump). The UDTF deliberately consumes
    pre-aggregated rows (|event types| per micro-batch), not raw
    events: UDTF ``eval`` runs per ROW even with Arrow transfer, so
    the per-event work stays in whole-stage codegen and Python only
    shapes the handful of summary rows — measured 14.7s -> ~3s at
    sf0.1 when the fan-out moved off the per-event path. Integer
    milli values — batch-split-invariant and exactly restatable in
    SQL."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="metric: string, n: bigint, mval: bigint", useArrow=True)
    class MetricFanout:
        def eval(self, event_type: str, n: int, v_milli: int):  # noqa: D401
            yield "rows", n, n
            yield "value_milli", n, v_milli
            yield "is_click", n, n if event_type == "CLICK" else 0

    return MetricFanout


def token_count_arrow_udf():
    """Row-level hook as a Spark 4 ARROW-OPTIMIZED regular Python UDF
    (``useArrow=True``): the third point on the UDF ladder —
    per-value Python logic with Arrow batch transfer but WITHOUT
    requiring the author to think in pandas Series (each call sees
    one value; serialization is Arrow-columnar under the hood). For
    genuinely vectorizable logic the pandas_udf above is still
    faster; this is the migration path for the long tail of scalar
    UDFs (the reference's per-row helpers, src/etl_2018.py:19-31)
    that want Arrow transport without a rewrite."""
    from pyspark.sql.functions import udf

    # EXPLICIT ASCII whitespace class, not str.split(): Python's
    # split() treats unicode whitespace (NBSP, unicode line seps) as
    # boundaries, RE2-based SQL \s does not — the round-10 unicode
    # differential caught the two drifting apart on NBSP. Pinning
    # the class makes the contract portable to any SQL engine.
    import re

    _ws = re.compile(r"[ \t\n\r\f\v]+")

    def _count(s: str) -> int | None:
        # NULL in, NULL out (SQL function semantics — the oracle's
        # regexp_split_to_array(NULL) is NULL, and 'we counted zero
        # tokens' must stay distinguishable from 'there was no
        # text'); empty string counts 0
        if s is None:
            return None
        return sum(1 for t in _ws.split(s) if t)

    return udf(_count, "long", useArrow=True)
