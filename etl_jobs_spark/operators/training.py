"""Training-data pipeline operators beyond the dedup/ANN/text kits:
PII scrubbing, stable sharding, deterministic stratified sampling,
sequence packing, quality gating, corpus materialization, embedding
health stats, and user-timeline gap features.

These are the remaining steps an LLM-corpus build runs between "raw
scrape" and "tokenizer-ready shards". Every operator is pure column
algebra / window work (map-only or one keyed shuffle), expressed as
dual-dialect SQL fragments so the DuckDB oracles state the identical
computation (same convention as ``operators/hashing.py``).

Scale notes per operator live on the functions; the common rules:
hash-based decisions (shard, sample) are reproducible across runs,
engines and retries — `rand()` is none of those; window work
partitions by a key with bounded group size (lang, user, content
hash), never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_jobs_spark.operators.hashing import (
    hash60,
    norm_text,
    word_tokens,
)

#: Email + long-digit-run patterns, written without backslashes or
#: braces so the SAME literal parses identically in Java regex
#: (Spark) and RE2 (DuckDB) through both engines' string literals.
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]+"
LONGNUM_RE = "[0-9][0-9][0-9][0-9][0-9][0-9]+"

#: Sequence-packing token budget per bin (a training batch).
PACK_BUDGET = 2048

#: Stable shard count for corpus writes.
N_SHARDS = 64

#: Per-language sampling rates (percent) — the "stratified" part.
SAMPLE_RATES = {"en": 10, "de": 25, "es": 25, "fr": 25, "zh": 50}
SAMPLE_DEFAULT_RATE = 20


def pii_input_expr(engine: str) -> str:
    """Deterministic PII-bearing input: a synthetic contact line is
    planted in front of every document (fixtures carry no real PII),
    so the scrub provably matches and removes it in both engines."""
    # coalesce(text, ''): Spark concat NULLs the whole result when
    # any argument is null while DuckDB concat skips nulls — a null
    # body must still yield the planted contact line on both engines
    # (string-null differential, round 10)
    cat = (
        "concat('reach u', CAST(doc_id AS VARCHAR), '@example.com or call "
        "555', CAST(doc_id AS VARCHAR), '0123456 ', coalesce(text, ''))"
    )
    return cat if engine == "duckdb" else cat.replace("VARCHAR", "STRING")


def scrub_expr(col: str, engine: str) -> str:
    """Redact emails then long digit runs. DuckDB needs the 'g' flag
    for all-occurrence replacement; Spark is global by default."""
    g = ", 'g'" if engine == "duckdb" else ""
    emails = f"regexp_replace({col}, '{EMAIL_RE}', '<EMAIL>'{g})"
    return f"regexp_replace({emails}, '{LONGNUM_RE}', '<NUM>'{g})"


def pii_scrub(docs: DataFrame) -> DataFrame:
    """PII scrub: map-only regex redaction (emails, long digit runs)
    — at 100 TB this is a pure narrow stage fused into the scan by
    whole-stage codegen; no shuffle, no Python."""
    return docs.select(
        "doc_id",
        F.expr(scrub_expr(pii_input_expr("spark"), "spark")).alias("clean_text"),
    )


def shard_expr(engine: str, n_shards: int = N_SHARDS) -> str:
    """Stable shard id from the doc key: md5-derived ``hash60`` mod
    n_shards. Content-independent of row order, reproducible across
    runs/engines/retries — the property ``rand()`` or
    ``monotonically_increasing_id()`` sharding lacks."""
    key = (
        "CAST(doc_id AS VARCHAR)" if engine == "duckdb"
        else "CAST(doc_id AS STRING)"
    )
    return f"({hash60(key, engine)} % {n_shards})"


def shard_assign(docs: DataFrame) -> DataFrame:
    """Shard-assignment report: per-shard doc count + id range. At
    scale the shard id is the write partition key
    (``write.partitionBy('shard')``) giving a balanced, stable
    layout for downstream tokenizer workers; the report is the
    balance check (64 shards → ~n/64 each)."""
    return (
        docs.select(F.expr(shard_expr("spark")).alias("shard"), "doc_id")
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


def sample_keep_expr(engine: str) -> str:
    """Deterministic stratified keep-predicate: hash60(doc key) mod
    100 under the language's rate. Sampling by hash (not rand()) is
    reproducible and join-stable: the same doc is kept in every
    rerun, on every engine, at any parallelism."""
    key = (
        "CAST(doc_id AS VARCHAR)" if engine == "duckdb"
        else "CAST(doc_id AS STRING)"
    )
    rate = " ".join(
        f"WHEN lang = '{lg}' THEN {r}" for lg, r in sorted(SAMPLE_RATES.items())
    )
    return (
        f"({hash60(key, engine)} % 100) < "
        f"(CASE {rate} ELSE {SAMPLE_DEFAULT_RATE} END)"
    )


def stratified_sample(docs: DataFrame) -> DataFrame:
    """Per-language deterministic sample (rates in SAMPLE_RATES):
    a pushdown-able filter — no shuffle, no state."""
    return docs.filter(F.expr(sample_keep_expr("spark"))).select(
        "doc_id", "lang", "source"
    )


def pack_sequences(docs: DataFrame, budget: int = PACK_BUDGET) -> DataFrame:
    """Next-fit sequence packing: within each language, docs (in
    doc_id order) accumulate into bins of ~``budget`` tokens — the
    batch-building step before tokenization. One window pass
    (running token sum per lang) + one keyed agg; at 100 TB the
    partition key is (lang, file-split) so packing stays
    embarrassingly parallel instead of a global sort.

    bin = floor(tokens_before_this_doc / budget): deterministic,
    contiguous, and identical in any engine with the same order.
    n_tokens joins the window order as a tie-break: duplicate doc
    ids with DIFFERENT texts (round-12 duplicate-key axis) would
    otherwise make the running sum order-ambiguous between engines;
    rows tying on (doc_id, n_tokens) leave every cum — and so every
    bin — identical under either order.
    """
    n = norm_text("text", "spark")
    toks = f"CAST(size({word_tokens(n, 'spark')}) AS BIGINT)"
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id", "n_tokens")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    with_bin = (
        docs.select("doc_id", "lang", F.expr(toks).alias("n_tokens"))
        .withColumn("cum", F.sum("n_tokens").over(w))
        .withColumn(
            "bin",
            F.floor((F.col("cum") - F.col("n_tokens")) / float(budget)).cast(
                "long"
            ),
        )
    )
    return with_bin.groupBy("lang", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )


def quality_top_half(docs: DataFrame) -> DataFrame:
    """Quality gate: keep each language's better half by the
    composite quality heuristic (``operators/text.quality_score``),
    rank-based (ntile over a total order) rather than
    quantile-threshold-based so the cut is exact integer logic — no
    float-boundary ambiguity between engines. One keyed window pass;
    group size is bounded by language, and at 100 TB the same gate
    runs per (lang, shard) to keep windows partition-local.

    ``lang`` is CARRIED through the score projection, not joined
    back on doc_id: the rejoin fans out on duplicate-delivered doc
    ids (round-12 duplicate-key axis — Spark returned the squared
    fan-out while the oracle's single window pass did not), and it
    was a whole extra shuffle besides."""
    from etl_jobs_spark.operators.text import quality_score

    ranked = quality_score(docs, keep=["lang"]).withColumn(
        "half",
        F.ntile(2).over(
            Window.partitionBy("lang").orderBy(
                F.col("quality").desc(), F.col("doc_id").asc()
            )
        ),
    )
    return ranked.filter(F.col("half") == 1).select("doc_id", "lang", "quality")


def keep_canonical(corpus: DataFrame) -> DataFrame:
    """Dedup materialization: the SURVIVING corpus after exact dedup
    — first (min doc_id) row per normalized-content fingerprint.
    This is the artifact a training run actually reads; the cluster
    *report* shape is ``dedup_exact_text``. Input is a planted
    ``(doc_id, lang, n)`` corpus (``operators/dedup.planted_corpus``).
    One hash-keyed window (row_number over md5 groups) — the shuffle
    carries the 16-byte fingerprint, never document text twice."""
    w = Window.partitionBy("fp").orderBy("doc_id")
    return (
        corpus.withColumn("fp", F.expr("md5(n)"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select(
            "doc_id",
            "lang",
            F.expr("CAST(length(n) AS BIGINT)").alias("n_chars_norm"),
        )
    )


def user_gap_stats(events: DataFrame) -> DataFrame:
    """Per-user inter-event gap features (mean/max seconds between
    consecutive events): the timeline features behind sessionization
    and bot/burst detection. One keyed window pass per user; group
    size bounded by per-user activity."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # cast through TIMESTAMP first: sources that store TIMESTAMP_NTZ
    # (e.g. Spark-written replicas) can't cast straight to DOUBLE;
    # LTZ sources pass through unchanged (session tz is pinned UTC)
    sec = F.col("ts").cast("timestamp").cast("double")
    gaps = (
        events.select("user_id", "ts", "event_id")
        .withColumn("gap", sec - F.lag(sec).over(w))
        .filter(F.col("gap").isNotNull())
    )
    return gaps.groupBy("user_id").agg(
        (F.count(F.lit(1)) + 1).alias("n_events"),
        # exact decimal sum of microsecond-precision gaps (epoch
        # seconds at us resolution are exactly representable, so the
        # DECIMAL(18,6) cast is lossless) -> order-free mean
        F.round(
            F.sum(F.col("gap").cast("decimal(18,6)")).cast("double")
            / F.count("gap"),
            2,
        ).alias("avg_gap_s"),
        F.round(F.max("gap"), 2).alias("max_gap_s"),
    )
