"""Corpus-governance operators: benchmark decontamination,
repetition-based quality signals, deterministic train/holdout
splits, and target-mixture rebalancing.

These are the governance steps a production LLM-corpus build runs
after cleaning/dedup and before materialization: prove the training
set does not contain the eval benchmarks (decontamination), kill
degenerate repetitive documents (the Gopher-style repetition rules),
pin every document to a reproducible train/val/test split, and
re-weight the source mixture toward a target composition.

Extends the reference's validate→clean→score pipeline idea
(src/etl_2022.py:140-260 — its quality gates are null/range checks
on tabular rows) to corpus text at 100 TB scale. The shared scale
rules, same as ``operators/training.py``:

- every per-doc signal is pure column algebra (map-only, fused into
  the scan by whole-stage codegen) — repetition ratios come from
  ``array_distinct`` arithmetic, NOT an explode+groupBy;
- the one shuffle-bearing op (decontamination) joins on 8-byte gram
  hashes with the EVAL side as the build side — benchmark suites
  are tiny (KBs-MBs) next to the corpus, so at scale that side is
  a broadcast and the train side never moves;
- membership decisions (eval set, split, mixture keep-list) hash a
  stable document key — reproducible across runs, engines, retries
  and parallelism, which ``rand()`` sampling is not.

All decision fragments are emitted for BOTH SQL dialects (same
convention as ``operators/hashing.py``) so the DuckDB oracles state
the identical computation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_jobs_spark import cache

from etl_jobs_spark.operators.hashing import (
    hash60,
    norm_text,
    word_ngrams,
    word_tokens,
)

#: 1-in-EVAL_MOD documents form the held-out "benchmark" set the
#: decontamination pass protects (stand-in for a real eval suite).
EVAL_MOD = 50

#: Word n-gram unit for contamination matching. Real pipelines use
#: 8-13; fixtures average ~56 words/doc, so 5 keeps tests meaningful.
DECONTAM_NGRAM = 5

#: A train doc sharing at least this fraction of its distinct
#: n-grams with the eval set is flagged contaminated.
DECONTAM_THRESHOLD = 0.30

#: Repetition gates (fractions of duplicate word 3-grams/sentences —
#: the "repetition signals" family of quality rules).
REP_W3_GATE = 0.05
REP_SENT_GATE = 0.10

#: train/val/test boundaries on hash60(doc key) % 100.
SPLIT_TRAIN_LT = 90
SPLIT_VAL_LT = 95

#: Mixture rebalance: total budget as a fraction of the corpus, in
#: basis points (integer arithmetic keeps both engines identical).
MIX_BUDGET_BP = 5500  # keep ~55% of docs overall


def _doc_key(engine: str, salt: str) -> str:
    cast = "VARCHAR" if engine == "duckdb" else "STRING"
    return f"concat(CAST(doc_id AS {cast}), ':{salt}')"


def eval_member_expr(engine: str) -> str:
    """Deterministic eval-set membership: hash60(doc_id:eval) lands
    in residue 0 of EVAL_MOD → ~2% of docs act as the benchmark."""
    return f"(({hash60(_doc_key(engine, 'eval'), engine)} % {EVAL_MOD}) = 0)"


def split_expr(engine: str) -> str:
    """Deterministic split assignment from hash60(doc_id:split)."""
    h = f"({hash60(_doc_key(engine, 'split'), engine)} % 100)"
    return (
        f"CASE WHEN {h} < {SPLIT_TRAIN_LT} THEN 'train' "
        f"WHEN {h} < {SPLIT_VAL_LT} THEN 'val' ELSE 'test' END"
    )


def source_weight_expr(engine: str) -> str:
    """Target mixture weight per source: 1 + hash60(source) % 4 →
    a deterministic 1..4 relative weight for ANY source set (no
    hard-coded source names), non-trivial on uniform fixtures."""
    return f"(1 + ({hash60('source', engine)} % 4))"


def dup_frac_expr(arr: str, engine: str) -> str:
    """Fraction of duplicate elements in a list: 1 - distinct/len,
    pure per-row array algebra (no explode, no shuffle)."""
    if engine == "spark":
        return (
            f"round(1.0 - CAST(size(array_distinct({arr})) AS DOUBLE)"
            f" / greatest(size({arr}), 1), 4)"
        )
    return (
        f"round(1.0 - CAST(len(list_distinct({arr})) AS DOUBLE)"
        f" / greatest(len({arr}), 1), 4)"
    )


def sentences_expr(norm_col: str, engine: str) -> str:
    """Sentence list: split normalized text on '. ' (Spark split is
    regex-based → '[.] ' states the same literal split)."""
    if engine == "spark":
        return f"split({norm_col}, '[.] ')"
    return f"string_split({norm_col}, '. ')"


def decontam_overlap(docs: DataFrame) -> DataFrame:
    """Benchmark decontamination: flag train docs whose distinct
    word-5-gram overlap with the eval set exceeds the threshold.

    Plan shape (the part that must survive 100 TB): explode each
    side to DISTINCT gram hashes (8-byte keys — the same
    shuffle-carries-hashes-not-text rule as MinHash,
    operators/dedup.py), LEFT SEMI join train grams against eval
    grams, count matches per train doc. The eval side of a real
    pipeline is a benchmark suite (tiny) → broadcast; the train side
    is joined in place, never re-shuffled on text.
    """
    from etl_jobs_spark.sources.readers import spread

    # spread before the normalize/tokenize/ngram explode — the
    # operator's dominant CPU stage; a single-file fixture scan is
    # one split (guide §2.5 input skew; no-op at real scale)
    docs = spread(docs)
    n = norm_text("text", "spark")
    # materialize norm+tokens as REAL columns before the n-gram
    # transform: the fragment builders splice expression TEXT, so
    # inlining `toks` would re-run split(regexp_replace(...)) once
    # per token position (measured 18s -> 3s at sf0.1). Catalyst
    # keeps the staged projection because `toks` is non-cheap and
    # multiply-referenced (CollapseProject's duplication guard).
    staged = docs.select(
        "doc_id",
        F.expr(eval_member_expr("spark")).alias("is_eval"),
        F.expr(n).alias("nrm"),
    ).withColumn("toks", F.expr(word_tokens("nrm", "spark")))
    grams = word_ngrams("toks", "nrm", "spark", DECONTAM_NGRAM)
    base = (
        staged.select(
            "doc_id",
            "is_eval",
            F.explode(F.array_distinct(F.expr(grams))).alias("gram"),
        )
        .select(
            "doc_id", "is_eval", F.expr(hash60("gram", "spark")).alias("gh")
        )
    )
    # feeds BOTH branches (train rows + the eval gram set); the
    # normalize→ngram→md5 explode is the expensive stage, so compute
    # it once (same rationale as the persisted MinHash signature
    # table, operators/dedup.py). ~16 bytes/row. Tracked so callers
    # can release it between queries instead of leaking blocks.
    base = cache.track(base)
    train = base.filter(~F.col("is_eval")).select("doc_id", "gh")
    eval_grams = (
        base.filter(F.col("is_eval"))
        .select("gh")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    # ONE pass over the exploded train grams: left-join the eval gram
    # set as a marker, then a single groupBy counts total and matched
    # grams together (vs. a semi-join + second agg + re-join, which
    # would scan the corpus explode twice more). No explicit
    # broadcast hint: when the eval side is a fixed benchmark suite
    # it is tiny and AQE broadcasts it at runtime anyway; when (as in
    # this fixture) the eval side is a hash slice that scales with
    # the corpus, a forced broadcast would OOM the driver at 100 TB —
    # AQE picks the right strategy from the measured size either way.
    return (
        train.join(eval_grams, "gh", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("hit").alias("n_matched"),
        )
        .withColumn(
            "overlap_frac",
            F.expr("round(CAST(n_matched AS DOUBLE) / n_grams, 4)"),
        )
        .filter(F.col("overlap_frac") >= DECONTAM_THRESHOLD)
    )


def repetition_signals(
    docs: DataFrame, keep: list[str] | None = None
) -> DataFrame:
    """Gopher-style repetition quality signals, entirely map-only:
    duplicate word-2-gram / 3-gram / sentence fractions from
    ``array_distinct`` arithmetic — no explode, no shuffle, fused
    into the parquet scan by whole-stage codegen. The gate flags
    degenerate (template/spam) documents.

    ``keep``: extra input columns carried through — a caller
    gating a corpus must NOT join these signals back by doc_id
    afterwards (fan-out under duplicate-delivered doc ids, round-12
    duplicate-key axis), so it carries what it needs here."""
    # Stage norm/tokens/gram-arrays as REAL columns before the
    # dup-frac arithmetic: the fragment builders splice expression
    # TEXT, so inlining `toks` into word_ngrams and then referencing
    # each gram array twice (array_distinct + size) would re-run the
    # split(regexp_replace(...)) chain ~10x per row — the same
    # blow-up fixed in decontam_overlap (measured 7.7s -> ~1s for
    # 500 docs at sf0.01). Catalyst keeps each staged projection
    # because every staged column is non-cheap and multiply
    # referenced (CollapseProject's duplication guard).
    staged = (
        docs.select(
            "doc_id",
            *(keep or []),
            F.expr(norm_text("text", "spark")).alias("nrm"),
        )
        .withColumn("toks", F.expr(word_tokens("nrm", "spark")))
        .withColumn("w2", F.expr(word_ngrams("toks", "nrm", "spark", 2)))
        .withColumn("w3", F.expr(word_ngrams("toks", "nrm", "spark", 3)))
        .withColumn("sents", F.expr(sentences_expr("nrm", "spark")))
    )
    return staged.select(
        "doc_id",
        *(keep or []),
        F.expr("CAST(size(toks) AS BIGINT)").alias("n_words"),
        F.expr(dup_frac_expr("w2", "spark")).alias("dup_word2_frac"),
        F.expr(dup_frac_expr("w3", "spark")).alias("dup_word3_frac"),
        F.expr(dup_frac_expr("sents", "spark")).alias("dup_sent_frac"),
    ).withColumn(
        "is_repetitive",
        (
            (F.col("dup_word3_frac") > REP_W3_GATE)
            | (F.col("dup_sent_frac") > REP_SENT_GATE)
        ).cast("long"),
    )


def split_report(docs: DataFrame) -> DataFrame:
    """Per-(lang, split) census of the deterministic train/val/test
    assignment: counts + each split's share of its language. The
    assignment column is the thing a 100 TB corpus stores (or
    recomputes — it's a pure hash); the report is the audit."""
    assigned = docs.select(
        "lang", F.expr(split_expr("spark")).alias("split")
    )
    per = assigned.groupBy("lang", "split").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    w = Window.partitionBy("lang")
    return per.select(
        "lang",
        "split",
        "n_docs",
        F.round(
            F.col("n_docs").cast("double") / F.sum("n_docs").over(w), 4
        ).alias("frac_of_lang"),
    )


def mixture_rebalance(docs: DataFrame) -> DataFrame:
    """Target-mixture rebalance: allocate a corpus budget across
    sources by deterministic target weights, then keep EXACTLY the
    allocated count per source via hash-ranked selection.

    Plan shape: per-source stats are a tiny aggregate (#sources
    rows) broadcast back onto the corpus; the only big-data work is
    one row_number window partitioned by source. Hash-ranked
    selection (rank docs by hash60, keep the first keep_n) gives
    exact per-stratum counts — reproducible, engine-identical, and
    unlike ``TABLESAMPLE`` it survives reruns and retries."""
    stats = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_src"))
    stats = stats.withColumn(
        "w", F.expr(source_weight_expr("spark"))
    )
    tot = stats.agg(
        F.sum("w").alias("w_total"), F.sum("n_src").alias("n_total")
    )
    quota = (
        stats.crossJoin(F.broadcast(tot))
        # integer arithmetic end-to-end: budget_bp of the corpus,
        # split across sources by w/w_total, floored — both engines
        # compute the identical keep_n.
        .withColumn(
            "keep_n",
            F.least(
                F.col("n_src"),
                F.expr(
                    f"CAST(floor(CAST(n_total AS DOUBLE) * {MIX_BUDGET_BP}"
                    " / 10000 * w / w_total) AS BIGINT)"
                ),
            ),
        )
        .select("source", "keep_n")
    )
    rnk_w = Window.partitionBy("source").orderBy(
        F.expr(hash60(_doc_key("spark", "mix"), "spark")), F.col("doc_id")
    )
    ranked = docs.select("doc_id", "source").withColumn(
        "rnk", F.row_number().over(rnk_w).cast("long")
    )
    return (
        ranked.join(F.broadcast(quota), "source")
        .filter(F.col("rnk") <= F.col("keep_n"))
        .select("doc_id", "source")
    )
