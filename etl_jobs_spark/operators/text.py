"""Text-analysis operators for LLM training-data pipelines.

Beyond-reference surface (SURVEY.md §7 step 7): the reference's only
text ops are upper/trim/contains (src/etl_2016.py:16,
src/etl_2018.py:23, src/etl_2020.py:48); a corpus pipeline needs
per-document statistics, language ID, quality scoring, and
fingerprinting. Everything here is pure Column algebra built from
the engine-portable fragments in ``hashing.py`` — no Python UDFs, so
the whole kit runs inside whole-stage codegen and scales as a single
narrow projection over the scan (no shuffle at all: one pass,
column-pruned to ``doc_id``/``text`` + needed metadata).

At 100 TB: these are map-only operators. The plan is
Scan(parquet, ReadSchema=[doc_id,text,...]) → Project — exactly the
shape that saturates IO; any shuffle here would be a bug.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_jobs_spark.operators.hashing import (
    char_shingles,
    hash60,
    norm_text,
    word_tokens,
)

#: BPE-ish pre-tokenizer: letter runs | digit runs | single
#: non-alnum-non-space symbols — the classic GPT-2-style coarse
#: split, portable between Java and RE2 regex dialects.
BPE_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"

#: Language marker lexicons for the n-gram/stopword heuristic.
#: Real deployments swap in full stopword tables; the mechanism
#: (count marker hits per language, argmax with a fixed tiebreak
#: order) is what the operator demonstrates.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "la", "que", "y", "los"),
    "fr": ("le", "les", "est", "et", "une"),
    "zh": ("de", "shi", "le", "bu", "wo"),
}
#: Deterministic argmax order (ties go to the earlier entry).
LANG_ORDER = ("en", "de", "es", "fr", "zh")


def lang_score_sql(tokens_col: str, lang: str, engine: str) -> str:
    """Count of tokens that hit ``lang``'s marker lexicon
    (dialect-portable: same lambda syntax in Spark SQL and DuckDB,
    modulo the list/array function prefix)."""
    markers = ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])
    fn = "filter" if engine == "spark" else "list_filter"
    ln = "size" if engine == "spark" else "len"
    return f"CAST({ln}({fn}({tokens_col}, t -> t IN ({markers}))) AS BIGINT)"


def lang_pick_sql(score_cols: dict[str, str]) -> str:
    """Deterministic argmax cascade over per-language scores —
    dialect-neutral CASE expression."""
    clauses = []
    for i, lang in enumerate(LANG_ORDER):
        others = [
            f"{score_cols[lang]} >= {score_cols[o]}" for o in LANG_ORDER[i + 1 :]
        ]
        cond = " AND ".join(others) if others else "TRUE"
        clauses.append(f"WHEN {cond} THEN '{lang}'")
    return "CASE " + " ".join(clauses) + " END"


def token_stats(docs: DataFrame) -> DataFrame:
    """Per-document token statistics: whitespace tokens, distinct
    tokens, BPE-ish regex tokens, mean token length.

    Map-only; ``array_distinct`` happens per-row (no shuffle), unlike
    a naive explode→groupBy which would shuffle every token.
    """
    n = norm_text("text", "spark")
    toks = word_tokens(n, "spark")
    return docs.select(
        "doc_id",
        F.expr(f"CAST(size({toks}) AS BIGINT)").alias("n_tokens"),
        F.expr(f"CAST(size(array_distinct({toks})) AS BIGINT)").alias(
            "n_distinct_tokens"
        ),
        F.expr(
            f"CAST(size(regexp_extract_all({n}, '{BPE_RE}', 0)) AS BIGINT)"
        ).alias("n_bpe_tokens"),
        F.expr(
            f"round(CAST(length(replace({n}, ' ', '')) AS DOUBLE)"
            f" / size({toks}), 4)"
        ).alias("avg_token_len"),
        F.expr(f"CAST(length({n}) AS BIGINT)").alias("n_chars_norm"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Heuristic language ID: marker-lexicon hit counts per language,
    deterministic argmax. One narrow projection (map-only)."""
    n = norm_text("text", "spark")
    toks = word_tokens(n, "spark")
    scores = {
        lang: lang_score_sql(toks, lang, "spark") for lang in LANG_ORDER
    }
    cols = [F.expr(s).alias(f"score_{lang}") for lang, s in scores.items()]
    pick = lang_pick_sql({lg: f"score_{lg}" for lg in LANG_ORDER})
    return (
        docs.select("doc_id", F.col("lang").alias("declared_lang"), *cols)
        .withColumn("predicted_lang", F.expr(pick))
    )


def quality_score(
    docs: DataFrame, keep: list[str] | None = None
) -> DataFrame:
    """Document quality heuristics: length, punctuation density,
    stopword ratio, mean word length → a composite [0,1] score.

    Mirrors the reference's row-level ``quality_score`` idea
    (1 - null ratio, src/etl_2022.py:216) lifted to corpus text.

    ``keep``: extra input columns carried through the projection.
    Callers that need them must carry them HERE rather than joining
    back on doc_id afterwards: a rejoin-by-id fans out when the id
    is not unique (duplicate-delivered docs) — the round-12
    duplicate-key axis caught quality_top_half doing exactly that.
    """
    n = norm_text("text", "spark")
    toks = word_tokens(n, "spark")
    stop_hits = lang_score_sql(toks, "en", "spark")
    punct = f"CAST(length(regexp_replace({n}, '[a-z0-9 ]', '')) AS DOUBLE)"
    return docs.select(
        "doc_id",
        *(keep or []),
        F.expr(f"CAST(length({n}) AS BIGINT)").alias("n_chars_norm"),
        F.expr(f"round({punct} / greatest(length({n}), 1), 4)").alias(
            "punct_ratio"
        ),
        F.expr(
            f"round(CAST({stop_hits} AS DOUBLE) / size({toks}), 4)"
        ).alias("stopword_ratio"),
        F.expr(
            f"round(CAST(length(replace({n}, ' ', '')) AS DOUBLE)"
            f" / size({toks}), 4)"
        ).alias("avg_word_len"),
        F.expr(
            f"round(least(1.0, CAST(length({n}) AS DOUBLE) / 200)"
            f" * (1.0 - least(1.0, {punct} / greatest(length({n}), 1)))"
            f", 4)"
        ).alias("quality"),
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """Document fingerprints: md5 of the normalized text (exact-dup
    key) + the minimum char-5-gram ``hash60`` (a 1-permutation
    MinHash — the rolling-hash fingerprint a near-dup pass blocks
    on). Map-only."""
    n = norm_text("text", "spark")
    sh = char_shingles(n, "spark")
    min_shingle = (
        f"coalesce(array_min(transform({sh}, s -> {hash60('s', 'spark')})), "
        f"{hash60(n, 'spark')})"
    )
    return docs.select(
        "doc_id",
        F.expr(f"md5({n})").alias("fingerprint"),
        F.expr(f"CAST({min_shingle} AS BIGINT)").alias("min_shingle_hash"),
    )
