"""Corpus-governance query declarations: decontamination,
repetition gating, split assignment, mixture rebalance (see
``operators/governance.py`` for the scale rationale).

Oracles are generated from the same dual-dialect fragment builders
the Spark operators use, so both engines state the identical
computation (hash membership, n-gram units, integer quota
arithmetic, rounding)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_jobs_spark import cache
from etl_jobs_spark.operators import governance as GV
from etl_jobs_spark.operators.hashing import (
    hash60,
    norm_text,
    word_ngrams,
    word_tokens,
)
from etl_jobs_spark.registry import register
from etl_jobs_spark.sources.readers import read_table, spread

_N = norm_text("text", "duckdb")
_TOKS = word_tokens(_N, "duckdb")


@register(
    "decontam_ngram_overlap",
    oracle=f"""
    WITH base AS (
        SELECT doc_id,
               {GV.eval_member_expr("duckdb")} AS is_eval,
               unnest(list_distinct(
                   {word_ngrams(_TOKS, _N, "duckdb", GV.DECONTAM_NGRAM)}
               )) AS gram
        FROM documents
    ),
    hashed AS (
        SELECT doc_id, is_eval, {hash60("gram", "duckdb")} AS gh FROM base
    ),
    train AS (SELECT doc_id, gh FROM hashed WHERE NOT is_eval),
    eval_grams AS (SELECT DISTINCT gh FROM hashed WHERE is_eval),
    totals AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams
        FROM train GROUP BY doc_id
    ),
    matched AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matched
        FROM train WHERE gh IN (SELECT gh FROM eval_grams)
        GROUP BY doc_id
    )
    SELECT t.doc_id, t.n_grams,
           COALESCE(m.n_matched, 0) AS n_matched,
           round(CAST(COALESCE(m.n_matched, 0) AS DOUBLE) / t.n_grams, 4)
               AS overlap_frac
    FROM totals t LEFT JOIN matched m USING (doc_id)
    WHERE round(CAST(COALESCE(m.n_matched, 0) AS DOUBLE) / t.n_grams, 4)
          >= {GV.DECONTAM_THRESHOLD}
    """,
)
def decontam_ngram_overlap(spark, sf_dir):
    """Benchmark decontamination: train docs sharing ≥30% of their
    distinct word-5-grams with the held-out eval set (a deterministic
    ~2% hash slice standing in for a benchmark suite). Gram hashes
    (8 bytes) cross the wire, never text; the eval side broadcasts."""
    return GV.decontam_overlap(read_table(spark, sf_dir, "documents"))


@register(
    "text_repetition_signals",
    # staged subqueries mirror the Spark side's staged columns: each
    # list pipeline (norm -> tokens -> gram arrays) is computed ONCE
    # per row instead of re-expanded at every reference — DuckDB's
    # projections materialize per operator, so this cuts the oracle's
    # own cost ~5x (the driver pays query + oracle per check).
    oracle=f"""
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_words,
           {GV.dup_frac_expr("w2", "duckdb")} AS dup_word2_frac,
           {GV.dup_frac_expr("w3", "duckdb")} AS dup_word3_frac,
           {GV.dup_frac_expr("sents", "duckdb")} AS dup_sent_frac,
           CAST(
             {GV.dup_frac_expr("w3", "duckdb")} > {GV.REP_W3_GATE}
             OR {GV.dup_frac_expr("sents", "duckdb")} > {GV.REP_SENT_GATE}
           AS BIGINT) AS is_repetitive
    FROM (
      SELECT doc_id, toks,
             {word_ngrams("toks", "nrm", "duckdb", 2)} AS w2,
             {word_ngrams("toks", "nrm", "duckdb", 3)} AS w3,
             {GV.sentences_expr("nrm", "duckdb")} AS sents
      FROM (
        SELECT doc_id, nrm, {word_tokens("nrm", "duckdb")} AS toks
        FROM (SELECT doc_id, {norm_text("text", "duckdb")} AS nrm
              FROM documents)))
    """,
)
def text_repetition_signals(spark, sf_dir):
    """Repetition quality signals (the Gopher-rule family): duplicate
    word-2-gram/3-gram/sentence fractions per doc, entirely map-only
    array algebra — no explode, no shuffle."""
    return GV.repetition_signals(read_table(spark, sf_dir, "documents"))


@register(
    "split_train_holdout",
    oracle=f"""
    WITH assigned AS (
        SELECT lang, {GV.split_expr("duckdb")} AS split FROM documents
    ),
    per AS (
        SELECT lang, split, CAST(count(*) AS BIGINT) AS n_docs
        FROM assigned GROUP BY lang, split
    )
    SELECT lang, split, n_docs,
           round(CAST(n_docs AS DOUBLE)
                 / sum(n_docs) OVER (PARTITION BY lang), 4) AS frac_of_lang
    FROM per
    """,
)
def split_train_holdout(spark, sf_dir):
    """Deterministic train/val/test census: 90/5/5 split pinned by
    hash60(doc key) — rerun-, engine- and parallelism-stable, unlike
    rand() splits — reported per language."""
    return GV.split_report(read_table(spark, sf_dir, "documents"))


@register(
    "mix_rebalance_sources",
    oracle=f"""
    WITH stats AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_src,
               {GV.source_weight_expr("duckdb")} AS w
        FROM documents GROUP BY source
    ),
    quota AS (
        SELECT source,
               least(n_src, CAST(floor(
                   CAST(sum(n_src) OVER () AS DOUBLE) * {GV.MIX_BUDGET_BP}
                   / 10000 * w / sum(w) OVER ()) AS BIGINT)) AS keep_n
        FROM stats
    ),
    ranked AS (
        SELECT doc_id, source,
               CAST(row_number() OVER (
                   PARTITION BY source
                   ORDER BY {hash60(GV._doc_key("duckdb", "mix"), "duckdb")},
                            doc_id
               ) AS BIGINT) AS rnk
        FROM documents
    )
    SELECT r.doc_id, r.source
    FROM ranked r JOIN quota q USING (source)
    WHERE r.rnk <= q.keep_n
    """,
)
def mix_rebalance_sources(spark, sf_dir):
    """Target-mixture rebalance: a 55%-of-corpus budget allocated
    across sources by deterministic weights, materialized via
    hash-ranked exact per-source selection (small quota table
    broadcast; one keyed window over the corpus)."""
    return GV.mixture_rebalance(read_table(spark, sf_dir, "documents"))


#: Temperature for mixture flattening (alpha < 1 upweights small
#: sources — the multilingual-sampling trick, e.g. alpha=0.7).
MIX_ALPHA_BP = 7000  # alpha in basis points: 0.7

#: pow() over a transcendental exponent is the one float path whose
#: libm may differ by 1 ULP between engines; quantize its output to a
#: fixed-point grid BEFORE normalizing (the RMS_SCALE /
#: _CENTROID_SCALE pattern) so both sides divide identical integers.
_POW_SCALE = 1_000_000_000


@register(
    "mix_temperature_weights",
    oracle=f"""
    WITH stats AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS n_chars
      FROM documents GROUP BY source),
    t AS (
      SELECT source, n_docs, n_chars,
             floor(pow(CAST(n_chars AS DOUBLE) / sum(n_chars) OVER (),
                       {MIX_ALPHA_BP} / 10000.0) * {_POW_SCALE} + 0.5)
               AS pa_q
      FROM stats)
    SELECT source, n_docs, n_chars,
           round(CAST(n_chars AS DOUBLE)
                 / sum(n_chars) OVER (), 6) AS p_natural,
           round(pa_q / sum(pa_q) OVER (), 6) AS p_temperature
    FROM t
    """,
)
def mix_temperature_weights(spark, sf_dir):
    """Temperature-scaled source mixture: p_i ∝ (share_i)^alpha with
    alpha < 1 — the standard flattening that upweights small sources
    (multilingual/LM sampling practice) without hand-tuned quotas.
    Reports natural vs temperature-scaled sampling probabilities per
    source. Pure two-pass aggregation over a |sources|-row table —
    the corpus-sized stage is one groupBy with map-side partial
    sums."""
    from pyspark.sql import Window

    docs = read_table(spark, sf_dir, "documents")
    stats = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("n_chars"),
    )
    w = Window.partitionBy()
    alpha = MIX_ALPHA_BP / 10000.0
    t = stats.withColumn(
        "pa_q",
        F.floor(
            F.pow(
                F.col("n_chars").cast("double") / F.sum("n_chars").over(w),
                alpha,
            )
            * _POW_SCALE
            + F.lit(0.5)
        ),
    )
    return t.select(
        "source",
        "n_docs",
        "n_chars",
        F.round(
            F.col("n_chars").cast("double") / F.sum("n_chars").over(w), 6
        ).alias("p_natural"),
        F.round(F.col("pa_q") / F.sum("pa_q").over(w), 6).alias(
            "p_temperature"
        ),
    )


#: Global token budget for the allocation planner, as a fraction of
#: the corpus's total BPE tokens (basis points).
TOKEN_BUDGET_BP = 6000


@register(
    "corpus_token_budget",
    oracle=f"""
    WITH per_src AS (
      SELECT source,
             CAST(sum(len(regexp_extract_all(n, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]'))) AS BIGINT)
               AS n_tokens,
             CAST(sum(CAST(length(n) AS BIGINT)) * 100 AS BIGINT)
               // CAST(count(*) AS BIGINT) AS avg_chars_c
      FROM (SELECT source, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS n FROM documents)
      GROUP BY source),
    ranked AS (
      SELECT source, n_tokens, avg_chars_c,
             CAST(sum(n_tokens) OVER (ORDER BY avg_chars_c DESC, source
                                 ROWS UNBOUNDED PRECEDING)
               AS BIGINT) AS cum_tokens,
             CAST(floor(sum(n_tokens) OVER ()
                        * {TOKEN_BUDGET_BP} / 10000.0) AS BIGINT) AS budget
      FROM per_src)
    SELECT source, n_tokens, cum_tokens,
           CAST(least(n_tokens,
                greatest(CAST(0 AS BIGINT),
                         budget - (cum_tokens - n_tokens)))
             AS BIGINT) AS tokens_allocated
    FROM ranked
    """,
)
def corpus_token_budget(spark, sf_dir):
    """Token-budget allocation planner: sources ranked by a quality
    proxy — integer-exact centichars-per-doc,
    ``sum_chars * 100 DIV n_docs`` as BIGINT on BOTH engines so the
    greedy rank can never flip on a cross-engine float-rounding
    quirk (the r4 driver red row) — each granted tokens until the
    global budget (60% of corpus tokens) runs out — greedy
    prefix-sum allocation, the fill-the-training-run shape. One
    corpus aggregation + one |sources|-row running-sum window; the
    plan a 100 TB corpus build runs FIRST to decide what to
    materialize."""
    from pyspark.sql import Window

    from etl_jobs_spark.operators.hashing import norm_text
    from etl_jobs_spark.operators.text import BPE_RE

    docs = read_table(spark, sf_dir, "documents")
    n = norm_text("text", "spark")
    per_src = (
        docs.select("source", F.expr(n).alias("nrm"))
        .groupBy("source")
        .agg(
            F.sum(
                F.expr(f"CAST(size(regexp_extract_all(nrm, '{BPE_RE}', 0)) AS BIGINT)")
            ).alias("n_tokens"),
            F.expr(
                "CAST(sum(CAST(length(nrm) AS BIGINT)) * 100L"
                " DIV count(*) AS BIGINT)"
            ).alias("avg_chars_c"),
        )
    )
    w_rank = (
        Window.partitionBy()
        .orderBy(F.col("avg_chars_c").desc(), F.col("source"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy()
    ranked = per_src.select(
        "source",
        "n_tokens",
        F.sum("n_tokens").over(w_rank).alias("cum_tokens"),
        F.floor(
            F.sum("n_tokens").over(w_all) * F.lit(TOKEN_BUDGET_BP / 10000.0)
        ).cast("bigint").alias("budget"),
    )
    return ranked.select(
        "source",
        "n_tokens",
        "cum_tokens",
        F.expr(
            "CAST(least(n_tokens, greatest(CAST(0 AS BIGINT),"
            " budget - (cum_tokens - n_tokens))) AS BIGINT)"
        ).alias("tokens_allocated"),
    )


def _llm_pipeline_oracle() -> str:
    from etl_jobs_spark.operators.training import pii_input_expr, scrub_expr

    n = norm_text("text", "duckdb")
    grams5 = word_ngrams("toks", "nrm", "duckdb", GV.DECONTAM_NGRAM)
    return f"""
    WITH scrubbed AS (
      SELECT doc_id, lang,
             {scrub_expr(pii_input_expr("duckdb"), "duckdb")} AS text
      FROM documents),
    staged AS (
      SELECT doc_id, lang, {GV.eval_member_expr("duckdb")} AS is_eval,
             {n} AS nrm
      FROM scrubbed),
    tk AS (SELECT doc_id, lang, is_eval, nrm,
                  {word_tokens("nrm", "duckdb")} AS toks FROM staged),
    grams AS (
      SELECT doc_id, is_eval, {hash60("gram", "duckdb")} AS gh FROM (
        SELECT doc_id, is_eval,
               unnest(list_distinct({grams5})) AS gram
        FROM tk)),
    eval_grams AS (SELECT DISTINCT gh FROM grams WHERE is_eval),
    contaminated AS (
      SELECT doc_id FROM (
        SELECT doc_id,
               CAST(count(*) FILTER (WHERE gh IN (SELECT gh FROM eval_grams))
                    AS DOUBLE) / count(*) AS frac
        FROM grams WHERE NOT is_eval GROUP BY doc_id)
      WHERE round(frac, 4) >= {GV.DECONTAM_THRESHOLD}),
    keep1 AS (
      SELECT doc_id, lang, nrm, toks FROM tk
      WHERE NOT is_eval AND doc_id NOT IN (SELECT doc_id FROM contaminated)),
    gated AS (
      SELECT doc_id, lang, nrm FROM (
        SELECT doc_id, lang, nrm,
               {GV.dup_frac_expr("w3", "duckdb")} AS d3,
               {GV.dup_frac_expr("sents", "duckdb")} AS ds
        FROM (SELECT doc_id, lang, nrm,
                     {word_ngrams("toks", "nrm", "duckdb", 3)} AS w3,
                     {GV.sentences_expr("nrm", "duckdb")} AS sents
              FROM keep1))
      WHERE NOT (d3 > {GV.REP_W3_GATE} OR ds > {GV.REP_SENT_GATE})),
    keepers AS (
      SELECT min(doc_id) AS doc_id FROM gated GROUP BY md5(nrm)),
    survivors AS (
      SELECT g.doc_id, g.lang, g.nrm FROM gated g
      JOIN keepers k ON g.doc_id = k.doc_id)
    SELECT {GV.split_expr("duckdb")} AS split, lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(length(nrm)) AS BIGINT) AS total_chars
    FROM survivors GROUP BY 1, lang
    """


@register(
    "pipeline_llm_corpus_end_to_end", oracle=_llm_pipeline_oracle()
)
def pipeline_llm_corpus_end_to_end(spark, sf_dir):
    """The LLM-era flagship composition — the whole corpus build as
    ONE declarative plan (the 2025 counterpart of
    pipeline_2022_end_to_end): PII scrub → benchmark decontamination
    (eval hash-slice held out, contaminated train docs dropped) →
    Gopher repetition gate → exact dedup (keep-first survivor per
    content hash) → deterministic train/val/test split census.

    Every stage is the registered operator's own fragments, so the
    composed oracle is stage-for-stage identical SQL. Plan shape at
    100 TB: two corpus-sized map stages (scrub+normalize, gram
    explode), one gram equi-join against the eval set, one content-
    hash aggregation, one census aggregation — no stage is
    quadratic, nothing collects. The three fan-out boundaries
    (``scrubbed`` → decontam + keep1, ``keep1`` → repetition gate +
    normalize, ``normed`` → survivor pick + survivor join) are
    persisted via ``cache.track`` — each is consumed by two plan
    branches, and without the persist Spark re-derives the regex
    scrub / normalize chain once per branch (~4 corpus-sized
    re-reads of the most expensive map stages at 100 TB; on a real
    cluster the same boundaries would be ``localCheckpoint`` or a
    staged parquet write)."""
    from etl_jobs_spark.operators.training import pii_input_expr, scrub_expr

    docs = spread(read_table(spark, sf_dir, "documents"))
    scrubbed = cache.track(docs.select(
        "doc_id",
        "lang",
        F.expr(scrub_expr(pii_input_expr("spark"), "spark")).alias("text"),
    ))
    contaminated = GV.decontam_overlap(scrubbed).select("doc_id")
    keep1 = cache.track(
        scrubbed.filter(~F.expr(GV.eval_member_expr("spark")))
        .join(contaminated, "doc_id", "left_anti")
    )
    # ROW-FAITHFUL gate: carry (lang, text) through the repetition
    # signals and filter in place — joining gated doc_ids back onto
    # keep1 fans out under duplicate-delivered doc ids (round-12
    # duplicate-key axis) and cost an extra keyed shuffle; the
    # oracle's gated CTE was always per-row.
    gated = (
        GV.repetition_signals(keep1, keep=["lang", "text"])
        .filter(F.col("is_repetitive") == 0)
        .select("doc_id", "lang", "text")
    )
    normed = cache.track(gated.select(
        "doc_id", "lang", F.expr(norm_text("text", "spark")).alias("nrm")
    ))
    keepers = normed.groupBy(F.expr("md5(nrm)").alias("ch")).agg(
        F.min("doc_id").alias("doc_id")
    ).select("doc_id")
    survivors = normed.join(keepers, "doc_id")
    return survivors.select(
        F.expr(GV.split_expr("spark")).alias("split"),
        "lang",
        F.expr("CAST(length(nrm) AS BIGINT)").alias("nc"),
    ).groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("nc").alias("total_chars"),
    )


@register(
    "mix_epoch_plan",
    oracle=f"""
    WITH per_src AS (
      SELECT source,
             CAST(sum(len(regexp_extract_all(n, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]'))) AS BIGINT)
               AS n_tokens
      FROM (SELECT source, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS n
            FROM documents)
      GROUP BY source),
    t AS (
      SELECT source, n_tokens,
             floor(pow(CAST(n_tokens AS DOUBLE) / sum(n_tokens) OVER (),
                       {MIX_ALPHA_BP} / 10000.0) * {_POW_SCALE} + 0.5)
               AS pa_q,
             CAST(floor(sum(n_tokens) OVER ()
                        * {TOKEN_BUDGET_BP} / 10000.0) AS BIGINT) AS budget
      FROM per_src)
    SELECT source, n_tokens,
           CAST(floor(budget * pa_q / sum(pa_q) OVER ()) AS BIGINT)
             AS target_tokens,
           CAST(floor(floor(budget * pa_q / sum(pa_q) OVER ())
                      * 1000.0 / n_tokens + 0.5) AS BIGINT) AS epochs_milli
    FROM t
    """,
)
def mix_epoch_plan(spark, sf_dir):
    """The data-recipe artifact a training run actually consumes:
    per-source token targets and repeat-epochs under a global token
    budget with temperature-flattened shares (alpha=0.7). Composes
    the temperature mixture with the budget: target_i = budget *
    p_temp_i, epochs_i = target_i / tokens_i — sources smaller than
    their flattened share repeat (epochs > 1.0), oversized sources
    subsample (epochs < 1.0). The pow() output is quantized to a
    fixed-point grid before normalizing (the cross-engine float
    discipline mix_temperature_weights established); everything after
    is IEEE-exact integer/division arithmetic. One corpus-sized
    groupBy; the planning math runs on a |sources|-row table."""
    from pyspark.sql import Window

    from etl_jobs_spark.operators.hashing import norm_text
    from etl_jobs_spark.operators.text import BPE_RE

    docs = read_table(spark, sf_dir, "documents")
    per_src = (
        docs.select(
            "source", F.expr(norm_text("text", "spark")).alias("nrm")
        )
        .select(
            "source",
            F.expr(
                f"CAST(size(regexp_extract_all(nrm, '{BPE_RE}', 0)) AS BIGINT)"
            ).alias("tok"),
        )
        .groupBy("source")
        .agg(F.sum("tok").alias("n_tokens"))
    )
    w = Window.partitionBy()
    alpha = MIX_ALPHA_BP / 10000.0
    t = per_src.withColumn(
        "pa_q",
        F.floor(
            F.pow(
                F.col("n_tokens").cast("double") / F.sum("n_tokens").over(w),
                alpha,
            )
            * _POW_SCALE
            + F.lit(0.5)
        ),
    ).withColumn(
        "budget",
        F.expr(
            f"CAST(floor(sum(n_tokens) OVER ()"
            f" * {TOKEN_BUDGET_BP} / 10000.0) AS BIGINT)"
        ),
    )
    target = F.floor(
        F.col("budget") * F.col("pa_q") / F.sum("pa_q").over(w)
    ).cast("long")
    return t.select(
        "source",
        "n_tokens",
        target.alias("target_tokens"),
        F.floor(target * 1000.0 / F.col("n_tokens") + F.lit(0.5))
        .cast("long")
        .alias("epochs_milli"),
    )


@register(
    "curriculum_phase_plan",
    oracle="""
    WITH ranked AS (
      SELECT lang, n_chars, doc_id,
             ntile(3) OVER (ORDER BY n_chars, doc_id) AS phase
      FROM documents)
    SELECT phase,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(sum(n_chars) // 4 AS BIGINT) AS est_tokens,
           CAST(min(n_chars) AS BIGINT) AS min_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
    FROM ranked GROUP BY phase
    """,
)
def curriculum_phase_plan(spark, sf_dir):
    """Curriculum-learning phase plan: the corpus split into three
    equal-population difficulty tiers (ntile over an integer
    difficulty proxy — document length, tiebroken by doc id, so the
    tile boundaries are bit-deterministic), with per-phase doc/char/
    token budgets — the schedule artifact an easy-to-hard training
    run consumes alongside mix_epoch_plan's source recipe. Scale
    note: the exact tiles are computed as a PARALLEL
    range-partitioned ranking (with_global_position +
    ntile_from_position — bit-identical to the window ntile, so the
    oracle still hash-matches) instead of the former unpartitioned
    ntile window, which was a single-partition sort of the whole
    corpus at the limit (VERDICT r15 item 2)."""
    from etl_jobs_spark.operators.relational import (
        ntile_from_position,
        with_global_position,
    )

    docs = read_table(spark, sf_dir, "documents")
    pos = with_global_position(
        docs,
        [F.col("n_chars").asc(), F.col("doc_id").asc()],
        out="_p",
        total="_n",
    )
    ranked = pos.withColumn(
        "phase", ntile_from_position("_p", "_n", 3).cast("int")
    )
    return ranked.groupBy("phase").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.expr("CAST(sum(n_chars) DIV 4 AS BIGINT)").alias("est_tokens"),
        F.min("n_chars").cast("bigint").alias("min_chars"),
        F.max("n_chars").cast("bigint").alias("max_chars"),
        F.countDistinct("lang").alias("n_langs"),
    )


@register(
    "corpus_quality_threshold_sweep",
    oracle="""
    WITH scored AS (
      SELECT least(n_chars // 200, 9) AS q_bucket,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) // 4 AS BIGINT) AS tokens
      FROM documents GROUP BY 1),
    tot AS (SELECT CAST(sum(tokens) AS BIGINT) AS all_tokens FROM scored),
    sweep AS (
      SELECT q_bucket AS threshold,
             CAST(sum(n_docs) OVER (ORDER BY q_bucket DESC
                                    ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS n_docs_kept,
             CAST(sum(tokens) OVER (ORDER BY q_bucket DESC
                                    ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS tokens_kept
      FROM scored)
    SELECT s.threshold, s.n_docs_kept, s.tokens_kept,
           CAST(s.tokens_kept * 1000 // t.all_tokens AS BIGINT)
             AS token_share_millis
    FROM sweep s, tot t
    """,
)
def corpus_quality_threshold_sweep(spark, sf_dir):
    """Quality-threshold ABLATION sweep — the planning table a
    corpus curator reads before picking a cut: for every candidate
    quality threshold (10 integer buckets over the length proxy),
    the docs and training tokens that SURVIVE a keep-if-at-least-
    this-good gate, cumulated from strictest to loosest, with each
    cut's share of the total token budget in exact per-mille. One
    tiny aggregation (10 rows) plus a prefix-sum window ordered by
    the INTEGER bucket (descending — strictest first), so the sweep
    costs one pass at any corpus size and the driver hash pins the
    entire ablation curve. Pairs with corpus_token_budget (which
    allocates within a chosen cut) and quality_filter_top_half
    (which materializes one)."""
    from pyspark.sql import Window as W

    docs = read_table(spark, sf_dir, "documents")
    scored = docs.groupBy(
        F.least(F.expr("n_chars DIV 200"), F.lit(9)).alias("q_bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.expr("CAST(sum(n_chars) DIV 4 AS BIGINT)").alias("tokens"),
    )
    tot = scored.agg(F.sum("tokens").cast("bigint").alias("all_tokens"))
    # row bound (r16 audit): scored is one row per quality bucket
    # (least(n_chars DIV 200, 9) -> at most 10 rows)
    w = W.orderBy(F.desc("q_bucket")).rowsBetween(
        W.unboundedPreceding, 0
    )
    sweep = scored.select(
        F.col("q_bucket").alias("threshold"),
        F.sum("n_docs").over(w).cast("bigint").alias("n_docs_kept"),
        F.sum("tokens").over(w).cast("bigint").alias("tokens_kept"),
    )
    return sweep.crossJoin(F.broadcast(tot)).select(
        "threshold",
        "n_docs_kept",
        "tokens_kept",
        F.expr(
            "CAST(tokens_kept * 1000 DIV all_tokens AS BIGINT)"
        ).alias("token_share_millis"),
    )


#: Benchmark slice for substring decontamination: the lowest doc_ids
#: stand in for the held-out eval set.
_DECONTAM_EVAL_MAX = 50


def _decontam_substring_oracle() -> str:
    from etl_jobs_spark.queries.dedup import _substring_spans_oracle

    spans = _substring_spans_oracle(
        f"SELECT doc_id, {norm_text('text', 'duckdb')} AS n FROM documents"
    )
    return f"""
    WITH hits AS ({spans})
    SELECT doc_b AS train_doc,
           CAST(count(DISTINCT doc_a) AS BIGINT) AS n_eval_docs,
           CAST(count(*) AS BIGINT) AS n_spans,
           CAST(max(span_len) AS BIGINT) AS max_span_len,
           CAST(sum(span_len) AS BIGINT) AS total_span_chars
    FROM hits
    WHERE doc_a < {_DECONTAM_EVAL_MAX} AND doc_b >= {_DECONTAM_EVAL_MAX}
    GROUP BY doc_b
    """


@register("decontam_substring_hits", oracle=_decontam_substring_oracle())
def decontam_substring_hits(spark, sf_dir):
    """SUBSTRING decontamination — the long-verbatim-overlap check
    run against a held-out benchmark before training (n-gram-overlap
    decontam, decontam_ngram_overlap, misses long spans diluted
    across a big doc; this catches any >= 40-char verbatim carry).
    The eval set is the lowest-id slice of documents; every training
    doc sharing a long span with ANY eval doc is reported with its
    hit census (distinct eval docs, span count, longest and total
    carried chars) — the kill-list a corpus build subtracts. Engine
    (VERDICT r7 item 3): the DECONTAM-SHAPED span plan
    (operators/dedup.py::substring_spans_decontam) — the tiny eval
    slice's distinct gram set broadcasts and semi-join-filters the
    train-side gram stream MAP-SIDE right after the explode, so
    nothing corpus-sized ever shuffles; stop-gram frequencies stay
    exact full-corpus values (every occurrence of each surviving
    gram is kept), making the result bit-identical to the general
    two-sided operator + pair filter, which the oracle still is."""
    docs = read_table(spark, sf_dir, "documents")
    from etl_jobs_spark.operators import dedup as DD

    corpus = docs.select(
        "doc_id", F.expr(norm_text("text", "spark")).alias("n")
    )
    hits = DD.substring_spans_decontam(corpus, _DECONTAM_EVAL_MAX)
    return hits.groupBy(F.col("doc_b").alias("train_doc")).agg(
        F.countDistinct("doc_a").cast("long").alias("n_eval_docs"),
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.max("span_len").cast("long").alias("max_span_len"),
        F.sum("span_len").cast("long").alias("total_span_chars"),
    )
