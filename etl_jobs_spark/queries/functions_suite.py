"""Scalar-function surface suites (SURVEY §2.7 breadth).

One query per function family, each exercising a batch of built-in
scalar functions in a single narrow projection with a DuckDB oracle
— proving the engine's function surface is not just present but
semantically identical cross-engine (names differ per dialect;
values must not). All map-only: these fuse into the scan under
whole-stage codegen, the right shape for expression-heavy ETL at
any scale.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_jobs_spark.registry import register
from etl_jobs_spark.sources.readers import read_table


@register(
    "fn_string_suite",
    oracle="""
    SELECT c_custkey,
           upper(c_name)                          AS up,
           lower(c_mktsegment)                    AS lo,
           CAST(length(c_name) AS BIGINT)         AS len,
           reverse(c_mktsegment)                  AS rev,
           substr(c_name, 10, 9)                  AS sub,
           replace(c_name, 'Customer#', 'C-')     AS repl,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
           concat(c_mktsegment, ':', CAST(c_custkey AS VARCHAR)) AS joined,
           CAST(strpos(c_name, '#') AS BIGINT)    AS hash_at,
           split_part(c_name, '#', 2)             AS after_hash,
           translate(c_mktsegment, 'AEIOU', 'aeiou') AS tr,
           repeat(left(c_mktsegment, 2), 2)       AS rep2,
           trim(concat('  ', c_mktsegment, '  ')) AS trimmed
    FROM customer
    """,
)
def fn_string_suite(spark, sf_dir):
    """String-function suite: 14 built-ins in one fused projection —
    upper/lower/length/reverse/substr/replace/lpad/concat/instr/
    split_part/translate/repeat/left/trim. Dialect note: Spark
    ``instr`` ≡ DuckDB ``strpos`` (1-based, 0 when absent)."""
    c = read_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("up"),
        F.lower("c_mktsegment").alias("lo"),
        F.length("c_name").cast("long").alias("len"),
        F.reverse("c_mktsegment").alias("rev"),
        F.substring("c_name", 10, 9).alias("sub"),
        F.expr("replace(c_name, 'Customer#', 'C-')").alias("repl"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded"),
        F.concat_ws(":", "c_mktsegment", F.col("c_custkey").cast("string")).alias(
            "joined"
        ),
        F.expr("CAST(instr(c_name, '#') AS BIGINT)").alias("hash_at"),
        F.expr("split_part(c_name, '#', 2)").alias("after_hash"),
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias("tr"),
        F.expr("repeat(left(c_mktsegment, 2), 2)").alias("rep2"),
        F.trim(F.concat(F.lit("  "), F.col("c_mktsegment"), F.lit("  "))).alias(
            "trimmed"
        ),
    )


@register(
    "fn_datetime_suite",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT)   AS yr,
           CAST(month(o_orderdate) AS BIGINT)  AS mth,
           CAST(day(o_orderdate) AS BIGINT)    AS dom,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP_NS) AS month_start,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR)   AS month_end,
           CAST(date_diff('day', DATE '1995-01-01',
                          CAST(o_orderdate AS DATE)) AS BIGINT)   AS days_since,
           strftime(o_orderdate, '%Y-%m')      AS ym,
           CAST(quarter(o_orderdate) AS BIGINT) AS qtr
    FROM orders
    """,
)
def fn_datetime_suite(spark, sf_dir):
    """Datetime-function suite: year/month/day/quarter extraction,
    month truncation, last_day, day arithmetic against an epoch
    date, and formatting — one fused projection. Dialect note:
    Spark ``datediff(end, start)`` ≡ DuckDB
    ``date_diff('day', start, end)``; Spark ``date_format`` ≡
    DuckDB ``strftime``."""
    o = read_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mth"),
        F.dayofmonth("o_orderdate").cast("long").alias("dom"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.last_day("o_orderdate").cast("string").alias("month_end"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        F.quarter("o_orderdate").cast("long").alias("qtr"),
    )


@register(
    "join_full_outer",
    oracle="""
    SELECT coalesce(c.c_custkey, o.o_custkey) AS custkey,
           CAST(count(o.o_orderkey) AS BIGINT) AS n_orders,
           CASE WHEN c.c_custkey IS NULL THEN 'order_only'
                WHEN count(o.o_orderkey) = 0 THEN 'customer_only'
                ELSE 'matched' END AS side
    FROM customer c FULL OUTER JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, o.o_custkey
    """,
)
def join_full_outer(spark, sf_dir):
    """Full-outer reconciliation: customers without orders AND
    orders without customers survive with the missing side null —
    the data-reconciliation join (source-vs-sink audits). At scale a
    full-outer is one co-partitioned shuffle on the key, same cost
    class as inner."""
    c = read_table(spark, sf_dir, "customer").select("c_custkey")
    o = read_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    j = c.join(o, c.c_custkey == o.o_custkey, "full_outer")
    return j.groupBy("c_custkey", "o_custkey").agg(
        F.count("o_orderkey").alias("n_orders")
    ).select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        "n_orders",
        F.when(F.col("c_custkey").isNull(), "order_only")
        .when(F.col("n_orders") == 0, "customer_only")
        .otherwise("matched")
        .alias("side"),
    )


@register(
    "fn_window_suite",
    oracle="""
    SELECT event_id, event_type,
           CAST(rank()       OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk,
           round(percent_rank() OVER w, 6)     AS prnk,
           round(cume_dist()    OVER w, 6)     AS cdist,
           lag(event_id)  OVER w               AS prev_id,
           lead(event_id) OVER w               AS next_id,
           first_value(event_id) OVER w        AS first_id,
           CAST(ntile(10) OVER w AS BIGINT)    AS decile
    FROM events
    WINDOW w AS (PARTITION BY event_type
                 ORDER BY value ASC NULLS FIRST, event_id ASC)
    """,
)
def fn_window_suite(spark, sf_dir):
    """Window-function family in one pass over one window spec:
    rank/dense_rank/percent_rank/cume_dist/lag/lead/first_value/
    ntile — all share the (event_type, value, event_id) total order,
    so Spark evaluates them in a single sort per partition.
    percent_rank and cume_dist are exact rationals (k/n) — identical
    doubles cross-engine; rounding is belt-and-braces. Null ordering
    is EXPLICIT (NULLS FIRST both engines): Spark's ASC default and
    DuckDB's differ, which silently permutes every rank on a
    nullable key (null-injection differential, round 10)."""
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").asc_nulls_first(), F.col("event_id").asc()
    )
    return ev.select(
        "event_id",
        "event_type",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("prnk"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.lag("event_id").over(w).alias("prev_id"),
        F.lead("event_id").over(w).alias("next_id"),
        F.first("event_id").over(w).alias("first_id"),
        F.ntile(10).over(w).cast("long").alias("decile"),
    )


@register(
    "fn_array_suite",
    oracle="""
    SELECT doc_id,
           CAST(len(toks) AS BIGINT)                    AS n,
           CAST(len(list_distinct(toks)) AS BIGINT)     AS n_distinct,
           list_sort(list_distinct(toks))[1]            AS first_sorted,
           CAST(list_contains(toks, 'the') AS BOOLEAN)  AS has_the,
           toks[1]                                      AS head,
           toks[-1]                                     AS last,
           array_to_string(list_slice(list_sort(list_distinct(toks)), 1, 3),
                           '|')                         AS top3_sorted
    FROM (SELECT doc_id,
                 string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                              ' ') AS toks
          FROM documents)
    """,
)
def fn_array_suite(spark, sf_dir):
    """Array-function family over the token list: size/distinct/
    sort/contains/head/last/slice/join — per-row array algebra (no
    explode, no shuffle; the map-only shape array-heavy schemas
    need). Dialect note: Spark ``element_at(a, -1)`` ≡ DuckDB
    ``a[-1]``; Spark ``slice``/``array_join`` ≡ DuckDB
    ``list_slice``/``array_to_string``."""
    from etl_jobs_spark.operators.hashing import norm_text, word_tokens

    toks = word_tokens(norm_text("text", "spark"), "spark")
    d = read_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.expr(f"CAST(size({toks}) AS BIGINT)").alias("n"),
        F.expr(f"CAST(size(array_distinct({toks})) AS BIGINT)").alias("n_distinct"),
        F.expr(f"sort_array(array_distinct({toks}))[0]").alias("first_sorted"),
        F.expr(f"array_contains({toks}, 'the')").alias("has_the"),
        F.expr(f"({toks})[0]").alias("head"),
        F.expr(f"element_at({toks}, -1)").alias("last"),
        F.expr(
            f"array_join(slice(sort_array(array_distinct({toks})), 1, 3), '|')"
        ).alias("top3_sorted"),
    )


@register(
    "fn_percentile_suite",
    oracle="""
    -- vq: NaN payloads excluded from the rank set EXPLICITLY (the
    -- quantile-over-real-numbers contract; DuckDB's quantile_cont
    -- ranks a parquet NaN as the largest value — round-11 extremes
    -- axis)
    WITH vq AS (
      SELECT event_type,
             CASE WHEN NOT isnan(value) THEN value END AS v
      FROM events)
    SELECT event_type,
           CAST(count(*) AS BIGINT)           AS n,
           round(quantile_cont(v, 0.25), 4)   AS p25,
           round(median(v), 4)                AS med,
           round(quantile_cont(v, 0.90), 4)   AS p90,
           round(quantile_cont(v, 0.99), 4)   AS p99
    FROM vq GROUP BY event_type
    """,
)
def fn_percentile_suite(spark, sf_dir):
    """Exact-percentile family per group: p25/median/p90/p99 with
    linear interpolation — Spark ``percentile()`` ≡ DuckDB
    ``quantile_cont`` (both sort-based exact; the approx variant for
    100 TB is covered by ``agg_approx_sketches``)."""
    ev = read_table(spark, sf_dir, "events")
    # NaN payloads are excluded from the rank set: DuckDB's
    # quantile_cont drops NaN while Spark's percentile ranks it as
    # the largest value — the suite pins the quantile-over-real-
    # numbers contract (round-11 extremes axis)
    v = "CASE WHEN NOT isnan(value) THEN value END"
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.expr(f"percentile({v}, 0.25)"), 4).alias("p25"),
        F.round(F.expr(f"percentile({v}, 0.50)"), 4).alias("med"),
        F.round(F.expr(f"percentile({v}, 0.90)"), 4).alias("p90"),
        F.round(F.expr(f"percentile({v}, 0.99)"), 4).alias("p99"),
    )


@register(
    "fn_variant_json",
    oracle="""
    SELECT event_type,
           CAST(count(*) FILTER (WHERE CAST(json_extract(props, '$.k')
                                       AS BIGINT) IS NOT NULL)
                AS BIGINT) AS n_with_k,
           CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           CAST(max(CAST(json_extract(props, '$.k') AS BIGINT))
                AS BIGINT) AS max_k
    FROM events GROUP BY event_type
    """,
)
def fn_variant_json(spark, sf_dir):
    """Semi-structured props via the VARIANT type (Spark 4):
    parse_json once into the binary variant encoding, then typed
    variant_get path extraction — at 100 TB this beats repeated
    get_json_object string re-parsing because the variant parses the
    JSON ONCE per row into a navigable binary form (and parquet can
    store the variant column, shredding paths into columnar form).
    Aggregates the extracted field per event type; the oracle states
    the same computation over DuckDB's JSON extraction."""
    ev = read_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type", F.parse_json("props").alias("v")
    ).select(
        "event_type",
        F.expr("try_variant_get(v, '$.k', 'bigint')").alias("k"),
    )
    return v.groupBy("event_type").agg(
        F.count("k").alias("n_with_k"),
        F.sum("k").alias("sum_k"),
        F.max("k").alias("max_k"),
    )


@register(
    "fn_collation_suite",
    oracle="""
    SELECT lower(seg) AS segment,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT seg_mixed) AS BIGINT) AS n_case_variants
    FROM (
      SELECT c_mktsegment AS seg,
             CASE WHEN c_custkey % 2 = 0 THEN lower(c_mktsegment)
                  ELSE c_mktsegment END AS seg_mixed
      FROM customer)
    GROUP BY lower(seg)
    """,
)
def fn_collation_suite(spark, sf_dir):
    """String collations (Spark 4): grouping under UTF8_LCASE treats
    case variants as one key — collation-aware comparison as a TYPE
    property instead of lower() sprinkled through every predicate
    (wrong-case data keeps its original form; only comparison
    changes). A deterministically mixed-case segment column groups
    to the same counts the lower()-normalized oracle computes, while
    count(DISTINCT) over the BINARY collation still sees both case
    variants."""
    cust = read_table(spark, sf_dir, "customer")
    mixed = cust.select(
        F.expr(
            "CASE WHEN c_custkey % 2 = 0 THEN lower(c_mktsegment)"
            " ELSE c_mktsegment END"
        ).alias("seg_mixed")
    )
    return (
        mixed.select(
            F.expr("seg_mixed COLLATE UTF8_LCASE").alias("seg_ci"),
            "seg_mixed",
        )
        .groupBy("seg_ci")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("seg_mixed").alias("n_case_variants"),
        )
        .select(
            F.expr("CAST(lower(seg_ci) AS STRING COLLATE UTF8_BINARY)").alias(
                "segment"
            ),
            "n",
            "n_case_variants",
        )
    )


def _lambda_oracle() -> str:
    from etl_jobs_spark.operators.hashing import norm_text, word_tokens

    n = norm_text("text", "duckdb")
    toks = word_tokens("n", "duckdb")
    return f"""
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_toks,
           CAST(len(list_filter(toks, t -> length(t) > 5)) AS BIGINT)
               AS n_long,
           (len(list_filter(toks, t -> t = 'the')) > 0) AS has_the,
           CAST(list_sum(list_transform(toks, t -> length(t))) AS BIGINT)
               AS total_chars,
           CAST(list_sum(list_transform(toks,
                t -> CASE WHEN length(t) >= 4 THEN length(t) ELSE 0 END))
               AS BIGINT) AS long_chars
    FROM (SELECT doc_id, {toks} AS toks
          FROM (SELECT doc_id, {n} AS n FROM documents))
    """


@register("fn_lambda_suite", oracle=_lambda_oracle())
def fn_lambda_suite(spark, sf_dir):
    """Higher-order (lambda) function family over the token array in
    ONE fused projection: transform / filter / exists / aggregate
    fold — Spark's array lambdas ≡ DuckDB's list lambdas. These are
    the 100 TB substitute for exploding nested data: every lambda
    evaluates inside whole-stage codegen on the row's own array, so
    a 5-metric token profile costs one map pass with NO explode
    shuffle and no row multiplication (compare text_token_stats,
    which explodes when the downstream needs per-token rows)."""
    from etl_jobs_spark.operators.hashing import norm_text, word_tokens

    n = norm_text("text", "spark")
    toks = word_tokens(n, "spark")
    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.expr(f"size({toks})").cast("long").alias("n_toks"),
        F.expr(f"size(filter({toks}, t -> length(t) > 5))")
        .cast("long")
        .alias("n_long"),
        F.expr(f"exists({toks}, t -> t = 'the')").alias("has_the"),
        F.expr(
            f"aggregate(transform({toks}, t -> length(t)), 0, (a, x) -> a + x)"
        )
        .cast("long")
        .alias("total_chars"),
        F.expr(
            f"aggregate(transform({toks}, "
            f"t -> CASE WHEN length(t) >= 4 THEN length(t) ELSE 0 END), "
            f"0, (a, x) -> a + x)"
        )
        .cast("long")
        .alias("long_chars"),
    )


@register(
    "fn_bitwise_suite",
    oracle="""
    SELECT event_type,
           bit_and(user_id & 1023)            AS and_mask,
           bit_or(user_id & 1023)             AS or_mask,
           bit_xor(event_id)                  AS xor_ids,
           CAST(sum(bit_count(event_id)) AS BIGINT) AS popcount_sum,
           max((event_id % 1048576) << 8)     AS max_shl,
           min(event_id >> 4)                 AS min_shr
    FROM events GROUP BY event_type
    """,
)
def fn_bitwise_suite(spark, sf_dir):
    """Bitwise-function family: scalar ops (&, |, shifts, popcount)
    fused into the scan projection plus the three bitwise AGGREGATES
    (bit_and / bit_or / bit_xor) per group — the primitives behind
    bitmap indexes, permission masks, and the engine's own bitmap
    distinct-count and XOR content-fingerprint operators
    (agg_bitmap_distinct, maintenance_compact_report). All integer
    arithmetic — bit-identical across engines by construction — and
    map-side combinable: each aggregate carries an 8-byte state, so
    the shuffle is one row per (type, partition) at any scale."""
    ev = read_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.expr("bit_and(user_id & 1023)").alias("and_mask"),
        F.expr("bit_or(user_id & 1023)").alias("or_mask"),
        F.expr("bit_xor(event_id)").alias("xor_ids"),
        F.expr("sum(bit_count(event_id))").alias("popcount_sum"),
        F.expr("max(shiftleft(event_id % 1048576, 8))").alias("max_shl"),
        F.expr("min(shiftright(event_id, 4))").alias("min_shr"),
    )


@register(
    "fn_map_suite",
    oracle="""
    SELECT c_custkey,
           2 AS m_size,
           c_mktsegment AS seg_from_map,
           CAST(c_nationkey AS BIGINT) AS nation_from_map,
           TRUE AS has_seg,
           FALSE AS has_missing,
           3 AS size_after_concat,
           'nation,segment' AS sorted_keys
    FROM customer
    """,
)
def fn_map_suite(spark, sf_dir):
    """MAP-type function family: build a map column with
    ``create_map``, read it back with ``element_at`` /
    ``map_contains_key``, extend it with ``map_concat``, and
    enumerate it with ``map_keys`` + ``array_sort`` — the
    semi-structured per-row key-value shape (feature bags, tag sets)
    exercised end to end. The oracle states every extracted value
    DIRECTLY from the source columns, so a wrong lookup, a dropped
    entry, or a concat that clobbers a key breaks the hash — the map
    machinery must be a faithful round trip. Map ops are per-row
    expression work (map-only, fused into the scan); keys enumerate
    in insertion order, so the suite pins order-independent
    properties (sorted keys, size) — the discipline map-typed
    pipelines need at any scale."""
    cust = read_table(spark, sf_dir, "customer")
    m = F.create_map(
        F.lit("segment"),
        F.col("c_mktsegment"),
        F.lit("nation"),
        F.col("c_nationkey").cast("string"),
    )
    mc = F.map_concat(
        m, F.create_map(F.lit("bal_band"), F.lit("x"))
    )
    return cust.select(
        "c_custkey",
        F.size(m).alias("m_size"),
        F.element_at(m, "segment").alias("seg_from_map"),
        F.element_at(m, "nation").cast("bigint").alias("nation_from_map"),
        F.map_contains_key(m, "segment").alias("has_seg"),
        F.map_contains_key(m, "missing").alias("has_missing"),
        F.size(mc).alias("size_after_concat"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias(
            "sorted_keys"
        ),
    )


@register(
    "fn_regex_suite",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(lower(text), '[aeiou]+'))
                AS BIGINT) AS n_vowel_runs,
           CAST(len(regexp_extract_all(lower(text), '[a-z]+'))
                AS BIGINT) AS n_alpha_words,
           regexp_extract(lower(text), '([a-z]{4,})', 1) AS first_long_word,
           regexp_matches(text, '^[A-Z]') AS starts_upper,
           CAST(length(regexp_replace(lower(text), '[aeiou]', '', 'g'))
                AS BIGINT) AS consonant_len
    FROM documents
    """,
)
def fn_regex_suite(spark, sf_dir):
    """Regex-function family in ONE fused projection: global match
    counting (regexp_count), full-match extraction
    (regexp_extract_all), group extraction of the first long word,
    anchored boolean match (rlike), and global replacement — the
    text-wrangling verbs of every log/scraper pipeline, proven
    semantically identical cross-engine (anchors, greediness, global
    flags and group indexing all behave the same or the hash breaks).
    Map-only: all five regexes fuse into the scan projection under
    whole-stage codegen — at 100 TB regex cost is pure CPU scale-out
    with zero shuffle."""
    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.expr("regexp_count(lower(text), '[aeiou]+')")
        .cast("bigint")
        .alias("n_vowel_runs"),
        F.size(F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)"))
        .cast("bigint")
        .alias("n_alpha_words"),
        F.regexp_extract(F.lower("text"), "([a-z]{4,})", 1).alias(
            "first_long_word"
        ),
        F.col("text").rlike("^[A-Z]").alias("starts_upper"),
        F.length(
            F.regexp_replace(F.lower("text"), "[aeiou]", "")
        )
        .cast("bigint")
        .alias("consonant_len"),
    )


@register(
    "fn_interval_suite",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate + INTERVAL 3 MONTH AS TIMESTAMP_NS)
             AS plus_3mo,
           CAST(o_orderdate - INTERVAL 45 DAY AS TIMESTAMP_NS)
             AS minus_45d,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP_NS)
             AS month_end,
           CAST(dayofyear(CAST(o_orderdate AS DATE)) AS INT) AS doy,
           CAST(weekofyear(CAST(o_orderdate AS DATE)) AS INT) AS iso_week,
           CAST(date_diff('day', DATE '1995-06-01',
                          CAST(o_orderdate AS DATE)) AS BIGINT)
             AS days_since_epoch0,
           CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP_NS)
             AS quarter_start
    FROM orders
    """,
)
def fn_interval_suite(spark, sf_dir):
    """Date/interval arithmetic family in one fused projection:
    calendar-aware month addition, day arithmetic, month-end
    snapping, ordinal day, ISO week, day distance from a pinned
    anchor, and quarter truncation — the due-date/aging/cohort
    verbs of every warehouse (TPC-H Q4's window is exactly
    ``+ INTERVAL 3 MONTH``). Calendar arithmetic is where engines
    quietly disagree (month-end clamping, ISO week 52/53
    boundaries); the hash pins the two engines to identical
    calendars. Map-only — fuses into the scan."""
    orders = read_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.expr("o_orderdate + INTERVAL 3 MONTH").alias("plus_3mo"),
        F.expr("o_orderdate - INTERVAL 45 DAY").alias("minus_45d"),
        F.expr(
            "CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP)"
        ).alias("month_end"),
        F.expr("dayofyear(CAST(o_orderdate AS DATE))")
        .cast("int")
        .alias("doy"),
        F.expr("weekofyear(CAST(o_orderdate AS DATE))")
        .cast("int")
        .alias("iso_week"),
        F.expr(
            "CAST(datediff(CAST(o_orderdate AS DATE),"
            " DATE '1995-06-01') AS BIGINT)"
        ).alias("days_since_epoch0"),
        F.date_trunc("quarter", "o_orderdate").alias("quarter_start"),
    )


@register(
    "fn_variant_suite",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_int,
           CAST(CAST(json_extract(props, '$.k') AS BIGINT) % 10
                AS BIGINT) AS k_mod,
           CASE WHEN json_extract(props, '$.missing') IS NULL
                THEN 1 ELSE 0 END AS missing_is_null,
           CAST(json_array_length(json_extract(props, '$'))
                IS NOT NULL AS INT) * 0 AS always_zero
    FROM events
    """,
)
def fn_variant_suite(spark, sf_dir):
    """Spark 4 VARIANT path: semi-structured JSON parsed ONCE into
    the binary VARIANT encoding (parse_json) and then accessed with
    typed, lazily-shredded path extraction (variant_get) — the
    engine-native semi-structured story that replaces repeated
    get_json_object string re-parsing (json_extract_props carries
    the legacy path for comparison). Typed extraction, modulo
    arithmetic on the extracted int, and missing-path null
    semantics are all exercised; the oracle reads the same fields
    with DuckDB's JSON extraction. Map-only, fused, no UDF. At
    100 TB VARIANT's columnar shredding keeps path access
    vectorized instead of per-row JSON parsing — this is the scan
    shape a props-heavy event table wants."""
    ev = read_table(spark, sf_dir, "events")
    v = "parse_json(props)"
    return ev.select(
        "event_id",
        F.expr(f"variant_get({v}, '$.k', 'bigint')").alias("k_int"),
        F.expr(f"variant_get({v}, '$.k', 'bigint') % 10").alias("k_mod"),
        F.expr(
            f"CASE WHEN variant_get({v}, '$.missing', 'string') IS NULL"
            " THEN 1 ELSE 0 END"
        ).alias("missing_is_null"),
        F.lit(0).alias("always_zero"),
    )


@register(
    "agg_listagg_ordered",
    oracle="""
    WITH top3 AS (
      SELECT c_mktsegment AS seg, c_name, c_acctbal
      FROM (
        SELECT c_mktsegment, c_name, c_acctbal,
               row_number() OVER (
                 PARTITION BY c_mktsegment
                 ORDER BY CAST(round(c_acctbal * 100) AS BIGINT) DESC,
                          c_custkey ASC) AS rk
        FROM customer)
      WHERE rk <= 3)
    SELECT seg,
           string_agg(c_name, '|' ORDER BY
             CAST(round(c_acctbal * 100) AS BIGINT) DESC, c_name ASC)
             AS top_names,
           CAST(count(*) AS BIGINT) AS n
    FROM top3 GROUP BY seg
    """,
)
def agg_listagg_ordered(spark, sf_dir):
    """Ordered string aggregation (Spark 4 listagg / SQL:2023
    LISTAGG ... WITHIN GROUP): the top-3 richest customers per
    segment concatenated in a DETERMINISTIC order — the report
    column every BI export needs, and the aggregate whose
    unordered form is a classic nondeterminism bug
    (collect_list order is partition-dependent; WITHIN GROUP
    pins it). The top-3 cut runs first (rank window on integer
    cents with custkey tiebreak) so the aggregated strings are
    tiny regardless of table size; the oracle is DuckDB's
    ORDER-BY string_agg — an independent implementation of the
    ordered-aggregate semantics."""
    cust = read_table(spark, sf_dir, "customer")
    from pyspark.sql import Window as W

    cents = F.expr("CAST(round(c_acctbal * 100) AS BIGINT)")
    top3 = (
        cust.withColumn("cents", cents)
        .withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("c_mktsegment").orderBy(
                    F.col("cents").desc(), F.col("c_custkey").asc()
                )
            ),
        )
        .filter(F.col("rk") <= 3)
    )
    return top3.groupBy(F.col("c_mktsegment").alias("seg")).agg(
        F.expr(
            "listagg(c_name, '|') WITHIN GROUP "
            "(ORDER BY cents DESC, c_name ASC)"
        ).alias("top_names"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )


@register(
    "fn_collation_suite",
    oracle="""
    WITH mixed AS (
      SELECT CASE WHEN event_id % 2 = 0 THEN upper(event_type)
                  ELSE event_type END AS t,
             value
      FROM events),
    dim(name) AS (VALUES ('CLICK'), ('View'), ('purchase'),
                         ('SIGNUP'), ('eRRor')),
    joined AS (
      SELECT d.name, m.t, m.value
      FROM mixed m JOIN dim d ON lower(m.t) = lower(d.name))
    SELECT name,
           CAST(count(*) AS BIGINT) AS n_matched,
           CAST(count(DISTINCT t) AS BIGINT) AS n_binary_variants,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             AS value_cents
    FROM joined GROUP BY name
    """,
)
def fn_collation_suite(spark, sf_dir):
    """Spark 4 COLLATION surface: case-insensitive equality via
    UTF8_LCASE collated comparison — the engine-native form of the
    lower()-both-sides workaround, pushed into the join operator
    itself (collation-aware hashing; no expression wrapper on the
    probe side). The fixture types gain deterministic case variance
    (even event_ids uppercase), a mixed-case dim joins under the
    collation, and each dim name reports matches, how many BINARY
    variants merged (2 — proving the collation did the merging),
    and integer-cent totals. The oracle states the equivalent
    lower()-normalized join — independent semantics, identical
    result. Output columns carry the dim's literal names, never a
    collation-picked group representative (which engines choose
    nondeterministically — the collation trap this query
    documents). At 100 TB the win is that collated joins/groupBys
    hash normalized keys natively — no double-scan of a derived
    column."""
    ev = read_table(spark, sf_dir, "events")
    mixed = ev.select(
        F.expr(
            "CASE WHEN event_id % 2 = 0 THEN upper(event_type)"
            " ELSE event_type END"
        ).alias("t"),
        "value",
    )
    dim = F.broadcast(
        ev.sparkSession.createDataFrame(
            [("CLICK",), ("View",), ("purchase",), ("SIGNUP",), ("eRRor",)],
            "name string",
        )
    )
    joined = mixed.join(
        dim,
        F.expr("collate(t, 'UTF8_LCASE') = collate(name, 'UTF8_LCASE')"),
    )
    return joined.groupBy("name").agg(
        F.count(F.lit(1)).cast("long").alias("n_matched"),
        F.countDistinct("t").cast("long").alias("n_binary_variants"),
        F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
        .cast("bigint")
        .alias("value_cents"),
    )


@register(
    "fn_try_suite",
    oracle="""
    SELECT o_orderkey,
           TRY_CAST(split_part(o_orderpriority, '-', 1) AS INTEGER)
             AS lead_digit,
           TRY_CAST(o_orderstatus AS INTEGER) IS NULL AS status_not_num,
           (o_orderkey % 5) = 0 AS div0_is_null,
           CAST(round(o_totalprice * 100) AS BIGINT) > 0
             AS add_overflow_null,
           CAST(epoch_us(TRY_CAST(CAST(o_orderdate AS VARCHAR)
                                  AS TIMESTAMP)) AS BIGINT) AS date_us,
           (string_split(o_orderpriority, '-'))[3] AS seg3,
           (string_split(o_orderpriority, '-'))[2] AS seg2
    FROM orders
    """,
)
def fn_try_suite(spark, sf_dir):
    """The ANSI-mode TRY_* error-absorbing family (Spark 4 runs
    ANSI-strict by default, so these are the sanctioned way to keep
    dirty-data pipelines total): try_cast on non-numeric strings,
    try_divide by zero, try_add past BIGINT max — each returning
    NULL instead of raising — plus try_to_timestamp and
    try_element_at past the array end. The oracle states the
    EXPECTED null-pattern in plain SQL (DuckDB TRY_CAST + natural
    out-of-bounds NULL), so the suite pins the semantics, not just
    the syntax. Map-only; scale-free."""
    o = read_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.expr(
            "try_cast(split_part(o_orderpriority, '-', 1) AS INT)"
        ).alias("lead_digit"),
        F.expr("try_cast(o_orderstatus AS INT) IS NULL").alias(
            "status_not_num"
        ),
        F.expr(
            "try_divide(1, o_orderkey % 5) IS NULL"
        ).alias("div0_is_null"),
        F.expr(
            "try_add(9223372036854775807,"
            " CAST(round(o_totalprice * 100) AS BIGINT)) IS NULL"
        ).alias("add_overflow_null"),
        F.expr(
            "unix_micros(try_to_timestamp(CAST(o_orderdate AS STRING)))"
        )
        .cast("bigint")
        .alias("date_us"),
        F.expr(
            "try_element_at(split(o_orderpriority, '-'), 3)"
        ).alias("seg3"),
        F.expr(
            "try_element_at(split(o_orderpriority, '-'), 2)"
        ).alias("seg2"),
    )
