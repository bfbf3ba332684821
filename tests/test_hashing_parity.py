"""Property-style parity for the engine-portable expression builders
(operators/hashing.py): the SAME builder emits a Spark expression and
a DuckDB expression — feed both engines one adversarial string corpus
and the results must be identical value-for-value.

This is the foundation the query oracles stand on: if hash60 /
norm_text / shingles diverge on any input, every dedup oracle match
is luck. The corpus targets the risky inputs: quotes, backslashes,
regex metacharacters, unicode, mixed whitespace, empty-ish strings.
"""

from __future__ import annotations

import random
import string

import duckdb
import pytest

from etl_jobs_spark.operators.hashing import (
    char_shingles,
    hash60,
    norm_text,
    word_tokens,
)

ADVERSARIAL = [
    "",
    " ",
    "  \t\n mixed   whitespace \t",
    "O'Brien's \"quoted\" text",
    "back\\slash and % percent _ underscore",
    "regex .* meta [chars] (groups) {braces} | pipes ^$",
    "unicode: café naïve 北京 🚀 ß",
    "UPPER lower MiXeD",
    "a",
    "the the the the",
    "semicolon; drop--comment",
]


@pytest.fixture(scope="module")
def corpus():
    rng = random.Random(42)
    alphabet = string.ascii_letters + string.digits + " .,'\"\\%_-"
    rand = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 80)))
        for _ in range(120)
    ]
    return ADVERSARIAL + rand


def _spark_eval(spark, corpus, expr_sql):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(corpus)], "i INT, s STRING")
    df.createOrReplaceTempView("parity_corpus")
    rows = spark.sql(
        f"SELECT i, {expr_sql} AS v FROM parity_corpus ORDER BY i"
    ).collect()
    return [r["v"] for r in rows]


def _duck_eval(corpus, expr_sql):
    con = duckdb.connect()
    con.execute("CREATE TABLE parity_corpus (i INT, s VARCHAR)")
    con.executemany("INSERT INTO parity_corpus VALUES (?, ?)", list(enumerate(corpus)))
    return [r[0] for r in con.sql(
        f"SELECT {expr_sql} AS v FROM parity_corpus ORDER BY i"
    ).fetchall()]


@pytest.mark.parametrize(
    "builder",
    [hash60, norm_text],
    ids=["hash60", "norm_text"],
)
def test_scalar_builders_agree(spark, corpus, builder):
    got = _spark_eval(spark, corpus, builder("s", "spark"))
    want = _duck_eval(corpus, builder("s", "duckdb"))
    assert got == want


def test_tokens_and_shingles_agree(spark, corpus):
    tok_s = _spark_eval(spark, corpus, word_tokens(norm_text("s", "spark"), "spark"))
    tok_d = _duck_eval(corpus, word_tokens(norm_text("s", "duckdb"), "duckdb"))
    assert [list(t) for t in tok_s] == [list(t) for t in tok_d]
    sh_s = _spark_eval(spark, corpus, char_shingles(norm_text("s", "spark"), "spark"))
    sh_d = _duck_eval(corpus, char_shingles(norm_text("s", "duckdb"), "duckdb"))
    assert [list(t) for t in sh_s] == [list(t) for t in sh_d]
