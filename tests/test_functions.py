"""Unit tests for the scalar function library (SURVEY.md §5.1) — the
messy-string semantics with the highest silent-divergence risk."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F
from pyspark.sql.functions import col

from hdb_resale_price_data_pipeline_spark.functions import hashing as H
from hdb_resale_price_data_pipeline_spark.functions.bedrooms import (
    clean_bedrooms_expr,
    clean_bedrooms_pandas_udf,
)
from hdb_resale_price_data_pipeline_spark.functions.cleaning import (
    money_to_int,
    psf_to_int,
    strip_emoji_and_newlines,
    strip_non_ascii,
    title_case_location,
)

BEDROOM_CASES = [
    ("Studio", 1),
    ("studio", 1),
    ("STUDIO", 1),
    ("3+1", 4),
    ("10+2", 12),
    ("3", 3),
    ("03", 3),
    (" 4 ", 4),
    ("junk", None),
    ("3+", None),
    # reference fallback is Python int(value): signs + whitespace accepted
    ("+1", 1),
    ("-2", -2),
    (" +0 ", 0),
    ("3.5", None),
    ("", None),
    (None, None),
]


@pytest.fixture(scope="module")
def bedrooms_df(spark):
    return spark.createDataFrame(
        [(i, v) for i, (v, _) in enumerate(BEDROOM_CASES)], "id int, raw string"
    )


def test_clean_bedrooms_native_expr(spark, bedrooms_df):
    got = {
        r.id: r.out
        for r in bedrooms_df.select("id", clean_bedrooms_expr(col("raw")).alias("out")).collect()
    }
    for i, (raw, expected) in enumerate(BEDROOM_CASES):
        assert got[i] == expected, f"{raw!r}: {got[i]} != {expected}"


def test_clean_bedrooms_pandas_udf_parity(spark, bedrooms_df):
    native = bedrooms_df.select("id", clean_bedrooms_expr(col("raw")).alias("out")).collect()
    vectorized = bedrooms_df.select(
        "id", clean_bedrooms_pandas_udf(col("raw")).alias("out")
    ).collect()
    assert sorted((r.id, r.out) for r in native) == sorted((r.id, r.out) for r in vectorized)


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("Blk 123 Bedok North Road", "123 Bedok North Road"),
        ("Block 45a Holland Road", "45A Holland Road"),
        ("bedok north road", "Bedok North Road"),
        ("8 Tampines Street 81", "8 Tampines Street 81"),
    ],
)
def test_title_case_location(spark, raw, expected):
    df = spark.createDataFrame([(raw,)], "loc string")
    assert df.select(title_case_location(col("loc")).alias("o")).collect()[0].o == expected


def test_money_and_psf(spark):
    df = spark.createDataFrame(
        [("$550,000", "$512 psf"), ("1200000", "1,010 psf"), (None, None)],
        "price string, psf string",
    )
    rows = df.select(
        money_to_int(col("price")).alias("p"), psf_to_int(col("psf")).alias("q")
    ).collect()
    assert [(r.p, r.q) for r in rows] == [(550000, 512), (1200000, 1010), (None, None)]


def test_strip_helpers(spark):
    df = spark.createDataFrame([("hi 🏠🌟\nthere", "Alice Wong ★")], "d string, n string")
    r = df.select(
        strip_emoji_and_newlines(col("d")).alias("d"),
        strip_non_ascii(col("n")).alias("n"),
    ).collect()[0]
    assert r.d == "hi  there"
    assert r.n == "Alice Wong"


def test_cross_engine_hash_parity_on_corpus(spark):
    """The load-bearing invariant behind every dedup oracle: the
    polynomial hash family is bit-identical in Spark and DuckDB over an
    adversarial corpus."""
    corpus = [
        "plain words here",
        "single",
        "",
        "repeated repeated repeated",
        "UPPER lower MiXeD",
        "numbers 123 456",
        "trailing space ",
        "  leading and  double  spaces",
        "unicode é ü ñ 中文 tokens",
        "a b c d e f g h i j k l m n o p",
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(corpus)], "i int, text string")
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i INT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(corpus)))

    checks = {
        "h": H.string_hash("text"),
        "mh": H.minhash(H.shingles(H.tokens("text"), 2), 137, 11),
        "sh": H.simhash(H.tokens("text"), 16),
    }
    for name, (s_sql, d_sql) in checks.items():
        got_spark = {
            r.i: r.v for r in df.selectExpr("i", f"{s_sql} AS v").collect()
        }
        got_duck = dict(con.execute(f"SELECT i, {d_sql} FROM t").fetchall())
        assert got_spark == got_duck, f"{name} diverged"
