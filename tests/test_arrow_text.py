"""Bit-identity of the Arrow-vectorized text primitives
(functions/arrow_text.py) against the expression spec
(functions/hashing.py) — the guarantee that lets the hot dedup queries
run the numpy path while the DuckDB oracles keep running the SQL spec.
"""

from __future__ import annotations

from conftest import TEST_SF_DIR
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from hdb_resale_price_data_pipeline_spark.functions import hashing as H
from hdb_resale_price_data_pipeline_spark.functions.arrow_text import (
    band_keys_udf,
    distinct_grams_udf,
    token_hashes_udf,
)
from hdb_resale_price_data_pipeline_spark.shipping import ensure_package_shipped
from hdb_resale_price_data_pipeline_spark.sources import read_table

SHINGLE_LEN, NUM_BANDS, ROWS_PER_BAND = 3, 4, 2

# Edge shapes the real corpus may not cover: empty text (→ single ''
# partial shingle, fold = seed init), short-of-n docs (partial shingle),
# repeated grams (distinct), multi-space runs (empty fragments dropped),
# mixed case, non-ASCII code points.
EDGE_TEXTS = [
    "",
    "one",
    "one two",
    "a  b   c",
    "The THE the tHe the the",
    "café naïve résumé café naïve résumé",
    "x " * 40,
]


def _frames(spark):
    docs = read_table(spark, TEST_SF_DIR, "documents").select("doc_id", "text")
    edges = spark.createDataFrame(
        [(10_000 + i, t) for i, t in enumerate(EDGE_TEXTS)], "doc_id long, text string"
    )
    return docs.unionByName(edges)


def test_band_keys_bit_identical(spark):
    ensure_package_shipped(spark)
    df = _frames(spark)
    codes_spark, _ = H.shingle_codes(H.shingles(H.tokens("text"), SHINGLE_LEN))
    bands = H.band_keys_from_codes("_codes", NUM_BANDS, ROWS_PER_BAND)
    expr_rows = {
        r.doc_id: [getattr(r, f"b{i}") for i in range(NUM_BANDS)]
        for r in df.select("doc_id", F.expr(codes_spark).alias("_codes"))
        .select("doc_id", *[F.expr(s).alias(f"b{i}") for i, (s, _) in enumerate(bands)])
        .collect()
    }
    arrow_rows = {
        r.doc_id: list(r.b)
        for r in df.select(
            "doc_id",
            band_keys_udf(SHINGLE_LEN, NUM_BANDS, ROWS_PER_BAND)(col("text")).alias("b"),
        ).collect()
    }
    assert expr_rows == arrow_rows
    assert len(expr_rows) > len(EDGE_TEXTS)


def test_distinct_grams_bit_identical(spark):
    ensure_package_shipped(spark)
    df = _frames(spark)
    grams_expr = F.array_distinct(
        F.expr(H.shingles(H.tokens("text"), SHINGLE_LEN)[0])
    )
    expr_rows = {
        r.doc_id: list(r.g) for r in df.select("doc_id", grams_expr.alias("g")).collect()
    }
    arrow_rows = {
        r.doc_id: list(r.g)
        for r in df.select(
            "doc_id", distinct_grams_udf(SHINGLE_LEN)(col("text")).alias("g")
        ).collect()
    }
    assert expr_rows == arrow_rows


def test_token_hashes_bit_identical(spark):
    ensure_package_shipped(spark)
    df = _frames(spark)
    th_spark, _ = H.token_hashes(H.tokens("text"))
    expr_rows = {
        r.doc_id: list(r.h)
        for r in df.select("doc_id", F.expr(th_spark).alias("h")).collect()
    }
    arrow_rows = {
        r.doc_id: list(r.h)
        for r in df.select("doc_id", token_hashes_udf()(col("text")).alias("h")).collect()
    }
    assert expr_rows == arrow_rows


def test_distinct_gram_hashes_bit_identical(spark):
    from hdb_resale_price_data_pipeline_spark.functions.arrow_text import (
        distinct_gram_hashes_udf,
    )
    from hdb_resale_price_data_pipeline_spark.operators.decontam import (
        doc_shingle_hashes,
    )

    ensure_package_shipped(spark)
    df = _frames(spark)
    expr_rows = {
        r.doc_id: list(r.g)
        for r in df.select(
            "doc_id", doc_shingle_hashes("text", SHINGLE_LEN).alias("g")
        ).collect()
    }
    arrow_rows = {
        r.doc_id: list(r.g)
        for r in df.select(
            "doc_id", distinct_gram_hashes_udf(SHINGLE_LEN)(col("text")).alias("g")
        ).collect()
    }
    assert expr_rows == arrow_rows


def test_html_extraction_recovers_exact_text(spark):
    """html_to_text (r5): tags/script/style/comments stripped (incl. a
    decoy </p> INSIDE the script body), entities decoded, whitespace
    collapsed — recovering exactly the known embedded content."""
    from pyspark.sql import functions as F

    from hdb_resale_price_data_pipeline_spark.operators.text import html_to_text

    html = (
        '<html><head><style>p { b: 1 }</style></head><body>'
        '<div>A &amp; B &lt;ok&gt;</div>\n\n<p>Hello   world</p>'
        '<script>var decoy = "</p>"; if (1 < 2) { x(); }</script>'
        "<!-- multi\nline comment --> tail&nbsp;end</body></html>"
    )
    out = (
        spark.range(1)
        .select(html_to_text(F.lit(html)).alias("t"))
        .first()
        .t
    )
    assert out == 'A & B <ok> Hello world tail end'
