"""Known-answer tests for the C4/Gopher corpus-filter primitives
(operators/text.py) — the oracle-parity suite proves Spark≡DuckDB on
the salted corpus; these pin the rules themselves to hand-checked
documents so a threshold or regex change cannot silently pass both
engines in lockstep."""

from __future__ import annotations

from pyspark.sql import functions as F

from hdb_resale_price_data_pipeline_spark.operators import text as T


def _one(spark, text: str, exprs: dict[str, str]) -> dict:
    df = spark.createDataFrame([(text,)], "text string")
    row = df.select(
        *[F.expr(e).alias(k) for k, e in exprs.items()]
    ).first()
    return row.asDict()


def test_c4_line_rules_keep_only_well_formed_lines(spark):
    page = "\n".join(
        [
            "this sentence has enough words and ends properly.",  # keep
            "too short.",  # < 5 words
            "no terminal punctuation on this line here",  # no punct
            "please enable javascript to view this content today.",  # js
            'a quoted sentence with five words counts too."',  # keep (quote)
        ]
    )
    got = _one(
        spark,
        page,
        {
            "n_lines": f"size({T.c4_lines('text')[0]})",
            "n_kept": f"size({T.c4_kept_lines('text')[0]})",
            "kept": f"array_join({T.c4_kept_lines('text')[0]}, '|')",
        },
    )
    assert got["n_lines"] == 5
    assert got["n_kept"] == 2
    assert got["kept"].startswith("this sentence")
    assert "javascript" not in got["kept"]


def test_c4_page_rules_drop_lorem_and_braces(spark):
    for text, bad in [
        ("a perfectly fine page of prose.", False),
        ("contains Lorem Ipsum filler text.", True),
        ("code snippet { return 1; } inline.", True),
    ]:
        got = _one(spark, text, {"bad": f"CAST({T.c4_page_bad('text')[0]} AS INT)"})
        assert got["bad"] == int(bad), text


def test_gopher_symbol_and_alpha_counts(spark):
    text = "alpha beta2 42 # ... #!"
    got = _one(
        spark,
        text,
        {
            "n_sym": T.gopher_symbol_count("text")[0],
            "n_alpha": T.gopher_alpha_count("text")[0],
        },
    )
    # tokens: alpha, beta2, 42, '#', '...', '#!' → symbols: '#' and
    # '...' ('#!' is neither); alphabetic: alpha, beta2
    assert got["n_sym"] == 2
    assert got["n_alpha"] == 2
