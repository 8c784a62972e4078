"""Dedup-operator unit tests beyond the oracle suite."""

from __future__ import annotations

from conftest import TEST_SF_DIR


def test_ngram_df_cap_is_identity_when_loose_and_kills_all_when_one(spark):
    """max_doc_freq is the hot-shingle relief valve: a loose cap must
    not change a single pair or value; cap=1 removes every SHARED gram
    by definition, so no pairs survive."""
    from hdb_resale_price_data_pipeline_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )
    from hdb_resale_price_data_pipeline_spark.sources import read_table

    docs = read_table(spark, TEST_SF_DIR, "documents")
    kw = dict(
        id_col="doc_id", text_col="text", block_col="lang",
        shingle_len=3, threshold=0.2,
    )
    base = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, **kw).collect()
    }
    assert len(base) > 0
    loose = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, max_doc_freq=10**9, **kw).collect()
    }
    assert loose == base
    assert ngram_jaccard_pairs(docs, max_doc_freq=1, **kw).count() == 0
