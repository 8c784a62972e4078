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


def test_span_dups_partial_and_merge_semantics(spark, tmp_path):
    """Duplicated-span semantics the testdata (whole-document dups)
    never exercises: a paragraph copied between two otherwise-distinct
    documents is detected at exactly its own token length (boundary
    grams crossing into unique context differ, so coverage is |P|, not
    |P|+K); two copies separated by >= K unique tokens merge into TWO
    spans; a run repeated only WITHIN one document is not flagged
    (cross-document criterion); documents sharing nothing are absent.
    Cross-engine exact."""
    import duckdb

    from hdb_resale_price_data_pipeline_spark.queries.dedup import (
        SPAN_GRAM,
        _span_dups_oracle,
        q_dedup_span_dups,
    )

    p = " ".join(f"p{i}" for i in range(20))  # the copied paragraph
    uniq = lambda tag, n: " ".join(f"{tag}{i}" for i in range(n))
    rows = [
        # docs 0/1 share P once, embedded in distinct unique context
        (0, f"{uniq('a', 10)} {p} {uniq('b', 10)}"),
        (1, f"{uniq('f', 10)} {p} {uniq('g', 10)}"),
        # doc 2 shares P twice, separated by >= K unique tokens
        (2, f"{p} {uniq('c', SPAN_GRAM + 2)} {p}"),
        # doc 3: internal repetition only — no other doc shares it
        (3, f"{uniq('d', 12)} {uniq('d', 12)}"),
        # doc 4: nothing shared
        (4, uniq("e", 30)),
    ]
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [(i, s, "en", "src", len(s)) for i, s in rows],
        schema="doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")

    out = {r["doc_id"]: r for r in q_dedup_span_dups(spark, sf_dir).collect()}
    assert set(out) == {0, 1, 2}
    for d in (0, 1):
        r = out[d]
        assert (r["n_dup_spans"], r["longest_span_tokens"]) == (1, 20)
        assert r["dup_tokens_covered"] == 20
    r2 = out[2]
    assert r2["n_dup_spans"] == 2
    assert r2["dup_tokens_covered"] == 40

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet/*.parquet'"
    )
    got = sorted(tuple(r) for r in q_dedup_span_dups(spark, sf_dir).collect())
    want = sorted(tuple(r) for r in con.execute(_span_dups_oracle()).fetchall())
    assert got == want
