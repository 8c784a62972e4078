"""Semantic checks for the model-based data-selection operators
(operators/scoring.py). The oracle-parity suite proves Spark≡DuckDB;
these pin the *behavior* — an LM must prefer in-distribution text, BM25
must rank term-bearing docs first, DSIR must up-weight the target
domain — so a formula bug that both engines share cannot pass."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from hdb_resale_price_data_pipeline_spark.operators import scoring as SC

from conftest import TEST_SF_DIR


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_lm_prefers_in_distribution_text(spark):
    # Train on repetitive in-domain text; a doc drawn from the same
    # distribution must score a lower avg NLL than out-of-domain gibberish.
    corpus = [(i, "the quick brown fox jumps over the lazy dog", "en") for i in range(0, 20, 2)]
    test = [(101, "the quick brown fox jumps", "en"), (103, "zzq qqz xvx vxv wwv", "en")]
    docs = _docs(spark, corpus + test)
    uni, big, vocab = SC.train_bigram_lm(docs.filter(col("doc_id") % 2 == 0), "text")
    out = {
        r["doc_id"]: r["avg_nll"]
        for r in SC.score_perplexity(docs, "text", uni, big, vocab).collect()
    }
    assert out[101] < out[103]
    # training docs themselves score best of all
    assert out[0] <= out[101]


def test_bm25_ranks_term_bearing_docs_first(spark):
    rows = [
        (1, "vector vector vector search index", "en"),
        (2, "vector search", "en"),
        (3, "nothing relevant at all here words", "en"),
        (4, "completely unrelated text content", "en"),
    ]
    top = SC.bm25_topk(_docs(spark, rows), "text", ["vector"], 2).collect()
    assert [r["doc_id"] for r in top] == [1, 2]
    assert top[0]["score"] > top[1]["score"] > 0


def test_bm25_length_normalization_prefers_shorter_doc_at_equal_tf(spark):
    rows = [
        (1, "vector " + "pad " * 40, "en"),
        (2, "vector pad", "en"),
    ]
    top = SC.bm25_topk(_docs(spark, rows), "text", ["vector"], 2).collect()
    assert top[0]["doc_id"] == 2  # same tf=1, shorter doc wins under b=0.75


def test_dsir_upweights_target_domain(spark):
    rows = (
        [(i, "alpha beta gamma delta", "en") for i in range(10)]
        + [(100 + i, "uno dos tres cuatro", "es") for i in range(10)]
    )
    out = {
        r["doc_id"]: r["avg_logw"]
        for r in SC.dsir_logweights(_docs(spark, rows), "text", col("lang") == "en").collect()
    }
    # every English doc must out-weigh every Spanish doc
    assert min(out[i] for i in range(10)) > max(out[100 + i] for i in range(10))


def test_bm25_plan_has_no_data_sized_shuffle(spark):
    """The scoring pass must be map-only + TakeOrderedAndProject: the
    only exchange feeds the 1-row stats aggregate, never the corpus."""
    from hdb_resale_price_data_pipeline_spark.sources import read_table

    docs = read_table(spark, TEST_SF_DIR, "documents")
    plan = SC.bm25_topk(docs, "text", ["vector"], 5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    # corpus rows reach the top-k without a repartition: the only
    # exchanges allowed are the 1-row stats aggregate's single-partition
    # exchange and the broadcast of its result — never a data-sized
    # hash-partitioned shuffle of the corpus.
    assert "Exchange hashpartitioning" not in plan


# --- logistic-regression classifier (operators/classifier.py) --------------

def test_lr_learns_separable_domains(spark):
    from hdb_resale_price_data_pipeline_spark.operators import classifier as CL

    rows = (
        [(i, "alpha beta gamma delta epsilon", "en") for i in range(0, 40, 2)]
        + [(i, "uno dos tres cuatro cinco", "es") for i in range(1, 40, 2)]
    )
    docs = _docs(spark, rows)
    fx = CL.featurize(docs, "text", col("lang") == "en")
    w = CL.lr_train(fx)
    out = CL.lr_score(fx, w).collect()
    en = [r["prob"] for r in out if r["is_target"] == 1]
    es = [r["prob"] for r in out if r["is_target"] == 0]
    assert min(en) > max(es)
    # trained far enough to call the classes apart at the 0.5 boundary
    assert all(r["pred"] == r["is_target"] for r in out)


def test_lr_training_is_deterministic_across_runs(spark):
    from hdb_resale_price_data_pipeline_spark.operators import classifier as CL

    rows = [(i, f"tok{i % 7} tok{i % 5} tok{i % 3}", "en" if i % 3 else "es") for i in range(60)]
    docs = _docs(spark, rows)
    fx = CL.featurize(docs, "text", col("lang") == "en")
    w1 = CL.lr_train(fx)
    w2 = CL.lr_train(CL.featurize(docs.repartition(7), "text", col("lang") == "en"))
    # bit-identical weights regardless of input partitioning: the
    # quantized-gradient sums are order-free exact
    assert w1 == w2


def test_lr_gradient_descent_reduces_logloss(spark):
    import math

    from hdb_resale_price_data_pipeline_spark.operators import classifier as CL

    rows = (
        [(i, "alpha beta gamma", "en") for i in range(0, 30, 2)]
        + [(i, "uno dos tres", "es") for i in range(1, 30, 2)]
    )
    fx = CL.featurize(_docs(spark, rows), "text", col("lang") == "en")

    def logloss(w):
        eps = 1e-9
        tot = 0.0
        for r in CL.lr_score(fx, w).collect():
            p = min(max(r["prob"], eps), 1 - eps)
            y = r["is_target"]
            tot += -(y * math.log(p) + (1 - y) * math.log(1 - p))
        return tot

    assert logloss(CL.lr_train(fx)) < logloss([0.0] * (CL.N_BUCKETS + 1))
