"""Composed curation pipeline (plans/curation.py): structural
invariants that hold at ANY scale factor (the exact per-stage values are
oracle-checked by test_correctness via the curation_report query)."""

from __future__ import annotations

import pytest

from conftest import TEST_SF_DIR
from hdb_resale_price_data_pipeline_spark.plans.curation import (
    curate_stages,
    curation_report,
)
from hdb_resale_price_data_pipeline_spark.sources import read_table


@pytest.fixture(scope="module")
def report(spark):
    docs = read_table(spark, TEST_SF_DIR, "documents")
    return {r.stage: r.n_docs for r in curation_report(docs).collect()}


def test_stage_counts_monotonically_non_increasing(report):
    chain = ["0_raw", "1_quality", "2_exact_dedup", "3_near_dup", "4_decontaminated"]
    counts = [report[s] for s in chain]
    assert counts == sorted(counts, reverse=True), report
    assert counts[-1] > 0, "curation must not drop the whole corpus"


def test_split_partitions_the_clean_set(report):
    splits = sum(report.get(s, 0) for s in ("5_train", "6_val", "7_test"))
    assert splits == report["4_decontaminated"]
    # 80/10/10 hash split: train strictly dominates on any non-trivial corpus
    assert report["5_train"] > report.get("6_val", 0)
    assert report["5_train"] > report.get("7_test", 0)


def test_stages_are_subsets_by_doc_id(spark):
    docs = read_table(spark, TEST_SF_DIR, "documents")
    s = curate_stages(docs)
    ids = {
        name: {r.doc_id for r in frame.select("doc_id").collect()}
        for name, frame in s.items()
        if name != "split"
    }
    assert ids["quality"] <= ids["raw"]
    assert ids["exact"] <= ids["quality"]
    assert ids["neardup"] <= ids["exact"]
    assert ids["clean"] <= ids["neardup"]
    # survivors of near-dup are each component's canonical (min) member:
    # no surviving doc may be the non-min end of a dropped pair
    dropped = ids["exact"] - ids["neardup"]
    assert all(d > min(ids["exact"]) for d in dropped) if dropped else True


def test_eval_holdout_never_enters_the_corpus(spark):
    docs = read_table(spark, TEST_SF_DIR, "documents")
    s = curate_stages(docs)
    raw_ids = [r.doc_id for r in s["raw"].select("doc_id").collect()]
    assert all(i % 10 != 0 for i in raw_ids)
