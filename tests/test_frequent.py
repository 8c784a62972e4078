"""Heavy-hitter operator tests (operators/frequent.py): the Misra-Gries
candidate guarantee under adversarial partitioning, the candidate-count
bound, and the end-to-end exactness the correctness suite also verifies
via the events_heavy_hitters oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hdb_resale_price_data_pipeline_spark.operators.frequent import (
    exact_heavy_hitters,
    misra_gries_candidates,
)


def _skewed(spark, parts):
    """600 rows: 'hot' 300 (50%), 'warm' 120 (20%), 30 keys × 6 each."""
    rows = (
        [("hot",)] * 300
        + [("warm",)] * 120
        + [(f"cold{i % 30}",) for i in range(180)]
    )
    return spark.createDataFrame(rows, "k string").repartition(parts)


@pytest.mark.parametrize("parts", [1, 7, 32])
def test_output_is_exact_and_partition_independent(spark, parts):
    df = _skewed(spark, parts)
    got = {
        (r.k, r.cnt)
        for r in exact_heavy_hitters(df, "k", factor=8, capacity=15).collect()
    }
    # exact truth: count * 8 > 600  ⇔  count > 75
    assert got == {("hot", 300), ("warm", 120)}


def test_candidate_superset_guarantee_and_bound(spark):
    parts, cap = 7, 15
    df = _skewed(spark, parts)
    cands = misra_gries_candidates(df, "k", capacity=cap).collect()
    keys = {r.k for r in cands}
    # superset of everything above N/(cap+1) = 37.5
    assert {"hot", "warm"} <= keys
    # bound: ≤ capacity candidates per partition
    assert len(cands) <= parts * cap


def test_capacity_below_factor_is_rejected(spark):
    df = _skewed(spark, 2)
    with pytest.raises(ValueError, match="capacity"):
        exact_heavy_hitters(df, "k", factor=8, capacity=3)


def test_null_keys_are_first_class(spark):
    """r7 review finding: NULL keys never become MG candidates (pandas
    value_counts drops NaN) and can't equi-join in the verify pass, but
    a GROUP BY oracle emits a NULL group — the operator must too."""
    rows = [("x",)] * 40 + [(None,)] * 50 + [(f"c{i}",) for i in range(10)]
    df = spark.createDataFrame(rows, "k string").repartition(5)
    got = {
        (r.k, r.cnt)
        for r in exact_heavy_hitters(df, "k", factor=4, capacity=7).collect()
    }
    # N=100, threshold cnt*4 > 100 ⇔ cnt > 25: 'x' (40) and NULL (50)
    assert got == {("x", 40), (None, 50)}
