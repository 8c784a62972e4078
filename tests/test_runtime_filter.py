"""Bloom runtime filter (orders_bloom_semi): the prefilter must never
drop a true match (no false negatives — the exact post-join can only
remove rows, not resurrect them) and must actually prune (the whole
point of the operator is that the expensive join sees a fraction of the
fact table)."""

from __future__ import annotations

from conftest import TEST_SF_DIR
from pyspark.sql.functions import col

from hdb_resale_price_data_pipeline_spark.queries.relational import (
    bloom_prefiltered_orders,
)
from hdb_resale_price_data_pipeline_spark.sources import read_table


def test_bloom_prefilter_superset_and_pruning(spark):
    prefiltered, keys = bloom_prefiltered_orders(spark, TEST_SF_DIR)
    orders = read_table(spark, TEST_SF_DIR, "orders")

    n_total = orders.count()
    n_pre = prefiltered.count()
    n_true = orders.join(
        keys, orders.o_custkey == col("k"), "left_semi"
    ).count()

    # no false negatives: every truly-matching order survives the bloom
    n_pre_true = prefiltered.join(
        keys, prefiltered.o_custkey == col("k"), "left_semi"
    ).count()
    assert n_pre_true == n_true

    # superset bound + real pruning: the prefilter passes at least the
    # matches and strictly fewer rows than the full table (the BUILDING
    # segment is ~20% of customers; even a generous FP allowance keeps
    # the pass-through under half the fact table)
    assert n_true <= n_pre <= n_total
    assert n_pre < n_total / 2, (n_pre, n_total)

    # false-positive rate within an order of magnitude of the m/n design
    # point (~0.03%): allow up to 1% of the non-matching rows through
    fp = n_pre - n_pre_true
    assert fp <= 0.01 * (n_total - n_true), fp
