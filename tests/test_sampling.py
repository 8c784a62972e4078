"""Temperature-mixture semantics: τ=0.5 must sit strictly between
proportional sampling (τ=1, rate flat across domains) and uniform
budgets (τ→0, rate ∝ 1/tokens)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from hdb_resale_price_data_pipeline_spark.operators.sampling import (
    domain_rates,
    temperature_rates,
)


def _features(spark, big, small):
    # two domains, `big` 10x the token mass of `small`
    rows = [("big", 10) for _ in range(big)] + [("small", 10) for _ in range(small)]
    return spark.createDataFrame(rows, "source string, n_tok long")


def test_temperature_rate_ratio_is_sqrt(spark):
    """rate_d ∝ 1/√tokens_d ⇒ rate_small / rate_big = √(t_big/t_small)."""
    feats = _features(spark, big=1000, small=100)
    rates = {
        r.source: r.rate
        for r in temperature_rates(feats, "source", budget_tokens=2000).collect()
    }
    assert rates["small"] < 1.0 and rates["big"] < 1.0  # budget binds
    ratio = rates["small"] / rates["big"]
    assert abs(ratio - math.sqrt(10)) < 1e-6


def test_temperature_sits_between_proportional_and_uniform(spark):
    """Sampled-token SHARE of the small domain: proportional gives
    1/11, uniform budget gives 1/2, τ=0.5 gives √1/(√10+√1)."""
    feats = _features(spark, big=1000, small=100)
    budget = 2000

    def share(rates_df):
        r = {x.source: x for x in rates_df.collect()}
        sampled = {k: r[k].rate * r[k].domain_tokens for k in r}
        return sampled["small"] / (sampled["small"] + sampled["big"])

    temp = share(temperature_rates(feats, "source", budget))
    uniform = share(domain_rates(feats, "source", budget))
    proportional = 100 / 1100  # flat rate => share = token share
    expected = math.sqrt(1000) / (math.sqrt(10000) + math.sqrt(1000))
    assert abs(temp - expected) < 1e-6
    assert proportional < temp < uniform


def test_temperature_budget_is_met_in_expectation(spark):
    """Σ_d rate_d · tokens_d ≈ budget when every rate < 1."""
    feats = _features(spark, big=1000, small=100)
    budget = 2000
    got = (
        temperature_rates(feats, "source", budget)
        .agg(F.sum(F.col("rate") * F.col("domain_tokens")))
        .first()[0]
    )
    assert abs(got - budget) < 1.0  # quantized-sqrt grid: sub-token error


def test_curriculum_shards_ordered_and_complete(spark):
    """Histogram-quantile curriculum shards: quality ranges must be
    disjoint and monotone decreasing with shard number, every doc lands
    in exactly one shard, and sizes stay near-equal (ties never split,
    so exact equality isn't guaranteed)."""
    from conftest import TEST_SF_DIR
    from hdb_resale_price_data_pipeline_spark.queries.text import (
        CURRICULUM_SHARDS,
        q_text_curriculum_shards,
    )
    from hdb_resale_price_data_pipeline_spark.sources import read_table

    rows = sorted(
        q_text_curriculum_shards(spark, TEST_SF_DIR).collect(),
        key=lambda r: r.shard,
    )
    assert [r.shard for r in rows] == list(range(1, CURRICULUM_SHARDS + 1))
    n_docs = read_table(spark, TEST_SF_DIR, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    for hi, lo in zip(rows, rows[1:]):
        assert hi.min_qb > lo.max_qb  # shard k strictly above shard k+1
    avg = n_docs / CURRICULUM_SHARDS
    for r in rows:
        assert r.n_docs < 2 * avg  # near-equal under tie-bunching
