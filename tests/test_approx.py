"""Approximate-aggregate bounds: sketches can't hash-match an exact
oracle, so the accuracy contract is asserted here instead."""

from __future__ import annotations

from conftest import TEST_SF_DIR
from hdb_resale_price_data_pipeline_spark.queries.tpch_extra import q_approx_stats
from hdb_resale_price_data_pipeline_spark.sources import read_table


def test_approx_within_bounds(spark):
    r = q_approx_stats(spark, TEST_SF_DIR).collect()[0]
    li = read_table(spark, TEST_SF_DIR, "lineitem")
    exact_orders = li.select("l_orderkey").distinct().count()
    exact_parts = li.select("l_partkey").distinct().count()
    assert abs(r.approx_orders - exact_orders) / exact_orders < 0.05
    assert abs(r.approx_parts - exact_parts) / exact_parts < 0.05

    exact_median = li.selectExpr("percentile(l_extendedprice, 0.5) AS m").first().m
    assert abs(r.approx_median_price - exact_median) / exact_median < 0.05
    assert r.approx_p99_price > r.approx_median_price
