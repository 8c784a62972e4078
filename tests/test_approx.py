"""Approximate-aggregate accuracy: the registered query now emits a
verified error-bound projection (exact values + in-bound flags) so the
driver hash-checks it; this test keeps bounding the RAW sketch values
directly, and asserts the projection's flags are all green."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import TEST_SF_DIR
from hdb_resale_price_data_pipeline_spark.queries.tpch_extra import q_approx_stats
from hdb_resale_price_data_pipeline_spark.sources import read_table


def test_approx_raw_sketches_within_bounds(spark):
    li = read_table(spark, TEST_SF_DIR, "lineitem")
    r = li.agg(
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.percentile_approx("l_extendedprice", 0.5).alias("approx_median_price"),
        F.percentile_approx("l_extendedprice", 0.99).alias("approx_p99_price"),
    ).collect()[0]
    exact_orders = li.select("l_orderkey").distinct().count()
    exact_parts = li.select("l_partkey").distinct().count()
    assert abs(r.approx_orders - exact_orders) / exact_orders < 0.05
    assert abs(r.approx_parts - exact_parts) / exact_parts < 0.05

    exact_median = li.selectExpr("percentile(l_extendedprice, 0.5) AS m").first().m
    assert abs(r.approx_median_price - exact_median) / exact_median < 0.05
    assert r.approx_p99_price > r.approx_median_price


def test_approx_projection_flags_green(spark):
    r = q_approx_stats(spark, TEST_SF_DIR).collect()
    assert len(r) == 1
    row = r[0]
    assert row.orders_in_bound == 1
    assert row.parts_in_bound == 1
    assert row.median_in_bound == 1
    assert row.p99_in_bound == 1
    assert row.n_rows > 0 and row.exact_orders > 0 and row.exact_parts > 0
