"""Bucketized range join — Spark has no native range/interval join; the
naive theta join plans as BroadcastNestedLoop (quadratic). This operator
is the standard rewrite: discretize the range key into fixed-width
buckets, explode each interval to the buckets it spans, equi-join on the
bucket id (hash shuffle, AQE-optimizable), then re-apply the exact
predicate as a residual filter.

Cost: |left| + Σ interval_width/bucket_size instead of |left|·|right|.
Bucket width trades replication (small w → more bucket rows per
interval) against residual selectivity (large w → more false candidates
filtered late). At 100 TB pick w ≈ median interval width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    left_value: str,
    right_lo: str,
    right_hi: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join each left row to right intervals with
    ``lo <= left_value < hi`` via bucket equi-join + residual filter."""
    lb = left.withColumn("_bucket", F.floor(col(left_value) / bucket_width))
    rb = right.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(col(right_lo) / bucket_width),
                # hi is exclusive: the bucket of hi itself is only needed
                # when hi is not on a bucket boundary; sequence to the
                # bucket of (hi - epsilon) via floor((hi*1e9-1)/..) is
                # fragile for doubles — include it and let the residual
                # predicate discard the overshoot
                F.floor(col(right_hi) / bucket_width),
            )
        ),
    )
    return (
        lb.join(rb, on="_bucket", how=how)
        .filter((col(left_value) >= col(right_lo)) & (col(left_value) < col(right_hi)))
        .drop("_bucket")
    )
