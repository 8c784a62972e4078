"""Data-quality validation operators (dbt-test style, as dataflow).

The reference validates nothing (SURVEY.md §5: no tests; BI eyeballing).
A warehouse at scale needs machine-checkable contracts: uniqueness,
non-null, referential integrity, range conformance — each expressed as
an aggregation returning violation counts, so a 100 TB validation run is
one scan + partial aggregates, not row-by-row assertions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col


def check_unique(df: DataFrame, cols: list[str]) -> DataFrame:
    """Violations of a uniqueness contract: duplicated key tuples."""
    return (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(col("n") > 1)
        .agg(
            F.coalesce(F.count(F.lit(1)), F.lit(0)).alias("duplicate_keys"),
            F.coalesce(F.sum(col("n") - 1), F.lit(0)).alias("excess_rows"),
        )
    )


def check_not_null(df: DataFrame, cols: list[str]) -> DataFrame:
    """NULL counts per contracted column (single scan, one agg row)."""
    return df.agg(
        *[F.count(F.when(col(c).isNull(), 1)).alias(f"nulls_{c}") for c in cols]
    )


def check_referential(
    fact: DataFrame, fact_key: str, dim: DataFrame, dim_key: str
) -> DataFrame:
    """Orphaned fact rows: fact keys with no dim match (left-anti —
    broadcast when the dim is small, exactly like the enrichment joins)."""
    return (
        fact.select(col(fact_key).alias("_fk"))
        .join(dim.select(col(dim_key).alias("_dk")), col("_fk") == col("_dk"), "left_anti")
        .agg(F.count(F.lit(1)).alias("orphan_rows"), F.countDistinct("_fk").alias("orphan_keys"))
    )


def check_range(df: DataFrame, checks: dict[str, tuple[float, float]]) -> DataFrame:
    """Out-of-range counts per column for [lo, hi] contracts."""
    return df.agg(
        *[
            F.count(
                F.when(col(c).isNotNull() & ((col(c) < lo) | (col(c) > hi)), 1)
            ).alias(f"oob_{c}")
            for c, (lo, hi) in checks.items()
        ]
    )
