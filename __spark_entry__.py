"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (broadcast-dim enrichment + agg, the
reference's core shape) on /root/testdata/sf0.001.

``queries()`` / ``oracle_sql()`` — every implemented operator from
SURVEY.md §2 plus the beyond-reference scale operators, each paired with
equivalent DuckDB SQL. Since round 4 all 50 registered queries carry
full value oracles (streaming included — availableNow emission is
deterministic, so the append-mode rules are SQL-expressible).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from hdb_resale_price_data_pipeline_spark.queries import all_queries

_SMOKE_SF_DIR = "/root/testdata/sf0.001"
_FLAGSHIP = "avg_revenue_by_region_year"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return all_queries()[_FLAGSHIP].fn(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
