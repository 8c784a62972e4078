"""Registry plumbing shared by the query modules."""

from __future__ import annotations

from collections.abc import Callable
from typing import NamedTuple

from pyspark.sql import DataFrame, SparkSession

from ..sources import read_table

QueryFn = Callable[[SparkSession, str], DataFrame]


class QuerySpec(NamedTuple):
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None → rows-only driver check


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Shorthand testdata table scan."""
    return read_table(spark, sf_dir, name)
