"""Local replica of the driver's t2 correctness gate: every query in the
registry runs on Spark AND its DuckDB oracle over the same parquet; row
count, column names, and order-insensitive values must match.
"""

from __future__ import annotations

import math

import pytest

from hdb_resale_price_data_pipeline_spark.queries import all_queries, local_queries

from conftest import TEST_SF_DIR

# Superset of the driver-graded registry: includes per-module
# LOCAL_QUERIES demoted out of the driver's 50-entry window.
REGISTRY = local_queries()

# The driver-graded window is the `core` gate: every graded query's
# oracle parity runs in the <5-min driver-facing subset (see
# conftest.pytest_collection_modifyitems); the local-only queries stay
# in the full suite.
_GRADED = set(all_queries())


def _canon(value):
    """Canonicalize a cell for cross-engine comparison (sortable str)."""
    import decimal

    import numpy as np
    import pandas as pd

    if isinstance(value, (bytes, bytearray)):
        return value.hex()
    if isinstance(value, (list, tuple, np.ndarray)):
        # The DRIVER's canon cannot sort list cells (pandas sort_values
        # → TypeError, r5's text_bpe_learn red row). The local replica
        # must never be MORE permissive than the driver, so reject
        # instead of stringifying; tests/test_registry.py lints the
        # whole registry for this.
        raise TypeError(
            "non-scalar cell reached the correctness canon — the driver "
            "gate would error on this query; emit joined strings instead"
        )
    if value is None or (isinstance(value, float) and math.isnan(value)) or value is pd.NA:
        return "\x00NULL"
    if isinstance(value, (float, np.floating)):
        v = float(value)
        if v == 0.0:
            v = 0.0  # collapse negative zero
        s = f"{v:.9g}"
        # Dtype-sensitive like the driver's hash: a float-typed 53.0 must
        # NOT canonicalize to the same string as an int-typed 53 (DuckDB
        # HUGEINT sums surface as float64 in pandas and failed the driver
        # gate in r01 while this replica stayed green).
        if "." not in s and "e" not in s and "n" not in s:
            s += ".0"
        return s
    if isinstance(value, decimal.Decimal):
        return _canon(float(value))
    return str(value)


def _rows(df_pandas, cols):
    return sorted(
        tuple(_canon(v) for v in row)
        for row in df_pandas[cols].itertuples(index=False, name=None)
    )


@pytest.mark.parametrize(
    "name",
    [
        pytest.param(n, marks=pytest.mark.core) if n in _GRADED else n
        for n in sorted(REGISTRY)
    ],
)
def test_query_matches_oracle(name, spark, duck):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, TEST_SF_DIR)
    spark_pd = sdf.toPandas()
    assert len(spark_pd) >= 0  # smoke: plan executes

    if spec.oracle is None:
        assert len(spark_pd) > 0, f"{name}: rows-only query returned 0 rows"
        return

    duck_pd = duck.execute(spec.oracle).fetchdf()

    spark_cols = sorted(spark_pd.columns)
    duck_cols = sorted(duck_pd.columns)
    assert spark_cols == duck_cols, f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    assert len(spark_pd) == len(duck_pd), (
        f"{name}: row count {len(spark_pd)} vs {len(duck_pd)}"
    )

    srows = _rows(spark_pd, spark_cols)
    drows = _rows(duck_pd, spark_cols)
    if srows != drows:
        only_spark = [r for r in srows if r not in set(drows)][:5]
        only_duck = [r for r in drows if r not in set(srows)][:5]
        raise AssertionError(
            f"{name}: value mismatch; spark-only={only_spark} duck-only={only_duck}"
        )
