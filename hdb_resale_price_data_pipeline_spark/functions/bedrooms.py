"""Bedroom-count conform: 'Studio'→1, '3+1'→4, '3'→3, junk/null→NULL.

The reference implements this as its single row-at-a-time Python UDF
(srx_transformation.py:68-83) with a quirk: the UDF has no returnType so
ints are stringified, then ``.cast('int')`` recovers them and turns the
sentinel 'None' into NULL. The observable semantics are exactly:

    NULL → NULL, 'Studio' (any case) → 1, 'a+b' → a+b, digits → int,
    anything else → NULL.

Ours is a pure Column expression — stays inside whole-stage codegen, no
Python boundary at all. A Pandas-UDF variant is kept as the vectorized
UDF-surface demonstration (SURVEY.md §2.10): Arrow-batched, ~10-100×
faster than the reference's row-at-a-time form at scale.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_PLUS_PATTERN = r"^\d+\+\d+$"
# The reference's fallback is Python ``int(value)`` (srx_transformation.py:
# 77-79), which accepts surrounding whitespace AND a leading sign
# ('+0' → 0, '-3' → -3). Spark's non-ANSI cast('int') has the same
# whitespace/sign acceptance, so gating on this pattern reproduces it.
# Known deliberate deviations from int(): no '1_0' digit-group
# underscores, no non-ASCII unicode digits — neither occurs in data.
_INT_PATTERN = r"^\s*[+-]?\d+\s*$"


def clean_bedrooms_expr(c: Column) -> Column:
    """Native-expression implementation (preferred at scale)."""
    summed = F.aggregate(
        F.transform(F.split(c, r"\+"), lambda x: x.cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return (
        F.when(c.isNull(), F.lit(None).cast("int"))
        .when(F.lower(c) == "studio", F.lit(1))
        .when(c.rlike(_PLUS_PATTERN), summed)
        .when(c.rlike(_INT_PATTERN), c.cast("int"))
        .otherwise(F.lit(None).cast("int"))
    )


def _clean_bedrooms_batch(s: pd.Series) -> pd.Series:
    out = pd.Series(pd.NA, index=s.index, dtype="Int32")
    notna = s.notna()
    lowered = s.where(notna, "").astype(str).str.lower()
    out[notna & (lowered == "studio")] = 1
    plus = notna & lowered.str.fullmatch(r"\d+\+\d+")
    if plus.any():
        out[plus] = (
            lowered[plus].str.split("+").map(lambda parts: sum(int(p) for p in parts))
        )
    digits = notna & lowered.str.fullmatch(r"\s*[+-]?\d+\s*")
    if digits.any():
        out[digits] = lowered[digits].map(int)
    return out


def clean_bedrooms_pandas_udf(c: Column) -> Column:
    """Arrow-vectorized variant with identical semantics.

    Built lazily (``pandas_udf`` registration needs an active session);
    ships the package so workers can unpickle the batch function.
    """
    from pyspark.sql import SparkSession

    from ..shipping import ensure_package_shipped

    session = SparkSession.getActiveSession()
    if session is not None:
        ensure_package_shipped(session)
    return pandas_udf(_clean_bedrooms_batch, "int")(c)
