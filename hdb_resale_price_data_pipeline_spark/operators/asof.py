"""As-of (most-recent-prior) join — a custom operator Spark lacks
natively (SURVEY.md §7: composition of existing DataFrame ops).

For each left row, attach the latest right row with
``right.ts <= left.ts`` within the same key. The naive formulation is a
range join + argmax (quadratic per key); this implementation is the
union-sort trick: tag both sides, union, and carry the last-seen right
value forward with ``last(..., ignorenulls=True)`` over a
(key, ts)-ordered window — one shuffle on the key, linear work, exactly
the merge-scan an ASOF join does in engines that support it natively
(DuckDB's ASOF JOIN is the oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join. ``right_value_cols`` are carried from the
    matched right row (NULL when no prior right row exists).

    Tie behavior: a right row with ``right.ts == left.ts`` matches
    (<=), same as DuckDB ASOF JOIN's default.
    """
    left_cols = left.columns
    tagged_left = left.select(
        col(key).alias("_k"),
        col(ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        *[col(c) for c in left_cols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_rv_{c}") for c in right_value_cols],
    )
    tagged_right = right.select(
        col(key).alias("_k"),
        col(ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
        *[col(c).alias(f"_rv_{c}") for c in right_value_cols],
    )
    unioned = tagged_left.unionByName(tagged_right)
    # right rows sort before left rows at equal ts (_is_left asc) so a
    # same-timestamp right row is visible to the left row (<= semantics)
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"_rv_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in right_value_cols
        ],
    )
    return carried.filter(col("_is_left") == 1).select(
        *left_cols, *[f"{c}{suffix}" for c in right_value_cols]
    )
