"""Skew-mitigation aggregation (100 TB concern; SURVEY.md §7).

A grouped aggregation on a power-law key (user_id, url, token) puts one
key's entire weight on one reducer. ``salted_agg`` splits every group
into ``n_salts`` subgroups (adding a deterministic salt to the shuffle
key), partially aggregates, then reduces the partials — two small
shuffles instead of one skewed one. Semantics are identical to the
plain groupBy, which is exactly what its DuckDB oracle checks.

AQE's skew-join splitting (enabled in session.py) handles *join* skew at
runtime; salting is the static-plan answer for *aggregation* skew, where
AQE cannot split a group.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col


def salted_sum_count(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    n_salts: int = 16,
    salt_source: Column | None = None,
) -> DataFrame:
    """groupBy(keys).agg(sum(value), count(*)) with a salted first stage.

    ``salt_source`` must be a deterministic column (e.g. a row id) so
    results are reproducible; it only spreads rows, never changes the
    final aggregate.
    """
    salt = (
        (salt_source if salt_source is not None else F.monotonically_increasing_id())
        % n_salts
    ).alias("_salt")
    partial = (
        df.select(*keys, col(value_col), salt)
        .groupBy(*keys, "_salt")
        .agg(
            F.sum(value_col).alias("_psum"),
            F.count(F.lit(1)).alias("_pcnt"),
        )
    )
    return partial.groupBy(*keys).agg(
        F.round(F.sum("_psum"), 2).alias("total_value"),
        F.sum("_pcnt").alias("n_rows"),
    )


# NOTE on what does NOT need salting on Spark ≥ 3.5 (measured in
# tools/scale_probe.py --skew, 10M rows, one key = 80% of them):
# - sum/count aggregation: map-side partial aggregation collapses the
#   hot key to one row per map task before the shuffle — plain groupBy
#   matches the salted plan within noise.
# - per-key top-N (row_number ≤ n): InferWindowGroupLimit inserts a
#   PARTIAL WindowGroupLimit below the exchange, so each map task ships
#   at most n rows per key — a hand-salted two-stage window is pure
#   overhead (measured slower).
# Salting earns its keep where partial state does not collapse
# (collect_list/UDF-style state) and for join skew when AQE's runtime
# split can't apply (it does apply here: scale_probe measures the AQE
# skew-join split at ~3× on the same data).
