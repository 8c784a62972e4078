"""Job-embedded observability: DQ counters computed inside the SAME
job that loads the warehouse (Spark ``Observation`` API), not by a
second scan.

A production daily load needs row counts, key-null counts, and the
loaded date range ON EVERY RUN — but a separate validation query
re-reads what was just written (at 100 TB, a second full scan per
table per day). ``df.observe`` attaches aggregate expressions to the
write's own plan: the metrics are folded map-side while the load runs,
cost ≈ zero, and arrive on the driver the moment the action finishes.

The counters here mirror the checks the reference applies manually
(e.g. merge_dedup.py's NOT NULL filter on the dedup keys — a key-null
reaching the sink means upstream cleaning regressed), plus the loaded
date range, which is what an idempotent day-partitioned load is keyed
on (sources/warehouse.load_day_partitioned).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def with_load_metrics(
    df: DataFrame, key_cols: list[str], date_col: str
) -> tuple[DataFrame, Observation]:
    """Attach standard load counters; returns ``(df, observation)``.
    Read ``observation.get`` AFTER the first action on the returned
    frame (it blocks until then): ``rows_loaded``, ``min_date`` /
    ``max_date`` (as strings), and ``null_<col>`` per key column."""
    obs = Observation()
    exprs = [
        F.count(F.lit(1)).alias("rows_loaded"),
        F.min(date_col).cast("string").alias("min_date"),
        F.max(date_col).cast("string").alias("max_date"),
    ]
    for k in key_cols:
        exprs.append(F.sum(F.isnull(k).cast("long")).alias(f"null_{k}"))
    return df.observe(obs, *exprs), obs
