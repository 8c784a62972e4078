"""SCD2 / CDC merge emulation (slowly-changing-dimension history).

The reference appends every run to a day-partitioned warehouse table
(dags/pipeline.py:239-247) — no history semantics. This operator gives
the real thing on plain parquet (no Delta in this environment): apply a
change batch to a history table keyed by a business key, closing out
changed rows (``valid_to`` stamped) and inserting new versions. The
classic MERGE INTO emulation: broadcast-or-hash join on the key +
union — one shuffle, no row-by-row driver logic.

Current rows have ``valid_to IS NULL``.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col


def scd2_apply(
    history: DataFrame,
    changes: DataFrame,
    key: str,
    compare_cols: list[str],
    as_of: datetime.date,
) -> DataFrame:
    """Return the new history table after applying ``changes``.

    - unchanged current rows (key absent from changes, or all
      ``compare_cols`` equal) stay open;
    - changed/new keys get a fresh open row with ``valid_from=as_of``;
    - superseded rows close with ``valid_to=as_of``.
    ``history`` must carry ``valid_from``/``valid_to``; ``changes`` is a
    plain snapshot batch of the same business columns.
    """
    closed = history.filter(col("valid_to").isNotNull())
    current = history.filter(col("valid_to").isNull())

    ch = changes.select(
        col(key).alias("_ck"), *[col(c).alias(f"_c_{c}") for c in compare_cols]
    )
    joined = current.join(ch, current[key] == col("_ck"), "left")

    differs = F.lit(False)
    for c in compare_cols:
        differs = differs | ~(
            (col(c) == col(f"_c_{c}"))
            | (col(c).isNull() & col(f"_c_{c}").isNull())
        )

    keep_cols = history.columns
    # rows with no change (or no matching change row) stay open
    untouched = joined.filter(col("_ck").isNull() | ~differs).select(*keep_cols)
    # superseded versions close
    superseded = (
        joined.filter(col("_ck").isNotNull() & differs)
        .select(*keep_cols)
        .withColumn("valid_to", F.lit(as_of))
    )
    # changed keys + brand-new keys open a fresh version
    current_keys = current.select(col(key).alias("_hk"), *[col(c).alias(f"_h_{c}") for c in compare_cols])
    ch_joined = changes.join(current_keys, changes[key] == col("_hk"), "left")
    ch_differs = F.lit(False)
    for c in compare_cols:
        ch_differs = ch_differs | ~(
            (col(c) == col(f"_h_{c}"))
            | (col(c).isNull() & col(f"_h_{c}").isNull())
        )
    inserts = (
        ch_joined.filter(col("_hk").isNull() | ch_differs)
        .select(*changes.columns)
        .withColumn("valid_from", F.lit(as_of))
        .withColumn("valid_to", F.lit(None).cast("date"))
        .select(*keep_cols)
    )
    return closed.unionByName(untouched).unionByName(superseded).unionByName(inserts)
