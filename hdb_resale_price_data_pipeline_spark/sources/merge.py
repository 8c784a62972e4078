"""Keyed MERGE (upsert) into a day-partitioned parquet warehouse,
touching only the partitions the update batch lands in.

Plain parquet has no transactional MERGE (that's Delta/Iceberg
territory), but the overwhelmingly common case — late rows and
corrections keyed by a business key, arriving for a handful of recent
days — only needs *partition-scoped* read-modify-write:

1. collect the distinct partition values present in the update batch
   (driver-side, days-sized by construction);
2. read ONLY those partitions back (partition pruning — the rest of
   the table is never opened);
3. anti-join the old rows against the update keys (update keys are
   batch-sized → broadcast), union the updates in;
4. write back with dynamic partition overwrite, replacing exactly the
   affected partitions.

Cost is O(affected partitions + batch), independent of table size —
the property that makes daily corrections viable at 100 TB. The
operation is idempotent (re-merging the same batch yields the same
table), which also makes it the correct ``foreachBatch`` sink for
late-data streams where the append-only day-partitioned sink
(streaming/sink.py) documents its boundary.

Caveat vs a real lakehouse MERGE: the swap is not atomic — a reader
racing the rewrite of one partition can see it empty. Single-writer
nightly-batch warehouses (the reference's deployment shape,
dags/pipeline.py) accept this; concurrent-reader deployments should
put Delta/Iceberg underneath and keep this exact plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import col


def merge_upsert(
    spark: SparkSession,
    table_path: str,
    updates: DataFrame,
    key_cols: list[str],
    partition_col: str,
) -> None:
    """Upsert ``updates`` into the day-partitioned table at
    ``table_path``: matching keys are replaced, new keys inserted,
    untouched partitions never read or written."""
    affected = [
        r[0] for r in updates.select(partition_col).distinct().collect()
    ]
    if not affected:
        return
    existing = spark.read.parquet(table_path).filter(
        col(partition_col).isin(affected)
    )
    update_keys = updates.select(*key_cols, partition_col).distinct()
    kept = existing.join(
        F.broadcast(update_keys), on=[*key_cols, partition_col], how="left_anti"
    )
    merged = kept.unionByName(updates.select(*existing.columns))
    (
        merged.repartition(partition_col)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(table_path)
    )
