"""Streaming → warehouse bridge: an exactly-once day-partitioned sink.

The reference's warehouse load is a batch WRITE_APPEND into
day-partitioned tables (dags/pipeline.py:231-247); its streaming-era
equivalent is ``foreachBatch`` feeding the same idempotent
dynamic-partition-overwrite load used by ``sources/warehouse.py``.

Exactly-once here is the composition of two guarantees:

- the checkpoint gives each micro-batch a stable ``batch_id``, and a
  batch that fails mid-write is REPLAYED with the same id after
  restart;
- ``load_day_partitioned`` makes the replay harmless — it replaces the
  date partitions present in the batch rather than appending, so a
  half-written batch is simply overwritten whole.

Plain ``mode("append")`` in ``foreachBatch`` would duplicate rows on
every such replay; partition-level overwrite is the Spark-native
idempotence trick when the sink has no transactional MERGE. The one
semantic requirement is that micro-batches align with partition
boundaries *or* that a partition is only ever extended by re-delivering
ALL of its rows (true for replays, which re-run the same batch). For a
date column derived from event time with a watermark, late data lands
in an old partition and would erase that partition's earlier rows —
that deployment needs the keyed variant below
(:func:`stream_to_day_partitioned_merge`), whose per-batch MERGE
replaces only matching keys inside the affected partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..sources.merge import merge_upsert
from ..sources.warehouse import load_day_partitioned


def stream_to_day_partitioned(
    streaming_df: DataFrame,
    path: str,
    partition_col: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Start a foreachBatch sink writing each micro-batch through the
    idempotent day-partitioned warehouse load. Returns the
    StreamingQuery (caller awaits)."""

    def _write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        load_day_partitioned(batch_df, path, partition_col)

    writer = (
        streaming_df.writeStream.foreachBatch(_write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_to_day_partitioned_merge(
    streaming_df: DataFrame,
    path: str,
    key_cols: list[str],
    partition_col: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Late-data-safe variant: each micro-batch MERGES by key into the
    affected partitions (sources/merge.py) instead of replacing them
    whole, so a batch carrying a few late rows for an old day updates
    those keys without erasing the day's earlier rows. Idempotent under
    replay for the same reason the merge itself is."""

    def _merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        if getattr(spark, "_jvm", None) is not None:
            jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
            fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
            exists = fs.exists(jpath)
        else:  # Spark Connect server-side session without gateway access
            try:
                spark.read.parquet(path).schema
                exists = True
            except Exception:
                exists = False
        if not exists:  # first batch bootstraps the table
            load_day_partitioned(batch_df, path, partition_col)
            return
        merge_upsert(spark, path, batch_df, key_cols, partition_col)

    writer = (
        streaming_df.writeStream.foreachBatch(_merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
