"""Streaming analytics over the ``events`` table.

Design: file-source ``readStream`` with an explicit schema (streaming
requires one — inference is a batch luxury), watermarked event-time
windows, ``availableNow`` trigger + memory sink for deterministic
finite runs. On a cluster the same plans run unbounded against a
landing directory with checkpointing; nothing here is test-only
plumbing except the memory-sink helper.

``ts`` arrives as TIMESTAMP(NANOS) parquet → declared LONG (with
``spark.sql.legacy.parquet.nanosAsLong``) and truncated to µs, same as
the batch reader (sources/readers.py).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import col
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

EVENTS_RAW_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), True),
        StructField("ts", LongType(), True),  # epoch nanos (see module doc)
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
        StructField("props", StringType(), True),
    ]
)

WATERMARK = "2 hours"


def _stage_stream_dir(sf_dir: str) -> str:
    """The file stream source requires a *directory* (its basePath); the
    testdata ships one parquet file per table. Stage a per-sf landing
    directory containing a symlink — the exact layout a real ingest
    (files appended to a landing dir) would have."""
    import hashlib
    import os

    src = os.path.abspath(f"{sf_dir}/events.parquet")
    stage = f"/tmp/hdb_stream_src_{hashlib.md5(src.encode()).hexdigest()[:10]}"
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "events.parquet")
    if not os.path.exists(link):
        os.symlink(src, link)
    return stage


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream of the events table."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    raw = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .format("parquet")
        .load(_stage_stream_dir(sf_dir))
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def stream_hourly_tumbling(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour windows per event_type, watermarked."""
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(F.window(col("ts"), "1 hour").alias("w"), col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            col("w.start").cast("string").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def stream_sliding_counts(events: DataFrame) -> DataFrame:
    """Sliding windows (1 hour, sliding every 15 min)."""
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(F.window(col("ts"), "1 hour", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(col("w.start").cast("string").alias("window_start"), "n_events")
    )


def stream_session_windows(events: DataFrame) -> DataFrame:
    """Native session windows (30-min gap) per user — the streaming twin
    of the batch sessionization query."""
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(F.session_window(col("ts"), "30 minutes").alias("w"), col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            col("w.start").cast("string").alias("session_start"),
            "user_id",
            "n_events",
        )
    )


def stream_user_dedup(events: DataFrame) -> DataFrame:
    """Watermarked streaming dedup: first event per (user_id,
    event_type) within the watermark horizon — the streaming analog of
    the reference's batch window dedup (merge_dedup.py:20-29)."""
    return (
        events.withWatermark("ts", WATERMARK)
        .dropDuplicates(["user_id", "event_type"])
        .select("event_id", "user_id", "event_type")
    )


ATTRIBUTION_HORIZON_MIN = 30


def stream_view_purchase_join(events: DataFrame) -> DataFrame:
    """Stream-stream inner join with event-time bounds: attribute each
    purchase to every view by the same user in the preceding 30 minutes.

    Both sides are watermarked and the join condition carries a closed
    time range on the two event-time columns — that is what lets Spark
    evict buffered state (a view older than watermark + horizon can
    never match a future purchase), so state stays bounded on an
    unbounded stream. Without the range the state store grows forever;
    with it this is the canonical scalable attribution join.

    Emits one row per (purchase, attributing view) pair; the batch twin
    (queries/events.q_events_attribution_join) is oracle-checked and the
    streaming/batch results are asserted identical in
    tests/test_streaming.py.
    """
    views = (
        events.where(col("event_type") == "view")
        .select(
            col("event_id").alias("view_id"),
            col("user_id"),
            col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", WATERMARK)
    )
    purchases = (
        events.where(col("event_type") == "purchase")
        .select(
            col("event_id").alias("purchase_id"),
            col("user_id").alias("p_user_id"),
            col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", WATERMARK)
    )
    return views.join(
        purchases,
        F.expr(
            f"""
            user_id = p_user_id
            AND purchase_ts >= view_ts
            AND purchase_ts <= view_ts + interval {ATTRIBUTION_HORIZON_MIN} minutes
            """
        ),
    ).select(
        "purchase_id",
        "view_id",
        "user_id",
        (F.unix_micros(col("purchase_ts")) - F.unix_micros(col("view_ts"))).alias(
            "micros_to_purchase"
        ),
    )


def run_stream_to_df(streaming_df: DataFrame, spark: SparkSession) -> DataFrame:
    """Execute a finite streaming query to completion (availableNow
    trigger → memory sink) and return the result as a batch DataFrame.
    This is the driver-facing bridge: ``queries()`` callables must
    return DataFrames."""
    name = f"stream_out_{uuid.uuid4().hex[:12]}"
    query = (
        streaming_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")  # watermarked windows emit on finalization
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(name)
