"""Streaming analytics over the ``events`` table.

Design: file-source ``readStream`` with an explicit schema (streaming
requires one — inference is a batch luxury), watermarked event-time
windows, ``availableNow`` trigger + memory sink for deterministic
finite runs. On a cluster the same plans run unbounded against a
landing directory with checkpointing; nothing here is test-only
plumbing except the memory-sink helper.

Streaming requires a declared schema up front, and the producer's
physical ``ts`` flavor has drifted across testdata generations
(TIMESTAMP(NANOS) → µs TIMESTAMP_NTZ). The schema is therefore picked
from the parquet FOOTER (one driver-side metadata read, no data scan)
and the column is normalized to the engine's single internal event-time
type — TIMESTAMP, session TZ pinned to UTC — same contract as the batch
reader (sources/readers.py).
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import col
from pyspark.sql.types import (
    DataType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
    TimestampType,
)

WATERMARK = "2 hours"


def _events_ts_flavor(events_parquet: str) -> str:
    """Inspect the parquet footer for the physical type of ``ts``:
    ``'nanos'`` (INT64 TIMESTAMP(NANOS) — Spark reads LONG under
    ``nanosAsLong``), ``'ntz'`` (µs/ms, no tz), or ``'ltz'``."""
    import pyarrow.parquet as pq

    t = pq.read_schema(events_parquet).field("ts").type
    import pyarrow as pa

    if pa.types.is_integer(t):
        return "nanos"  # raw INT64 epoch — treat as nanos like the batch path
    if not pa.types.is_timestamp(t):
        raise TypeError(f"events.ts: unsupported parquet type {t}")
    if t.unit == "ns":
        return "nanos"
    return "ltz" if t.tz else "ntz"


def events_raw_schema(ts_type: DataType) -> StructType:
    return StructType(
        [
            StructField("event_id", LongType(), True),
            StructField("ts", ts_type, True),
            StructField("user_id", LongType(), True),
            StructField("event_type", StringType(), True),
            StructField("value", DoubleType(), True),
            StructField("props", StringType(), True),
        ]
    )


# Default declared schema (current testdata generation: µs TIMESTAMP_NTZ).
EVENTS_RAW_SCHEMA = events_raw_schema(TimestampNTZType())


def _stage_stream_dir(sf_dir: str) -> str:
    """The file stream source requires a *directory* (its basePath); the
    testdata ships one parquet file per table. Stage a per-sf landing
    directory containing a symlink — the exact layout a real ingest
    (files appended to a landing dir) would have. The stage key includes
    the source file's (mtime, size) so a regenerated testdata file never
    reuses a stale staging dir."""
    import hashlib
    import os

    src = os.path.abspath(f"{sf_dir}/events.parquet")
    st = os.stat(src)
    key = f"{src}:{st.st_mtime_ns}:{st.st_size}"
    stage = f"/tmp/hdb_stream_src_{hashlib.md5(key.encode()).hexdigest()[:10]}"
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "events.parquet")
    if not os.path.exists(link):
        os.symlink(src, link)
    return stage


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream of the events table, ``ts`` normalized to
    TIMESTAMP regardless of the producer's physical flavor."""
    # Pin BOTH confs the ts normalization depends on — nanosAsLong for
    # the INT64-nanos flavor and session TZ for the NTZ→TIMESTAMP cast
    # (timezone-sensitive): a bare non-UTC driver session whose FIRST
    # action is a streaming query must see the same event times as one
    # that ran read_table (which pins UTC at sources/readers.py) first.
    for k, v in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.session.timeZone", "UTC"),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:
            pass
    import os

    flavor = _events_ts_flavor(os.path.abspath(f"{sf_dir}/events.parquet"))
    ts_type: DataType = {
        "nanos": LongType(),
        "ntz": TimestampNTZType(),
        "ltz": TimestampType(),
    }[flavor]
    raw = (
        spark.readStream.schema(events_raw_schema(ts_type))
        .format("parquet")
        .load(_stage_stream_dir(sf_dir))
    )
    if flavor == "nanos":
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if flavor == "ntz":
        return raw.withColumn("ts", col("ts").cast("timestamp"))
    return raw


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


def stream_user_dedup_bounded(events: DataFrame) -> DataFrame:
    """Bounded-state streaming dedup (``dropDuplicatesWithinWatermark``):
    the variant a FOREVER-RUNNING stream needs. Plain ``dropDuplicates``
    keeps every key's state until the query dies — on an unbounded key
    domain (user × type here is small; think event_id or URL at 100 TB)
    the state store grows without limit. WithinWatermark guarantees
    dedup only among duplicates arriving inside the watermark horizon
    and EVICTS key state once the watermark passes, bounding the store
    by the horizon's key arrival rate. The trade: a duplicate arriving
    later than the horizon re-emits — which is the correct contract for
    ingest dedup where upstream retries cluster in time (exactly the
    at-least-once-delivery case this exists for)."""
    return (
        events.withWatermark("ts", WATERMARK)
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("event_id", "user_id", "event_type")
    )


def stream_static_enrich(events: DataFrame, nation: DataFrame) -> DataFrame:
    """Stream-static broadcast enrichment: each streaming event joins a
    STATIC dimension (the nation table, keyed by ``user_id % 25``) —
    the third join class Structured Streaming supports next to
    stream-stream and self-joins. The static side is re-read per
    microbatch (so a dim update between batches is picked up) and
    broadcast — the stream side is never shuffled and no state store is
    involved, which is what makes this the cheapest enrichment shape on
    an unbounded stream. Pure row enrichment (no agg, no watermark) ⇒
    append mode emits every joined row, so the result equals the batch
    twin exactly and carries its full value oracle."""
    dim = nation.select(
        col("n_nationkey").cast("int").alias("nk"), col("n_name")
    )
    return (
        events.withColumn("nk", (col("user_id") % 25).cast("int"))
        .join(F.broadcast(dim), "nk")
        .select("event_id", "user_id", col("n_name").alias("nation"))
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


# --- scale-adaptive state partitioning (r9 optimization round) ----------------
# A stateful streaming operator creates one state store per shuffle
# partition, and the partition count is frozen at the query's first
# batch — AQE is DISABLED inside streaming, so nothing coalesces the
# default down when the input is small. Measured at sf0.1 (≈200k events,
# 32 partitions): per-partition store open/commit overhead dominates —
# session windows 2.8–7.6s wall vs 1.4–1.8s at a size-derived count,
# identical results (state partitioning never changes aggregate/dedup
# semantics; the driver's bare 200-partition sessions already hash-match
# the 32-partition bench). So derive the count the way AQE would: rows
# from the parquet FOOTER (driver-side metadata, no data scan — the
# _events_ts_flavor discipline) divided by a target state-rows-per-
# partition, CLAMPED ABOVE by the session's configured
# spark.sql.shuffle.partitions. On a production cluster the configured
# value is large and the input is 100 TB, so the ceiling binds and
# behavior is unchanged; the derivation only ever *lowers* the count
# when the data provably fits in fewer stores.
STREAM_STATE_ROWS_PER_PARTITION = int(
    os.environ.get("SPARK_GRAFT_STREAM_STATE_ROWS", "65536")
)

# path -> (file-stat key, rows, complete). ``rows`` is a lower bound
# when ``complete`` is False (the short-circuit below fired).
_SOURCE_ROWS_CACHE: dict[str, tuple[tuple, int, bool]] = {}


def _dir_parquet_rows(path: str, stop_at: int | None = None) -> int | None:
    """Total footer row count over a landing directory's parquet files
    (symlinks followed), cached on the files' (mtime, size) so a
    re-staged directory never reuses stale counts.

    Short-circuits once ``stop_at`` rows are proven: the caller only
    uses the count to check whether the partition ceiling binds, so at
    100 TB / O(1e5) files the driver must not read every footer to
    learn what the first few already decide — the returned partial sum
    is >= ``stop_at`` and the ceiling binds. Any metadata failure (a
    file deleted between glob and stat, a corrupt or partially-written
    footer in a landing dir receiving concurrent appends) returns None
    -> the caller skips scaling instead of failing the query."""
    import glob

    import pyarrow.parquet as pq

    try:
        files = sorted(
            glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        )
        if not files:
            return None
        # One os.stat per file: two stats could straddle a concurrent
        # rewrite and mint a key matching neither version.
        stats = [os.stat(f) for f in files]
        key = tuple(
            (f, st.st_mtime_ns, st.st_size) for f, st in zip(files, stats)
        )
        hit = _SOURCE_ROWS_CACHE.get(path)
        if hit is not None and hit[0] == key:
            rows, complete = hit[1], hit[2]
            # A truncated count is reusable only if it already proves
            # this call's threshold; otherwise re-read (a higher
            # configured partition count needs a higher bound).
            if complete or (stop_at is not None and rows >= stop_at):
                return rows
        rows = 0
        complete = True
        for i, f in enumerate(files):
            rows += pq.read_metadata(f).num_rows
            if stop_at is not None and rows >= stop_at:
                complete = i == len(files) - 1
                break
        _SOURCE_ROWS_CACHE[path] = (key, rows, complete)
        return rows
    except Exception:  # metadata racing a live landing dir — skip scaling
        return None


def _analyzed_plan_string(streaming_df: DataFrame) -> str | None:
    try:
        return streaming_df._jdf.queryExecution().analyzed().toString()
    except Exception:  # Spark Connect: no _jdf on the client
        return None


def _stream_source_rows(plan: str, stop_at: int | None = None) -> int | None:
    """Sum of input rows across the stream's distinct file sources,
    read from the analyzed plan's ``FileSource[...]`` markers. Returns
    None (→ no scaling) when a source is not a parquet directory.
    ``stop_at`` propagates the footer-read short-circuit: once the sum
    proves the threshold, later sources need not be read at all."""
    import re

    paths = sorted(set(re.findall(r"FileSource\[([^\]]+)\]", plan)))
    if not paths:
        return None
    total = 0
    for p in paths:
        if p.startswith("file:"):  # URI-scheme FileSource → local path
            p = p.removeprefix("file:")
        if stop_at is not None and total >= stop_at:
            return total
        rows = _dir_parquet_rows(
            p, None if stop_at is None else stop_at - total
        )
        if rows is None:
            return None
        total += rows
    return total


def derived_stream_partitions(n_rows: int, configured: int) -> int:
    """ceil(rows / target-rows-per-store), clamped to [1, configured]."""
    derived = max(1, -(-n_rows // STREAM_STATE_ROWS_PER_PARTITION))
    return min(configured, derived)


def run_stream_to_df(
    streaming_df: DataFrame, spark: SparkSession, mode: str = "append"
) -> DataFrame:
    """Execute a finite streaming query to completion (availableNow
    trigger → memory sink) and return the result as a batch DataFrame.
    This is the driver-facing bridge: ``queries()`` callables must
    return DataFrames. ``mode="append"`` for watermarked windows (emit
    on finalization); ``mode="complete"`` for unwindowed running
    aggregates (e.g. sketch registers), where the last microbatch's
    full state is the result.

    The state-store partition count is derived from the source size
    (see ``derived_stream_partitions``) for the duration of the query
    and restored afterwards — the streaming twin of AQE coalescing,
    which streaming plans cannot use."""
    name = f"stream_out_{uuid.uuid4().hex[:12]}"
    prior: str | None = None
    plan = _analyzed_plan_string(streaming_df)
    # Python-stateful plans (applyInPandasWithState) are exempt: their
    # cost is per-GROUP Python work, which the partition count
    # parallelizes — measured 4.4s at the configured 32 partitions vs
    # 8.6s at the state-derived 4 (sf0.1). State-store overhead is the
    # minor term there; compute wins.
    try:
        configured = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except Exception:
        configured = 0
    # NOTE: the set/restore below mutates a session-global conf and
    # assumes no concurrent query planning shares this SparkSession
    # (true for the bench, the driver, and the tests, which are all
    # sequential). ``prior`` is read from the live conf value above.
    n_rows = (
        _stream_source_rows(
            plan, stop_at=configured * STREAM_STATE_ROWS_PER_PARTITION
        )
        if plan is not None
        and configured > 0
        and "FlatMapGroupsInPandasWithState" not in plan
        else None
    )
    if n_rows is not None and configured > 0:
        target = derived_stream_partitions(n_rows, configured)
        if target < configured:
            prior = str(configured)
            spark.conf.set("spark.sql.shuffle.partitions", str(target))
    try:
        query = (
            streaming_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
    finally:
        if prior is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prior)
    return spark.table(name)


def stream_hll_registers(events: DataFrame) -> DataFrame:
    """Distinct-user HyperLogLog registers as a STREAMING aggregate —
    the sketch is the canonical answer to streaming COUNT(DISTINCT):
    exact streaming distinct needs state proportional to the key
    domain (unbounded at 100 TB), while the HLL register table is a
    FIXED types × 256 rows of state no matter how many events or users
    flow through, and max-merge makes every microbatch a partial
    aggregate. Run in complete mode (no watermark needed: state is
    bounded by construction, not by time eviction); the batch fold
    (queries/events.py hll_fold) turns the final registers into the
    estimate."""
    from ..queries.events import hll_registers

    return hll_registers(events)


def stream_daily_counts(events: DataFrame) -> DataFrame:
    """Per-(event_type, day) volume as a STREAMING aggregate — the state
    backing the streaming EWMA twin. Complete mode: state is one row
    per (type, day) pair (types × elapsed-days — slowly growing; a
    production deployment past ~years of days would switch to a
    watermarked append window and fold only closed days, same
    downstream recurrence). Counts are partial-aggregable, so every
    microbatch merges map-side."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import col

    return events.groupBy(
        col("event_type"),
        F.to_date(col("ts")).cast("string").alias("day"),
    ).agg(F.count(F.lit(1)).alias("n"))


CMS_USER_D = 4
CMS_USER_W = 256


def stream_cms_user_cells(events: DataFrame) -> DataFrame:
    """Count-Min sketch cells over user_id as a STREAMING aggregate —
    the fixed-memory answer to streaming heavy hitters: state is
    exactly d × w = {D} × {W} cells no matter how many events or users
    flow through (the HLL-registers argument, applied to frequency).
    The CMS update is a commutative + into cells, so every microbatch
    is a partial aggregate and per-occurrence streaming increments are
    bit-identical to batch count-then-sum. ONE posexplode over the d
    bucket expressions (a d-way union of projections would re-execute
    the source per arm)."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import col

    from ..functions import hashing as H

    buckets = F.array(
        *[
            F.expr(
                f"({H.string_hash('uid', *H.DEFAULT_SEEDS[d])[0]}) % {CMS_USER_W}"
            )
            for d in range(CMS_USER_D)
        ]
    )
    return (
        events.select(col("user_id").cast("string").alias("uid"))
        .select(F.posexplode(buckets).alias("d", "bucket"))
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).alias("cell"))
    )


def stream_view_purchase_outer(events: DataFrame) -> DataFrame:
    """LEFT-OUTER stream-stream join: every (view, attributing purchase)
    pair — plus, once the watermark PROVES no purchase can still arrive
    for a view (global watermark past view_ts + horizon), the unmatched
    view with a NULL right side. The second half is the semantics the
    inner join cannot express: "this exposure definitively did not
    convert", emitted incrementally from bounded state instead of by an
    end-of-day batch anti-join.

    Same watermarks + closed event-time range as the inner variant, so
    state eviction (and with it outer emission) is guaranteed; unmatched
    rows for views still inside the horizon at end-of-stream are
    correctly withheld (they are not yet provably unconverted) — the
    batch twin encodes exactly that end-of-stream-watermark rule, making
    the result deterministic and value-oracled. Nullable join outputs
    are coalesced to -1 sentinels: both engines then emit non-null
    BIGINTs (a NULL bigint surfaces as a float column in pandas and
    breaks dtype-sensitive hashing)."""
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
        "leftOuter",
    ).select(
        "view_id",
        "user_id",
        F.coalesce(col("purchase_id"), F.lit(-1)).alias("purchase_key"),
        F.when(col("purchase_id").isNull(), 0)
        .otherwise(1)
        .cast("int")
        .alias("matched"),
        F.coalesce(
            F.unix_micros(col("purchase_ts")) - F.unix_micros(col("view_ts")),
            F.lit(-1),
        ).alias("micros_to_purchase"),
    )
