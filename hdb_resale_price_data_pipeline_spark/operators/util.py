"""Shared operator plumbing."""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame


class ClosureValue:
    """Broadcast-shaped holder (``.value``) for sessions where
    ``SparkContext.broadcast`` is unavailable client-side (Spark
    Connect): the value rides each serialized task closure instead of
    the once-per-executor torrent broadcast. Fine for the bounded
    payloads this package ships (≤ a few hundred KiB bitsets /
    codebooks); a classic session always gets a real Broadcast."""

    __slots__ = ("value",)

    def __init__(self, value: Any) -> None:
        self.value = value

    # no-op lifecycle, so callers (IndexCache) can treat both alike
    def unpersist(self) -> None:  # pragma: no cover - trivial
        pass

    def destroy(self) -> None:  # pragma: no cover - trivial
        pass


def broadcast_value(spark, value: Any):
    """``sc.broadcast(value)`` on a classic session; a
    :class:`ClosureValue` under Spark Connect (no client-side
    SparkContext)."""
    try:
        sc = spark.sparkContext
    except Exception:  # Spark Connect client
        return ClosureValue(value)
    return sc.broadcast(value)


def widen(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition a narrow scan up to core count before expression-heavy
    per-row work (higher-order functions, vector math — the interpreted
    paths that don't get whole-stage codegen).

    Locally a single parquet file arrives as ONE input partition, so
    without this the 32-core box runs the hash/vector work single-
    threaded. On a cluster the scan is already wide (files × row-groups)
    and this is a no-op. The round-robin shuffle it inserts is tiny
    relative to the per-row work it parallelizes.
    """
    try:
        default_par = df.sparkSession.sparkContext.defaultParallelism
    except Exception:  # Spark Connect: no client-side context
        default_par = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
    target = min_partitions or default_par
    if df.isStreaming:
        # A file-source micro-batch arrives as maxFilesPerTrigger
        # partitions (usually 1) — always narrow; neither inputFiles()
        # nor .rdd is available on a streaming frame to probe.
        return df.repartition(target)
    try:
        # cheap: source-file count (a derived frame reports its scans'
        # files). Fewer files than cores → the scan is narrow. The
        # testdata ships single-row-group files, which parquet cannot
        # split further, so file count IS the scan parallelism here.
        narrow = len(df.inputFiles()) < target
    except Exception:
        narrow = df.rdd.getNumPartitions() < target
    if narrow:
        return df.repartition(target)
    return df
