#!/usr/bin/env python3
"""Spill probe: demonstrate (and measure) shuffle-spill behavior under
memory pressure, and that PARTITION SIZING — not more memory — is the
fix.

The brief's "spill-aware" contract: size ``spark.sql.shuffle.partitions``
/ ``spark.sql.files.maxPartitionBytes`` so post-shuffle partitions fit
executor memory at the target SF. This probe makes the failure mode and
the fix concrete on local[32]:

1. a wide-row aggregation (10M rows × ~200-byte synthetic payload)
   shuffled into FEW partitions under a deliberately starved unified-
   memory pool (``spark.memory.fraction=0.1``) → execution memory
   exhausts and the sort/agg SPILLS (memory+disk spill bytes read from
   the Spark REST status API) — but completes: spill is graceful
   degradation, not failure;
2. the same job with shuffle partitions sized so each partition fits
   the starved pool → ZERO spill at the same memory budget.

AQE's ``advisoryPartitionSizeInBytes`` automates exactly this sizing on
a cluster; the probe pins the mechanism the advisory targets.

Run solo (shares the 32 cores): ``python tools/spill_probe.py``.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = 10_000_000
PAYLOAD_REPEAT = 25  # ~200 bytes of per-row shuffle payload


def _stage_spills(ui_port: int) -> list[tuple[int, int, int]]:
    """[(stageId, memoryBytesSpilled, diskBytesSpilled)] via the Spark
    REST status API on the local UI."""
    base = f"http://127.0.0.1:{ui_port}/api/v1"
    with urllib.request.urlopen(f"{base}/applications") as r:
        app_id = json.load(r)[0]["id"]
    with urllib.request.urlopen(f"{base}/applications/{app_id}/stages") as r:
        stages = json.load(r)
    return sorted(
        (
            s["stageId"],
            s.get("memoryBytesSpilled", 0),
            s.get("diskBytesSpilled", 0),
        )
        for s in stages
    )


def run_case(shuffle_partitions: int) -> None:
    """One probe case in a FRESH JVM (spark.memory.fraction is static).

    ``repartition(P, k).sortWithinPartitions(payload)``: the map side
    only WRITES shuffle blocks (serialized shuffle writer — record
    pointers in memory, data in pages), so the sorter that needs
    partition-sized execution memory runs on the REDUCE side — the side
    whose footprint ``spark.sql.shuffle.partitions`` controls. The
    LAST stage's spill therefore isolates exactly what partition
    sizing fixes."""
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.appName(f"spill-probe-{shuffle_partitions}")
        .master("local[8]")
        .config("spark.driver.memory", "2g")
        # starve the unified pool: forces execution memory pressure at
        # a size local[*] would otherwise absorb
        .config("spark.memory.fraction", "0.1")
        .config("spark.sql.adaptive.enabled", "false")  # pin partition count
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4049")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.range(ROWS).select(
        (F.col("id") % 1000).alias("k"),
        F.repeat(F.concat(F.lit("x"), F.col("id").cast("string")), PAYLOAD_REPEAT).alias(
            "payload"
        ),
    )
    t0 = time.perf_counter()
    (
        df.repartition(shuffle_partitions, F.col("k"))
        .sortWithinPartitions("payload")
        .write.mode("overwrite")
        .format("noop")
        .save()
    )
    wall = time.perf_counter() - t0
    stages = _stage_spills(4049)
    total_mem = sum(m for _, m, _ in stages)
    reduce_mem = stages[-1][1] if stages else 0
    reduce_disk = stages[-1][2] if stages else 0
    print(
        f"partitions={shuffle_partitions}: wall {wall:.1f}s, "
        f"REDUCE-stage spill mem={reduce_mem / 1e6:.0f}MB "
        f"disk={reduce_disk / 1e6:.0f}MB (all-stage mem {total_mem / 1e6:.0f}MB)"
    )
    spark.stop()


def main() -> None:
    part = sys.argv[1] if len(sys.argv) > 1 else None
    if part:  # child mode: one case per JVM (memory.fraction is static)
        run_case(int(part))
        return
    import subprocess

    for p in (4, 256):
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), str(p)], check=True
        )


if __name__ == "__main__":
    main()
