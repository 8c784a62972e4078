#!/usr/bin/env python3
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is total wall-clock over the suite. Each query is executed to
completion (count() action — results are consumed, not collected, so the
measurement is plan execution, not driver materialization).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hdb_resale_price_data_pipeline_spark.queries import all_queries
from hdb_resale_price_data_pipeline_spark.session import get_spark_session

# Headline suite: the scan/join/agg/window/dedup/similarity workloads that
# dominate at scale. (Quadratic-verification demos like blocked pairwise
# jaccard run in correctness, not in the bench loop.)
BENCH_QUERIES = [
    "pricing_summary",
    "avg_revenue_by_region_year",
    "region_nation_revenue",
    "shipping_priority_top10",
    "customer_windows",
    "orders_cube",
    "events_hourly_pivot",
    "events_sessionize",
    "dedup_exact",
    "dedup_least_nulls",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "text_fingerprint",
    "text_top_tokens",
    "text_profile",
    "text_repetition",
    "emb_cosine_topk",
    "emb_ann_lsh_topk",
    "emb_ivf_topk",
    "events_asof_attribution",
    "events_salted_totals",
    "multimodal_features",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark_session(app_name="hdb-pipeline-bench")
    spark.sparkContext.setLogLevel("ERROR")

    registry = all_queries()
    timings: dict[str, float] = {}

    # Per-query warm run (codegen/JIT/scan-cache), then one timed run:
    # reported numbers are steady-state execution, not first-touch
    # compilation, which is what matters for a long-lived cluster.
    total = 0.0
    for name in BENCH_QUERIES:
        registry[name].fn(spark, sf_dir).count()
        start = time.perf_counter()
        n = registry[name].fn(spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - start, 3)
        total += timings[name]
        print(f"# {name}: {timings[name]:.3f}s rows={n}", file=sys.stderr)
    total = round(total, 3)

    print(
        json.dumps(
            {
                "metric": "bench_suite_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
