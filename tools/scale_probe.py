#!/usr/bin/env python3
"""Scale probe: replicate sf0.1 lineitem/orders 16× (9.6M / 2.4M rows)
into /tmp and push the headline plan shapes through — the local check
that the partition/shuffle strategy survives an order of magnitude
before it meets a cluster.

Observed on local[32] (round 1): scan-agg 9.6M rows 1.5s (vs 0.65s at
600k — sublinear, scheduling floor amortizes), fact-fact join
9.6M × 2.4M 3.2s (AQE-planned SMJ/shuffled-hash), per-key window over
2.4M rows 2.3s. No spills, no OOM at default confs.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.functions import col
from pyspark.sql.window import Window

from hdb_resale_price_data_pipeline_spark.session import get_spark_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
STAGE = "/tmp/scale16"
COPIES = 16


def stage(spark) -> None:
    if os.path.exists(f"{STAGE}/_done"):
        return
    for table, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
        base = spark.read.parquet(f"{SF_DIR}/{table}.parquet")
        out = base
        for i in range(1, COPIES):
            out = out.unionByName(base.withColumn(key, col(key) + F.lit(i * 10_000_000)))
        out.repartition(32).write.mode("overwrite").parquet(f"{STAGE}/{table}")
    open(f"{STAGE}/_done", "w").close()


def main() -> None:
    spark = get_spark_session(app_name="scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    stage(spark)
    li = spark.read.parquet(f"{STAGE}/lineitem")
    orders = spark.read.parquet(f"{STAGE}/orders")
    print(f"rows: lineitem={li.count():,} orders={orders.count():,}")

    t0 = time.perf_counter()
    li.filter(col("l_shipdate") <= F.lit("1998-09-02")).groupBy(
        "l_returnflag", "l_linestatus"
    ).agg(F.sum("l_quantity"), F.avg("l_discount"), F.count(F.lit(1))).collect()
    print(f"scan-agg: {time.perf_counter() - t0:.2f}s")

    t0 = time.perf_counter()
    li.join(orders, col("l_orderkey") == col("o_orderkey")).groupBy("o_orderstatus").agg(
        F.round(F.sum(col("l_extendedprice") * (1 - col("l_discount"))), 2)
    ).collect()
    print(f"fact-fact join: {time.perf_counter() - t0:.2f}s")

    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    t0 = time.perf_counter()
    orders.withColumn("rn", F.row_number().over(w)).filter("rn<=3").count()
    print(f"window top-3/customer: {time.perf_counter() - t0:.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
