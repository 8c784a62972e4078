"""Materialized rollup: incremental refresh must equal a full rebuild
bit-for-bit (the DECIMAL-sums design point), touching only affected
day partitions."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F
from pyspark.sql.functions import col

from conftest import TEST_SF_DIR
from hdb_resale_price_data_pipeline_spark.operators.rollup import (
    build_hourly_rollup,
    daily_from_hourly,
    refresh_rollup,
    write_rollup,
)
from hdb_resale_price_data_pipeline_spark.sources import read_table


def _canon_rows(df):
    return sorted(
        (str(r.hour_start), r.event_type, r.n_events, str(r.sum_value))
        for r in df.select(
            "hour_start", "event_type", "n_events", "sum_value"
        ).collect()
    )


def test_incremental_refresh_equals_full_rebuild(spark, tmp_path):
    ev = read_table(spark, TEST_SF_DIR, "events")
    first = ev.filter(col("event_id") % 3 != 0)
    late = ev.filter(col("event_id") % 3 == 0)  # late rows across ALL days
    path = str(tmp_path / "rollup")

    write_rollup(build_hourly_rollup(first), path)
    before_days = set(os.listdir(path)) - {"_SUCCESS"}
    refresh_rollup(spark, path, late)

    got = spark.read.parquet(path)
    want = build_hourly_rollup(ev)
    assert _canon_rows(got) == _canon_rows(want)
    assert set(os.listdir(path)) - {"_SUCCESS"} == before_days

    # and the daily view over the refreshed table matches raw-daily too
    daily_got = {
        (r.day, r.event_type): (r.n_events, r.total_value, r.avg_value)
        for r in daily_from_hourly(
            got.select("hour_start", "event_type", "n_events", "sum_value")
        ).collect()
    }
    daily_want = {
        (r.day, r.event_type): (r.n_events, r.total_value, r.avg_value)
        for r in daily_from_hourly(build_hourly_rollup(ev)).collect()
    }
    assert daily_got == daily_want


def test_refresh_touches_only_affected_partitions(spark, tmp_path):
    ev = read_table(spark, TEST_SF_DIR, "events").withColumn(
        "day", F.date_trunc("day", col("ts")).cast("date")
    )
    days = sorted(r[0] for r in ev.select("day").distinct().collect())
    assert len(days) >= 2
    path = str(tmp_path / "rollup2")
    write_rollup(build_hourly_rollup(ev.drop("day")), path)

    other_day_files = {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{path}/day={days[0]}/*.parquet")
    }
    late = ev.filter(col("day") == days[-1]).drop("day")
    refresh_rollup(spark, path, late)
    # day[0] partition untouched byte-for-byte
    assert {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{path}/day={days[0]}/*.parquet")
    } == other_day_files
