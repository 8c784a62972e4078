"""Streaming CDC apply tests (streaming/cdc.py): copy-on-write bucket
pruning, touched-but-emptied bucket clearing (the live bug the
correlated delete predicate exposed), and seq-LWW replay convergence.
The end-to-end state is value-diffed against its DuckDB oracle by the
correctness suite (stream_cdc_apply)."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from hdb_resale_price_data_pipeline_spark.streaming.cdc import (
    read_cdc_state,
    stream_cdc_apply,
)

SCHEMA = "o_orderkey bigint, seq int, op string, price_cents bigint"


def _run_wave(spark, rows, landing, root, tag):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(
        landing
    )
    q = stream_cdc_apply(
        spark.readStream.schema(SCHEMA).parquet(landing),
        state_dir=os.path.join(root, "state"),
        checkpoint_dir=os.path.join(root, "ckpt"),
        buckets=4,
    )
    q.awaitTermination()


def _state(spark, root):
    return {
        r.o_orderkey: (r.price_cents, r.last_seq)
        for r in read_cdc_state(spark, os.path.join(root, "state")).collect()
    }


def test_upsert_delete_and_cow_bucket_pruning(spark, tmp_path):
    root = str(tmp_path)
    landing = os.path.join(root, "landing")
    # wave 1: keys in buckets 0,1,2 (keys 4, 1, 2)
    _run_wave(
        spark,
        [(4, 1, "upsert", 100), (1, 1, "upsert", 200), (2, 1, "upsert", 300)],
        landing,
        root,
        "w1",
    )
    assert _state(spark, root) == {4: (100, 1), 1: (200, 1), 2: (300, 1)}
    b0 = os.path.join(root, "state", "bucket=0")
    before = {
        f: os.path.getmtime(os.path.join(b0, f))
        for f in os.listdir(b0)
        if not f.startswith(("_", "."))
    }

    # wave 2 touches ONLY bucket 1 (key 5 insert, key 1 update)
    _run_wave(
        spark,
        [(5, 2, "upsert", 500), (1, 2, "upsert", 201)],
        landing,
        root,
        "w2",
    )
    assert _state(spark, root) == {
        4: (100, 1),
        1: (201, 2),
        5: (500, 2),
        2: (300, 1),
    }
    after = {
        f: os.path.getmtime(os.path.join(b0, f))
        for f in os.listdir(b0)
        if not f.startswith(("_", "."))
    }
    assert before == after, "untouched bucket rewritten — copy-on-write broken"

    # wave 3 DELETES every key of bucket 2 (key 2): dynamic partition
    # overwrite alone would leave the stale files (the correlated-
    # predicate bug) — the touched-but-empty bucket must be cleared.
    _run_wave(spark, [(2, 3, "delete", None)], landing, root, "w3")
    assert _state(spark, root) == {4: (100, 1), 1: (201, 2), 5: (500, 2)}
    assert not os.path.isdir(os.path.join(root, "state", "bucket=2"))


def test_replay_converges_by_sequence_lww(spark, tmp_path):
    root = str(tmp_path)
    landing = os.path.join(root, "landing")
    _run_wave(
        spark,
        [(7, 1, "upsert", 700), (3, 1, "upsert", 300), (3, 2, "delete", None)],
        landing,
        root,
        "w1",
    )
    final = _state(spark, root)
    assert final == {7: (700, 1)}
    # replay EVERYTHING from scratch onto the existing state (checkpoint
    # wiped → the stream re-delivers every change): seq-LWW application
    # must converge to the same state, no duplicates, no resurrection.
    shutil.rmtree(os.path.join(root, "ckpt"))
    q = stream_cdc_apply(
        spark.readStream.schema(SCHEMA).parquet(landing),
        state_dir=os.path.join(root, "state"),
        checkpoint_dir=os.path.join(root, "ckpt"),
        buckets=4,
    )
    q.awaitTermination()
    assert _state(spark, root) == final
