"""Streaming CDC apply tests (streaming/cdc.py): copy-on-write bucket
pruning, touched-but-emptied bucket clearing (the live bug the
correlated delete predicate exposed), and seq-LWW replay convergence.
The end-to-end state is value-diffed against its DuckDB oracle by the
correctness suite (stream_cdc_apply)."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F
from pyspark.sql.functions import col

from hdb_resale_price_data_pipeline_spark.streaming.cdc import (
    read_cdc_state,
    stream_cdc_apply,
)

SCHEMA = "o_orderkey bigint, seq int, op string, price_cents bigint"


def _run_wave(spark, rows, landing, root, tag, df=None):
    wave = df if df is not None else spark.createDataFrame(rows, SCHEMA)
    wave.select("o_orderkey", "seq", "op", "price_cents").coalesce(1).write.mode(
        "append"
    ).parquet(landing)
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

    # wave 3 DELETES every key of bucket 2 (key 2): the delete is
    # retained as a TOMBSTONE (deleted=true) — the live view drops it,
    # the raw state keeps it (so a stale earlier-seq upsert can never
    # resurrect the key), and the bucket partition is rewritten rather
    # than left with its stale pre-delete files (the correlated-
    # predicate bug the first cut had).
    _run_wave(spark, [(2, 3, "delete", None)], landing, root, "w3")
    assert _state(spark, root) == {4: (100, 1), 1: (201, 2), 5: (500, 2)}
    raw = {
        r.o_orderkey: (r.last_seq, r.deleted)
        for r in read_cdc_state(
            spark, os.path.join(root, "state"), include_tombstones=True
        ).collect()
    }
    assert raw[2] == (3, True), "delete must persist as a tombstone"


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


def test_diff_changelog_roundtrip_reproduces_new_snapshot(spark, tmp_path):
    """The versioning family's consistency contract: loading the OLD
    snapshot, then applying the CHANGELOG DERIVED FROM dataset_diff's
    added/changed→upsert, removed→delete classification, must converge
    the state table to exactly the NEW snapshot — diff ∘ apply =
    snapshot replace, at per-bucket copy-on-write cost instead of a
    full rewrite."""
    import os

    from conftest import TEST_SF_DIR

    root = str(tmp_path)
    landing = os.path.join(root, "landing")
    orders = spark.read.parquet(f"{TEST_SF_DIR}/orders.parquet").select(
        "o_orderkey",
        F.floor(col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
    )
    k = col("o_orderkey")
    old = orders.filter(k % 7 != 3)
    new = orders.filter(k % 11 != 5).withColumn(
        "cents", F.when(k % 5 == 0, col("cents") + 100).otherwise(col("cents"))
    )

    # wave 1: the old snapshot as seq-1 upserts
    _run_wave(
        spark,
        None,
        landing,
        root,
        "w1",
        df=old.select(
            "o_orderkey",
            F.lit(1).alias("seq"),
            F.lit("upsert").alias("op"),
            col("cents").alias("price_cents"),
        ),
    )
    # wave 2: the diff as a changelog — added/changed upsert, removed delete
    o = old.select("o_orderkey", col("cents").alias("old_c"))
    n = new.select("o_orderkey", col("cents").alias("new_c"))
    diff = o.join(n, "o_orderkey", "full_outer")
    changelog2 = (
        diff.filter(col("new_c").isNull())
        .select(
            "o_orderkey",
            F.lit(2).alias("seq"),
            F.lit("delete").alias("op"),
            F.lit(None).cast("bigint").alias("price_cents"),
        )
        .unionByName(
            diff.filter(
                col("new_c").isNotNull()
                & (col("old_c").isNull() | (col("old_c") != col("new_c")))
            ).select(
                "o_orderkey",
                F.lit(2).alias("seq"),
                F.lit("upsert").alias("op"),
                col("new_c").alias("price_cents"),
            )
        )
    )
    _run_wave(spark, None, landing, root, "w2", df=changelog2)

    got = {k_: v for k_, (v, _) in _state(spark, root).items()}
    want = {r.o_orderkey: r.cents for r in new.collect()}
    assert got == want, "diff ∘ apply must equal the new snapshot"


def test_out_of_order_delete_is_not_resurrected(spark, tmp_path):
    """Cross-batch ORDER independence: a seq-2 delete delivered BEFORE
    the seq-1 upsert (mtime tie / unspecified file order) must still
    win — the tombstone's higher seq rejects the stale upsert. Without
    retained tombstones the early delete would be a no-op on empty
    state and the late upsert would resurrect the key."""
    import os

    root = str(tmp_path)
    landing = os.path.join(root, "landing")
    _run_wave(spark, [(6, 2, "delete", None)], landing, root, "w1")
    assert _state(spark, root) == {}
    _run_wave(spark, [(6, 1, "upsert", 600)], landing, root, "w2")
    assert _state(spark, root) == {}, "stale upsert resurrected a deleted key"
    raw = {
        r.o_orderkey: (r.last_seq, r.deleted)
        for r in read_cdc_state(
            spark, os.path.join(root, "state"), include_tombstones=True
        ).collect()
    }
    assert raw[6] == (2, True)
