"""Streaming embedding ingest: arriving vectors routed into a TRAINED
IVF index at the ingest boundary.

The vector-side twin of streaming/documents.py: a production embedding
pipeline lands new vectors continuously, and each must be assigned to
its inverted list BEFORE it can be served — the assignment is the
index maintenance step (operators/ivf.assign_to_codebook is the same
Arrow pass the batch build uses, so stream and batch can never
disagree on a vector's list). Map-only: the trained codebook rides the
UDF closure (K×dim doubles), no state store, no watermark — append
emits every row and the batch-twin oracle (coarse-assignment CTE over
the Lloyd unroll) is exact.

At 100 TB the sink side of this stream is the ivf_cid-partitioned
layout of ``operators/index_store`` (``foreachBatch`` →
``partitionBy("ivf_cid")`` append): arriving vectors extend exactly
the inverted lists a cold-started server partition-prunes to. The
affinity to the assigned centroid is emitted quantized
(``floor(aff × grid)``) — the same integer-grid discipline as
``emb_outliers`` — so the ingest gate can ALSO threshold drift/garbage
vectors against per-cluster bounds without any cross-engine float
hazard.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import col

STREAM_SLICES = 4  # staged landing files → micro-batches


def _stage_emb_dir(spark: SparkSession, sf_dir: str) -> str:
    """Stage the embeddings table as STREAM_SLICES landing files so the
    stream runs multiple micro-batches (same staging discipline as
    streaming/documents._stage_docs_dir: keyed by source (mtime, size)
    so regenerated testdata can never reuse stale staging)."""
    src = os.path.abspath(f"{sf_dir}/embeddings.parquet")
    st = os.stat(src)
    key = f"{src}:{st.st_mtime_ns}:{st.st_size}:{STREAM_SLICES}"
    stage = f"/tmp/hdb_emb_stream_{hashlib.md5(key.encode()).hexdigest()[:10]}"
    if not os.path.exists(os.path.join(stage, "_SUCCESS")):
        (
            spark.read.parquet(src)
            .repartition(STREAM_SLICES)
            .write.mode("overwrite")
            .parquet(stage)
        )
    return stage


def embeddings_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream of the embeddings table, schema pinned from
    the parquet footer; one landing file per trigger."""
    schema = spark.read.parquet(f"{sf_dir}/embeddings.parquet").schema
    return (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(_stage_emb_dir(spark, sf_dir))
    )


def stream_append_to_ann_index(
    vecs: DataFrame,
    store_path: str,
    coarse: list[tuple[int, list[float]]],
    pq_codebooks: list[list[list[float]]],
    checkpoint_dir: str,
    available_now: bool = True,
):
    """The module docstring's sink, executed: a ``foreachBatch`` stream
    that assigns + PQ-encodes each arriving micro-batch with the STORED
    codebooks (never retrains — retraining would orphan existing codes)
    and publishes it into the persisted ``ivf_cid``-partitioned
    inverted lists via the EXACTLY-ONCE two-phase append
    (``operators/index_store.append_ann_index_idempotent`` — replays
    keyed by the checkpoint's stable batch_id converge instead of
    duplicating). Map-only per batch: codebooks ride the closure,
    zero shuffles; the landing write is the only disk work. Returns
    the StreamingQuery (caller awaits)."""
    from ..operators.index_store import append_ann_index_idempotent
    from ..operators.ivf import assign_to_codebook
    from ..operators.pq import pq_encode

    def _publish_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        encoded = pq_encode(
            assign_to_codebook(batch_df, "embedding", coarse),
            "embedding",
            pq_codebooks,
        )
        append_ann_index_idempotent(store_path, encoded, batch_id)

    writer = (
        vecs.writeStream.foreachBatch(_publish_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_ivf_ingest(
    vecs: DataFrame,
    codebook: list[tuple[int, list[float]]],
    grid: int,
) -> DataFrame:
    """Assign each arriving vector to its trained inverted list and
    emit ``(vec_id, ivf_cid, qaff)`` — qaff is the centroid affinity on
    the integer grid. Two closure-codebook Arrow passes (assign, then
    affinity-to-assigned), zero shuffles, zero state."""
    from ..operators.ivf import affinity_to_assigned, assign_to_codebook

    assigned = assign_to_codebook(vecs, "embedding", codebook)
    scored = affinity_to_assigned(assigned, "embedding", "ivf_cid", codebook)
    return scored.select(
        "vec_id",
        "ivf_cid",
        F.floor(col("aff") * grid).cast("long").alias("qaff"),
    )
