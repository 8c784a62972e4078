"""Streaming corpus ingest: the documents table as a file-source
stream with a quality gate at the ingest boundary.

The continuous-ingest shape of a training-data pipeline: crawler
output lands as files in a directory; the stream scores each document
as it arrives (map-only — no watermark, no state) and routes it
keep/review/drop BEFORE it ever reaches the corpus, so downstream
dedup/decontamination work only on plausible documents. At 100 TB
the gate is embarrassingly parallel: every micro-batch is a
partition-parallel scan + codegen projection, and the same
``load_day_partitioned`` sink used by the batch pipelines gives
exactly-once day-partitioned landing (streaming/sink.py).

Same engineering discipline as the events stream (streaming/events.py):
the landing dir is staged keyed by the source's (mtime, size) so
regenerated testdata can never reuse stale staging, and the declared
schema is taken from the parquet footer, never assumed.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from ..operators import text as T


STREAM_SLICES = 4  # staged landing files → micro-batches


def _stage_docs_dir(spark: SparkSession, sf_dir: str) -> str:
    """Stage the single-file documents table as STREAM_SLICES landing
    files so the stream genuinely runs MULTIPLE micro-batches (one file
    per trigger) — a symlinked single file would collapse ingest into
    one batch and prove nothing about incremental arrival."""
    src = os.path.abspath(f"{sf_dir}/documents.parquet")
    st = os.stat(src)
    key = f"{src}:{st.st_mtime_ns}:{st.st_size}:{STREAM_SLICES}"
    stage = f"/tmp/hdb_docs_stream_{hashlib.md5(key.encode()).hexdigest()[:10]}"
    if not os.path.exists(os.path.join(stage, "_SUCCESS")):
        (
            spark.read.parquet(src)
            .repartition(STREAM_SLICES)
            .write.mode("overwrite")
            .parquet(stage)
        )
    return stage


def documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream of the documents table, schema pinned from
    the parquet footer (one footer-sized batch read — no inference, no
    assumption); one landing file per trigger."""
    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    return (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(_stage_docs_dir(spark, sf_dir))
    )


GATE_PREFIX_K = 2  # short prefix → real boilerplate-collision band


def stream_dedup_gate(docs: DataFrame, corpus: DataFrame) -> DataFrame:
    """Stream-static dedup gate: every arriving document is checked
    against the EXISTING corpus — exact duplicate via the full-text
    fingerprint, boilerplate near-dup via the ``GATE_PREFIX_K``-token
    prefix fingerprint — and routed drop/review/ingest BEFORE landing.

    This lifts the incremental-curation plan shape
    (operators/incremental.py: corpus fingerprints meet the batch via
    broadcast, the corpus is never shuffled) into the ingest stream:
    both corpus fingerprint sets are distinct-reduced once and broadcast
    into each micro-batch as stream-static left joins. Map-only, no
    watermark, no state store — append emits every row, so the
    batch-twin oracle is exact. At 100 TB the broadcast side is the
    fingerprint *index* (one BIGINT per corpus doc), not the corpus.
    """
    from pyspark.sql.functions import broadcast

    from ..functions import hashing as H
    from ..operators.incremental import prefix_fingerprint

    exact_fp = F.expr(H.string_hash("lower(text)")[0])
    corpus_exact = corpus.select(exact_fp.alias("c_fp")).distinct()
    corpus_prefix = corpus.select(
        prefix_fingerprint("text", GATE_PREFIX_K).alias("c_pfp")
    ).distinct()
    scored = docs.select(
        "doc_id",
        "lang",
        exact_fp.alias("fp"),
        prefix_fingerprint("text", GATE_PREFIX_K).alias("pfp"),
    )
    return (
        scored.join(broadcast(corpus_exact), col("fp") == col("c_fp"), "left")
        .join(broadcast(corpus_prefix), col("pfp") == col("c_pfp"), "left")
        .select(
            "doc_id",
            "lang",
            col("c_fp").isNotNull().cast("int").alias("is_exact_dup"),
            col("c_pfp").isNotNull().cast("int").alias("is_prefix_dup"),
            F.when(col("c_fp").isNotNull(), "drop_exact")
            .when(col("c_pfp").isNotNull(), "review_neardup")
            .otherwise("ingest")
            .alias("gate"),
        )
    )


def stream_quality_gate(docs: DataFrame) -> DataFrame:
    """Score + route each arriving document (map-only append stream):
    the quality band decides keep/review/drop at the ingest boundary.
    Deterministic per-document output — directly oracle-checkable
    against the batch twin."""
    score = T.quality_score("text")
    return docs.select(
        "doc_id",
        "lang",
        score.alias("quality"),
        F.when(score >= 0.6, "keep")
        .when(score >= 0.4, "review")
        .otherwise("drop")
        .alias("gate"),
        T.lang_id("text").alias("lang_pred"),
    )
