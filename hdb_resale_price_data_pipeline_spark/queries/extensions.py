"""Streaming + multimodal query registrations.

Streaming entries execute a real ``readStream`` plan to completion
(availableNow → memory sink) and return the result frame — incremental
execution has no DuckDB twin, so these are rows-only checks (oracle
None). The multimodal feature extraction DOES carry an oracle: its
Pandas-UDF polynomial fold over payload bytes equals the char-code fold
in SQL for ASCII payloads (operators/multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions import hashing as H
from ..operators.multimodal import (
    FEATURE_SEEDS,
    documents_as_assets,
    extract_features,
    sample_chunks,
)
from ..streaming import (
    events_stream,
    run_stream_to_df,
    stream_hourly_tumbling,
    stream_session_windows,
    stream_user_dedup,
)
from .base import QuerySpec, t


def q_stream_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_stream_to_df(stream_hourly_tumbling(events_stream(spark, sf_dir)), spark)


def q_stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_stream_to_df(stream_session_windows(events_stream(spark, sf_dir)), spark)


def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_stream_to_df(stream_user_dedup(events_stream(spark, sf_dir)), spark)


def q_stream_stateful_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): gap
    sessionizer with GroupState carried across microbatches."""
    from ..streaming.stateful import split_events_stream, stateful_sessions

    return run_stream_to_df(
        stateful_sessions(split_events_stream(spark, sf_dir)), spark
    )


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column feature extraction via Arrow-batched mapInPandas."""
    return extract_features(documents_as_assets(t(spark, sf_dir, "documents")))


def _features_oracle() -> str:
    cols = []
    for i, (a, b) in enumerate(FEATURE_SEEDS):
        fold = H.poly_fold(H.char_codes("text"), a, b)[1]
        cols.append(f"round(({fold})::DOUBLE / {H.MERSENNE_31}, 9) AS f{i}")
    cols_sql = ",\n       ".join(cols)
    return f"""
SELECT doc_id AS asset_id,
       length(text) AS n_bytes,
       {cols_sql}
FROM documents
"""


def q_multimodal_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk fan-out (frame-sampling shape). The payload here is UTF-8
    ASCII text, so byte-chunking equals char-chunking and the binary
    chunks decode losslessly to strings — which upgrades this from a
    rows-only check to a full value oracle (DuckDB substring windows)."""
    chunks = sample_chunks(documents_as_assets(t(spark, sf_dir, "documents")))
    from pyspark.sql import functions as F

    return chunks.withColumn("chunk", F.col("chunk").cast("string"))


_CHUNKS_SQL = """
WITH idx AS (
    SELECT doc_id, text,
           CAST(unnest(range(0, CAST(ceil(length(text) / 64.0) AS BIGINT))) AS INT) AS chunk_idx
    FROM documents
)
SELECT doc_id AS asset_id, chunk_idx,
       substring(text, chunk_idx * 64 + 1, 64) AS chunk
FROM idx
"""


QUERIES: dict[str, QuerySpec] = {
    "stream_hourly_tumbling": QuerySpec(q_stream_hourly, None),
    "stream_session_windows": QuerySpec(q_stream_sessions, None),
    "stream_user_dedup": QuerySpec(q_stream_dedup, None),
    "stream_stateful_sessions": QuerySpec(q_stream_stateful_sessions, None),
    "multimodal_features": QuerySpec(q_multimodal_features, _features_oracle()),
    "multimodal_chunks": QuerySpec(q_multimodal_chunks, _CHUNKS_SQL),
}


def q_stream_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream watermarked interval join (view → purchase
    attribution). With availableNow the whole source lands in one
    microbatch, so nothing is watermark-dropped and the result equals
    the batch twin exactly — which lets this streaming query carry the
    batch twin's full value oracle instead of a rows-only check."""
    from ..streaming.events import stream_view_purchase_join

    return run_stream_to_df(
        stream_view_purchase_join(events_stream(spark, sf_dir)), spark
    )


def _attribution_oracle() -> str:
    from .events import _EVENTS_ATTRIBUTION_SQL

    return _EVENTS_ATTRIBUTION_SQL


def q_stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static broadcast join (streaming/events.py): streaming
    events enriched against the static nation dim. No watermark and no
    aggregation, so append mode emits every row and the batch-equality
    oracle is exact."""
    from ..streaming.events import stream_static_enrich

    return run_stream_to_df(
        stream_static_enrich(events_stream(spark, sf_dir), t(spark, sf_dir, "nation")),
        spark,
    )


_STREAM_STATIC_SQL = """
SELECT event_id, user_id, n_name AS nation
FROM events JOIN nation ON user_id % 25 = n_nationkey
"""


LOCAL_QUERIES: dict[str, QuerySpec] = {
    "stream_attribution_join": QuerySpec(q_stream_attribution, _attribution_oracle()),
    "stream_static_enrich": QuerySpec(q_stream_static_enrich, _STREAM_STATIC_SQL),
}
