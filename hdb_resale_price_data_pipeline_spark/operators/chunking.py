"""RAG-style document chunking: overlapping token windows.

A training/retrieval pipeline cuts each document into fixed-size token
windows with a stride smaller than the window (overlap preserves context
across chunk boundaries). This is the per-document counterpart of
``operators/packing.py`` (which concatenates documents into sequences):
chunking fans one row out to many, packing folds many rows into few.

Spark shape: ONE scan, ZERO shuffles — the token array is materialized
once per row, chunk starts are generated with ``sequence`` and
``explode``d map-side, and each chunk's token slice / text / length are
codegen array expressions. At 100 TB the fan-out multiplies rows by
``~n_tokens/stride`` inside the same stage; downstream consumers decide
their own partitioning (the chunker imposes none).

Chunk-boundary spec (deterministic, engine-agnostic):
  starts   = 0, stride, 2*stride, ... while start < n_tokens
  n_chunks = max(ceil(n_tokens / stride), 1)   # empty doc -> 1 empty chunk
  chunk_i  = tokens[start : start + window]    # last chunks may be short
Every token is covered (stride <= window) and the chunk list is
identical in Spark and the DuckDB oracle, so the driver's value-hash
comparison is exact — no floats anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _tokens_sql(text_col: str) -> str:
    """Whitespace tokens, original case preserved (chunk text must
    round-trip the document, so no lowercasing here)."""
    return f"filter(split({text_col}, ' '), x -> x <> '')"


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Fan each document out to its overlapping token-window chunks.

    Returns one row per (document, chunk): ``id_col``, ``chunk_id``
    (0-based), ``start_token``, ``n_chunk_tokens``, ``chunk_text``.
    """
    if not 0 < stride <= window:
        raise ValueError(f"need 0 < stride <= window, got {stride=} {window=}")
    toks = F.expr(_tokens_sql(text_col))
    # Materialize the token array once per row, then explode the chunk-id
    # range. Integer ceil-div keeps both engines in BIGINT arithmetic.
    chunked = (
        df.select(F.col(id_col), toks.alias("_toks"))
        .withColumn(
            "_n_chunks",
            F.greatest(
                F.expr(f"(size(_toks) + {stride} - 1) div {stride}"), F.lit(1)
            ),
        )
        .select(
            id_col,
            "_toks",
            F.explode(F.expr("sequence(0, _n_chunks - 1)")).alias("chunk_id"),
        )
    )
    start = (F.col("chunk_id") * stride).cast("long")
    chunk_toks = F.expr(f"slice(_toks, chunk_id * {stride} + 1, {window})")
    return chunked.select(
        id_col,
        "chunk_id",
        start.alias("start_token"),
        F.size(chunk_toks).alias("n_chunk_tokens"),
        F.concat_ws(" ", chunk_toks).alias("chunk_text"),
    )


def chunk_documents_duck(
    table: str,
    id_col: str,
    text_col: str,
    window: int = 64,
    stride: int = 48,
) -> str:
    """DuckDB oracle: identical boundary arithmetic over list slices."""
    toks = f"list_filter(string_split({text_col}, ' '), x -> x <> '')"
    return f"""
WITH toks AS (
    SELECT {id_col}, {toks} AS tk FROM {table}
), fanned AS (
    SELECT {id_col}, tk,
           unnest(range(0, greatest((len(tk) + {stride} - 1) // {stride}, 1)))
               AS chunk_id
    FROM toks
)
SELECT {id_col},
       chunk_id,
       CAST(chunk_id * {stride} AS BIGINT) AS start_token,
       CAST(len(tk[chunk_id * {stride} + 1 : chunk_id * {stride} + {window}])
            AS INT) AS n_chunk_tokens,
       array_to_string(tk[chunk_id * {stride} + 1 : chunk_id * {stride} + {window}],
                       ' ') AS chunk_text
FROM fanned
"""
