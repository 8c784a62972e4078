"""Incremental dedup: clean a NEW batch against an EXISTING corpus
without ever shuffling the corpus.

The daily shape of a crawl pipeline: the corpus is huge and already
deduplicated; today's batch is small. Re-running global dedup nightly
is O(corpus); the incremental plan is O(batch) plus one corpus *scan*:

1. the batch's distinct fingerprints broadcast into a **left-semi join
   against the corpus scan** — the corpus is filtered where it is read,
   never shuffled, and emits only the (batch-sized at most) set of
   colliding fingerprints;
2. that collision set broadcasts back for a **left-anti join against
   the batch** — also shuffle-free.

Both joins broadcast the small side, so total shuffle volume is the
batch's internal groupBy only. At a real deployment the semi-join scan
runs against a fingerprint *index table* (one BIGINT per corpus doc)
rather than the corpus itself; the plan is identical.

The fingerprint here is the polynomial hash of the first ``k`` tokens —
a prefix fingerprint, the cheap boilerplate/near-dup key (catches
shared leading boilerplate and copied openings that full-text hashes
miss), and bit-identical in the DuckDB oracle like the rest of
``functions.hashing``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from ..functions import hashing as H

PREFIX_K = 5


def prefix_fingerprint(text_col: str, k: int = PREFIX_K) -> Column:
    """BIGINT hash of the first ``k`` whitespace tokens (lower-cased)."""
    toks = H.tokens(text_col)[0]
    return F.expr(H.string_hash(f"concat_ws(' ', slice({toks}, 1, {k}))")[0])


def prefix_fingerprint_duck(text_col: str, k: int = PREFIX_K) -> str:
    """DuckDB twin of :func:`prefix_fingerprint`."""
    toks = H.tokens(text_col)[1]
    return H.string_hash(f"array_to_string(({toks})[1:{k}], ' ')")[1]


def dedup_incremental(
    batch: DataFrame,
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = PREFIX_K,
) -> DataFrame:
    """Batch rows that are new to the corpus: ``(id, fp)``, one row per
    surviving fingerprint (min-id survivor within the batch)."""
    fp = prefix_fingerprint(text_col, k).alias("fp")
    survivors = (
        batch.select(fp, col(id_col))
        .groupBy("fp")
        .agg(F.min(id_col).alias(id_col))
    )
    collisions = (
        corpus.select(fp)
        .join(F.broadcast(survivors.select("fp")), "fp", "left_semi")
        .distinct()
    )
    return survivors.join(F.broadcast(collisions), "fp", "left_anti").select(
        id_col, "fp"
    )
