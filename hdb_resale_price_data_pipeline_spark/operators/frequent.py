"""Frequent-items (heavy-hitter) detection: Misra-Gries candidate
sketch + exact verification pass.

The classic two-pass exact heavy-hitter algorithm for data too large to
group-by in full:

1. **Candidate pass** — each partition runs a Misra-Gries summary
   (Misra & Gries 1982; the deterministic ancestor of Space-Saving)
   with ``capacity`` counters over its rows: admit a new key while a
   counter is free, otherwise decrement ALL counters and drop the
   zeroed ones. A partition of n_p rows emits ≤ capacity candidate
   keys, and every key with partition count > n_p/(capacity+1)
   survives. Pigeonhole across partitions: a key with GLOBAL count
   > N/(capacity+1) must exceed that rate in at least one partition, so
   the union of per-partition candidates is a SUPERSET of every global
   heavy hitter. The sketch runs in an Arrow ``mapInPandas`` (the
   designated vectorized-Python boundary — Spark has no builtin MG) and
   its output is candidate keys only: ≤ capacity × partitions rows,
   independent of N.

2. **Exact pass** — the bounded candidate set broadcasts back onto the
   corpus; only matching rows are counted (one shuffle over the heavy
   keys' rows, never a full-domain group-by), and the final threshold
   ``count * factor > N`` keeps exactly the true heavy hitters.

The OUTPUT is therefore exact and partition-layout-independent — the
sketch only decides which keys get exact-counted, and the guarantee
(``capacity + 1 >= factor``, asserted) makes the candidate superset
cover the threshold. That's what makes the operator oracle-able by a
plain ``GROUP BY ... HAVING`` at test scale while running fixed-memory
at 100 TB: the full-domain group-by the oracle uses is the exact
thing the two-pass structure avoids.

No reference counterpart (the reference has no sketch surface); this
extends the engine's mergeable-sketch family (HLL, histogram
quantiles) with the frequent-items sketch every OLAP/streaming engine
ships.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col


def misra_gries_candidates(
    df: DataFrame, key_col: str, capacity: int
) -> DataFrame:
    """Per-partition Misra-Gries candidate keys (≤ ``capacity`` per
    partition). Union across partitions ⊇ every key with global count
    > N/(capacity+1)."""

    def _mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[object, int] = {}
        for pdf in batches:
            # vectorized pre-aggregation: within an Arrow batch, count
            # first (value_counts), then fold the per-key totals into
            # the MG state — identical result to row-at-a-time MG
            # admission/decrement, at pandas speed.
            for key, cnt in pdf[key_col].value_counts().items():
                cnt = int(cnt)
                if key in counters:
                    counters[key] += cnt
                elif len(counters) < capacity:
                    counters[key] = cnt
                else:
                    dec = min(cnt, min(counters.values()))
                    cnt -= dec
                    counters = {
                        k: v - dec for k, v in counters.items() if v > dec
                    }
                    if cnt > 0:
                        counters[key] = cnt
        yield pd.DataFrame({key_col: list(counters.keys())})

    return df.select(key_col).mapInPandas(
        _mg, schema=df.select(key_col).schema
    )


def exact_heavy_hitters(
    df: DataFrame, key_col: str, factor: int, capacity: int | None = None
) -> DataFrame:
    """Exact keys with ``count * factor > N`` via the two-pass
    MG-candidates + verify structure (module docstring). Returns
    ``(key_col, cnt)``.

    NULL keys are handled out-of-band (r7 review finding): pandas
    ``value_counts`` drops NaN so NULL can never become an MG
    candidate, and the verify equi-join can't match NULL either —
    but a ``GROUP BY`` oracle emits a NULL group. The null count is
    exact from the same 1-row total aggregate (no extra pass) and a
    NULL row is unioned in iff it clears the threshold."""
    if capacity is None:
        capacity = 2 * factor - 1
    if capacity + 1 < factor:
        raise ValueError(
            f"capacity {capacity} cannot guarantee threshold N/{factor}: "
            f"need capacity + 1 >= factor"
        )
    cands = misra_gries_candidates(df, key_col, capacity).distinct()
    total = df.agg(
        F.count(F.lit(1)).alias("n"),
        (F.count(F.lit(1)) - F.count(key_col)).alias("n_null"),
    )
    counts = (
        df.join(F.broadcast(cands), key_col)
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    hot = (
        counts.crossJoin(F.broadcast(total))
        .filter(col("cnt") * factor > col("n"))
        .select(key_col, "cnt")
    )
    null_hot = total.filter(col("n_null") * factor > col("n")).select(
        F.lit(None).cast(df.schema[key_col].dataType).alias(key_col),
        col("n_null").alias("cnt"),
    )
    return hot.unionByName(null_hot)
