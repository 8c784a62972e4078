"""IVF (inverted-file) ANN index over an embedding column.

The second scale path for similarity search beside hyperplane LSH
(operators/similarity.py): partition vectors into K centroid lists, probe
only the ``nprobe`` lists nearest the query.

Design for scale:

- the codebook here is a deterministic sample (first K vectors) — at
  real scale you'd k-means it, but the *query plan* is identical;
- assignment is an Arrow-batched vectorized ``pandas_udf`` against the
  closure-broadcast codebook (K×dim floats), so labeling 100 TB of
  vectors is a shuffle-free map. A literal-inlined K×dim codegen
  expression is NOT used: at K×dim ≳ 500 terms the generated class blows
  the JVM 64KB/constant-pool limits, janino fails, and Spark silently
  falls back to *interpreted* per-row eval — ~4× slower than brute
  force (observed in round-1 bench at K=8, dim=64);
- the numpy accumulation walks dimensions in index order
  (``acc = acc + M[:, j] * c[j]``), reproducing the exact IEEE op
  sequence of the DuckDB oracle's sequential folds (same discipline as
  operators/similarity.py) — vectorized across rows, ordered across
  terms, so argmin ties cannot diverge from the oracle.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _lit(v: float) -> str:
    """Shortest round-trip repr — parses to the identical double in
    Spark SQL and DuckDB."""
    return repr(float(v))


def _sq_norm(vals: list[float]) -> float:
    """Sequential Σv² — the same IEEE op order as the SQL folds."""
    acc = 0.0
    for v in vals:
        acc = acc + float(v) * float(v)
    return acc


def dist_to_literal_centroid(emb_col: str, centroid: list[float]) -> str:
    """Centroid affinity |c|² − 2⟨c, e⟩ (Spark SQL text).

    Equals true L2² minus the centroid-independent |e|², so argmin is
    unchanged — at half the expression size of the (e−c)² form (each
    element referenced once) and with the |c|² part folded to a literal.
    The DuckDB twin (``duck_ivf_dist``) computes the exact same ops, so
    near-tie argmins cannot diverge.
    """
    terms = [
        f"cast(element_at({emb_col}, {i}) AS double) * {_lit(v)}"
        for i, v in enumerate(centroid, start=1)
    ]
    return f"({_lit(_sq_norm(centroid))} - 2.0 * ({' + '.join(terms)}))"


def assign_to_codebook(
    df: DataFrame, emb_col: str, codebook: list[tuple[int, list[float]]]
) -> DataFrame:
    """Append ``ivf_cid``: the id of the nearest codebook centroid
    (ties → lowest id). Requires codebook ids to be 0..K-1.

    Arrow-batched vectorized assignment: the codebook travels in the UDF
    closure (K×dim doubles — broadcast-sized), each batch is one numpy
    (n×dim) matrix, and per-centroid affinities |c|² − 2⟨c,e⟩ accumulate
    dimension-by-dimension in index order so every row reproduces the
    DuckDB oracle's sequential-fold IEEE op sequence exactly. Strict
    ``<`` on the running minimum makes ties resolve to the lowest
    centroid id, matching the oracle's ``row_number ... ORDER BY d, cid``.
    """
    from ..shipping import ensure_package_shipped

    ensure_package_shipped(df.sparkSession)

    ordered = sorted(codebook)
    assert [cid for cid, _ in ordered] == list(range(len(ordered))), (
        "codebook ids must be 0..K-1"
    )
    cents = [[float(v) for v in cent] for _, cent in ordered]
    sq_norms = [_sq_norm(cent) for cent in cents]

    @pandas_udf("int")
    def _nearest_centroid(emb: pd.Series) -> pd.Series:
        import numpy as np

        if len(emb) == 0:
            return pd.Series([], dtype="int32")
        mat = np.stack(emb.to_numpy()).astype(np.float64, copy=False)
        n = mat.shape[0]
        best_d = np.full(n, np.inf)
        best_i = np.zeros(n, dtype="int32")
        for idx, (cent, sq) in enumerate(zip(cents, sq_norms)):
            # dot walked in dimension order: identical per-row IEEE op
            # sequence to the literal `t1 + t2 + ...` chain and the
            # DuckDB list_reduce fold.
            acc = mat[:, 0] * cent[0]
            for j in range(1, len(cent)):
                acc = acc + mat[:, j] * cent[j]
            d = sq - 2.0 * acc
            take = d < best_d  # strict: ties keep the lower centroid id
            best_d = np.where(take, d, best_d)
            best_i = np.where(take, np.int32(idx), best_i).astype("int32")
        return pd.Series(best_i)

    return df.withColumn("ivf_cid", _nearest_centroid(F.col(emb_col)))


def affinity_to_assigned(
    df: DataFrame, emb_col: str, cid_col: str, codebook: list[tuple[int, list[float]]]
) -> DataFrame:
    """Append ``aff``: the centroid affinity |c|² − 2⟨c,e⟩ of each row
    to its ALREADY-ASSIGNED centroid (``cid_col``) — the per-vector
    anomaly signal the outlier detector thresholds. Same Arrow batch
    shape and the same dimension-order accumulation as
    :func:`assign_to_codebook`, so the value is bit-identical to the
    ``duck_ivf_dist`` fold the oracle computes at its ``rn = 1`` row."""
    import numpy as np

    from ..shipping import ensure_package_shipped

    ensure_package_shipped(df.sparkSession)
    ordered = sorted(codebook)
    assert [cid for cid, _ in ordered] == list(range(len(ordered))), (
        "codebook ids must be 0..K-1"  # cents_np[cid] gathers by position
    )
    # precomputed once at closure-build time, like assign_to_codebook —
    # per-batch Python folds over K×dim would be pure repeated work
    cents_np = np.asarray([[float(v) for v in c] for _, c in ordered])
    sq_np = np.asarray([_sq_norm([float(v) for v in c]) for _, c in ordered])

    @pandas_udf("double")
    def _aff(emb: pd.Series, cid: pd.Series) -> pd.Series:
        if len(emb) == 0:
            return pd.Series([], dtype="float64")
        mat = np.stack(emb.to_numpy()).astype(np.float64, copy=False)
        cix = cid.to_numpy(dtype=np.int64)
        cs = cents_np[cix]  # n × dim gather
        acc = mat[:, 0] * cs[:, 0]
        for j in range(1, mat.shape[1]):
            acc = acc + mat[:, j] * cs[:, j]  # dimension-order fold
        return pd.Series(sq_np[cix] - 2.0 * acc)

    return df.withColumn("aff", _aff(F.col(emb_col), F.col(cid_col)))


def pairwise_affinity_expr(cent: str, e: str, dim: int) -> Column:
    """|c|² − 2⟨c, e⟩ between two array columns (cent, query), codegen
    chain with the same op order as ``duck_ivf_dist``."""
    sq_terms = [
        f"cast(element_at({cent}, {i}) AS double) * cast(element_at({cent}, {i}) AS double)"
        for i in range(1, dim + 1)
    ]
    dot_terms = [
        f"cast(element_at({cent}, {i}) AS double) * cast(element_at({e}, {i}) AS double)"
        for i in range(1, dim + 1)
    ]
    return F.expr(f"(({' + '.join(sq_terms)}) - 2.0 * ({' + '.join(dot_terms)}))")


def duck_ivf_dist(cent: str, e: str) -> str:
    """DuckDB twin of the centroid affinity (sequential folds, same op
    order: |c|² fold, then − 2·dot fold)."""
    dc = f"CAST({cent} AS DOUBLE[])"
    de = f"CAST({e} AS DOUBLE[])"
    sq = (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"[({dc})[i] * ({dc})[i] for i in range(1, len({dc}) + 1)]), (acc, x) -> acc + x)"
    )
    dot = (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"[({dc})[i] * ({de})[i] for i in range(1, len({dc}) + 1)]), (acc, x) -> acc + x)"
    )
    return f"(({sq}) - 2.0 * ({dot}))"
