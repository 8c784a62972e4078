"""IVF (inverted-file) ANN index over an embedding column.

The second scale path for similarity search beside hyperplane LSH
(operators/similarity.py): partition vectors into K centroid lists, probe
only the ``nprobe`` lists nearest the query.

Design for scale:

- the codebook here is a deterministic sample (first K vectors) — at
  real scale you'd k-means it, but the *query plan* is identical;
- assignment is a pure literal expression (the codebook is collected to
  the driver — K×dim floats — and inlined), so labeling 100 TB of
  vectors is a shuffle-free codegen map, not a crossJoin;
- distances are explicit left-associative arithmetic, bit-identical to
  the DuckDB oracle's sequential folds (same discipline as
  operators/similarity.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


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
    (ties → lowest id).

    The K distance expressions go into ONE array column; the argmin is
    ``array_position(arr, array_min(arr))`` — each distance is computed
    exactly once (a CASE/least formulation re-references every distance
    K+1 times, which explodes generated code past the JIT limit).
    Requires codebook ids to be 0..K-1 (array position ↔ id).
    """
    ordered = sorted(codebook)
    assert [cid for cid, _ in ordered] == list(range(len(ordered))), (
        "codebook ids must be 0..K-1"
    )
    staged = df.select(
        "*",
        F.array(
            *[F.expr(dist_to_literal_centroid(emb_col, cent)) for _, cent in ordered]
        ).alias("_dists"),
    )
    return staged.withColumn(
        "ivf_cid",
        (F.expr("array_position(_dists, array_min(_dists))") - 1).cast("int"),
    ).drop("_dists")


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
