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


def dist_to_literal_centroid(emb_col: str, centroid: list[float]) -> str:
    """Σ (e_i − c_i)² as an explicit codegen chain (Spark SQL text)."""
    terms = []
    for i, v in enumerate(centroid, start=1):
        e = f"cast(element_at({emb_col}, {i}) AS double)"
        terms.append(f"(({e}) - {_lit(v)}) * (({e}) - {_lit(v)})")
    return "(" + " + ".join(terms) + ")"


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


def pairwise_l2_expr(a: str, b: str, dim: int) -> Column:
    """Σ (a_i − b_i)² between two array columns, codegen chain."""
    terms = []
    for i in range(1, dim + 1):
        ea = f"cast(element_at({a}, {i}) AS double)"
        eb = f"cast(element_at({b}, {i}) AS double)"
        terms.append(f"(({ea}) - ({eb})) * (({ea}) - ({eb}))")
    return F.expr("(" + " + ".join(terms) + ")")


def duck_l2(a: str, b: str) -> str:
    """DuckDB twin of the L2 fold (sequential, same order)."""
    da = f"CAST({a} AS DOUBLE[])"
    db = f"CAST({b} AS DOUBLE[])"
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"[(({da})[i] - ({db})[i]) * (({da})[i] - ({db})[i]) "
        f"for i in range(1, len({da}) + 1)]), (acc, x) -> acc + x)"
    )
