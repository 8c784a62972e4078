"""Greedy k-center coreset selection over an embedding column — the
diversity-maximizing data-selection method (pick the point FARTHEST
from everything already selected, k times): a small set whose max-min
distance 2-approximates the optimal k-center cover, used to pick
maximally-diverse exemplars for labeling/eval/distillation.

Execution shape: a k-bounded driver loop (the BPE-merge-loop
discipline — the collect is ONE vector per step, never corpus-sized).
Each step is one shuffle-free Arrow pass computing every point's full
L2² distance to its nearest selected center, then a TakeOrdered(1)
argmax with a vec_id tiebreak. k passes over the corpus total; at
100 TB each pass is an embarrassingly parallel map.

Cross-engine exactness (the operators/ivf.py discipline): the numpy
kernel accumulates dimensions IN INDEX ORDER, |c|² folds sequentially
on the driver, and the full distance is assembled as
``(|c|² − 2⟨c,e⟩) + |e|²`` — the identical IEEE op sequence as the
DuckDB oracle's list_reduce folds, so the per-step argmax (a raw
double comparison) cannot diverge between engines. Unlike the ANN
surrogate ``|c|² − 2⟨c,e⟩``, k-center needs the FULL distance: the
dropped |e|² is constant per point for argmin over centers, but the
selection argmax compares ACROSS points.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col, pandas_udf

from .ivf import _sq_norm


def min_full_dist_to_centers(centers: list[list[float]]):
    """Arrow kernel: per-row min over ``centers`` of the full L2²
    distance, dimension-ordered accumulation (see module docstring)."""

    @pandas_udf("double")
    def kern(embs: pd.Series) -> pd.Series:
        import numpy as np

        M = np.stack([np.asarray(v, dtype=np.float64) for v in embs])
        n, dim = M.shape
        en = np.zeros(n)
        for j in range(dim):
            en = en + M[:, j] * M[:, j]
        best = None
        for c in centers:
            sq = _sq_norm(c)
            dot = np.zeros(n)
            for j in range(dim):
                dot = dot + M[:, j] * float(c[j])
            d = (sq - 2.0 * dot) + en
            best = d if best is None else np.minimum(best, d)
        return pd.Series(best)

    return kern


def greedy_kcenter(
    vecs: DataFrame, emb_col: str, id_col: str, k: int
) -> list[tuple[int, int, float | None]]:
    """Run the greedy selection; returns [(step, id, sel_dist|None)]
    — sel_dist is the max-min distance at which the point was chosen
    (None for the seed). Seed = min id (deterministic)."""
    seed = vecs.orderBy(col(id_col)).limit(1).collect()[0]
    selected = [(1, seed[id_col], None)]
    centers = [list(seed[emb_col])]
    for step in range(2, k + 1):
        kern = min_full_dist_to_centers(centers)
        nxt = (
            vecs.select(col(id_col), col(emb_col), kern(col(emb_col)).alias("d"))
            .orderBy(col("d").desc(), col(id_col))
            .limit(1)
            .collect()[0]
        )
        selected.append((step, nxt[id_col], float(nxt["d"])))
        centers.append(list(nxt[emb_col]))
    return selected


def duck_full_dist(cent: str, e: str) -> str:
    """DuckDB twin of the kernel's full L2²: (|c|² − 2⟨c,e⟩) + |e|²,
    every Σ a sequential list_reduce fold."""
    from .ivf import duck_ivf_dist

    de = f"CAST({e} AS DOUBLE[])"
    esq = (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"[({de})[i] * ({de})[i] for i in range(1, len({de}) + 1)]), (acc, x) -> acc + x)"
    )
    return f"(({duck_ivf_dist(cent, e)}) + ({esq}))"
